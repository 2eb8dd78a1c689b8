from posterior_matching_tpu.eval.clustering import (
    ClusteringAccuracyCallback,
    clustering_accuracy,
)
from posterior_matching_tpu.eval.embeddings import (
    embedder_provenance,
    get_inception_embeddings,
)
from posterior_matching_tpu.eval.prd import (
    compute_prd,
    compute_prd_from_embedding,
    prd_to_max_f_beta_pair,
)

__all__ = [
    "ClusteringAccuracyCallback",
    "clustering_accuracy",
    "compute_prd",
    "compute_prd_from_embedding",
    "embedder_provenance",
    "get_inception_embeddings",
    "prd_to_max_f_beta_pair",
]
