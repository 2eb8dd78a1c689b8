"""Hot-path ops: fused kernels (Pallas) with XLA reference implementations."""
from posterior_matching_tpu.ops.vq import (
    nearest_codebook_indices,
    vq_straight_through,
)

__all__ = ["nearest_codebook_indices", "vq_straight_through"]
