from posterior_matching_tpu.models.heads import get_distribution
from posterior_matching_tpu.models.networks import get_network
from posterior_matching_tpu.models.vae import PosteriorMatchingVAE

__all__ = ["PosteriorMatchingVAE", "get_distribution", "get_network"]
