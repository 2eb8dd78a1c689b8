"""Pure-pytree distribution library (replaces tfp/distrax in the reference)."""
from posterior_matching_tpu.distributions._math import (
    fill_scale_tril,
    fill_triangular,
    softplus_scale,
    sum_rightmost,
    tril_size,
)
from posterior_matching_tpu.distributions.discrete import Bernoulli, Categorical
from posterior_matching_tpu.distributions.logistic import QuantizedLogisticMixture
from posterior_matching_tpu.distributions.mixture import GMM1D
from posterior_matching_tpu.distributions.normal import (
    MultivariateNormalDiag,
    MultivariateNormalTriL,
    Normal,
)

__all__ = [
    "Bernoulli",
    "Categorical",
    "GMM1D",
    "MultivariateNormalDiag",
    "MultivariateNormalTriL",
    "Normal",
    "QuantizedLogisticMixture",
    "fill_scale_tril",
    "fill_triangular",
    "softplus_scale",
    "sum_rightmost",
    "tril_size",
]
