"""posterior_matching_tpu: a TPU-native framework for Posterior Matching.

A from-scratch JAX/XLA/Pallas implementation of "Posterior Matching for
Arbitrary Conditioning" (arXiv 2201.12414) with the full capability surface of
the reference implementation (lupalab/posterior-matching), re-designed
TPU-first:

- pure-pytree distribution library (no tfp/distrax object graphs in the hot
  path) in :mod:`posterior_matching_tpu.distributions`
- on-device mask generation fused into the jitted train step
  (:mod:`posterior_matching_tpu.masking`) instead of host-side
  ``tf.py_function`` callbacks
- a single ``jit``-compiled, ``NamedSharding``-over-``Mesh`` trainer
  (:mod:`posterior_matching_tpu.train`) replacing pmap/bax
- Pallas kernels for the hot ops in :mod:`posterior_matching_tpu.ops`
- the model zoo (PM-VAE, VQ-VAE + conditional PixelCNN, PM-VDVAE, VaDE,
  lookahead posteriors) in :mod:`posterior_matching_tpu.models`
"""

__version__ = "0.1.0"
