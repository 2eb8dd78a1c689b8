from tensorflow_probability.substrates.jax import (  # noqa: F401
    bijectors,
    distributions,
    math,
)
