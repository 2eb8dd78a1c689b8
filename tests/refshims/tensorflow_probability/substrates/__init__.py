from tensorflow_probability.substrates import jax  # noqa: F401
