"""Shim package — see tests/refshims/README.md."""
from tensorflow_probability import substrates  # noqa: F401
