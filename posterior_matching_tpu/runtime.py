"""Process-level runtime configuration for entry-point scripts.

The reference's ``configure_environment`` (reference utils.py:21-24) silences
TF and hides GPUs from it; ours configures JAX for production runs:
persistent compilation cache (first compile of the big models is expensive;
subsequent runs hit the cache) and optional x64/platform overrides via env.
"""
from __future__ import annotations

import os


def configure_environment():
    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")
    os.environ.setdefault("XLA_PYTHON_CLIENT_PREALLOCATE", "false")

    import jax

    if os.environ.get("PM_TPU_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["PM_TPU_PLATFORM"])

    # Persistent compile cache: indispensable for the slow remote-compile TPU
    # path, but CPU runs must skip it — the service's CPU AOT artifacts carry
    # machine features the local host may not support (SIGILL risk).
    on_cpu = os.environ.get("PM_TPU_PLATFORM") == "cpu"
    cache_dir = os.environ.get(
        "PM_TPU_COMPILE_CACHE", os.path.expanduser("~/.cache/pm_tpu_jax")
    )
    if cache_dir and cache_dir != "0" and not on_cpu:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # Multi-host: joins the jax.distributed cluster when a coordinator is
    # configured (no-op single-host). Must run before any backend use.
    from posterior_matching_tpu.parallel.mesh import (
        maybe_initialize_distributed,
    )

    maybe_initialize_distributed()
