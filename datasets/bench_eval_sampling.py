"""One-off: times PM-VQVAE imputation sampling, naive full-forward raster
vs the incrementally-cached sampler (models/pixelcnn_fast.py), on the
north-star CelebA shapes. Prints a JSON line per variant.

Run on the TPU: ``python datasets/bench_eval_sampling.py``
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from posterior_matching_tpu.models.pixelcnn import (
        PixelCNN,
        pixelcnn_sample,
    )
    from posterior_matching_tpu.models.pixelcnn_fast import (
        pixelcnn_sample_fast,
    )
    from posterior_matching_tpu.runtime import configure_environment

    configure_environment()

    # configs/pm_vqvae_celeb_a.py shapes
    model = PixelCNN(
        num_indices=512, image_shape=(16, 16), dropout=0.5,
        num_resnet=12, num_hierarchies=1, num_filters=128,
    )
    batch, num_samples = 32, 10  # eval protocol: 10 imputations/instance
    cond = jax.random.normal(jax.random.PRNGKey(7), (batch, 512))
    x0 = jnp.zeros((batch, 16, 16), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), x0, cond)

    def logits_fn(codes, c):
        return model.apply(variables, codes, conditional_input=c)

    naive = jax.jit(
        lambda k, c: pixelcnn_sample(
            logits_fn, k, num_samples, (16, 16), conditional_input=c
        )
    )
    fast = jax.jit(
        lambda k, c: pixelcnn_sample_fast(
            model, variables["params"], k, num_samples, conditional_input=c
        )
    )

    def sync(out):
        # value fetch: block_until_ready is not a reliable fence on
        # remote/tunneled backends (see bench.py _sync)
        return int(jnp.sum(out))

    results = {}
    for name, fn in [("fast_cached", fast), ("naive_full_forward", naive)]:
        out = fn(jax.random.PRNGKey(0), cond)  # compile
        sync(out)
        reps = 3
        t0 = time.perf_counter()
        for i in range(reps):
            out = fn(jax.random.PRNGKey(i), cond)
            sync(out)
        dt = (time.perf_counter() - t0) / reps
        results[name] = dt
        print(
            json.dumps(
                {
                    "variant": name,
                    "sec_per_batch": round(dt, 4),
                    "grids_per_sec": round(batch * num_samples / dt, 2),
                }
            ),
            flush=True,
        )
    print(
        json.dumps(
            {
                "metric": "pm_vqvae_celeba_sampling_speedup",
                "value": round(
                    results["naive_full_forward"] / results["fast_cached"], 3
                ),
                "unit": "x",
            }
        )
    )


if __name__ == "__main__":
    main()
