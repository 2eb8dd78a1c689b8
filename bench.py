"""Benchmark: PM-VQVAE CelebA training steps/sec/chip (the north-star metric,
BASELINE.md).

Prints ONE final JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

``value`` is the steady-state optimizer steps/sec of our best fused pipeline
on the reference's PM-VQVAE CelebA workload shape
(configs/pm_vqvae_celeb_a.py: 64x64x3 images, batch 32, 16x16 code grid, 12
gated resnet blocks, 128 filters, codebook 512).

THE HEADLINE RATIO is ``vs_reference_impl``: our steps/sec against the
reference implementation's OWN code measured on the same chip
(bench_reference.py -> BENCH_REFERENCE.json). ``vs_baseline`` is a secondary,
deliberately conservative number: the same model stepped the way the
reference's input pipeline works — per-batch host-side numpy mask generation
(reference masking.py:342 tf.py_function; the numpy stand-in here omits the
RandomPattern/PIL and nested-mixture cost, so it UNDERSTATES the host cost)
+ host->device transfer + one dispatch each step — on the same chip, clamped
to its recorded best (see RECORDED_HOST_STEPS_PER_SEC).

Robustness architecture (round 2): the round-1 driver capture died because a
single transient remote-compile tunnel failure (HTTP 500 / broken pipe) hit
``model.init`` and took the whole process down.  Now every variant runs in a
FRESH SUBPROCESS (``python bench.py --variant X``) with retries and a
timeout; the parent process never imports jax, so a dead tunnel in one child
cannot poison the rest of the capture.  Variants run best-expected-first and
the final JSON is emitted from whatever succeeded.  The persistent XLA
compile cache (runtime.configure_environment) makes retries cheap after the
first successful compile.
"""
import argparse
import functools
import json
import os
import subprocess
import sys
import time

import numpy as np

# Steady-state dispatch counts. Kept modest: the driver runs this once at
# round end; the compile (cached) dominates wall time, not the timed region.
N_DISPATCH = 30
CHUNK = 20
# Chunked variants time this many dispatches (x CHUNK optimizer steps each);
# raised from 3 to 10 (VERDICT r3 weak #5: the headline deserves a thicker
# sample — 200 timed steps is still <3 s at ~80 steps/s).
N_DISPATCH_CHUNKED = 10

# Recorded host-pipeline baseline (BASELINE.md, measured 2026-08-16 on the
# same chip/workload) — used for vs_baseline ONLY if the live host-pipeline
# measurement fails after retries; the JSON then marks the fallback.
# ALSO the floor for the live measurement: the host pipeline is dominated by
# per-step host->device transfer + dispatch latency through the axon relay,
# which swings 2x between sessions (measured 24.4 / 20.8 / 11.0 steps/s on
# identical code). Taking max(live, recorded-best) keeps vs_baseline
# CONSERVATIVE — a slow relay day inflates the ratio, never the other way.
RECORDED_HOST_STEPS_PER_SEC = 24.4

# Step FLOPs of the flagship training step (fwd+bwd+update), measured from
# the round-3 device trace cost analysis (datasets/profile_cost_analysis.py,
# BASELINE.md: 1206 GFLOP/step). Used for the MFU field.
FLOPS_PER_STEP = 1.206e12
# Dense bf16 peak of one TPU v5e chip (197 TFLOP/s MXU).
TPU_V5E_BF16_PEAK = 197e12

# Recorded eval-sampler throughput (datasets/bench_eval_sampling.py,
# BASELINE.md 2026-08-16: fast cached sampler, 0.145 s/batch of 320 grids).
# Fallback for the eval_grids_per_sec field when the live measurement is
# skipped (budget) or fails; provenance is stamped either way.
RECORDED_EVAL_GRIDS_PER_SEC = 2211.0


def build(compute_dtype=None, packed=False):
    import jax
    import jax.numpy as jnp
    import optax

    from posterior_matching_tpu import masking
    from posterior_matching_tpu.models.pm_vqvae import PMVQVAE
    from posterior_matching_tpu.runtime import configure_environment

    configure_environment()

    vqvae_config = {
        "embedding_dim": 64,
        "num_embeddings": 512,
        "hidden_units": 128,
        "residual_hidden_units": 32,
        "residual_blocks": 2,
        "decay": 0.99,
        "use_ema": True,
        "commitment_cost": 0.25,
        "output_channels": 3,
    }
    pixel_cnn_config = {
        "image_shape": (16, 16),
        "num_resnet": 12,
        "num_hierarchies": 1,
        "num_filters": 128,
        "dropout": 0.5,
        "num_indices": 512,
    }
    batch = 32
    cond_dim = 512
    if os.environ.get("PM_BENCH_TINY"):
        # Plumbing smoke mode (CPU): tiny shapes, interpret-mode chain
        # kernels. Numbers are meaningless; only the wiring is exercised.
        vqvae_config.update(
            embedding_dim=16, num_embeddings=32, hidden_units=16,
            residual_hidden_units=8,
        )
        pixel_cnn_config.update(
            image_shape=(4, 4), num_resnet=2, num_filters=8,
            num_indices=32, fused_chain="interpret",
        )
        batch, cond_dim = 2, 32
    model = PMVQVAE.from_config(
        cond_dim, vqvae_config, pixel_cnn_config, compute_dtype=compute_dtype
    )
    mask_fn = masking.get_mask_generator("CelebAMaskGenerator")

    rng = np.random.RandomState(0)
    img_hw = 4 * pixel_cnn_config["image_shape"][0]  # vqvae downsamples 4x
    images = rng.rand(batch, img_hw, img_hw, 3).astype(np.float32)

    x0 = jnp.asarray(images)
    b0 = mask_fn(jax.random.PRNGKey(0), x0.shape)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x0,
        b0,
        training=True,
    )
    params = variables.pop("params")
    state = dict(variables)

    # The optimizer matches the real training CLI (train_pm_vqvae.py /
    # reference train_pm_vqvae.py:122-123): the pretrained VQ-VAE subtree is
    # FROZEN — no gradient is built through it and it carries no adam state.
    # Plain per-leaf adam is the measured winner for the update itself
    # (quiet-box A/B, pair chain): tree 75.2 > group_by_shape 70.2 >
    # optax.flatten 57.2 steps/s. flatten loses to re-tiling relayouts of
    # every raveled leaf; group_by_shape's leading-axis stacking is
    # layout-preserving but the per-leaf unstack+apply keeps the
    # fragmentation while the stack adds copies — XLA's per-leaf adam
    # schedule is already near its bandwidth floor. PM_BENCH_OPT=group
    # keeps the A/B reproducible.
    from posterior_matching_tpu.train.optim import group_by_shape

    tx = optax.adam(3e-4)
    if os.environ.get("PM_BENCH_OPT", "tree") == "group":
        tx = group_by_shape(tx)

    def _split(p):
        train = {k: v for k, v in p.items() if k != "vqvae"}
        return train, p["vqvae"]

    # Packed-chain representation (models/pixelcnn.py::pack_chain_params):
    # the PixelCNN gated-chain weights live in kernel-native stacked form
    # ([L, rows, cols] per weight name) for the WHOLE training run — the
    # per-step slice/reshape/stack copies that derive the kernel form from
    # canonical per-level leaves vanish, and Adam runs over ~26 stacked
    # tensors instead of ~100 chain leaves (the measured round-3 tail:
    # ~1.9 ms of per-leaf multiply_add fusions + ~0.8 ms of inter-fusion
    # copies, BASELINE.md). Elementwise-optimizer-exact: pack/unpack are
    # pure rearrangements (parity-pinned by tests/test_packed_chain.py).
    from posterior_matching_tpu.models.pixelcnn import (
        is_chain_param, pack_chain_params,
    )

    n_resnet = pixel_cnn_config["num_resnet"]
    n_filters = pixel_cnn_config["num_filters"]
    # Chain leaves stay in the apply tree structurally (their values are
    # unused by the packed apply path); closed over as jit constants.
    chain_stub = {
        k: v for k, v in params["pixel_cnn"].items() if is_chain_param(k)
    }

    def _split_packed(p):
        pc = p["pixel_cnn"]
        train = {
            k: v for k, v in p.items() if k not in ("vqvae", "pixel_cnn")
        }
        train["pixel_cnn_rest"] = {
            k: v for k, v in pc.items() if not is_chain_param(k)
        }
        train["packed"] = pack_chain_params(
            pc, num_resnet=n_resnet, num_filters=n_filters
        )
        return train, p["vqvae"]

    def _merge_packed(train, frozen):
        full = {
            k: v for k, v in train.items()
            if k not in ("packed", "pixel_cnn_rest")
        }
        full["pixel_cnn"] = {**chain_stub, **train["pixel_cnn_rest"]}
        full["vqvae"] = frozen
        return full, train["packed"]

    trainable0, _ = (_split_packed if packed else _split)(params)
    opt_state = tx.init(trainable0)

    def loss(params, state, x, b, key, packed_chain=None):
        ll, _ = model.apply(
            {"params": params, **state}, x, b, training=True,
            rngs={"dropout": key}, mutable=["vq_ema"],
            packed_chain=packed_chain,
        )
        return -jnp.mean(ll)

    # Matches the Trainer's default rng_impl="auto": the dropout key is
    # converted to the hardware rbg impl on TPU (threefry bit generation is
    # pure VPU ALU work, ~7 ms/step at these shapes — measured, BASELINE.md);
    # mask keys stay threefry (measured equal).
    from posterior_matching_tpu.utils import fast_bits_key

    use_rbg = jax.default_backend() == "tpu"

    frozen_vqvae = params["vqvae"]

    def fused_body(params, opt_state, state, images, key):
        key, k_mask, k_drop = jax.random.split(key, 3)
        if use_rbg:
            k_drop = fast_bits_key(k_drop)
        b = mask_fn(k_mask, images.shape).reshape(
            (*images.shape[:-1], 1)
        )
        if packed:
            # ``params`` here IS the packed trainable tree; the frozen
            # vqvae rides as a closed-over constant like chain_stub.
            def packed_loss(t):
                full, pk = _merge_packed(t, frozen_vqvae)
                return loss(full, state, images, b, k_drop, packed_chain=pk)

            g = jax.grad(packed_loss)(params)
            updates, opt_state = tx.update(g, opt_state)
            return optax.apply_updates(params, updates), opt_state, key
        train, frozen = _split(params)
        g = jax.grad(
            lambda t: loss({**t, "vqvae": frozen}, state, images, b, k_drop)
        )(train)
        updates, opt_state = tx.update(g, opt_state)
        return {**train, "vqvae": frozen}, opt_state, key

    fused_step = jax.jit(fused_body, donate_argnums=(0, 1))

    # Scan-fused: CHUNK optimizer steps per dispatched program — the
    # framework's Trainer(steps_per_call=...) + DeviceDataset execution mode.
    # Possible only because masks are generated on device; the reference's
    # host mask callback forces one dispatch (and transfer) per step.
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def fused_chunk(params, opt_state, state, images, key):
        def body(carry, _):
            p, o, k = carry
            return fused_body(p, o, state, images, k), None

        (params, opt_state, key), _ = jax.lax.scan(
            body, (params, opt_state, key), None, length=CHUNK
        )
        return params, opt_state, key

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def naive_step(params, opt_state, state, images, b, key):
        key, k_drop = jax.random.split(key)
        train, frozen = _split(params)
        g = jax.grad(
            lambda t: loss({**t, "vqvae": frozen}, state, images, b, k_drop)
        )(train)
        updates, opt_state = tx.update(g, opt_state)
        train = optax.apply_updates(train, updates)
        return {**train, "vqvae": frozen}, opt_state, key

    # In packed mode the tree threaded through the step IS the packed
    # trainable tree (frozen vqvae + stub chain leaves ride as constants).
    threaded = trainable0 if packed else params
    return (
        jax, jnp, model, mask_fn, images, threaded, state, opt_state,
        fused_step, fused_chunk, naive_step,
    )


def host_masks(images_shape, rng):
    """Reference-style host mask generation (numpy re-implementation of the
    CelebA mixture's cheap components for timing purposes)."""
    b, h, w, _ = images_shape
    masks = np.ones((b, h, w, 1), np.float32)
    for i in range(b):
        kind = rng.randint(3)
        if kind == 0:
            masks[i] = (rng.rand(h, w, 1) > 0.2).astype(np.float32)
        else:
            x1, x2 = sorted(rng.randint(0, w, 2))
            y1, y2 = sorted(rng.randint(0, h, 2))
            masks[i, y1 : y2 + 1, x1 : x2 + 1] = 0.0
    return masks


def _sync(jax, jnp, tree):
    """Forces completion by FETCHING A VALUE. ``block_until_ready`` is not a
    reliable fence on remote/tunneled backends (measured: it returned in
    0.04s where the actual device work took 34s) — only a value round trip
    proves the computation ran."""
    return float(jnp.sum(jax.tree.leaves(tree)[0]))


def _time_fused(
    jax, jnp, params, state, opt_state, step_fn, images, n, steps_per_call=1
):
    """Times ``n`` dispatches of ``step_fn`` (each = ``steps_per_call``
    optimizer steps); returns optimizer steps/sec. Synced by value fetch."""
    key = jax.random.PRNGKey(0)
    x_dev = jnp.asarray(images)
    p = jax.tree.map(jnp.copy, params)  # steps donate their inputs
    o = jax.tree.map(jnp.copy, opt_state)
    for _ in range(2):  # warmup/compile
        p, o, key = step_fn(p, o, state, x_dev, key)
    _sync(jax, jnp, p)
    t0 = time.perf_counter()
    for _ in range(n):
        p, o, key = step_fn(p, o, state, x_dev, key)
    _sync(jax, jnp, p)
    return n * steps_per_call / (time.perf_counter() - t0)


# ---------------------------------------------------------------------------
# Child mode: measure one variant, print {"steps_per_sec": N} on the LAST
# stdout line.
# ---------------------------------------------------------------------------

def run_variant(name):
    if name == "eval_sampler":
        return run_eval_sampler()
    import jax
    import jax.numpy as jnp

    dtype = "bfloat16" if name.endswith("bf16") else None
    (
        jax_, jnp_, model, mask_fn, images, params, state, opt_state,
        fused_step, fused_chunk, naive_step,
    ) = build(compute_dtype=dtype, packed=name.startswith("packed"))

    if name.startswith(("chunked", "packed")):
        sps = _time_fused(
            jax, jnp, params, state, opt_state, fused_chunk, images,
            N_DISPATCH_CHUNKED, steps_per_call=CHUNK,
        )
    elif name.startswith("fused"):
        sps = _time_fused(
            jax, jnp, params, state, opt_state, fused_step, images, N_DISPATCH
        )
    elif name == "host_baseline":
        key = jax.random.PRNGKey(0)
        rng = np.random.RandomState(0)
        p = jax.tree.map(jnp.copy, params)
        o = jax.tree.map(jnp.copy, opt_state)
        for _ in range(2):
            b = jnp.asarray(host_masks(images.shape, rng))
            x = jnp.asarray(images.copy())
            p, o, key = naive_step(p, o, state, x, b, key)
        _sync(jax, jnp, p)
        t0 = time.perf_counter()
        for _ in range(N_DISPATCH):
            b = jnp.asarray(host_masks(images.shape, rng))
            x = jnp.asarray(images.copy())  # fresh host batch each step
            p, o, key = naive_step(p, o, state, x, b, key)
        _sync(jax, jnp, p)
        sps = N_DISPATCH / (time.perf_counter() - t0)
    else:
        raise ValueError(f"unknown variant {name!r}")
    print(json.dumps(
        {"steps_per_sec": sps, "platform": jax.default_backend()}
    ))


def run_eval_sampler():
    """Times the fast cached PixelCNN imputation sampler at the eval-protocol
    shapes (batch 32 x 10 imputations over the 16x16 CelebA code grid) and
    prints ``{"grids_per_sec": N}`` — the "eval imgs/sec" metric from
    BASELINE.json's metric line (VERDICT r3 item 4). The naive raster sampler
    is NOT re-timed here (11 s/batch; its ratio lives in
    datasets/bench_eval_sampling.py and BASELINE.md)."""
    import jax
    import jax.numpy as jnp

    from posterior_matching_tpu.models.pixelcnn import PixelCNN
    from posterior_matching_tpu.models.pixelcnn_fast import (
        pixelcnn_sample_fast,
    )
    from posterior_matching_tpu.runtime import configure_environment

    configure_environment()
    model = PixelCNN(
        num_indices=512, image_shape=(16, 16), dropout=0.5,
        num_resnet=12, num_hierarchies=1, num_filters=128,
    )
    batch, num_samples = 32, 10
    cond = jax.random.normal(jax.random.PRNGKey(7), (batch, 512))
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((batch, 16, 16), jnp.int32), cond
    )
    if (
        jax.default_backend() == "tpu"
        and os.environ.get("PM_TPU_SAMPLER", "rowkernel") == "rowkernel"
    ):
        # same dispatch as the eval path (pm_vqvae_impute): the per-row
        # Pallas sampler kernel, bf16 (ops/sampler_chain.py)
        from posterior_matching_tpu.ops.sampler_chain import (
            pixelcnn_sample_rowkernel,
        )

        fast = jax.jit(
            lambda k, c: pixelcnn_sample_rowkernel(
                model, variables["params"], k, num_samples,
                conditional_input=c, compute_dtype="bfloat16",
            )
        )
    else:
        fast = jax.jit(
            lambda k, c: pixelcnn_sample_fast(
                model, variables["params"], k, num_samples,
                conditional_input=c
            )
        )
    out = fast(jax.random.PRNGKey(0), cond)  # compile
    int(jnp.sum(out))  # value-fetch sync (see _sync)
    reps = 3
    t0 = time.perf_counter()
    for i in range(reps):
        out = fast(jax.random.PRNGKey(i + 1), cond)
        int(jnp.sum(out))
    dt = (time.perf_counter() - t0) / reps
    print(json.dumps(
        {
            "grids_per_sec": batch * num_samples / dt,
            "sec_per_batch": dt,
            "platform": jax.default_backend(),
        }
    ))


# ---------------------------------------------------------------------------
# Parent mode: orchestrate subprocesses with retries; emit the final JSON.
# ---------------------------------------------------------------------------

def _run_child(label, argv, tries=3, timeout_s=2400):
    """Runs a child python process; retries on any failure (the
    remote-compile tunnel flakes transiently — a fresh process gets a fresh
    tunnel connection). Returns the parsed last-JSON-line dict or None."""
    for attempt in range(1, tries + 1):
        if time.monotonic() > _DEADLINE[0]:
            print(
                f"# bench budget exhausted before {label} attempt {attempt}",
                file=sys.stderr,
            )
            return None
        try:
            remaining = max(_DEADLINE[0] - time.monotonic(), 60.0)
            proc = subprocess.run(
                [sys.executable] + argv,
                capture_output=True, text=True,
                timeout=min(timeout_s, remaining),
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            if proc.returncode == 0:
                for line in reversed(proc.stdout.strip().splitlines()):
                    line = line.strip()
                    if line.startswith("{"):
                        return json.loads(line)
            err_tail = (proc.stderr or "")[-500:]
            print(
                f"# bench {label} attempt {attempt}/{tries} failed "
                f"(rc={proc.returncode}): ...{err_tail!r}",
                file=sys.stderr,
            )
        except subprocess.TimeoutExpired:
            print(
                f"# bench {label} attempt {attempt}/{tries} timed out",
                file=sys.stderr,
            )
        except Exception as e:  # noqa: BLE001 — keep the capture alive
            print(
                f"# bench {label} attempt {attempt}/{tries}: {e!r}",
                file=sys.stderr,
            )
        time.sleep(min(10.0 * attempt, 30.0))
    return None


def _measure_in_subprocess(variant, tries=3, timeout_s=2400):
    """Measures one bench.py variant in a fresh process; returns steps/sec
    (or grids/sec for eval_sampler) or None."""
    rec = _run_child(
        variant,
        [os.path.abspath(__file__), "--variant", variant],
        tries=tries, timeout_s=timeout_s,
    )
    if rec is None:
        return None
    if variant == "eval_sampler":
        return float(rec["grids_per_sec"])
    return float(rec["steps_per_sec"])


# Global wall-clock budget for the whole capture (seconds; override with
# PM_BENCH_BUDGET). A wedged TPU backend times out per attempt; without a
# budget, retries across variants could run for hours in a driver context.
_DEADLINE = [0.0]

_CAPTURE_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "BENCH_CAPTURE.json"
)
_REFERENCE_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "BENCH_REFERENCE.json"
)


def _probe_backend_once(timeout_s=300):
    """Cheap grantability probe in a fresh subprocess: a wedged TPU lease
    hangs client creation indefinitely (observed 2026-08-17: a Pallas kernel
    dying in PJRT occupied the remote lease for hours). Returns
    ``(ok, failure_kind)`` with ``failure_kind`` one of ``None`` (success),
    ``"fast"`` (nonzero exit — a transient tunnel error, worth retrying),
    ``"hang"`` (timeout — a wedged OR transiently-held lease), or
    ``"spawn"`` (could not even start a process — environmental, final)."""
    code = (
        "import jax, jax.numpy as jnp;"
        "print('OK', float(jnp.sum(jnp.ones((8, 8)))))"
    )
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=timeout_s,
        )
        ok = proc.returncode == 0 and "OK 64.0" in proc.stdout
        return (ok, None if ok else "fast")
    except subprocess.TimeoutExpired:
        return (False, "hang")
    except Exception:  # noqa: BLE001 — spawn failure: environmental
        return (False, "spawn")


def _probe_backend(timeout_s=300, max_attempts=3, retry_gap_s=30,
                   hang_retries=1):
    """Probe with retries on FAST failures (transient HTTP 500s through
    the tunnel — the exact round-1 failure mode). A probe that times out
    is EITHER a wedged lease (not worth re-entering the claim queue for)
    OR another process transiently holding the single-chip lease — e.g. a
    long compile from an earlier run still finishing (observed 2026-08-20:
    the probe declared "wedged" while a killed trace run's lease was still
    draining, and the capture needlessly fell back to the banked record).
    One hang-retry (after a full probe-timeout of waiting) distinguishes
    the two: a transient holder releases, a true wedge hangs again."""
    # Hang retries are budgeted SEPARATELY from fast-failure retries
    # (advisor r4: a hang on the final fast attempt used to print
    # "retrying", sleep, then exhaust the loop without actually retrying).
    hangs = 0
    fast_failures = 0
    while True:
        ok, failure = _probe_backend_once(timeout_s)
        if ok:
            return True
        if failure == "spawn":
            print(
                "# backend probe could not spawn — not retrying",
                file=sys.stderr,
            )
            return False
        if failure == "hang":
            hangs += 1
            if hangs > hang_retries:
                print(
                    f"# backend probe hung {hangs}x — wedged lease, "
                    "giving up", file=sys.stderr,
                )
                return False
            print(
                "# backend probe hung — retrying once in case another "
                "process transiently holds the lease", file=sys.stderr,
            )
            time.sleep(retry_gap_s)
            continue
        fast_failures += 1
        print(
            f"# backend probe fast failure {fast_failures}/{max_attempts} "
            "(transient tunnel error)",
            file=sys.stderr,
        )
        if fast_failures >= max_attempts:
            return False
        time.sleep(retry_gap_s)


def _merge_reference_ratio(out, fresh_ref_sps=None):
    """Adds the implementation-vs-implementation ratio — the true north-star
    denominator (bench_reference.py runs the reference's own code over the
    tests/refshims shims, appending to BENCH_REFERENCE.json). Prefers a
    same-session measurement (``fresh_ref_sps``, VERDICT r3 item 5: numerator
    and denominator should share a session) and falls back to the banked
    best. No jax import here: the parent process must not claim the TPU; the
    records carry their platform, and only accelerator runs are comparable
    to this capture."""
    try:
        with open(_REFERENCE_PATH) as f:
            ref_records = json.load(f)
        banked = max(
            r["value"] for r in ref_records
            if r.get("platform") not in (None, "cpu") and r.get("value")
        )
    except (OSError, ValueError, KeyError, TypeError, AttributeError):
        banked = None
    if fresh_ref_sps:
        # Same clamp policy as the host baseline: the reference's per-step
        # host-masking pipeline is dominated by relay dispatch latency and
        # swings with session weather (measured 19.7 / 18.19 / 5.67 steps/s
        # on identical code across 2026-08-19/20 sessions). The denominator
        # is max(live, banked best) so a slow relay day can only UNDERSTATE
        # the ratio; both raw values are reported.
        out["reference_impl_live_steps_per_sec"] = fresh_ref_sps
        if banked is not None and banked > fresh_ref_sps:
            out["reference_impl_steps_per_sec"] = banked
            out["reference_impl_source"] = "live_clamped_to_banked_best"
            out["vs_reference_impl"] = round(out["value"] / banked, 4)
        else:
            out["reference_impl_steps_per_sec"] = fresh_ref_sps
            out["reference_impl_source"] = "same_session"
            out["vs_reference_impl"] = round(out["value"] / fresh_ref_sps, 4)
        return
    try:
        ref_sps = banked
        if ref_sps is None:
            raise ValueError("no banked reference record")
        out["reference_impl_steps_per_sec"] = ref_sps
        out["reference_impl_source"] = "banked_best"
        out["vs_reference_impl"] = round(out["value"] / ref_sps, 4)
    except (OSError, ValueError, KeyError, TypeError, AttributeError):
        # TypeError/AttributeError: malformed BENCH_REFERENCE.json (object
        # instead of list, non-dict records, "value": null) must not crash
        # the wedged-chip fallback path this function exists to keep robust.
        pass


def _emit_banked_capture(reason):
    """Falls back to a capture banked EARLIER IN THIS ROUND by a successful
    run of this same script on the real chip (written by main() on success).
    Only used when the backend is unreachable now; the output says so loudly
    (``cached: true`` + measurement timestamp) — it is a real measurement,
    just not a fresh one."""
    try:
        with open(_CAPTURE_PATH) as f:
            banked = json.load(f)
    except (OSError, ValueError):
        return False
    if not banked.get("value"):
        return False
    banked["cached"] = True
    banked["cache_reason"] = reason
    # The banked capture may predate the reference measurement on this
    # hardware; merge the ratio at emit time so the fallback still reports
    # the implementation-vs-implementation number.
    if "vs_reference_impl" not in banked:
        _merge_reference_ratio(banked)
    print(json.dumps(banked))
    return True


def _resolve_baseline(measured):
    """vs_baseline denominator + provenance tag. The live host-pipeline
    measurement is clamped UP to its recorded best so relay-latency noise
    can only understate the win (see RECORDED_HOST_STEPS_PER_SEC)."""
    if measured is None:
        return RECORDED_HOST_STEPS_PER_SEC, "recorded_round1"
    if measured < RECORDED_HOST_STEPS_PER_SEC:
        return RECORDED_HOST_STEPS_PER_SEC, "measured_clamped_to_recorded_best"
    return measured, "measured"


def _compose_and_emit(results, fresh_ref_sps=None, bank=True):
    """Builds the final JSON record from whatever has been measured so far,
    banks it, and PRINTS it. Called as soon as the primary numbers are in
    hand and again after each optional extra (the driver parses the LAST
    JSON line, so re-emitting an updated record is safe — and it means a
    driver timeout mid-extra still leaves a complete capture on stdout;
    round 3 lost its headline to exactly that, VERDICT r3 weak #1)."""
    fused_names = [
        "packed_bf16", "chunked_bf16", "fused_bf16",
        "packed_f32", "chunked_f32", "fused_f32",
    ]
    fused = {k: v for k, v in results.items() if k in fused_names}
    best = max(fused.values())
    live_host = results.get("host_baseline")
    naive, baseline_source = _resolve_baseline(live_host)

    out = {
        "metric": "pm_vqvae_celeba_train_steps_per_sec_per_chip",
        "value": round(best, 4),
        "unit": "steps/sec",
        "vs_baseline": round(best / naive, 4),
        "baseline_source": baseline_source,
        "host_masking_steps_per_sec": round(naive, 4),
        # MFU at the measured rate: 1206 GFLOP/step (round-3 trace cost
        # analysis) against one v5e chip's dense bf16 peak.
        "mfu": round(best * FLOPS_PER_STEP / TPU_V5E_BF16_PEAK, 4),
    }
    if baseline_source == "measured_clamped_to_recorded_best":
        # Preserve the raw live measurement alongside the clamped
        # denominator so the capture documents what was actually measured.
        out["host_masking_live_steps_per_sec"] = round(live_host, 4)
    for k, v in fused.items():
        out[f"{k}_steps_per_sec"] = round(v, 4)
    # Eval-sampler throughput (BASELINE.json metric line: "eval imgs/sec").
    if results.get("eval_sampler"):
        out["eval_grids_per_sec"] = round(results["eval_sampler"], 2)
        out["eval_grids_source"] = "measured"
    else:
        out["eval_grids_per_sec"] = RECORDED_EVAL_GRIDS_PER_SEC
        out["eval_grids_source"] = "recorded_2026-08-16"
    _merge_reference_ratio(out, fresh_ref_sps)
    # Explicit live-measurement provenance (VERDICT r4 item 4): a fresh
    # capture says cached: false; only _emit_banked_capture flips it.
    out["cached"] = False
    out["measured_at"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    if bank:
        # Bank the fresh capture for a wedged-chip fallback later the round.
        try:
            with open(_CAPTURE_PATH, "w") as f:
                json.dump(out, f)
        except OSError:
            pass
    print(json.dumps(out), flush=True)
    return out


def main():
    # Budget default 30 min (VERDICT r3 item 1c: the round-3 default of
    # 90 min outran the driver's timeout and the capture was lost).
    _DEADLINE[0] = time.monotonic() + float(
        os.environ.get("PM_BENCH_BUDGET", 1800)
    )
    if not _probe_backend():
        print(
            "# backend probe failed (wedged lease or dead tunnel)",
            file=sys.stderr,
        )
        if _emit_banked_capture("backend unreachable at capture time"):
            return
        # No banked capture — proceed anyway; the probe failure may have
        # been a transient claim-queue stall and retries are budgeted.
    # PRIMARY PLAN: just the headline variant + the host-pipeline baseline.
    # The final JSON is emitted (and banked) the moment both are in hand;
    # everything after is optional and re-emits an updated last line.
    # fused_bf16/chunked_f32 exist for A/Bs, not for the capture — they are
    # gated behind PM_BENCH_FULL=1 (VERDICT r3 item 1b). fused_f32 is
    # intentionally absent: its compile measured pathologically slow through
    # the remote-compile tunnel (>25 min on 2026-08-17).
    results = {}
    partial_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_PARTIAL.json"
    )

    def _bank_partial():
        try:
            with open(partial_path, "w") as f:
                json.dump(results, f)
        except OSError:
            pass

    # packed_bf16 (chain weights kernel-native-stacked across the run,
    # measured 86.8 vs chunked_bf16's 78.2 steps/s on-chip 2026-08-19) is
    # the headline; chunked_bf16 is its fallback if it ever fails.
    for variant in ["packed_bf16", "host_baseline"]:
        sps = _measure_in_subprocess(variant)
        if sps is not None:
            results[variant] = sps
        _bank_partial()

    if "packed_bf16" not in results:
        sps = _measure_in_subprocess("chunked_bf16")
        if sps is not None:
            results["chunked_bf16"] = sps
        _bank_partial()

    if not any(k in results for k in ("packed_bf16", "chunked_bf16")):
        if _emit_banked_capture("primary variant failed this capture"):
            return
        # Nothing measured at all — emit an explicit failure record (rc!=0).
        print(json.dumps(
            {"metric": "pm_vqvae_celeba_train_steps_per_sec_per_chip",
             "value": None, "unit": "steps/sec",
             "error": "primary variant failed", **results}
        ))
        sys.exit(1)

    _compose_and_emit(results)

    # --- Optional extras, budget-permitting; each re-emits the record. ---
    # 1. Same-session reference-implementation measurement (VERDICT r3
    #    item 5): numerator and denominator share a session. 30 steps at
    #    ~19 steps/s ≈ 2 s timed; the reference model compile is cached
    #    after its first run. bench_reference.py appends the row to
    #    BENCH_REFERENCE.json itself.
    fresh_ref = None
    if time.monotonic() < _DEADLINE[0] - 120:
        rec = _run_child(
            "reference_impl",
            [os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "bench_reference.py"),
             "--steps", "30", "--warmup", "3"],
            tries=2, timeout_s=1200,
        )
        if rec and rec.get("platform") not in (None, "cpu") and rec.get("value"):
            fresh_ref = float(rec["value"])
            results["reference_impl"] = fresh_ref
            _bank_partial()
            _compose_and_emit(results, fresh_ref)

    # 2. Eval-sampler throughput (VERDICT r3 item 4).
    if time.monotonic() < _DEADLINE[0] - 120:
        gps = _measure_in_subprocess("eval_sampler", tries=2, timeout_s=1200)
        if gps is not None:
            results["eval_sampler"] = gps
            _bank_partial()
            _compose_and_emit(results, fresh_ref)

    # 3. A/B variants, only on explicit request.
    if os.environ.get("PM_BENCH_FULL"):
        for variant in ["fused_bf16", "chunked_f32"]:
            sps = _measure_in_subprocess(variant)
            if sps is not None:
                results[variant] = sps
                _bank_partial()
                _compose_and_emit(results, fresh_ref)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--variant", default=None)
    args = parser.parse_args()
    if args.variant:
        run_variant(args.variant)
    else:
        main()
