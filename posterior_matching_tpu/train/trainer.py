"""The training runtime: a single-jit, mesh-sharded trainer.

Replaces the external ``bax`` Trainer the reference depends on
(reference requirements.txt:1; call sites e.g. train_pm_vdvae.py:146-154) with
a TPU-first design:

- ONE ``jax.jit``-compiled update step per training run. Mask generation and
  training-noise injection run *inside* that step (``prologue_fn``), so the
  host never touches masks (the reference pays a ``tf.py_function`` Python
  callback per batch, reference masking.py:342).
- data parallelism via ``NamedSharding`` over a 1-D mesh (ICI collectives
  inserted by XLA) instead of pmap; the same code path runs on 1 or N chips
  and on a forced-host-device CPU mesh in tests.
- parameter freezing (``trainable_predicate``, reference
  train_pm_vqvae.py:122), non-finite update skipping
  (reference train_pm_vdvae.py:152), EMA params + EMA-for-eval
  (reference train_pm_vdvae.py:153-154), warm starts via
  ``initial_params``/``initial_state`` merge (reference train_pm_vqvae.py:154).
"""
from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Dict, Iterable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from posterior_matching_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    put_with_sharding,
    replicated_sharding,
)
from posterior_matching_tpu.train.state import TrainState

# loss_fn(params, state, key, step, batch, is_training) -> (loss, aux, state)
LossFn = Callable[..., Any]
# init_fn(key, batch) -> (params, state)
InitFn = Callable[..., Any]
# prologue_fn(batch, key) -> batch   (runs inside jit, on device)
PrologueFn = Callable[..., Any]


def _tree_merge(base: dict, overrides: dict) -> dict:
    """Recursively merges ``overrides`` into ``base`` (leaves in overrides
    win). Used for warm starts where the new model is a superset of a
    pretrained one (reference train_pm_vqvae.py:154-155)."""
    out = dict(base)
    for k, v in (overrides or {}).items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _tree_merge(out[k], v)
        else:
            out[k] = v
    return out


def _path_to_names(path) -> tuple:
    parts = []
    for p in path:
        key = getattr(p, "key", getattr(p, "name", None))
        parts.append(str(key))
    return tuple(parts)


def _all_finite(tree) -> jnp.ndarray:
    leaves = jax.tree.leaves(tree)
    ok = jnp.array(True)
    for leaf in leaves:
        ok = jnp.logical_and(ok, jnp.all(jnp.isfinite(leaf)))
    return ok


class Trainer:
    """See module docstring.

    Args mirror the reference's bax Trainer where applicable:
        loss_fn: ``(params, state, key, step, batch, is_training) ->
            (loss, aux_dict, new_state)``.
        init_fn: ``(key, batch) -> (params, state)``.
        optimizer: an optax GradientTransformation.
        num_devices: devices in the data mesh (default: all local devices).
        trainable_predicate: ``(module_path: str, name: str, value) -> bool``;
            params mapped to False receive zero updates (frozen).
        skip_nonfinite_updates: skip the whole update when loss or grads are
            non-finite.
        ema_rate / use_ema_for_eval: maintain EMA params; use them for
            validation and callbacks.
        prologue_fn: on-device batch preprocessing fused into the jitted step
            (mask generation, training noise).
        seed: RNG seed.
        steps_per_call: fuse this many optimizer steps into ONE dispatched XLA
            program (``lax.scan`` over the update). Amortizes host dispatch
            and host->device transfer (batches for a chunk are stacked and
            shipped once); with a :class:`DeviceDataset` the input pipeline
            leaves the host entirely. Requires ``validation_freq`` divisible
            by it. Only possible because masks/noise are generated on device
            — the reference's host-side mask callback forces one dispatch per
            step by construction (reference masking.py:342).
        rng_impl: PRNG implementation for the per-step LOSS key (dropout /
            reparameterization bits). ``"auto"`` (default) uses ``"rbg"``
            (hardware RngBitGenerator) on TPU and threefry elsewhere;
            threefry bit generation is pure VPU ALU work and costs ~25% of
            the PM-VQVAE CelebA step (measured, BASELINE.md). Prologue
            (mask) keys stay threefry — many small fused draws, measured
            equal. Pass ``None`` to force threefry everywhere.
        optimizer may also be a FACTORY ``params ->
            GradientTransformation`` for transforms that need concrete
            parameter shapes; it is called once with the initialized params.
            For consolidating the per-leaf update fragmentation on TPU, wrap
            the optimizer in ``train.optim.group_by_shape`` (NOT
            ``optax.flatten``, whose raveling forces re-tiling relayouts —
            measured slower than the per-leaf update on the flagship).
    """

    def __init__(
        self,
        loss_fn: LossFn,
        init_fn: InitFn,
        optimizer: optax.GradientTransformation,
        *,
        num_devices: Optional[int] = None,
        trainable_predicate: Optional[Callable] = None,
        skip_nonfinite_updates: bool = False,
        ema_rate: Optional[float] = None,
        use_ema_for_eval: bool = False,
        prologue_fn: Optional[PrologueFn] = None,
        val_prologue_fn: Optional[PrologueFn] = None,
        seed: Optional[int] = None,
        profile_dir: Optional[str] = None,
        profile_steps: tuple = (10, 15),
        steps_per_call: int = 1,
        rng_impl: Optional[str] = "auto",
        param_codec: Optional[Callable] = None,
    ):
        self._loss_fn = loss_fn
        self._init_fn = init_fn
        self._optimizer = optimizer
        # param_codec: FACTORY ``init_params -> codec`` where the codec has
        # ``encode(params)`` / ``decode(params)`` methods converting the
        # canonical param tree to/from a TRAINING representation (e.g.
        # models/pixelcnn.py::PackedChainCodec keeps the PixelCNN chain
        # weights kernel-native-stacked so the optimizer runs over a few
        # stacked tensors instead of ~100 leaves). Contract: encode/decode
        # are exact inverses made of pure rearrangements, so any elementwise
        # optimizer commutes with them. TrainState.params stays CANONICAL
        # between dispatches (checkpoint/eval ABI unchanged); encode/decode
        # run INSIDE the jitted dispatch (amortized over steps_per_call);
        # opt_state lives in the ENCODED structure; loss_fn receives the
        # encoded tree during training and the canonical tree at validation
        # and must accept both.
        self._param_codec_factory = param_codec
        self._codec = None
        self._trainable_predicate = trainable_predicate
        self._skip_nonfinite = skip_nonfinite_updates
        self._ema_rate = ema_rate
        self._use_ema_for_eval = use_ema_for_eval
        self._prologue_fn = prologue_fn
        self._val_prologue_fn = (
            val_prologue_fn if val_prologue_fn is not None else prologue_fn
        )
        self._seed = seed if seed is not None else np.random.randint(0, 2**31)
        self._profile_dir = profile_dir
        self._profile_steps = profile_steps
        assert steps_per_call >= 1
        self._steps_per_call = steps_per_call
        if rng_impl == "auto":
            rng_impl = "rbg" if jax.default_backend() == "tpu" else None
        if rng_impl not in (None, "rbg"):
            raise ValueError(f"unsupported rng_impl: {rng_impl!r}")
        self._rng_impl = rng_impl

        self.mesh = create_mesh(num_devices)
        self._batch_sharding = batch_sharding(self.mesh)
        self._replicated = replicated_sharding(self.mesh)

        self._tx = None  # built lazily once params are known
        self._train_step = None
        self._val_step = None

    # -- setup ---------------------------------------------------------------

    def _build_tx(self, params) -> optax.GradientTransformation:
        inner = self._optimizer
        if not isinstance(
            inner, optax.GradientTransformation
        ) and callable(inner):
            # optimizer FACTORY ``params -> GradientTransformation``: for
            # transforms that need concrete parameter shapes.
            inner = inner(params)
        if self._trainable_predicate is None:
            return inner

        pred = self._trainable_predicate

        def label(path, value):
            names = _path_to_names(path)
            module_name = "/".join(names[:-1])
            return (
                "trainable" if pred(module_name, names[-1], value) else "frozen"
            )

        labels = jax.tree_util.tree_map_with_path(label, params)
        return optax.multi_transform(
            {"trainable": inner, "frozen": optax.set_to_zero()},
            labels,
        )

    def _step_body(self):
        """The single-update function ``(ts, batch, base_key) ->
        (new_ts, metrics)`` shared by the per-step and scan-fused paths."""
        tx = self._tx
        loss_fn = self._loss_fn
        prologue = self._prologue_fn
        ema_rate = self._ema_rate
        skip_nonfinite = self._skip_nonfinite
        rng_impl = self._rng_impl

        def train_step(ts: TrainState, batch, base_key):
            key = jax.random.fold_in(base_key, ts.step)
            k_pro, k_loss = jax.random.split(key)
            if rng_impl == "rbg":
                from posterior_matching_tpu.utils import fast_bits_key

                k_loss = fast_bits_key(k_loss)
            if prologue is not None:
                batch = prologue(batch, k_pro)

            def lf(params):
                loss, aux, new_state = loss_fn(
                    params, ts.state, k_loss, ts.step, batch, True
                )
                return loss, (aux, new_state)

            (loss, (aux, new_state)), grads = jax.value_and_grad(
                lf, has_aux=True
            )(ts.params)

            updates, new_opt_state = tx.update(grads, ts.opt_state, ts.params)
            new_params = optax.apply_updates(ts.params, updates)

            if skip_nonfinite:
                ok = jnp.logical_and(jnp.isfinite(loss), _all_finite(grads))
                sel = lambda a, b: jax.tree.map(
                    lambda x, y: jnp.where(ok, x, y), a, b
                )
                new_params = sel(new_params, ts.params)
                new_opt_state = sel(new_opt_state, ts.opt_state)
                new_state = sel(new_state, ts.state)
                aux = dict(aux, skipped=jnp.logical_not(ok).astype(jnp.float32))

            ema_params = ts.ema_params
            if ema_rate is not None:
                ema_params = jax.tree.map(
                    lambda e, p: e * ema_rate + (1.0 - ema_rate) * p,
                    ts.ema_params,
                    new_params,
                )

            new_ts = TrainState(
                params=new_params,
                state=new_state,
                opt_state=new_opt_state,
                ema_params=ema_params,
                step=ts.step + 1,
            )
            metrics = dict(aux, loss=loss)
            return new_ts, metrics

        return train_step

    def _codec_wrap(self, dispatch):
        """Wraps a ``(ts, *args) -> (ts, metrics)`` dispatch body with the
        param codec: canonical -> encoded at entry, encoded -> canonical at
        exit (both INSIDE the jitted program), so TrainState carries
        canonical params between dispatches while the update loop runs in
        the training representation."""
        codec = self._codec
        if codec is None:
            return dispatch

        def _enc(ts):
            return dataclasses.replace(
                ts,
                params=codec.encode(ts.params),
                ema_params=(
                    codec.encode(ts.ema_params)
                    if ts.ema_params is not None else None
                ),
            )

        def _dec(ts):
            return dataclasses.replace(
                ts,
                params=codec.decode(ts.params),
                ema_params=(
                    codec.decode(ts.ema_params)
                    if ts.ema_params is not None else None
                ),
            )

        def wrapped(ts, *args):
            new_ts, metrics = dispatch(_enc(ts), *args)
            return _dec(new_ts), metrics

        return wrapped

    def _make_train_step(self):
        return jax.jit(
            self._codec_wrap(self._step_body()), donate_argnums=(0,)
        )

    def _make_train_step_scan(self, num_steps: int):
        """``(ts, stacked_batches, base_key) -> (new_ts, stacked_metrics)``:
        ``num_steps`` updates in one XLA program. Batches arrive stacked on a
        leading chunk axis (one transfer per chunk); per-step RNG is identical
        to the per-step path (``fold_in(base_key, ts.step)``)."""
        step = self._step_body()

        def multi(ts, batches, base_key):
            def body(carry, batch):
                return step(carry, batch, base_key)

            return jax.lax.scan(body, ts, batches, length=num_steps)

        return jax.jit(self._codec_wrap(multi), donate_argnums=(0,))

    def _make_train_step_device_resident(self, num_steps: int, spec):
        """``(ts, data, base_key) -> (new_ts, stacked_metrics)``:
        ``num_steps`` updates with batches gathered from device-resident
        arrays *inside* the program — zero host involvement per chunk."""
        step = self._step_body()
        batch_size, num_examples, transform = spec
        batch_sharding = self._batch_sharding

        def multi(ts, data, base_key):
            def body(carry, _):
                # separate stream from the loss/prologue keys (which fold in
                # carry.step directly)
                k_idx = jax.random.fold_in(
                    jax.random.fold_in(base_key, 0x0DA7A), carry.step
                )
                idx = jax.random.randint(
                    k_idx, (batch_size,), 0, num_examples
                )
                batch = jax.tree.map(lambda a: jnp.take(a, idx, 0), data)
                # Without this constraint the replicated data arrays would
                # propagate a replicated batch (no data parallelism): pin the
                # gathered batch to the data axis so each chip gathers and
                # computes only its slice.
                batch = jax.lax.with_sharding_constraint(
                    batch, batch_sharding
                )
                if transform is not None:
                    batch = transform(batch)
                return step(carry, batch, base_key)

            return jax.lax.scan(body, ts, None, length=num_steps)

        return jax.jit(self._codec_wrap(multi), donate_argnums=(0,))

    def _make_val_step(self):
        loss_fn = self._loss_fn
        prologue = self._val_prologue_fn
        rng_impl = self._rng_impl

        def val_step(params, state, batch, key, step):
            k_pro, k_loss = jax.random.split(key)
            if rng_impl == "rbg":
                from posterior_matching_tpu.utils import fast_bits_key

                k_loss = fast_bits_key(k_loss)
            if prologue is not None:
                batch = prologue(batch, k_pro)
            loss, aux, _ = loss_fn(params, state, k_loss, step, batch, False)
            return dict(aux, loss=loss)

        return jax.jit(val_step)

    def init(self, batch, initial_params=None, initial_state=None) -> TrainState:
        """Initializes a TrainState from a sample batch, merging warm-start
        params/state over the fresh init when provided."""
        key = jax.random.PRNGKey(self._seed)
        k_init, k_pro = jax.random.split(key)
        if self._prologue_fn is not None:
            init_batch = jax.jit(self._prologue_fn)(batch, k_pro)
        else:
            init_batch = batch
        params, state = self._init_fn(k_init, init_batch)
        params = jax.device_get(params)
        state = jax.device_get(state)
        if initial_params is not None:
            params = _tree_merge(params, jax.device_get(initial_params))
        if initial_state is not None:
            state = _tree_merge(state, jax.device_get(initial_state))

        if self._param_codec_factory is not None:
            self._codec = self._param_codec_factory(params)
        # The optimizer (and its trainable/frozen labels) is built over the
        # ENCODED tree: optimizer state persists across dispatches in the
        # training representation.
        enc = self._codec.encode(params) if self._codec else params
        self._tx = self._build_tx(enc)
        opt_state = self._tx.init(enc)
        ema_params = params if self._ema_rate is not None else None

        # put_with_sharding, not device_put: correct on one host AND across
        # processes (each host holds the identical replicated value).
        put = lambda t: put_with_sharding(t, self._replicated)
        return TrainState(
            params=put(params),
            state=put(state),
            opt_state=put(opt_state),
            ema_params=put(ema_params) if ema_params is not None else None,
            step=jnp.zeros((), jnp.int32),
        )

    # -- the loop -------------------------------------------------------------

    def _shard(self, batch):
        from posterior_matching_tpu.parallel.mesh import shard_batch

        return shard_batch(batch, self.mesh)

    def _shard_chunk(self, chunk):
        """Device-puts a stacked [steps_per_call, batch, ...] chunk with the
        BATCH axis (axis 1) sharded over the data mesh (multi-host aware)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from posterior_matching_tpu.parallel.mesh import (
            DATA_AXIS,
            put_with_sharding,
        )

        sharding = NamedSharding(self.mesh, P(None, DATA_AXIS))
        return put_with_sharding(chunk, sharding)

    def fit(
        self,
        train_dataset: Iterable,
        steps: int,
        val_dataset: Optional[Iterable] = None,
        validation_freq: int = 1000,
        callbacks: Sequence = (),
        initial_params=None,
        initial_state=None,
        resume_from: Optional[TrainState] = None,
        log_fn: Callable[[str], None] = print,
    ) -> TrainState:
        """Runs the training loop. ``resume_from`` continues mid-run from a
        full TrainState (params + optimizer state + step counter) — a
        capability the reference lacks entirely (its checkpoints only chain
        pipeline stages, SURVEY.md §5)."""
        from posterior_matching_tpu.data.datasets import DeviceDataset

        def forever(ds):
            while True:
                yielded = False
                for b in ds:
                    yielded = True
                    yield b
                if not yielded:
                    raise ValueError("empty dataset")

        device_resident = isinstance(train_dataset, DeviceDataset)
        spc = self._steps_per_call
        if spc > 1 and validation_freq % spc != 0:
            raise ValueError(
                f"validation_freq={validation_freq} must be divisible by "
                f"steps_per_call={spc}"
            )
        # Constant-time resume: when the host dataset supports stream
        # fast-forward (ArrayDataset.skip_stream), defer creating the
        # iterator until the resume step is known, and use an RNG-neutral
        # spec batch for init shapes. Falls back to step-by-step replay for
        # plain iterables.
        fast_forward = (
            resume_from is not None
            and not device_resident
            and hasattr(train_dataset, "skip_stream")
            and hasattr(train_dataset, "spec_batch")
        )
        if device_resident:
            train_iter = None
            first = train_dataset.example_batch()
        elif fast_forward:
            train_iter = None
            first = train_dataset.spec_batch()
        else:
            train_iter = forever(train_dataset)
            first = next(train_iter)

        if resume_from is not None:
            # Build the optimizer (and its trainable/frozen label tree, when
            # a trainable_predicate is set) from the RESTORED param
            # structure: a warm-started run's checkpoint contains modules the
            # fresh loss-fn init does not create (e.g. the lookahead
            # trainer's grafted PM-VAE encoder subtree), and a tx labeled
            # from the smaller fresh tree cannot step the restored params.
            ts = self.init(
                self._shard(first),
                initial_params=resume_from.params,
                initial_state=resume_from.state,
            )
            put = lambda t: put_with_sharding(t, self._replicated)
            ts = TrainState(
                params=put(resume_from.params),
                state=put(resume_from.state),
                opt_state=put(resume_from.opt_state),
                ema_params=(
                    put(resume_from.ema_params)
                    if resume_from.ema_params is not None
                    else None
                ),
                step=jnp.asarray(int(resume_from.step), jnp.int32),
            )
        else:
            ts = self.init(
                self._shard(first), initial_params, initial_state
            )
        if device_resident:
            data_dev = put_with_sharding(
                train_dataset.data, self._replicated
            )
            spec = (
                train_dataset.batch_size,
                train_dataset.num_examples,
                train_dataset.transform,
            )
            self._train_step = self._make_train_step_device_resident(
                spc, spec
            )
        elif spc > 1:
            self._train_step = self._make_train_step_scan(spc)
        else:
            self._train_step = self._make_train_step()
        tail_step = None  # per-step jit for a final chunk smaller than spc
        self._val_step = self._make_val_step()

        base_key = put_with_sharding(
            jax.random.PRNGKey(self._seed + 1), self._replicated
        )
        val_key = jax.random.PRNGKey(self._seed + 2)

        pending_metrics = []
        t_start = time.time()
        steps_since_log = 0

        start_step = int(ts.step)
        batch = first
        if fast_forward:
            # Resume in O(epochs) permutation time + ONE gather: advance the
            # shuffle RNG past the first start_step stream batches without
            # materializing them, then draw exactly the batch the original
            # run would have seen at this step. (Device-resident sampling is
            # keyed by the step counter — resume needs no fast-forward.)
            train_dataset.skip_stream(start_step)
            train_iter = forever(train_dataset)
            batch = next(train_iter)
        elif not device_resident and start_step > 0:
            # Plain-iterable fallback: replay the deterministic batch stream
            # up to the checkpoint.
            for _ in range(start_step):
                batch = next(train_iter)

        def next_chunk(k):
            """Stacks the next k host batches on a leading chunk axis (ONE
            transfer per chunk)."""
            bs = [batch] + [next(train_iter) for _ in range(k - 1)]
            return jax.tree.map(lambda *xs: np.stack(xs), *bs)

        step = start_step
        while step < steps:
            k = min(spc, steps - step)
            rel = step - start_step  # optimizer step this call starts at
            # profile_steps are OPTIMIZER steps: start before the call that
            # contains profile_steps[0], stop after the one containing [1]
            if (
                self._profile_dir is not None
                and rel <= self._profile_steps[0] < rel + k
            ):
                jax.profiler.start_trace(self._profile_dir)

            if device_resident:
                if k == spc:
                    ts, metrics = self._train_step(ts, data_dev, base_key)
                else:
                    if tail_step is None:
                        tail_step = self._make_train_step_device_resident(
                            k, spec
                        )
                    ts, metrics = tail_step(ts, data_dev, base_key)
            elif spc > 1:
                chunk = self._shard_chunk(next_chunk(k))
                if step + k < steps:
                    batch = next(train_iter)
                if k == spc:
                    ts, metrics = self._train_step(ts, chunk, base_key)
                else:
                    if tail_step is None:
                        tail_step = self._make_train_step_scan(k)
                    ts, metrics = tail_step(ts, chunk, base_key)
            else:
                ts, metrics = self._train_step(
                    ts, self._shard(batch), base_key
                )
                if step + 1 < steps:
                    batch = next(train_iter)

            if (
                self._profile_dir is not None
                and rel <= self._profile_steps[1] < rel + k
            ):
                jax.tree.map(lambda x: x.block_until_ready(), metrics)
                jax.profiler.stop_trace()
            pending_metrics.append(metrics)
            steps_since_log += k
            step += k

            if step % validation_freq == 0 or step == steps:
                logs = self._aggregate(pending_metrics)
                pending_metrics = []

                elapsed = time.time() - t_start
                logs["steps_per_sec"] = steps_since_log / max(elapsed, 1e-9)

                eval_params = (
                    ts.ema_params if self._use_ema_for_eval and ts.ema_params
                    is not None else ts.params
                )
                if val_dataset is not None:
                    val_metrics = []
                    for vi, vbatch in enumerate(val_dataset):
                        val_key, k = jax.random.split(val_key)
                        vbatch = self._shard(vbatch)
                        val_metrics.append(
                            self._val_step(
                                eval_params, ts.state, vbatch, k, ts.step
                            )
                        )
                        for cb in callbacks:
                            if hasattr(cb, "on_validation_step"):
                                val_key, k2 = jax.random.split(val_key)
                                cb.on_validation_step(ts, k2, vbatch)
                    vlogs = self._aggregate(val_metrics)
                    logs.update({f"val_{k}": v for k, v in vlogs.items()})

                for cb in callbacks:
                    if hasattr(cb, "on_validation_end"):
                        cb.on_validation_end(ts, int(ts.step), logs)

                msg = " ".join(
                    f"{k}={np.asarray(v).item():.5g}"
                    for k, v in sorted(logs.items())
                    if np.ndim(v) == 0
                )
                log_fn(f"[step {step}/{steps}] {msg}")
                t_start = time.time()
                steps_since_log = 0

        return ts

    @staticmethod
    def _aggregate(metric_dicts) -> Dict[str, Any]:
        if not metric_dicts:
            return {}
        host = [jax.device_get(m) for m in metric_dicts]
        keys = host[0].keys()
        return {
            k: float(np.mean([np.mean(np.asarray(m[k])) for m in host]))
            for k in keys
        }
