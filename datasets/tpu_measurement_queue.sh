#!/bin/bash
# One-shot TPU measurement queue for when the chip lease returns.
#
# Runs every TPU-gated measurement of the round STRICTLY SEQUENTIALLY (the
# axon tunnel grants the chip to one process at a time) and in RISK ORDER:
# known-good compile-cached programs first so the round's primary numbers
# are banked before anything that could wedge the chip again (the round-2
# wedge was a Pallas kernel dying in PJRT — see
# .claude/skills/verify/SKILL.md "TPU wedge recovery").
#
# Usage:  bash datasets/tpu_measurement_queue.sh [logdir]
# Writes per-step logs + a STATUS line per step to <logdir>/queue_status.txt.
set -u
LOGDIR=${1:-/tmp/tpu_queue_$(date +%H%M%S)}
mkdir -p "$LOGDIR"
STATUS="$LOGDIR/queue_status.txt"
cd "$(dirname "$0")/.."

note() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$STATUS"; }

run_step() { # name timeout_s command...
    local name=$1 tmo=$2; shift 2
    note "START $name"
    timeout --kill-after=30 "$tmo" "$@" >"$LOGDIR/$name.log" 2>&1
    local rc=$?
    # timeout's SIGKILL can orphan nothing here (direct child), but double
    # check no python survived holding the relay connection.
    sleep 2
    local orphans
    orphans=$(ss -tnp 2>/dev/null | grep ":81" | grep -o "pid=[0-9]*" | cut -d= -f2 | sort -u)
    for pid in $orphans; do
        if [ "$pid" != "$$" ] && ps -p "$pid" -o comm= 2>/dev/null | grep -q python; then
            # only kill processes we started (children of this shell)
            if ps -o ppid= -p "$pid" 2>/dev/null | grep -qw "$$"; then
                note "killing orphan pid $pid from $name"
                kill -9 "$pid" 2>/dev/null
            fi
        fi
    done
    note "END $name rc=$rc (log: $LOGDIR/$name.log)"
    return $rc
}

# 0. Probe: is the chip actually grantable? Abort early if not.
run_step probe 150 python -c "import jax; print('TPU_OK', jax.devices()); import jax.numpy as jnp; print(float(jnp.sum(jnp.ones((8,8)))))" || { note "ABORT: chip not grantable"; exit 1; }

# 1. Primary driver metric (compile-cached programs; retries internal).
run_step bench 5600 env PM_BENCH_BUDGET=5400 python bench.py

# 2. Reference implementation's own steps/sec on this chip (pure JAX,
#    cold compile through the tunnel can take 5-10 min -> generous timeout,
#    few steps; host mask gen dominates per-step wall anyway).
run_step bench_reference 3600 python bench_reference.py --steps 60 --warmup 5

# 3. VDVAE steps/s with the fused KL custom VJP (VERDICT item 5 target
#    >= ~15.5 steps/s; prints trainer step logs, which value-sync).
run_step vdvae_steps 3600 python train_pm_vdvae.py --config configs/pm_vdvae_mnist.py \
    --config.steps 200 --config.validation_freq 100 \
    --config.steps_per_call 20 --config.device_resident_data=True

# 3b. Same, bf16 bottleneck convs (distribution params stay f32): the
#     remaining grad time is the backbone conv backward, which bf16 runs at
#     MXU rate — expected to clear the 15.5 steps/s target.
run_step vdvae_steps_bf16 3600 python train_pm_vdvae.py --config configs/pm_vdvae_mnist.py \
    --config.model.compute_dtype bfloat16 \
    --config.steps 200 --config.validation_freq 100 \
    --config.steps_per_call 20 --config.device_resident_data=True

# 4. The reference's documented 625-per-device likelihood batch on one chip
#    (VERDICT item 7; chunked internally). Tiny instance count: the point is
#    that batch_size 625 COMPLETES, not a full sweep.
LATEST_VDVAE=$(ls -dt runs/pm-vdvae-mnist-* 2>/dev/null | head -1)
if [ -n "$LATEST_VDVAE" ]; then
    run_step likelihood_625 3600 python eval_pm_vdvae_likelihood.py \
        --run_dir "$LATEST_VDVAE" --dataset mnist \
        --mask_generator MNISTMaskGenerator \
        --batch_size 625 --num_instances 625 --num_samples 200 --num_trials 1
else
    note "SKIP likelihood_625: no pm-vdvae run dir"
fi

# 5. LAST (wedge risk): Pallas fused gated block + VQ kernel on-TPU
#    validation/microbench. Runs by default BECAUSE it is last: step 1's
#    bench.py has already banked a fresh capture to BENCH_CAPTURE.json, so
#    even if this re-wedges the chip the driver's end-of-round bench.py
#    emits that fresh banked number (rc=0). The kernel also AOT-lowers
#    through Mosaic now (tests/test_gated_block.py), which the original
#    wedge-causing version did not. Set PM_SKIP_WEDGE_RISKY=1 to opt out.
if [ "${PM_SKIP_WEDGE_RISKY:-0}" = "1" ]; then
    note "SKIP validate_fused (PM_SKIP_WEDGE_RISKY=1)"
else
    run_step validate_vq 1200 python datasets/validate_vq_tpu.py
fi

note "QUEUE COMPLETE"
