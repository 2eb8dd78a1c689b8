#!/bin/bash
# Sequential CPU work queue, round 2 part C: the real-data pipeline stages
# that part B (cpu_queue_r2b.sh) did not reach before its session ended.
# Same discipline as part B: one job at a time, nice -n 19, yield to the
# TPU measurement queue (its host-side dispatch must never be starved).
#
# Usage: bash datasets/cpu_queue_r2c.sh [logdir]
set -u
LOGDIR=${1:-/tmp/cpu_queue_c}
mkdir -p "$LOGDIR"
STATUS="$LOGDIR/status.txt"
cd "$(dirname "$0")/.."

note() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$STATUS"; }

tpu_queue_active() {
    local q=/tmp/tpu_watchdog/queue/queue_status.txt
    [ -f "$q" ] && ! grep -q "QUEUE COMPLETE" "$q"
}

wait_for_tpu_queue() {
    while tpu_queue_active; do
        note "TPU measurement queue active - yielding CPU"
        sleep 120
    done
}

run_step() { # name timeout_s command...
    local name=$1 tmo=$2; shift 2
    wait_for_tpu_queue
    note "START $name"
    nice -n 19 timeout --kill-after=30 "$tmo" "$@" >"$LOGDIR/$name.log" 2>&1
    note "END $name rc=$? (log: $LOGDIR/$name.log)"
}

latest_run() { ls -dt runs/$1-* 2>/dev/null | head -1; }

export PM_TPU_PLATFORM=cpu

# 0. Let any in-flight wine reference sweep finish first (single core).
if [ -f /tmp/ref_wine_sweep.pid ]; then
    while kill -0 "$(cat /tmp/ref_wine_sweep.pid)" 2>/dev/null; do
        note "ref wine sweep still running - waiting"
        sleep 60
    done
fi

# 1. PM-VDVAE on the real 16x16 digits (the one pipeline stage still without
#    real-data numbers). Mid-run validation checkpoints mean a timeout still
#    leaves an evaluable model.
run_step vdvae16_train 10800 python train_pm_vdvae.py \
    --config configs/pm_vdvae_digits16.py
RD=$(latest_run pm-vdvae-digits16)
if [ -n "$RD" ] && [ -f "$RD/train_state.pkl" ]; then
    run_step vdvae16_impute 3600 python eval_pm_vdvae_imputation.py \
        --run_dir "$RD" --dataset digits16 --mask_generator RectangleMaskGenerator \
        --num_instances 256 --batch_size 64 --num_samples 4
    run_step vdvae16_ll 3600 python eval_pm_vdvae_likelihood.py \
        --run_dir "$RD" --dataset digits16 --mask_generator RectangleMaskGenerator \
        --num_instances 360 --batch_size 120 --num_samples 200 --num_trials 1
fi

# 2. Conv PM-VAE on real digits16 (pm_vae_mnist16 family).
run_step pmvae16_train 7200 python train_pm_vae.py \
    --config configs/pm_vae_digits16.py

# 3. Finish lookahead training (interrupted at step 1000/6000) by resuming
#    via --resume_dir, then run the real-data greedy-acquisition eval.
LK=runs/lookahead-digits_flat-20260817-163952
run_step lookahead_resume 10800 python train_lookahead_posterior.py \
    --config configs/lookahead_digits.py --resume_dir "$LK"
LKR=$(latest_run lookahead-digits_flat)
run_step acquisition_eval 7200 python eval_greedy_acquisition.py \
    --run_dir "$LKR" --dataset digits_flat --num_instances 200
note "ACQ $(tail -5 "$LOGDIR/acquisition_eval.log" | tr '\n' ' ')"

# 4. Conv VaDE on real digits16 (3-phase).
run_step vade16_train 10800 python train_vade.py --config configs/vade_digits16.py

note "CPU QUEUE COMPLETE"
