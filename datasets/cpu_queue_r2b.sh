#!/bin/bash
# Sequential CPU work queue for the single-core host (round 2, part B).
#
# Everything runs nice -n 19 and strictly one at a time: the box has ONE
# core, and the TPU measurement queue (datasets/tpu_measurement_queue.sh,
# launched by the watchdog when the wedged chip lease returns) must win the
# CPU for its host-side dispatch. Between items we also block outright while
# that queue is mid-flight so its timed regions are never contended.
#
# Usage: bash datasets/cpu_queue_r2b.sh [logdir]
set -u
LOGDIR=${1:-/tmp/cpu_queue}
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

# 1. Wine seed sweep: is the our-vs-reference quality gap on wine real, or
#    single-seed noise on a 142-row train split?
for seed in 1 2 3; do
    run_step wine_train_s$seed 2400 python train_pm_vae.py \
        --config configs/pm_vae_wine.py --config.seed $seed
    RD=$(latest_run pm-vae-wine)
    run_step wine_eval_s$seed 1200 python eval_pm_vae_uci.py \
        --run_dir "$RD" --dataset wine --num_samples 128 --batch_size 17 \
        --num_trials 5
    note "WINE OURS seed=$seed $(grep -A2 RESULTS "$LOGDIR/wine_eval_s$seed.log" | tail -2 | tr '\n' ' ')"
done
for seed in 1 2; do
    run_step wine_ref_s$seed 2400 python datasets/reference_quality_run.py \
        --dataset wine --config pm_vae_wine --seed $seed --num_samples 128
    note "WINE REF seed=$seed $(grep -o '"nrmse_mean[^,]*\|"ac_ll_mean[^,]*' "$LOGDIR/wine_ref_s$seed.log" | tr '\n' ' ')"
done

# 2. PM-VDVAE on the real 16x16 digits (the one pipeline stage still without
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

# 3. Conv PM-VAE on real digits16 (pm_vae_mnist16 family) + NRMSE/AC-LL via
#    the flattened eval path is not applicable (conv model) - its role in the
#    reference is feeding the lookahead stage; train it, then continue the
#    interrupted lookahead training on top of the REAL flat-digits PM-VAE.
run_step pmvae16_train 7200 python train_pm_vae.py \
    --config configs/pm_vae_digits16.py

# 4. Finish lookahead training (interrupted at step 1000/6000) by resuming
#    via the new --resume_dir CLI, then run the real-data greedy-acquisition
#    eval.
LK=runs/lookahead-digits_flat-20260817-163952
run_step lookahead_resume 10800 python train_lookahead_posterior.py \
    --config configs/lookahead_digits.py --resume_dir "$LK"
LKR=$(latest_run lookahead-digits_flat)
run_step acquisition_eval 7200 python eval_greedy_acquisition.py \
    --run_dir "$LKR" --dataset digits_flat --num_instances 200
note "ACQ $(tail -5 "$LOGDIR/acquisition_eval.log" | tr '\n' ' ')"

# 5. Conv VaDE on real digits16 (3-phase).
run_step vade16_train 10800 python train_vade.py --config configs/vade_digits16.py

note "CPU QUEUE COMPLETE"
