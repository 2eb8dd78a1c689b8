#!/bin/bash
# Flagship-shape quality A/B on the synthetic CelebA local drop
# (VERDICT r3 item 7): train + eval BOTH implementations — ours via the
# standard CLIs, the reference's own code via
# datasets/reference_quality_images.py — on identical data
# (data/celeb_a/*.npz, datasets/prepare_synth_celeba.py), identical step
# budgets, seed, mask generator and eval protocol
# (reference eval_pm_vqvae.py:133-138 PSNR, 5 trials).
#
# Matched budget: 6k VQ-VAE steps + 8k PM-VQVAE steps (the digits16 A/B's
# budgets, scaled shapes) — full configs are 100k/150k, far beyond what an
# A/B needs to compare implementations.
#
# Usage:  bash datasets/celeba_ab_queue.sh [ours|ref ...]  (default: both)
# Stop:   touch /tmp/celeba_ab_stop
# Log:    /tmp/celeba_ab.log
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/celeba_ab.log
SIDES=("$@")
[ ${#SIDES[@]} -eq 0 ] && SIDES=(ours ref)
echo "=== celeba A/B start $(date -u +%H:%M:%S) sides: ${SIDES[*]} ===" >> "$LOG"

run() {
    [ -f /tmp/celeba_ab_stop ] && { echo "stopped" >> "$LOG"; exit 0; }
    echo "--- $* $(date -u +%H:%M:%S)" >> "$LOG"
    timeout 5400 "$@" >> "$LOG" 2>&1
    echo "--- rc=$? $(date -u +%H:%M:%S)" >> "$LOG"
}

for side in "${SIDES[@]}"; do
    case "$side" in
    ours)
        run python train_vqvae.py --config configs/vqvae_celeb_a.py \
            --config.steps 6000 --config.validation_freq 2000 \
            --config.seed 0 --config.steps_per_call 20 \
            --config.device_resident_data True
        VQDIR=$(ls -dt runs/vqvae-celeb_a-* | head -1)
        echo "VQDIR=$VQDIR" >> "$LOG"
        run python train_pm_vqvae.py --config configs/pm_vqvae_celeb_a.py \
            --config.steps 8000 --config.validation_freq 2000 \
            --config.seed 0 --config.steps_per_call 20 \
            --config.device_resident_data True \
            --config.vqvae_dir "$VQDIR"
        PMDIR=$(ls -dt runs/pm-vqvae-celeb_a-* | head -1)
        echo "PMDIR=$PMDIR" >> "$LOG"
        run python eval_pm_vqvae.py --run_dir "$PMDIR" --dataset celeb_a \
            --mask_generator CelebAMaskGenerator --num_instances 160 \
            --num_samples 10 --num_trials 5 --batch_size 32
        ;;
    ref)
        run python datasets/reference_quality_images.py --stage vqvae \
            --config vqvae_celeb_a --steps 6000 --seed 0 \
            --workdir runs/ref-quality-celeba
        run python datasets/reference_quality_images.py --stage pm_vqvae \
            --config pm_vqvae_celeb_a --steps 8000 --seed 0 \
            --num_instances 160 --num_samples 10 --num_trials 5 \
            --workdir runs/ref-quality-celeba
        ;;
    esac
done
echo "=== celeba A/B done $(date -u +%H:%M:%S) ===" >> "$LOG"
