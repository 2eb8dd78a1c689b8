#!/bin/bash
# Sequential reference-quality image stages (datasets/reference_quality_images.py)
# on the TPU — one chip process at a time, each stage a fresh python process.
#
# Closes VERDICT r2 item 2: the reference implementation's OWN code trained
# and evaluated on the same real local-drop data at the same step counts as
# our BASELINE.md numbers (full config steps; the chip makes them cheap —
# the CPU smoke measured 0.69 steps/s for pm_vqvae vs ~15+ on chip).
#
# Usage:  bash datasets/refq_images_queue.sh [stages...]   (default: all 4)
# Stop:   touch /tmp/refq_stop
# Log:    /tmp/refq_queue.log
set -u
cd "$(dirname "$0")/.."
STAGES=("$@")
[ ${#STAGES[@]} -eq 0 ] && STAGES=(vqvae pm_vqvae vdvae vade)
args_for() {
    case "$1" in
        # match OUR BASELINE.md VDVAE protocol: 200 IS samples for BPD/AC-LL
        # (360 instances) and 4-sample imputation PSNR
        vdvae) echo "--num_samples 4 --ll_num_samples 200 --num_instances 360" ;;
        *) echo "" ;;
    esac
}
for stage in "${STAGES[@]}"; do
    [ -f /tmp/refq_stop ] && { echo "stopped before $stage" >> /tmp/refq_queue.log; exit 0; }
    echo "=== stage $stage start $(date -u +%H:%M:%S) ===" >> /tmp/refq_queue.log
    # shellcheck disable=SC2046
    timeout 10800 python datasets/reference_quality_images.py --stage "$stage" \
        $(args_for "$stage") >> /tmp/refq_queue.log 2>&1
    echo "=== stage $stage rc=$? $(date -u +%H:%M:%S) ===" >> /tmp/refq_queue.log
done
