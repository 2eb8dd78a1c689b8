#!/bin/bash
# Probes the (currently wedged) TPU lease sparsely and starts the one-shot
# measurement queue the moment the chip is grantable again.
#
# Wedge background: a Pallas kernel dying in PJRT left the remote lease
# occupied; every client creation hangs in make_c_api_client until the pool
# reaps it (hours). Probing enters the claim queue, so probe RARELY
# (>= 10 min apart) and always reap our own probe child BY PID — an orphaned
# probe keeps an ESTABLISHED relay connection and perpetuates the wedge
# (see .claude/skills/verify/SKILL.md "TPU wedge recovery").
#
# Usage: bash datasets/tpu_watchdog.sh [logdir] [max_probes] [probe_gap_s]
set -u
LOGDIR=${1:-/tmp/tpu_watchdog}
MAX_PROBES=${2:-24}
GAP=${3:-900}
mkdir -p "$LOGDIR"
cd "$(dirname "$0")/.."

note() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOGDIR/watchdog.txt"; }

probe_once() {
    # Run the probe as our own child and reap it BY PID; never pattern-kill.
    python -c "import jax; print('TPU_OK', jax.devices()); import jax.numpy as jnp; print('SUM', float(jnp.sum(jnp.ones((8,8)))))" \
        >"$LOGDIR/probe.log" 2>&1 &
    local pid=$!
    local waited=0
    while kill -0 "$pid" 2>/dev/null && [ "$waited" -lt 150 ]; do
        sleep 5; waited=$((waited + 5))
    done
    if kill -0 "$pid" 2>/dev/null; then
        kill -9 "$pid" 2>/dev/null
        wait "$pid" 2>/dev/null
        return 1
    fi
    wait "$pid" 2>/dev/null
    grep -q "SUM 64.0" "$LOGDIR/probe.log"
}

for i in $(seq 1 "$MAX_PROBES"); do
    note "probe $i/$MAX_PROBES"
    if probe_once; then
        note "CHIP GRANTABLE — starting measurement queue"
        bash datasets/tpu_measurement_queue.sh "$LOGDIR/queue" \
            >>"$LOGDIR/watchdog.txt" 2>&1
        note "QUEUE DONE rc=$?"
        exit 0
    fi
    note "still wedged (probe timed out or failed)"
    sleep "$GAP"
done
note "GIVING UP after $MAX_PROBES probes"
exit 1
