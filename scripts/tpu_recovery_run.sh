#!/bin/bash
# Waits for the axon tunnel to come back, then runs the full TPU validation
# sequence serially (never two heavy jax processes at once), logging each
# stage. Written during the 2026-08-18 tunnel outage so recovery work starts
# the moment the claim leg is back.
#
#   nohup bash scripts/tpu_recovery_run.sh > /tmp/tpu_recovery.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

log() { echo "[$(date +%H:%M:%S)] $*"; }

probe() {
    timeout 120 python -u -c "
import jax, jax.numpy as jnp, numpy as np
print('probe ok', float(np.asarray(jnp.ones((4,4)).sum())))" 2>&1 | tail -1
}

log "waiting for the axon tunnel..."
until probe | grep -q "probe ok"; do
    log "tunnel still down; sleeping 600s"
    sleep 600
done
log "tunnel is BACK"

log "stage 1: flagship entry"
timeout 1800 python __graft_entry__.py > /tmp/rec_entry.log 2>&1
log "entry rc=$? $(tail -1 /tmp/rec_entry.log)"

log "stage 2: bench run A (int8-tower default)"
timeout 2400 python bench.py > /tmp/rec_bench_a.log 2>&1
log "bench A rc=$? $(grep -o '{.*}' /tmp/rec_bench_a.log | tail -1)"

log "stage 3: bench run B (median check)"
timeout 2400 python bench.py > /tmp/rec_bench_b.log 2>&1
log "bench B rc=$? $(grep -o '{.*}' /tmp/rec_bench_b.log | tail -1)"

log "stage 4: tower drift + timings on TPU"
timeout 1800 python scripts/probe_tower_drift.py > /tmp/rec_drift.log 2>&1
log "drift rc=$? $(grep -o '{.*}' /tmp/rec_drift.log | tail -1)"

log "stage 5: training throughput, batch 16 + bf16 first moment"
V2AP_MU_BF16=1 timeout 2400 python scripts/bench_train.py 6 16 \
    > /tmp/rec_train16.log 2>&1
log "train16 rc=$? $(tail -2 /tmp/rec_train16.log | head -1)"

log "all stages done"
