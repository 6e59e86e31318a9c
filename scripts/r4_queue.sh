#!/bin/bash
# Round-4 staged TPU measurement queue: probe until the axon tunnel
# recovers, then run the measurement jobs in sequence under tpu_run.
# Usage: bash scripts/r4_queue.sh LOGDIR
set -u
cd "$(dirname "$0")/.."
LOGDIR=${1:-/tmp/r4_queue}
mkdir -p "$LOGDIR"
note() { echo "[queue $(date -u +%H:%M:%S)] $*" | tee -a "$LOGDIR/queue.log"; }

# ---- phase 1: probe until first readback succeeds ----
for i in $(seq 1 60); do
  if timeout -k 10 90 python -c \
    "import numpy as np, jax; np.asarray(jax.numpy.zeros(8)+1.0); print('probe ok')" \
    > "$LOGDIR/probe.log" 2>&1 && grep -q "probe ok" "$LOGDIR/probe.log"; then
    note "probe $i OK — pool is back"
    break
  fi
  note "probe $i wedged; sleeping 300s"
  sleep 300
done
if ! grep -q "probe ok" "$LOGDIR/probe.log" 2>/dev/null; then
  note "pool never recovered; giving up"
  exit 1
fi

# ---- phase 2: the measurement jobs (order: cheapest diagnostics first,
# then the new-experiment measurements, then the full bench) ----
run() {
  local name=$1; shift
  note "START $name"
  TRIES=2 COOLDOWN_S=120 timeout -k 30 3600 \
    python scripts/tpu_run.py "$LOGDIR/$name.log" -- "$@" \
    >> "$LOGDIR/queue.log" 2>&1
  note "DONE $name rc=$?"
}

run unroll      python scripts/bench_unroll.py
run ncol_slopes python scripts/bench_ncol_slopes.py
run minor_skip  python scripts/bench_minor_skip.py
run adjoint     python scripts/bench_adjoint.py
note "queue complete"
