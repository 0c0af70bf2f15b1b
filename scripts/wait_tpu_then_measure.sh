#!/bin/bash
# Wait for the axon TPU tunnel to come back, then run the round-3 campaign.
# Usage: bash scripts/wait_tpu_then_measure.sh [logfile] [stage...]
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/r3_measurements.log}
shift || true
for i in $(seq 1 120); do
  if timeout 240 python -c "import jax; d=jax.devices(); assert d and d[0].platform != 'cpu', d; print(d)" >> /tmp/tpu_wait.log 2>&1; then
    echo "TPU up after $i probes $(date +%H:%M:%S)" >> /tmp/tpu_wait.log
    exec bash scripts/measure_r3.sh "$LOG" "$@"
  fi
  sleep 180
done
echo "TPU never came back" >> /tmp/tpu_wait.log
