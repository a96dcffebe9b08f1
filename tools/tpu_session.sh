#!/bin/bash
# Sequential TPU measurement session: one job at a time (the chip sits
# behind a serializing relay; overlapping or killed jobs wedge it for
# ~10 min).  Each step logs to $OUT/<step>.log; a failed/hung step is
# followed by a cool-down before the next.
#
# Round-4 policy updates (docs/perf.md, 2026-08-21):
#   * IDLE THE HOST first — CPU load throttles the dispatch loop and
#     depresses every capture (fwd 2.1e9 loaded vs 3.55e9 idle).
#   * bench.py runs FIRST (no d2h at all, warms the persistent cache).
#   * compact_bench is RETIRED on this relay: its per-chunk live-count
#     sync crashed the TPU worker three rounds running.
#   * pallas_bench is retired with the Pallas traversal (worker-crash).
#   * the TPU golden render has crashed the worker 7/7 attempts; the
#     committed parity artifact is the CPU render in docs/golden/.
set -u
OUT=${1:-/tmp/tpu_session}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

probe() {
  timeout 180 python -c "
import time, jax, jax.numpy as jnp
x = jnp.arange(1024.0)
t0=time.time(); (x*2).sum().block_until_ready(); print('probe', time.time()-t0)
" >> "$OUT/probe.log" 2>&1
}

wait_healthy() {
  for i in 1 2 3 4 5 6; do
    if probe; then
      last=$(tail -1 "$OUT/probe.log" | awk '{print $2}')
      ok=$(python -c "print(1 if float('$last' or 1e9) < 30.0 else 0)" 2>/dev/null || echo 0)
      [ "$ok" = "1" ] && return 0
    fi
    echo "relay unhealthy (attempt $i), cooling down 300s" >> "$OUT/probe.log"
    sleep 300
  done
  return 1
}

run_step() {
  name=$1; budget=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S)" >> "$OUT/status.log"
  wait_healthy || { echo "$name SKIPPED (relay never recovered)" >> "$OUT/status.log"; return 1; }
  timeout "$budget" "$@" > "$OUT/$name.log" 2>&1
  rc=$?
  echo "=== $name exit $rc $(date -u +%H:%M:%S)" >> "$OUT/status.log"
  if [ $rc -ne 0 ]; then sleep 420; fi   # cool-down after failure/timeout
  return $rc
}

run_step bench 3000 python -u bench.py

run_step grad_profile 2400 python -u tools/grad_profile.py --rays 8388608 --span 3 --reps 2

echo "=== session done $(date -u +%H:%M:%S)" >> "$OUT/status.log"
