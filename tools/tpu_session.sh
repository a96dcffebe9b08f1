#!/bin/bash
# Sequential TPU measurement session: one job at a time (the chip sits
# behind a serializing relay; overlapping or killed jobs wedge it for
# ~10 min).  Each step logs to $OUT/<step>.log; a failed/hung step is
# followed by a cool-down before the next.
set -u
OUT=${1:-/tmp/tpu_session}
mkdir -p "$OUT" docs/golden docs/inverse
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
      ok=$(python -c "print(1 if float('$last' or 1e9) < 5.0 else 0)" 2>/dev/null || echo 0)
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

run_step pallas_bench 900 python -u tools/pallas_bench.py --res 1024 512 --reps 5

run_step compact_bench 1200 python -u tools/compact_bench.py --res 1920 1080 --reps 5

run_step bench 1500 python -u bench.py

run_step golden_render 1500 python -u -m hanamaru_tpu -w 1920 -h 1080 -s 1000 \
    -t 3000 -i 999999 --out-dir /tmp/golden_tpu
if [ -f /tmp/golden_tpu/result.png ]; then
  cp /tmp/golden_tpu/result.png docs/golden/rtcamp6_1080p_1000pass_tpu.png
  python tools/compare_golden.py docs/golden/rtcamp6_1080p_1000pass_tpu.png --scale 2 \
      > docs/golden/compare_scale2.json 2>> "$OUT/golden_render.log"
  python tools/compare_golden.py docs/golden/rtcamp6_1080p_1000pass_tpu.png --scale 8 \
      > docs/golden/compare_scale8.json 2>> "$OUT/golden_render.log"
fi

run_step inverse_demo 1800 python -u tools/inverse_demo.py \
    --width 480 --height 270 --steps 150 --target-spp 16 --out-dir docs/inverse

echo "=== session done $(date -u +%H:%M:%S)" >> "$OUT/status.log"
