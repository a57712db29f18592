#!/bin/bash
# Round-5 device measurement queue: wait for the axon TPU service to
# come back, then run the pending probes, logging to
# benchmarks/queue_out/.
#
# Queue:
#   1. polar_scl_unrolled_ab.py — unrolled SCL device A/B (B=1024/4096)
#   2. bcjr_chunk_ab.py         — BCJR lane-chunk depth C=8 vs 16
#   3. kbest_r3_ab.py           — pinned-r3 vs current K-best A/B
cd "$(dirname "$0")/.."
OUT=benchmarks/queue_out
mkdir -p "$OUT"
DEADLINE=$(( $(date +%s) + ${WAIT_MAX_S:-28800} ))  # default: 8 h

probe() {
  timeout 120 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
assert jax.default_backend() in ("tpu", "axon")
x = jax.jit(lambda a: a * 2 + 1)(jnp.ones((8, 128)))
assert float(x.sum()) == 3 * 8 * 128
EOF
}

echo "$(date -Is) r5 watcher start" >> "$OUT/watch_r5.log"
until probe; do
  if [ "$(date +%s)" -ge "$DEADLINE" ]; then
    echo "$(date -Is) gave up waiting for TPU" >> "$OUT/watch_r5.log"
    exit 1
  fi
  echo "$(date -Is) TPU still down" >> "$OUT/watch_r5.log"
  sleep 180
done
echo "$(date -Is) TPU back; running r5 queue" >> "$OUT/watch_r5.log"

run() {  # run <name> <cmd...>
  name=$1; shift
  echo "$(date -Is) start $name" >> "$OUT/watch_r5.log"
  timeout 1500 "$@" > "$OUT/r5_$name.out" 2> "$OUT/r5_$name.err"
  echo "$(date -Is) done $name rc=$?" >> "$OUT/watch_r5.log"
}

run scl_unrolled python scripts/polar_scl_unrolled_ab.py
run bcjr_chunk   python scripts/bcjr_chunk_ab.py
run kbest_r3     python scripts/kbest_r3_ab.py
echo "$(date -Is) r5 queue complete" >> "$OUT/watch_r5.log"
