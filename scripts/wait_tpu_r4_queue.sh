#!/bin/bash
# Round-4 device measurement queue: wait for the axon TPU service to
# come back, then run the pending probes, logging to
# benchmarks/queue_out/.
#
# Queue:
#   1. viterbi_exact_ab.py      — exact-mode bit identity + e2e pricing
#   2. traceback_ab.py          — r4 traceback walk vs r3 (identity + time)
#   3. traceback_vmem_probe.py  — VMEM cap model at G=4 + cap edge
#   4. bench_all viterbi        — refresh headline section if tb wins
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

echo "$(date -Is) r4 watcher start" >> "$OUT/watch_r4.log"
until probe; do
  if [ "$(date +%s)" -ge "$DEADLINE" ]; then
    echo "$(date -Is) gave up waiting for TPU" >> "$OUT/watch_r4.log"
    exit 1
  fi
  echo "$(date -Is) TPU still down" >> "$OUT/watch_r4.log"
  sleep 300
done
echo "$(date -Is) TPU back; running r4 queue" >> "$OUT/watch_r4.log"

run() {  # run <name> <cmd...>
  name=$1; shift
  echo "$(date -Is) start $name" >> "$OUT/watch_r4.log"
  timeout 1200 "$@" > "$OUT/r4_$name.out" 2> "$OUT/r4_$name.err"
  echo "$(date -Is) done $name rc=$?" >> "$OUT/watch_r4.log"
}

run exact_ab     python scripts/viterbi_exact_ab.py
run traceback_ab python scripts/traceback_ab.py
run vmem_probe   python scripts/traceback_vmem_probe.py
run bench_viterbi python benchmarks/bench_all.py viterbi
echo "$(date -Is) r4 queue complete" >> "$OUT/watch_r4.log"
