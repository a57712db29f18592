#!/bin/bash
# Round-3 pending device-measurement queue: wait for the axon TPU
# service, then (1) re-validate Viterbi device parity after the
# 32-bit decision packing + MSB traceback, (2) headline bench,
# (3) full section sweep + render, (4) roofline regeneration.
cd "$(dirname "$0")/.."
OUT=benchmarks/queue_out
mkdir -p "$OUT"
DEADLINE=$(( $(date +%s) + ${WAIT_MAX_S:-36000} ))

probe() {
  timeout 120 python - <<'PYEOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
assert jax.default_backend() in ("tpu", "axon")
x = jax.jit(lambda a: a * 2 + 1)(jnp.ones((8, 128)))
assert float(x.sum()) == 3 * 8 * 128
PYEOF
}

echo "$(date -Is) r3 watcher start" >> "$OUT/watch.log"
until probe; do
  if [ "$(date +%s)" -ge "$DEADLINE" ]; then
    echo "$(date -Is) gave up waiting for TPU" >> "$OUT/watch.log"
    exit 1
  fi
  echo "$(date -Is) TPU still down" >> "$OUT/watch.log"
  sleep 300
done
echo "$(date -Is) TPU IS BACK — running r3 queue" >> "$OUT/watch.log"

run() {
  echo "=== $* ===" >> "$OUT/watch.log"
  local name=$1; shift
  ( "$@" ) > "$OUT/$name.log" 2>&1
  echo "$(date -Is) $name exit=$?" >> "$OUT/watch.log"
}

run vit_parity  timeout 2400 python scripts/viterbi_exact_probe.py
run bench       timeout 560 python bench.py
run sections    bash benchmarks/run_all_sections.sh
run roofline    timeout 3000 python benchmarks/roofline.py
echo "$(date -Is) r3 queue complete" >> "$OUT/watch.log"
