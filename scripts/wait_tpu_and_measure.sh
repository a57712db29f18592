#!/bin/bash
# Watch for the remote TPU (axon) service to come back, then run the
# full pending measurement queue (ROADMAP.md "Pending TPU measurements")
# unattended, logging each step to benchmarks/queue_out/.
#
# Probe = can a trivial jitted program execute on the default (axon)
# backend within 120 s?  During the outage jax.devices() hangs, so every
# probe rides under timeout(1).
cd "$(dirname "$0")/.."
OUT=benchmarks/queue_out
mkdir -p "$OUT"
DEADLINE=$(( $(date +%s) + ${WAIT_MAX_S:-36000} ))  # default: 10 h

probe() {
  timeout 120 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
assert jax.default_backend() in ("tpu", "axon")
x = jax.jit(lambda a: a * 2 + 1)(jnp.ones((8, 128)))
assert float(x.sum()) == 3 * 8 * 128
EOF
}

echo "$(date -Is) watcher start" >> "$OUT/watch.log"
until probe; do
  if [ "$(date +%s)" -ge "$DEADLINE" ]; then
    echo "$(date -Is) gave up waiting for TPU" >> "$OUT/watch.log"
    exit 1
  fi
  echo "$(date -Is) TPU still down" >> "$OUT/watch.log"
  sleep 600
done
echo "$(date -Is) TPU IS BACK — running queue" >> "$OUT/watch.log"

run() {  # run <name> <cmd...>
  echo "=== $* ===" >> "$OUT/watch.log"
  local name=$1; shift
  ( "$@" ) > "$OUT/$name.log" 2>&1
  echo "$(date -Is) $name exit=$?" >> "$OUT/watch.log"
}

run sections     bash benchmarks/run_all_sections.sh
run bench        timeout 560 python bench.py
run turbo_window timeout 3000 python scripts/turbo_window_ab.py
run butterfly    timeout 3000 python scripts/bcjr_butterfly_ab.py
run vit_layout   timeout 3000 python scripts/viterbi_layout_ab.py
run ber_probe    timeout 3000 python scripts/turbo_ber_probe.py
run wifi_stage   timeout 3000 python scripts/wifi_stage_profile.py
run qcldpc_ab    timeout 3000 python scripts/qcldpc_ab.py
echo "$(date -Is) queue complete" >> "$OUT/watch.log"
