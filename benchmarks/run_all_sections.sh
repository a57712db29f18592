#!/bin/bash
# Run every bench_all section in its OWN process (the remote compile
# service has flaky windows; one hung section must not take down the
# run), appending JSON lines to results_latest.jsonl.  Re-running only
# replaces sections that emit (render_results keeps the LAST line per
# metric).
cd "$(dirname "$0")/.."
OUT=benchmarks/results_latest.jsonl
for sec in viterbi turbo turbo_long turbo_nii ldpc qcldpc qcldpc_layered qcldpc_dvbs2 nrldpc polar tpc equalize bch rs demod kbest wifi wifi_ldpc ofdm mimo_link; do
  echo "=== $sec ===" >&2
  timeout 900 python benchmarks/bench_all.py "$sec" | tee -a "$OUT"
done
python benchmarks/render_results.py "$OUT"
