#!/bin/bash
# Run the fast test lane one pytest process PER FILE, retrying a file
# once on abnormal exit.  Rationale: this image's XLA:CPU compiler
# segfaults intermittently after many accumulated compiles in one
# process (observed at 5 different tests across full-suite runs; every
# one passes in isolation).  Small processes bound the exposure; the
# retry absorbs residual flakes.  Genuine test FAILURES (pytest rc 1)
# are NOT retried.
set -u
cd "$(dirname "$0")/.."
overall=0
for f in tests/test_*.py; do
  out=$(timeout 1800 python -m pytest "$f" -q -m "not slow" -p no:cacheprovider 2>&1)
  rc=$?
  line=$(echo "$out" | grep -E "passed|deselected|no tests ran" | tail -1)
  # rc 5 = nothing collected (a file whose tests are all slow-marked)
  if [ $rc -gt 1 ] && [ $rc -ne 5 ]; then  # crash/timeout: retry once
    echo "$f: rc=$rc (${line:-crash}) — retrying"
    out=$(timeout 1800 python -m pytest "$f" -q -m "not slow" -p no:cacheprovider 2>&1)
    rc=$?
    line=$(echo "$out" | grep -E "passed|deselected|no tests ran" | tail -1)
  fi
  echo "$f: rc=$rc ${line}"
  if [ $rc -ne 0 ] && [ $rc -ne 5 ]; then
    overall=1
  fi
done
exit $overall
