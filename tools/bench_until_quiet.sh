#!/bin/bash
# Re-run the canonical full-suite bench until a run passes BOTH noise
# gates (non-degraded) and therefore updates bench_quiet.json, or the
# attempt budget runs out (VERDICT r19 #2: a degraded canonical bench
# is an unfinished checklist item — re-run on a quiet machine instead
# of shipping it). Attempts are back-to-back so a quiet window on the
# shared sandbox host is caught as soon as it opens.
#
# Usage: tools/bench_until_quiet.sh [max_attempts]
set -uo pipefail
cd "$(dirname "$0")/.."
MAX="${1:-4}"
BEFORE=$(stat -c %Y bench_quiet.json 2>/dev/null || echo 0)
for i in $(seq 1 "$MAX"); do
  echo "== bench attempt $i/$MAX ($(date +%H:%M:%S), load: $(cut -d' ' -f1 /proc/loadavg))"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    sbt -batch "runMain graft.Bench" > "/tmp/bench_attempt_$i.log" 2>&1
  AFTER=$(stat -c %Y bench_quiet.json 2>/dev/null || echo 0)
  if [ "$AFTER" != "$BEFORE" ]; then
    echo "== non-degraded run recorded on attempt $i"
    exit 0
  fi
  echo "== attempt $i degraded (see /tmp/bench_attempt_$i.log)"
done
echo "== no non-degraded run in $MAX attempts"
exit 1
