#!/bin/bash
# Second-scale oracle pass, one command (VERDICT r16 #5): dumps every
# registry entry at sf0.1 and hash-compares against DuckDB, writing the
# per-entry artifact CORRECTNESS_sf0.1_r<N>.json in the driver's JSON
# shape. tools/gen_inventory.py fails when the latest such artifact's
# entry set drifts from the registry, so adding an entry without
# re-running this command breaks the build-time lint, not a future
# round's trust.
#
# Usage: tools/second_scale.sh [round]
#   round defaults to the highest existing BENCH_r<N>.json + 1 (the
#   in-flight round; 1 when no bench artifact exists yet). Writes into
#   the repo root.
#
# The sf0.1 pass catches two divergence classes sf0.01 cannot
# (SCALE.md / memory): DECIMAL(18) overflow and round(x,6) boundaries.
set -euo pipefail
cd "$(dirname "$0")/.."
ROUND="${1:-}"
if [ -z "$ROUND" ]; then
  # `|| true` twice: no artifacts must fall through to the default,
  # not kill the script via set -e/pipefail (reproduced in review)
  LAST=$( (ls BENCH_r*.json 2>/dev/null || true) \
    | sed -E 's/BENCH_r0*([0-9]+)\.json/\1/' | sort -n | tail -1 || true)
  ROUND=$(( ${LAST:-0} + 1 ))
fi
OUT=/tmp/verify_sf01
LOG=/tmp/verify_sf01_sbt.log
rm -rf "$OUT"
echo "== second-scale pass: sf0.1, round r$ROUND"
# No output filter and no exit-status masking: a compile error or a
# crashed dump must abort HERE, not surface later as an all-red
# artifact produced from an empty dump dir. Full sbt log goes to $LOG
# (the "[verify] ... failed" lines are stderr and land there too).
if ! sbt -batch "runMain graft.Verify /root/testdata/sf0.1 $OUT" > "$LOG" 2>&1; then
  echo "== sbt Verify FAILED — tail of $LOG:" >&2
  tail -20 "$LOG" >&2
  exit 1
fi
grep -E "\[verify\].*failed" "$LOG" >&2 || true
python3 tools/local_verify.py /root/testdata/sf0.1 "$OUT" \
  --json "CORRECTNESS_sf0.1_r$(printf '%02d' "$ROUND").json"
