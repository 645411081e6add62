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
#   in-flight round). Writes into the repo root.
#
# The sf0.1 pass catches two divergence classes sf0.01 cannot
# (SCALE.md / memory): DECIMAL(18) overflow and round(x,6) boundaries.
set -euo pipefail
cd "$(dirname "$0")/.."
ROUND="${1:-}"
if [ -z "$ROUND" ]; then
  ROUND=$(ls BENCH_r*.json 2>/dev/null \
    | sed -E 's/BENCH_r0*([0-9]+)\.json/\1/' | sort -n | tail -1)
  ROUND=$((ROUND + 1))
fi
OUT=/tmp/verify_sf01
rm -rf "$OUT"
echo "== second-scale pass: sf0.1, round r$ROUND"
sbt -batch "runMain graft.Verify /root/testdata/sf0.1 $OUT" \
  | grep -E "\[verify\].*failed" || true
python3 tools/local_verify.py /root/testdata/sf0.1 "$OUT" \
  --json "CORRECTNESS_sf0.1_r$(printf '%02d' "$ROUND").json"
