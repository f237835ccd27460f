#!/bin/bash
# Round-22 close ritual: quiet full-suite bench runs at sf0.1 on the r22
# binary (post d02 candidate materialization, c01 window keeper, d04
# count-carry, and the CollapseProject/lambda-HOF barrier sweep). Pins
# re-derive via
#   scripts/derive_pins.py bench/r22/close_r22_*.json
# Min-of-runs makes warm runs harmless, so extra letters only help.
set -u
cd /root/repo
for r in "$@"; do
  echo "=== CLOSE $r $(date +%H:%M:%S) ==="
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" 2>/dev/null \
    | grep -E 'bench_detail|"metric"' > bench/r22/close_r22_$r.json
  # a 0-byte capture means the run was cut — mark it loudly rather than
  # committing an empty file derive_pins cannot distinguish from truncation
  if [ ! -s bench/r22/close_r22_$r.json ]; then
    echo "ABORTED: close run $r produced no bench output" > bench/r22/close_r22_$r.ABORTED
    rm -f bench/r22/close_r22_$r.json
  fi
  sleep 10
done
echo "=== CLOSE DONE $(date +%H:%M:%S) ==="
