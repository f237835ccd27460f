#!/bin/bash
# Round-19 close ritual: four quiet full-suite bench runs at sf0.1 on the
# r19 binary (post d04 extract+short-circuit/releaseShared-handle changes — all
# plan-neutral at bench defaults, so these pins describe the shipping
# plans). Pins re-derive via scripts/derive_pins.py bench/r19/close_r19_*.json
set -u
cd /root/repo
for r in A B C D; do
  echo "=== CLOSE $r $(date +%H:%M:%S) ==="
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" 2>/dev/null \
    | grep -E 'bench_detail|"metric"' > bench/r19/close_r19_$r.json
  # a 0-byte capture means the run was cut — mark it loudly rather than
  # committing an empty file derive_pins cannot distinguish from truncation
  if [ ! -s bench/r19/close_r19_$r.json ]; then
    echo "ABORTED: close run $r produced no bench output" > bench/r19/close_r19_$r.ABORTED
    rm -f bench/r19/close_r19_$r.json
  fi
  sleep 10
done
echo "=== CLOSE DONE $(date +%H:%M:%S) ==="
