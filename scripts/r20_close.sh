#!/bin/bash
# Round-20 close ritual: four quiet full-suite bench runs at sf0.1 on the
# r20 binary (post pushdown-barrier default change — d04 salt-off plans are
# unchanged at bench defaults, so these pins describe the shipping
# plans). Pins re-derive via scripts/derive_pins.py bench/r20/close_r20_*.json
set -u
cd /root/repo
for r in A B C D; do
  echo "=== CLOSE $r $(date +%H:%M:%S) ==="
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" 2>/dev/null \
    | grep -E 'bench_detail|"metric"' > bench/r20/close_r20_$r.json
  # a 0-byte capture means the run was cut — mark it loudly rather than
  # committing an empty file derive_pins cannot distinguish from truncation
  if [ ! -s bench/r20/close_r20_$r.json ]; then
    echo "ABORTED: close run $r produced no bench output" > bench/r20/close_r20_$r.ABORTED
    rm -f bench/r20/close_r20_$r.json
  fi
  sleep 10
done
echo "=== CLOSE DONE $(date +%H:%M:%S) ==="
