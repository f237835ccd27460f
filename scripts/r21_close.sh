#!/bin/bash
# Round-21 close ritual: quiet full-suite bench runs at sf0.1 on the r21
# binary (post q44/t10/t13/t14/x03/x07 restructures + CC fast path +
# Tables memo + ImageIO cache fix). Pins re-derive via
#   scripts/derive_pins.py bench/r21/close_r21_*.json
# The ambient machine was contended all round (mt_x 1.7-4.2); min-of-runs
# makes warm runs harmless, so extra letters only help.
set -u
cd /root/repo
for r in "$@"; do
  echo "=== CLOSE $r $(date +%H:%M:%S) ==="
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" 2>/dev/null \
    | grep -E 'bench_detail|"metric"' > bench/r21/close_r21_$r.json
  # a 0-byte capture means the run was cut — mark it loudly rather than
  # committing an empty file derive_pins cannot distinguish from truncation
  if [ ! -s bench/r21/close_r21_$r.json ]; then
    echo "ABORTED: close run $r produced no bench output" > bench/r21/close_r21_$r.ABORTED
    rm -f bench/r21/close_r21_$r.json
  fi
  sleep 10
done
echo "=== CLOSE DONE $(date +%H:%M:%S) ==="
