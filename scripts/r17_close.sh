#!/bin/bash
# Round-17 close ritual: four quiet full-suite bench runs at sf0.1.
set -u
cd /root/repo
for r in A B C D; do
  echo "=== CLOSE $r $(date +%H:%M:%S) ==="
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" 2>/dev/null \
    | grep -E 'bench_detail|"metric"' > bench/r17/close_r17_$r.json
  sleep 10
done
echo "=== CLOSE DONE $(date +%H:%M:%S) ==="
