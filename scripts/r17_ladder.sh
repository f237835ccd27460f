#!/bin/bash
# Round-17 scale ladder (VERDICT r16 #2):
#  A. dedup-chain ladder sf0.1 -> x1000 on the POST-MIGRATION binary —
#     the headline is d20 completing the x1000 stage (r16 abort), plus
#     d08 output counts per decade on the new 4x16-bit band geometry.
#  B. inverted-index family (d04/d15/d17) on skew-amplified corpora
#     (one 8-token hot span in 1% of docs) at x10 and x100 — one decade
#     of direct hot-shingle m^2 evidence, skewed vs unskewed.
# Stage order: cheap first; the 64 GiB x1000 stage last.
set -u
LOG=/root/repo/bench/r17/probe_ladder.log
cd /root/repo
stamp() { echo "=== $* $(date +%H:%M:%S) ===" >> "$LOG"; }

bench() { # dir only_regex mem
  SPARK_DRIVER_MEM=$3 SPARK_GRAFT_SF_DIR=$1 SPARK_GRAFT_ONLY=$2 \
    sbt -batch "runMain graft.Bench" 2>>"$LOG" \
    | grep -E 'bench_detail|"metric"' >> "$LOG"
}
pairs() { # dir query mem
  SPARK_DRIVER_MEM=$3 sbt -batch "Test/runMain graft.probe.PairCount $1 $2" \
    2>>"$LOG" | grep "PAIRS" >> "$LOG"
}

DEDUP='^(d02|d19|d20)$'
INV='^(d04|d15|d17)$'

stamp "BENCH dedup sf0.1"
bench /root/testdata/sf0.1 "$DEDUP" 8g
stamp "PAIRS sf0.1"
pairs /root/testdata/sf0.1 d19 8g
pairs /root/testdata/sf0.1 d08 8g

stamp "BENCH dedup sfprobe10"
bench /tmp/sfprobe10 "$DEDUP" 8g
stamp "PAIRS sfprobe10"
pairs /tmp/sfprobe10 d19 8g
pairs /tmp/sfprobe10 d08 8g

stamp "BENCH dedup sfprobe100"
bench /tmp/sfprobe100 "$DEDUP" 8g
stamp "PAIRS sfprobe100"
pairs /tmp/sfprobe100 d19 8g
pairs /tmp/sfprobe100 d08 8g

stamp "BENCH inv sfprobe10 (unskewed control)"
bench /tmp/sfprobe10 "$INV" 16g
stamp "BENCH inv sfskew10"
bench /tmp/sfskew10 "$INV" 16g
stamp "BENCH inv sfprobe100 (unskewed control)"
bench /tmp/sfprobe100 "$INV" 16g
stamp "BENCH inv sfskew100"
bench /tmp/sfskew100 "$INV" 16g
stamp "PAIRS d17 skew (leaky-doc rows, skew vs control)"
pairs /tmp/sfprobe100 d17 16g
pairs /tmp/sfskew100 d17 16g

stamp "BENCH dedup sfprobe1000 (64g)"
bench /tmp/sfprobe1000 "$DEDUP" 64g
stamp "PAIRS sfprobe1000 (64g)"
pairs /tmp/sfprobe1000 d19 64g
pairs /tmp/sfprobe1000 d08 64g

stamp "LADDER DONE"
