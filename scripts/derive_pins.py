#!/usr/bin/env python3
"""Re-derive Bench.CleanMediansSf01 from N close-run bench outputs.

Usage: python3 scripts/derive_pins.py /tmp/close_r12b_A.json [...]

Each input holds the two bench lines (`bench_detail` + metric). Takes the
per-query MIN of the detail-line medians across runs (the least-contaminated
clean-floor estimate; see the pin scaladoc in Bench.scala), prints the Scala
map body ready to paste, plus the canary pins and run summaries.
"""
import json, re, sys

runs = []
for path in sys.argv[1:]:
    detail = metric = trust = None
    for line in open(path):
        line = line.strip().removeprefix("[info] ")
        if '"bench_detail"' in line:
            detail = json.loads(line)
        elif '"bench_trust"' in line:
            trust = json.loads(line)
        elif '"metric"' in line:
            metric = json.loads(line)
    runs.append((path, detail, metric, trust))

qs = {}
for path, detail, metric, trust in runs:
    t = metric["value"] if metric else None
    # r14+: the trust line is de-shaped — fields nest under "bench_trust".
    # r13 carried them flat on a {"metric":"bench_trust"} line; older
    # captures carried them on the metric line — read any of the three.
    tr = trust or metric or {}
    tr = tr.get("bench_trust", tr)
    print(f"# {path}: total {t} contaminated={tr.get('contaminated')}"
          f" canary_x={tr.get('canary_x')} canary_max={tr.get('canary_max')}"
          f" cpu_ref={tr.get('cpu_ref')} mt_x={tr.get('mt_x')}")
    for q, v in detail["bench_detail"]["queries"].items():
        if v >= 0:
            qs.setdefault(q, []).append(v)

pins = {q: min(vs) for q, vs in sorted(qs.items())}
print(f"# pin sum: {sum(pins.values()):.2f} s over {len(pins)} queries")
print(f"# canaries: q02 {pins.get('q02')}, q16 {pins.get('q16')}, "
      f"q30 {pins.get('q30')}, t08 {pins.get('t08')}, "
      f"d01 {pins.get('d01')}, d06 {pins.get('d06')}")
for q, v in pins.items():
    print(f'    "{q}" -> {v:.3f},')
