#!/usr/bin/env python3
"""Re-derive Bench.CleanMediansSf01 from N close-run bench outputs.

Usage: python3 scripts/derive_pins.py bench/r18/close_*.json

Each input holds the two bench lines (`bench_detail` + metric). Takes the
per-query MIN of the detail-line medians across runs (the least-contaminated
clean-floor estimate; see the pin scaladoc in Bench.scala), prints the Scala
map body ready to paste, plus the canary pins and run summaries.
"""
import json, re, sys


def parse_run(path):
    """Parse one capture file into (detail, metric, trust) dicts.

    Robust to tail-truncated captures (the BENCH_r*.json artifacts are
    2,000-byte tails, so the FIRST line is often cut mid-JSON): unparseable
    lines are skipped rather than aborting the whole derivation.
    """
    detail = metric = trust = None
    for line in open(path):
        line = line.strip().removeprefix("[info] ")
        if not line.startswith("{"):
            continue
        try:
            obj = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "bench_detail" in obj:
            detail = obj
        elif "bench_trust" in obj:
            trust = obj
        elif "metric" in obj:
            metric = obj
    return detail, metric, trust


def trust_fields(detail, metric, trust):
    """Contamination verdict, wherever it survived the capture window.

    Priority: standalone de-shaped trust line (r14+) -> the r15 'trust'
    appendix at the END of the detail line (the segment designed to survive
    the 2,000-byte tail when the standalone line is evicted) -> legacy
    flat fields on the metric line (pre-r13 captures).
    """
    tr = trust or (detail or {}).get("bench_detail", {}).get("trust") \
        or metric or {}
    return tr.get("bench_trust", tr)


def main():
    qs = {}
    for path in sys.argv[1:]:
        detail, metric, trust = parse_run(path)
        if detail is None:
            sys.exit(f"FAIL: no bench_detail line parseable in {path} "
                     "(tail-truncated capture? re-capture the full run)")
        t = metric["value"] if metric else None
        tr = trust_fields(detail, metric, trust)
        print(f"# {path}: total {t} contaminated={tr.get('contaminated')}"
              f" canary_x={tr.get('canary_x')}"
              f" canary_max={tr.get('canary_max')}"
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


if __name__ == "__main__":
    main()
