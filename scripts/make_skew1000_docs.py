#!/usr/bin/env python3
"""Documents-ONLY x1000 1%-hot skew corpus, in one pass.

Composes make_scale_probe.py's documents amplification (per-copy md5
word rewrite — copies share no shingles with their originals) with
make_skew_probe.py's hot-span append (doc_id % 100 == 0 gets one shared
8-token span), without materializing the intermediate or amplifying the
fact tables: the d04 skew cell reads only documents, and on a single
box every spare GB of scratch belongs to the probe's shuffle spill
(~50-70 GB zstd at the 1%-hot x1000 geometry, bench/r18's ENOSPC), not
to a 10 GB lineitem nobody scans.

Usage: make_skew1000_docs.py [SRC_SF_DIR] [DST_DIR] [N]
"""
import sys
from pathlib import Path

import duckdb

src = Path(sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.1')
dst = Path(sys.argv[2] if len(sys.argv) > 2 else '/tmp/sfskew1000docs')
n = int(sys.argv[3]) if len(sys.argv) > 3 else 1000
HOT = "hotspan aa bb cc dd ee ff gg"  # identical to make_skew_probe.py

dst.mkdir(parents=True, exist_ok=True)
con = duckdb.connect()
ndocs = con.execute(
    f"SELECT max(doc_id)+1 FROM '{src}/documents.parquet'").fetchone()[0]
con.execute(f"""
COPY (
  WITH amp AS (
    SELECT doc_id + i * {ndocs} AS doc_id,
           CASE WHEN i = 0 THEN text
                ELSE array_to_string(
                  list_transform(string_split(text, ' '),
                                 w -> substr(md5(w || i::VARCHAR), 1, 8)), ' ')
           END AS text,
           lang, source, n_chars
    FROM '{src}/documents.parquet', generate_series(0, {n - 1}) t(i))
  SELECT doc_id,
         CASE WHEN doc_id % 100 = 0 THEN text || ' {HOT}' ELSE text END AS text,
         lang, source,
         CASE WHEN doc_id % 100 = 0 THEN n_chars + {len(HOT) + 1}
              ELSE n_chars END AS n_chars
  FROM amp
) TO '{dst}/documents.parquet' (FORMAT parquet)
""")
c, nhot = con.execute(
    f"SELECT count(*), sum(CASE WHEN doc_id % 100 = 0 THEN 1 ELSE 0 END) "
    f"FROM '{dst}/documents.parquet'").fetchone()
print(f"{dst}: {c} docs, {nhot} hot ({100.0 * nhot / c:.2f}%), "
      f"hot-pair budget C({nhot},2) = {nhot * (nhot - 1) // 2}")
