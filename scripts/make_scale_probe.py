#!/usr/bin/env python3
"""Amplify sf0.1's documents/embeddings Nx into a probe directory, to
measure how the dedup/similarity queries scale one decade past the largest
driver-generated SF (there is no sf1 on disk).

Copy i != 0 rewrites every word as a per-copy hash prefix of itself — the
token COUNT and length statistics survive, but copies share no shingles
with their originals, so the probe measures pipeline throughput (shingle →
minhash → band → bucket join) at 10x the rows rather than an artificial
45-pairs-per-doc near-dup explosion that no real corpus has. Embeddings
amplify by a per-copy affine PERMUTATION of the dims (a bijection:
a_i*j + b_i mod 64 with a_i odd; copy 0 is the identity) — a permuted
copy shares no direction with its original (cross-copy cosine ~ 0), but
unlike the constant drift this used to apply, a permutation preserves
the per-dim value distribution EXACTLY: sign balance, norms, and
within-copy pair structure all survive, so sign-LSH bucket histograms
at 100x look like the base corpus scaled, not like the degenerate
one-bucket pile the +i*0.037 shift produced (98% of values positive by
copy 50, 94% of the corpus in one d11 bucket).

Fact tables amplify with per-copy KEY OFFSETS and unchanged payloads:
orders/lineitem share one orderkey offset (join shape preserved, dims
untouched — 10x facts against the same dimensions, how a warehouse
actually grows), events offsets event/user ids (per-user session and
funnel shapes survive; DuckDB re-writes ts as micros, which Tables.load
accepts as-is — same values the nanos path truncates to).
Dimension tables copy unchanged."""
import shutil
import sys
from pathlib import Path

import duckdb

src = Path(sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.1')
dst = Path(sys.argv[2] if len(sys.argv) > 2 else '/tmp/sfprobe10')
n = int(sys.argv[3]) if len(sys.argv) > 3 else 10

amplified = ('documents', 'embeddings', 'orders', 'lineitem', 'events')
dst.mkdir(parents=True, exist_ok=True)
for p in src.glob('*.parquet'):
    if p.stem not in amplified:
        target = dst / p.name
        if not target.exists():
            shutil.copy(p, target)

con = duckdb.connect()
ndocs = con.execute(f"SELECT max(doc_id)+1 FROM '{src}/documents.parquet'").fetchone()[0]
nvecs = con.execute(f"SELECT max(vec_id)+1 FROM '{src}/embeddings.parquet'").fetchone()[0]
nord = con.execute(f"SELECT max(o_orderkey)+1 FROM '{src}/orders.parquet'").fetchone()[0]
nevt = con.execute(f"SELECT max(event_id)+1 FROM '{src}/events.parquet'").fetchone()[0]
nusr = con.execute(f"SELECT max(user_id)+1 FROM '{src}/events.parquet'").fetchone()[0]

con.execute(f"""
COPY (
  SELECT o_orderkey + i * {nord} AS o_orderkey, o_custkey, o_orderstatus,
         o_totalprice, o_orderdate, o_orderpriority
  FROM '{src}/orders.parquet', generate_series(0, {n - 1}) t(i)
) TO '{dst}/orders.parquet' (FORMAT parquet)
""")
con.execute(f"""
COPY (
  SELECT l_orderkey + i * {nord} AS l_orderkey, l_partkey, l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate
  FROM '{src}/lineitem.parquet', generate_series(0, {n - 1}) t(i)
) TO '{dst}/lineitem.parquet' (FORMAT parquet)
""")
con.execute(f"""
COPY (
  SELECT event_id + i * {nevt} AS event_id, ts::TIMESTAMP_NS AS ts,
         user_id + i * {nusr} AS user_id, event_type, value, props
  FROM '{src}/events.parquet', generate_series(0, {n - 1}) t(i)
) TO '{dst}/events.parquet' (FORMAT parquet)
""")

con.execute(f"""
COPY (
  SELECT doc_id + i * {ndocs} AS doc_id,
         CASE WHEN i = 0 THEN text
              ELSE array_to_string(
                list_transform(string_split(text, ' '),
                               w -> substr(md5(w || i::VARCHAR), 1, 8)), ' ')
         END AS text,
         lang, source, n_chars
  FROM '{src}/documents.parquet', generate_series(0, {n - 1}) t(i)
) TO '{dst}/documents.parquet' (FORMAT parquet)
""")
con.execute(f"""
COPY (
  SELECT vec_id + i * {nvecs} AS vec_id,
         list_transform(range(len(embedding)),
           j -> embedding[(((2 * ((i * 37) % 32) + 1) * j
                            + (i * 11 + (i // 32) * 13) % 64)
                           % len(embedding)) + 1]) AS embedding,
         label
  FROM '{src}/embeddings.parquet', generate_series(0, {n - 1}) t(i)
) TO '{dst}/embeddings.parquet' (FORMAT parquet)
""")
d = con.execute(f"SELECT count(*) FROM '{dst}/documents.parquet'").fetchone()[0]
e = con.execute(f"SELECT count(*) FROM '{dst}/embeddings.parquet'").fetchone()[0]
print(f"wrote {dst}: documents={d} embeddings={e} (x{n})")
