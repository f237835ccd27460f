#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 scripts/selfcheck.py <outDir> [sfDir]

Reads <outDir>/<query>/ parquet dumps written by graft.Verify plus
<outDir>/oracle_sql.json, runs each oracle SQL in DuckDB against the sfDir
parquet tables, and compares: schema (column names, sorted), ARROW TYPES
(normalized — see type_key), row count, and values (rows sorted by all
columns; floats compared exactly AND with 1e-9 tolerance so we can see how
close "exact" is).

The type compare exists because the driver's hash is value-serialization
-sensitive: r11's only red row was w07, where an uncast DuckDB window
`sum(BIGINT)` returned HUGEINT (arrow decimal128(38,0)) against Spark's
int64 — 167/167 values identical, hash mismatch. The pylist compare below
masks that class (Decimal(500) == 500 in Python), so types are compared
FIRST. Normalization is the empirically-driver-tolerated set only:
timestamp unit/tz (Spark dumps ns, DuckDB µs — green in every parsed
round) and string/binary width variants. int vs decimal, int vs float,
or width differences FAIL.
"""
import json, math, sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def type_key(t):
    """Canonical comparison key for an arrow type. Collapses only the
    variants the driver's hash demonstrably tolerates; everything else
    (decimal vs int, int32 vs int64, float vs double, ...) stays distinct.
    """
    import pyarrow as pa
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_large_string(t) or pa.types.is_string(t):
        return "string"
    if pa.types.is_large_binary(t) or pa.types.is_binary(t):
        return "binary"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return ("list", type_key(t.value_type))
    return str(t)


def canon(rows):
    def key(row):
        return tuple("\0NULL" if v is None else str(v) for v in row)
    return sorted(rows, key=key)


def eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            af, bf = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(af) and math.isnan(bf):
            return True
        return af == bf
    if isinstance(a, (list, tuple)) or isinstance(b, (list, tuple)):
        return len(a) == len(b) and all(eq(x, y) for x, y in zip(a, b))
    return a == b


def close(a, b, tol=1e-9):
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return abs(a - b) <= tol * max(1.0, abs(a), abs(b))
    if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
        return len(a) == len(b) and all(close(x, y, tol) for x, y in zip(a, b))
    return eq(a, b)


def main():
    out_dir = Path(sys.argv[1])
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())

    con = duckdb.connect()
    con.execute("SET timezone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    n_pass = n_fail = 0
    missing_oracle = []
    for qdir in sorted(p for p in out_dir.iterdir() if p.is_dir()):
        name = qdir.name
        tbl = pq.read_table(str(qdir))
        spark_cols = sorted(tbl.column_names)
        spark_rows = canon([tuple(r[c] for c in spark_cols)
                            for r in tbl.to_pylist()])
        if name not in oracle:
            missing_oracle.append(name)
            continue
        try:
            res = con.execute(oracle[name])
            duck_cols_raw = [d[0] for d in res.description]
            duck_tbl = res.fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        duck_cols = sorted(duck_cols_raw)
        if duck_cols != spark_cols:
            print(f"FAIL {name}: columns spark={spark_cols} duck={duck_cols}")
            n_fail += 1
            continue
        spark_types = {f.name: f.type for f in tbl.schema}
        duck_types = {f.name: f.type for f in duck_tbl.schema}
        bad_types = {c: (str(spark_types[c]), str(duck_types[c]))
                     for c in spark_cols
                     if type_key(spark_types[c]) != type_key(duck_types[c])}
        if bad_types:
            print(f"FAIL {name}: TYPE-MISMATCH (driver hash is "
                  f"serialization-sensitive; cast the oracle) {bad_types}")
            n_fail += 1
            continue
        duck_rows = canon([tuple(r[c] for c in duck_cols)
                           for r in duck_tbl.to_pylist()])
        if len(duck_rows) != len(spark_rows):
            print(f"FAIL {name}: rows spark={len(spark_rows)} duck={len(duck_rows)}")
            n_fail += 1
            continue
        exact = all(all(eq(a, b) for a, b in zip(sr, dr))
                    for sr, dr in zip(spark_rows, duck_rows))
        if exact:
            print(f"PASS {name} ({len(spark_rows)} rows)")
            n_pass += 1
        else:
            near = all(all(close(a, b) for a, b in zip(sr, dr))
                       for sr, dr in zip(spark_rows, duck_rows))
            bad = next((sr, dr) for sr, dr in zip(spark_rows, duck_rows)
                       if not all(eq(a, b) for a, b in zip(sr, dr)))
            tag = "NEAR(1e-9)" if near else "VALUE-MISMATCH"
            print(f"FAIL {name}: {tag}\n  spark={bad[0]}\n  duck ={bad[1]}")
            n_fail += 1
    for name in missing_oracle:
        print(f"NOORACLE {name} (rows-only check)")
    print(f"\n{n_pass} pass, {n_fail} fail, {len(missing_oracle)} without oracle")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
