#!/usr/bin/env python3
"""Local pre-verification of SparkEntry.oracleSql against Verify output.

Mimics the driver's t2 gate: run each oracle SQL in DuckDB over the
sf parquet tables, load the corresponding Spark result parquet, sort
columns by name, sort rows, and compare values (exact for
ints/strings, tolerance report for floats).

Usage: python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/verify_out
"""
import json, math, os, sys
import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, (list, tuple)) or str(type(v)).find("ndarray") >= 0:
        return tuple(norm_cell(x) for x in v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if hasattr(v, "isoformat"):
        try:
            return v.isoformat()
        except Exception:
            return str(v)
    return v


def norm_df(df):
    df = df.reindex(sorted(df.columns), axis=1)
    rows = [tuple(norm_cell(v) for v in row) for row in df.itertuples(index=False)]
    return sorted(rows, key=lambda r: tuple(str(x) for x in r)), list(df.columns)


def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        # a FILTERED Verify dump (third arg, r16) omits most queries;
        # skip their oracles instead of paying every DuckDB replay —
        # at sf0.1 the full oracle set is minutes of cross joins
        if not os.path.exists(f"{outdir}/{name}"):
            print(f"FAIL {name}: dump missing (filtered run?)")
            n_fail += 1  # still counted: a filtered run must never
            continue     # read as a full green sweep
        try:
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e)[:200]}")
            n_fail += 1
            continue
        try:
            got = pq.read_table(f"{outdir}/{name}").to_pandas()
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {str(e)[:200]}")
            n_fail += 1
            continue
        wrows, wcols = norm_df(want)
        grows, gcols = norm_df(got)
        wcols_l = [c.lower() for c in wcols]
        gcols_l = [c.lower() for c in gcols]
        if wcols_l != gcols_l:
            print(f"FAIL {name}: columns differ: duckdb={wcols} spark={gcols}")
            n_fail += 1
            continue
        if len(wrows) != len(grows):
            print(f"FAIL {name}: rowcount differ: duckdb={len(wrows)} spark={len(grows)}")
            n_fail += 1
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(wrows, grows)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(wrows)} rows differ; first at {i}:")
            print(f"   duckdb: {a}")
            print(f"   spark : {b}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(wrows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed, "
          f"{len(oracles)} oracled")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
