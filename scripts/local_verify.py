#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Reads the parquet dumps written by graft.Verify plus oracle_sql.json,
runs each oracle in DuckDB against the same sf tables, and compares
row-count / schema (sorted column names) / value multiset.

Usage: python3 scripts/local_verify.py <sfDir> <outDir>
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm(x)) for k, x in v.items()))
    return str(v)


def rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm(r[i]) for i in order) for r in rows)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name in sorted(oracle):
        qdir = Path(out_dir) / name
        if not qdir.exists():
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            tbl = pq.read_table(qdir)
            spark_cols = list(tbl.column_names)
            spark_rows = [
                tuple(row[c] for c in spark_cols)
                for row in tbl.to_pylist()]
            cur = con.execute(oracle[name])
            duck_cols = [d[0] for d in cur.description]
            duck_rows = cur.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if sorted(spark_cols) != sorted(duck_cols):
            print(f"FAIL {name}: cols spark={sorted(spark_cols)} "
                  f"duck={sorted(duck_cols)}")
            n_fail += 1
            continue
        if len(spark_rows) != len(duck_rows):
            print(f"FAIL {name}: rows spark={len(spark_rows)} "
                  f"duck={len(duck_rows)}")
            n_fail += 1
            continue
        s, d = rowset(spark_cols, spark_rows), rowset(duck_cols, duck_rows)
        if s != d:
            diff = next(i for i in range(len(s)) if s[i] != d[i])
            print(f"FAIL {name}: values differ, first diff row {diff}:\n"
                  f"  spark={s[diff]}\n  duck ={d[diff]}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(spark_rows)} rows)")
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
