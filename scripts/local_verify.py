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
import time
from pathlib import Path

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    # Exact representations only: the driver hashes the value ENCODING,
    # so rounding floats or str()-ing ints here hides real mismatches
    # (the round-8 HUGEINT incident shipped because of exactly that).
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, int):
        # Width matters to the driver: tag anything outside int64 range
        # so an int128-valued oracle cell can never compare equal.
        if v < -(2 ** 63) or v >= 2 ** 63:
            return f"int128:{v}"
        return f"i:{v}"
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


# Coarse physical-encoding classes. The driver's hash covers the value
# encoding, so an int128 (DuckDB HUGEINT) column can NEVER hash-match a
# Spark int64 column even when every value is equal — that is the bug
# class this check exists to catch locally.
def type_class(name):
    t = str(name).upper()
    if "HUGEINT" in t or "INT128" in t:
        return "int128"
    if any(k in t for k in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
                            "INT8", "INT16", "INT32", "INT64", "INT")):
        return "int64"
    if any(k in t for k in ("DOUBLE", "FLOAT", "REAL", "HALF")):
        return "float"
    if "DECIMAL" in t or "NUMERIC" in t:
        return "decimal"
    if "BOOL" in t:
        return "bool"
    if "TIMESTAMP" in t:
        return "timestamp"
    if "DATE" in t:
        return "date"
    if any(k in t for k in ("VARCHAR", "STRING", "UTF8", "LARGE_STRING")):
        return "string"
    return "other"


def duck_types(con, sql):
    rel = con.sql(sql)
    return dict(zip(rel.columns, [str(t) for t in rel.types]))


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    # Per-oracle DuckDB seconds: the r11 empty-artifact incident's
    # second suspect was oracle cost blowing the driver's time budget
    # (q194 hit 186s at sf0.01 before CTE materialization) — record
    # the suite's DuckDB spend as a per-round artifact so a cost
    # regression is visible the round it ships, not when the
    # scoreboard zeroes.
    oracle_secs = {}
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
            t0 = time.time()
            cur = con.execute(oracle[name])
            duck_cols = [d[0] for d in cur.description]
            duck_rows = cur.fetchall()
            oracle_secs[name] = round(time.time() - t0, 3)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        # Type gate first: any HUGEINT in the oracle result, or an
        # encoding-class mismatch vs the Spark parquet schema, fails
        # even when the sf0.01 VALUES happen to be equal.
        try:
            dtypes = duck_types(con, oracle[name])
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle type probe: {e}")
            n_fail += 1
            continue
        stypes = {f.name: str(f.type) for f in tbl.schema}
        type_bad = []
        for c, t in dtypes.items():
            if type_class(t) == "int128":
                type_bad.append(f"{c}: oracle {t} (int128 — cast the "
                                f"sum to BIGINT/DOUBLE)")
            elif c in stypes and type_class(t) != type_class(stypes[c]):
                type_bad.append(
                    f"{c}: oracle {t} vs spark {stypes[c]}")
        if type_bad:
            print(f"FAIL {name}: type mismatch: " + "; ".join(type_bad))
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
    total = round(sum(oracle_secs.values()), 1)
    top = sorted(oracle_secs.items(), key=lambda kv: -kv[1])[:10]
    (Path(out_dir) / "oracle_cost.json").write_text(json.dumps({
        "total_duckdb_sec": total, "n_oracles": len(oracle_secs),
        "top10": dict(top), "per_query": oracle_secs}, indent=1))
    print(f"\n{n_pass} pass, {n_fail} fail; "
          f"DuckDB total {total}s over {len(oracle_secs)} oracles "
          f"(top: {', '.join(f'{k}={v}s' for k, v in top[:3])})")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
