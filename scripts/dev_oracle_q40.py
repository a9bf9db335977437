#!/usr/bin/env python3
"""Develop the q40 simhash DuckDB oracle against the Spark dump."""
import duckdb, sys

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
dump = sys.argv[2] if len(sys.argv) > 2 else "target/verify_out/q40_simhash"

# FNV-1a over UTF-16 code units, one (xor byte, mul) step per byte
# (low byte then high byte per char), emulated in HUGEINT mod 2^64.
# mul64(u, C): split C into 32-bit halves so products stay < 2^127.
ORACLE = r"""
WITH t AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
  FROM documents
),
h AS (  -- FNV-1a token hash as HUGEINT in [0, 2^64)
  SELECT doc_id, tok,
    list_reduce(
      list_prepend(CAST(14695981039346656037 AS HUGEINT),
        flatten(list_transform(string_split(tok, ''),
          ch -> [unicode(ch) % 256, unicode(ch) // 256]))),
      (acc, b) -> ((acc // 65536) * 65536
          + xor(CAST(acc % 65536 AS BIGINT), CAST(b AS BIGINT)))
        * 1099511628211 % 18446744073709551616
    ) AS hu
  FROM t
),
bits AS (  -- per token, vote per bit position via 32-bit halves
  SELECT doc_id, b,
    CASE WHEN b < 32
      THEN (CAST(hu % 4294967296 AS BIGINT) >> b) & 1
      ELSE (CAST(hu // 4294967296 AS BIGINT) >> (b - 32)) & 1
    END AS bit
  FROM h, (SELECT unnest(range(0, 64)) AS b)
),
votes AS (
  SELECT doc_id, b, sum(CASE WHEN bit = 1 THEN 1 ELSE -1 END) AS v
  FROM bits GROUP BY doc_id, b
)
SELECT doc_id,
  CAST(sum(CASE WHEN v > 0 AND b < 63 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)
    + sum(CASE WHEN v > 0 AND b = 63 THEN -9223372036854775808 ELSE 0 END)
    AS BIGINT) AS sig
FROM votes GROUP BY doc_id
"""

con = duckdb.connect()
con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
oracle = {r[0]: r[1] for r in con.execute(ORACLE).fetchall()}
spark = {r[0]: r[1] for r in con.execute(
    f"SELECT doc_id, sig FROM '{dump}/*.parquet'").fetchall()}
bad = [(k, spark.get(k), oracle.get(k)) for k in spark
       if spark.get(k) != oracle.get(k)]
print(f"rows spark={len(spark)} oracle={len(oracle)} mismatches={len(bad)}")
for row in bad[:5]:
    print("MISMATCH", row, format(row[1] % 2**64, '016x'), format((row[2] or 0) % 2**64, '016x'))
