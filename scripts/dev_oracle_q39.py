#!/usr/bin/env python3
"""Develop the q39 minhash-LSH-dedup DuckDB oracle against the Spark dump."""
import duckdb, sys

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
dump = sys.argv[2] if len(sys.argv) > 2 else "target/verify_out/q39_minhash_dedup"

# 64-bit wrap-around arithmetic in HUGEINT:
#   xor64 via 32-bit halves (BIGINT xor), mul64 via 32-bit splits of the
#   constant, shifts as integer division. Signed view only for the final
#   min comparison (Spark keeps minima over signed longs).
ORACLE = r"""
WITH d AS (
  SELECT doc_id, text FROM documents
  UNION ALL SELECT doc_id + 100000, text FROM documents
),
tok AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks FROM d),
sh AS (  -- FNV-1a hashed 3-gram shingles; token separator is ONE 0x20 step
  SELECT doc_id,
    unnest(list_transform(range(1, greatest(len(toks) - 2, 1) + 1),
      i -> list_reduce(
        list_prepend(CAST(14695981039346656037 AS HUGEINT),
          flatten(list_transform(
            list_filter([toks[i], toks[i + 1], toks[i + 2]], t -> t IS NOT NULL),
            t -> list_append(
              flatten(list_transform(string_split(t, ''),
                ch -> [unicode(ch) % 256, unicode(ch) // 256])), 32))
          )[:-2]),  -- drop trailing separator (DuckDB slice bounds are INCLUSIVE)
        (acc, b) -> ((acc // 65536) * 65536
            + xor(CAST(acc % 65536 AS BIGINT), CAST(b AS BIGINT)))
          * 1099511628211 % 18446744073709551616))) AS s_u
  FROM tok
),
z0 AS (
  SELECT doc_id, seed,
    (s_u + (seed + 1) * 11400714819323198485) % 18446744073709551616 AS z
  FROM sh, (SELECT unnest(range(0, 64)) AS seed)
),
z1 AS (SELECT doc_id, seed,
    xor(CAST(z // 4294967296 AS BIGINT), CAST(z // 1073741824 // 4294967296 AS BIGINT))::HUGEINT * 4294967296
  + xor(CAST(z % 4294967296 AS BIGINT), CAST(z // 1073741824 % 4294967296 AS BIGINT))::HUGEINT AS z
  FROM z0),
z2 AS (SELECT doc_id, seed,
    ((z % 4294967296) * 484763065
     + (((z % 4294967296) * 3210233709 + (z // 4294967296) * 484763065) % 4294967296) * 4294967296
    ) % 18446744073709551616 AS z
  FROM z1),
z3 AS (SELECT doc_id, seed,
    xor(CAST(z // 4294967296 AS BIGINT), CAST(z // 134217728 // 4294967296 AS BIGINT))::HUGEINT * 4294967296
  + xor(CAST(z % 4294967296 AS BIGINT), CAST(z // 134217728 % 4294967296 AS BIGINT))::HUGEINT AS z
  FROM z2),
z4 AS (SELECT doc_id, seed,
    ((z % 4294967296) * 321982955
     + (((z % 4294967296) * 2496678331 + (z // 4294967296) * 321982955) % 4294967296) * 4294967296
    ) % 18446744073709551616 AS z
  FROM z3),
z5 AS (SELECT doc_id, seed,
    xor(CAST(z // 4294967296 AS BIGINT), CAST(z // 2147483648 // 4294967296 AS BIGINT))::HUGEINT * 4294967296
  + xor(CAST(z % 4294967296 AS BIGINT), CAST(z // 2147483648 % 4294967296 AS BIGINT))::HUGEINT AS z
  FROM z4),
sig AS (  -- signature: per (doc, seed) SIGNED minimum over shingles
  SELECT doc_id, seed,
    min(CASE WHEN z >= 9223372036854775808
        THEN CAST(z - 18446744073709551616 AS BIGINT)
        ELSE CAST(z AS BIGINT) END) AS v
  FROM z5 GROUP BY doc_id, seed
),
bands AS (  -- 16 bands x 4 rows; band content = ordered value list
  SELECT doc_id, seed // 4 AS b, list(v ORDER BY seed) AS content
  FROM sig GROUP BY doc_id, seed // 4
),
bucket_min AS (
  SELECT b, content, min(doc_id) AS m FROM bands GROUP BY b, content
)
SELECT bands.doc_id FROM bands
JOIN bucket_min USING (b, content)
GROUP BY bands.doc_id
HAVING min(m) = bands.doc_id
"""

con = duckdb.connect()
con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
oracle = sorted(r[0] for r in con.execute(ORACLE).fetchall())
spark = sorted(r[0] for r in con.execute(
    f"SELECT doc_id FROM '{dump}/*.parquet'").fetchall())
print(f"rows spark={len(spark)} oracle={len(oracle)} equal={spark == oracle}")
if spark != oracle:
    so, oo = set(spark), set(oracle)
    print("spark-only", sorted(so - oo)[:10])
    print("oracle-only", sorted(oo - so)[:10])
