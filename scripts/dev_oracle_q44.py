#!/usr/bin/env python3
"""Develop the q44 LSH-ANN DuckDB oracle: replicate the deterministic
hyperplanes (scala.util.Random(42) = java.util.Random LCG) and the
bucket-then-rerank plan."""
import duckdb, sys

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
dump = sys.argv[2] if len(sys.argv) > 2 else "target/verify_out/q44_ann_lsh"


class JavaRandom:
    def __init__(self, seed):
        self.seed = (seed ^ 0x5DEECE66D) & ((1 << 48) - 1)

    def next(self, bits):
        self.seed = (self.seed * 0x5DEECE66D + 0xB) & ((1 << 48) - 1)
        r = self.seed >> (48 - bits)
        return r

    def next_double(self):
        return ((self.next(26) << 27) + self.next(27)) / float(1 << 53)


def hyperplanes(dim, planes, seed=42):
    rnd = JavaRandom(seed)
    return [[rnd.next_double() * 2 - 1 for _ in range(dim)]
            for _ in range(planes)]


ps = hyperplanes(64, 4)
mat = "[" + ",".join(
    "[" + ",".join(repr(x) for x in row) + "]" for row in ps) + "]"

ORACLE = f"""
WITH coded AS (
  SELECT vec_id, embedding,
    list_sum(list_transform(range(1, 5), p ->
      CASE WHEN list_sum(list_transform(range(1, len(embedding) + 1),
          i -> CAST(embedding[i] AS DOUBLE) * ({mat})[p][i])) >= 0
        THEN (1 << (p - 1)) ELSE 0 END)) AS bk
  FROM embeddings),
q AS (SELECT embedding AS qe, bk AS qbk FROM coded WHERE vec_id = 0),
sc AS (SELECT c.vec_id,
  list_sum(list_transform(range(1, len(c.embedding) + 1),
    i -> CAST(c.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE))) /
  (sqrt(list_sum(list_transform(c.embedding,
     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
   sqrt(list_sum(list_transform(q.qe,
     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS raw
 FROM coded c, q WHERE c.vec_id <> 0 AND c.bk = q.qbk)
SELECT vec_id, round(raw, 4) AS score FROM sc
ORDER BY raw DESC, vec_id LIMIT 10
"""

con = duckdb.connect()
con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{sf}/embeddings.parquet'")
oracle = con.execute(ORACLE).fetchall()
spark = con.execute(
    f"SELECT vec_id, score FROM '{dump}/*.parquet' ORDER BY score DESC, vec_id").fetchall()
print(f"oracle={oracle}")
print(f"spark ={spark}")
print("equal =", sorted(oracle) == sorted(spark))
