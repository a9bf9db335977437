package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the driver's correctness-harness contract (round-11
  * incident): `SparkEntry.queries` and `SparkEntry.oracleSql` must
  * stay exactly 1:1 — a `queries` row with no oracle makes the
  * driver's DuckDB comparator record an EMPTY artifact for the whole
  * round, zeroing every query's recorded correctness, not just the
  * oracle-less one. Queries the bench should measure but no static
  * SQL can oracle (data-dependent sizing) belong in
  * [[SparkEntry.benchOnlyQueries]], which must stay key-disjoint.
  *
  * BenchOnly semantics gate (r11 verdict #7): at sf0.001 the
  * driver-generated embeddings table is floored at exactly
  * Q188Cardinality rows, so the pinned filter `vec_id <
  * Q188Cardinality` is the identity there — the live-auto-sizing
  * growth twins (q197/q198) must produce row-for-row the SAME result
  * as their pinned oracle-gated siblings (q188/q196). That pins the
  * bench-only rows to oracle-verified semantics without a static
  * oracle of their own.
  */
class RegistrySpec extends AnyFunSuite {

  test("queries and oracleSql key sets are identical") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    val missingOracle = q -- o
    val orphanOracle = o -- q
    assert(missingOracle.isEmpty,
      s"queries without an oracleSql row (breaks the driver " +
        s"correctness artifact): ${missingOracle.toSeq.sorted}")
    assert(orphanOracle.isEmpty,
      s"oracleSql rows with no query: ${orphanOracle.toSeq.sorted}")
  }

  test("benchOnlyQueries is disjoint from queries") {
    val overlap = SparkEntry.benchOnlyQueries.keySet
      .intersect(SparkEntry.queries.keySet)
    assert(overlap.isEmpty, s"bench-only keys shadowing oracle-gated " +
      s"queries: ${overlap.toSeq.sorted}")
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet

  test("growth twins equal their pinned siblings where cardinalities " +
      "coincide (sf0.001 embeddings == pinned slice)") {
    val s = SparkFixture.spark
    val dir = SparkFixture.sfDir
    val n = s.read.parquet(s"$dir/embeddings.parquet").count()
    assume(n == SparkEntry.Q188Cardinality,
      s"sf0.001 embeddings floor changed ($n rows); premise gone")
    val q = SparkEntry.queries
    val b = SparkEntry.benchOnlyQueries
    assert(rows(b("q197_auto_lsh_growth")(s, dir)) ==
      rows(q("q188_auto_lsh_pairs")(s, dir)),
      "q197 (live sizing) != q188 (pinned) on the coinciding slice")
    assert(rows(b("q198_semantic_balance_growth")(s, dir)) ==
      rows(q("q196_semantic_balance")(s, dir)),
      "q198 (live sizing) != q196 (pinned) on the coinciding slice")
  }
}
