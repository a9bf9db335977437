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

  test("q203 banded growth twin: superset of the single table at the " +
      "derived r (band-0 prefix), subset of the exact all-pairs oracle") {
    import org.apache.spark.sql.functions._
    import graft.ml.Similarity
    val s = SparkFixture.spark
    val dir = SparkFixture.sfDir
    val e = s.read.parquet(s"$dir/embeddings.parquet")
    val r = Similarity.autoPlanes(e.count(), 128L)
    val banded = rows(
      SparkEntry.benchOnlyQueries("q203_banded_pairs_growth")(s, dir))
    val single = rows(
      Similarity.nearDupPairs(e, "vec_id", "embedding", dim = 64,
          minCosine = 0.35, planes = r, bands = 1)
        .select(col("id_a"), col("id_b"),
          round(col("score"), 4).as("score")))
    assert(single.subsetOf(banded),
      "single table at the derived r is not a subset of the banded " +
        "twin — the shared-draw band-0 prefix property broke")
    assert(banded.size > single.size, "bands added no candidates")
    val exact = rows(
      Similarity.nearDupPairsExact(e, "vec_id", "embedding",
          minCosine = 0.35)
        .select(col("id_a"), col("id_b"), col("score")))
    assert(banded.subsetOf(exact),
      "banded twin returned a pair/score the exact oracle lacks")
  }

  test("q206 IVF-PQ growth twin: k rows, every score the TRUE cosine " +
      "for its id (rerank contract), position-wise dominated by brute") {
    import org.apache.spark.sql.functions._
    import graft.ml.Similarity
    val s = SparkFixture.spark
    val dir = SparkFixture.sfDir
    val out = SparkEntry.benchOnlyQueries("q206_ann_ivfpq_growth")(s, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    assert(out.size == 10, s"expected k = 10 rows, got ${out.size}")
    val e = s.read.parquet(s"$dir/embeddings.parquet")
    val corpus = e.filter(col("vec_id") =!= 0)
    val query  = e.filter(col("vec_id") === 0)
    // the full exact ranking (sf0.001 — a few hundred rows)
    val exact = Similarity.bruteForceTopK(corpus, "vec_id", "embedding",
        query, "embedding", k = 1000000)
      .select(col("vec_id"), round(col("score"), 4).as("score"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    val exactMap = exact.toMap
    out.foreach { case (id, sc) =>
      assert(exactMap.get(id).contains(sc),
        s"q206 score for $id is not the true cosine: $sc vs " +
          s"${exactMap.get(id)}") }
    // brute top-k dominates any pruned top-k position-wise
    exact.take(10).map(_._2).zip(out.map(_._2)).foreach { case (b, o) =>
      assert(b >= o, s"brute score $b below q206's $o at same rank") }
  }

  test("q208 ADC-eval growth twin: one verdict per query, labels " +
      "faithful to the inputs, correct derived — and the eval " +
      "MACHINERY is exactness-pinned in PqSpec (lossy-config verdicts " +
      "legitimately diverge from brute on near-uniform noise, where " +
      "true neighbors are quasi-ties; agreement in the planted regime " +
      "is measured in pq_recall_r13)") {
    import org.apache.spark.sql.functions._
    val s = SparkFixture.spark
    val dir = SparkFixture.sfDir
    val out = SparkEntry.benchOnlyQueries("q208_knn_eval_pq_growth")(s, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getInt(3)))
    val e = s.read.parquet(s"$dir/embeddings.parquet")
    val qLabels = e.filter(col("vec_id") % 7 === 0 && col("vec_id") < 2000)
      .select(col("vec_id"), col("label"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val corpusLabels = e.filter(col("vec_id") % 7 =!= 0)
      .select(col("label")).distinct()
      .collect().map(_.getInt(0)).toSet
    assert(out.map(_._1).toSet == qLabels.keySet,
      "q208 must return exactly one verdict per eval query")
    assert(out.length == qLabels.size, "duplicate verdict rows")
    out.foreach { case (qid, trueLabel, predicted, correct) =>
      assert(trueLabel == qLabels(qid),
        s"true_label for $qid does not match the query table")
      assert(corpusLabels.contains(predicted),
        s"predicted label $predicted for $qid outside the corpus domain")
      assert(correct == (if (trueLabel == predicted) 1 else 0),
        s"correct flag for $qid is not derived from the labels")
    }
  }

  test("q210 DSIR resample twin: deterministic per seed, exact sample " +
      "size, ids from the raw corpus, weights matching q209's ranking " +
      "surface") {
    import org.apache.spark.sql.functions._
    val s = SparkFixture.spark
    val dir = SparkFixture.sfDir
    def run() = SparkEntry
      .benchOnlyQueries("q210_dsir_resample_growth")(s, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val a = run()
    val b = run()
    assert(a == b, "same seed must reproduce the same resample")
    val d = s.read.parquet(s"$dir/documents.parquet")
    val n = d.count()
    assert(a.length == math.min(200L, n).toInt)
    assert(a.map(_._1).distinct.length == a.length, "duplicate ids")
    val rawIds = d.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a.forall(p => rawIds.contains(p._1)))
    // the emitted weight_ppm column is the SAME exact-BIGINT weight
    // q209's oracle checks — compare against dsirWeights directly
    val w = graft.ml.Curation.dsirWeights(
        d.select(col("doc_id"), col("text")),
        d.filter(col("doc_id") % 5 === 0)
          .select(col("doc_id"), col("text")),
        "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    a.foreach { case (id, ppm) =>
      assert(w(id) == ppm, s"resample weight for $id diverged: " +
        s"$ppm vs ${w(id)}") }
  }
}
