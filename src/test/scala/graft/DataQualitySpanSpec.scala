package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ml.SpanDedup
import graft.operators.DataQuality
import graft.operators.DataQuality._

/** Specs for the two round-8 curation additions: the single-pass DQ
  * rule engine and substring-span duplication detection.
  */
class DataQualitySpanSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  // ------------------------------------------------------------- DQ

  private def orders = Seq(
    (1L, Some(10L), "F", 100.0),
    (2L, Some(20L), "O", 200.0),
    (3L, None, "X", 50000.0),
    (4L, Some(20L), "F", 300.0))
    .toDF("ok", "cust", "status", "price")

  private def verdicts(rules: Seq[Rule]): Map[String, (String, Double)] =
    DataQuality.evaluate(orders, rules)
      .as[(Int, String, String, Double)].collect()
      .map(r => r._2 -> (r._3, r._4)).toMap

  test("each rule type computes the right metric and verdict") {
    val v = verdicts(Seq(
      RowCountBetween(1, 10),
      RowCountBetween(5, 10),
      IsComplete("cust"),
      IsComplete("cust", minRatio = 0.7),
      IsUnique("ok"),
      IsUnique("cust"),
      ValuesBetween("price", 0, 1000, minRatio = 0.7),
      ValuesIn("status", Seq("F", "O")),
      MeanBetween("price", 0, 1000)))
    assert(v("RowCountBetween(1,10)") == ("Passed", 4.0))
    assert(v("RowCountBetween(5,10)") == ("Failed", 4.0))
    assert(v("IsComplete(cust)") == ("Failed", 0.75))
    assert(v("IsComplete(cust >= 0.7)") == ("Passed", 0.75))
    assert(v("IsUnique(ok)") == ("Passed", 1.0))
    // 20 repeats: 2 distinct / 3 non-null
    assert(v("IsUnique(cust)")._1 == "Failed")
    assert(v("ColumnValues(price between 0.0 1000.0 >= 0.7)") == ("Passed", 0.75))
    assert(v("ColumnValues(status in F|O)") == ("Failed", 0.75))
    // mean = 12650 > 1000
    assert(v("Mean(price between 0.0 1000.0)") == ("Failed", 12650.0))
  }

  test("all rules evaluate in ONE aggregate (single scan of the input)") {
    val plan = DataQuality.evaluate(orders, Seq(
      RowCountBetween(1, 10), IsComplete("cust"), IsUnique("ok"),
      ValuesBetween("price", 0, 1000), MeanBetween("price", 0, 1000)))
      .queryExecution.optimizedPlan
    val scans = plan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
      case l: org.apache.spark.sql.execution.LogicalRDD => l
    }
    assert(scans.size == 1, s"expected one scan, plan:\n$plan")
  }

  test("empty-table ratios fail cleanly (try_divide: 0/0 is NULL, no crash)") {
    val v = DataQuality.evaluate(
      orders.filter(col("ok") < 0),
      Seq(RowCountBetween(1, 10), IsComplete("cust")))
      .as[(Int, String, String, Option[Double])].collect()
      .map(r => r._2 -> (r._3, r._4)).toMap
    assert(v("RowCountBetween(1,10)") == ("Failed", Some(0.0)))
    assert(v("IsComplete(cust)") == ("Failed", None)) // NULL ratio fails
  }

  test("duplicate rule names are rejected up front") {
    intercept[IllegalArgumentException] {
      DataQuality.evaluate(orders,
        Seq(IsComplete("cust"), IsComplete("cust")))
    }
  }

  // ----------------------------------------------------- span dedup

  private def docs = Seq(
    // docs 1 and 2 share the 6-token block "alpha beta gamma delta
    // epsilon zeta" at different offsets; doc 3 is disjoint content
    (1L, "alpha beta gamma delta epsilon zeta unique1 tail1 tail2"),
    (2L, "lead2 alpha beta gamma delta epsilon zeta other2"),
    (3L, "nothing shared here at all with anyone anywhere"))
    .toDF("doc_id", "text")

  test("shared block becomes one maximal span per doc at its offset") {
    val spans = SpanDedup.duplicateSpans(docs, "doc_id", "text", width = 3)
      .as[(Long, Long, Long, Long)].collect().toSet
    // 6 shared tokens, width 3 → 4 shared gram positions per doc.
    // Doc 1: positions 0..3 → tokens 0..5; doc 2: 1..4 → tokens 1..6.
    assert(spans == Set((1L, 0L, 5L, 4L), (2L, 1L, 6L, 4L)))
  }

  test("two separate shared blocks stay two spans, not one") {
    val d = Seq(
      (1L, "one two three X Y Z four five six"),
      (2L, "one two three A B C four five six"))
      .toDF("doc_id", "text")
    val spans = SpanDedup.duplicateSpans(d, "doc_id", "text", width = 3)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(spans == Set(
      (1L, 0L, 2L, 1L), (1L, 6L, 8L, 1L),
      (2L, 0L, 2L, 1L), (2L, 6L, 8L, 1L)))
  }

  test("a gram repeated only within ONE doc is not a duplicated span") {
    val d = Seq(
      (1L, "loop loop loop loop loop loop"),
      (2L, "totally different words right here")).toDF("doc_id", "text")
    assert(SpanDedup.duplicateSpans(d, "doc_id", "text", width = 3)
      .count() == 0)
  }

  test("minDocs raises the bar") {
    val d = Seq(
      (1L, "shared phrase here and more"),
      (2L, "shared phrase here and more"),
      (3L, "shared phrase here plus other")).toDF("doc_id", "text")
    val s3 = SpanDedup.duplicateSpans(d, "doc_id", "text",
      width = 3, minDocs = 3).as[(Long, Long, Long, Long)].collect()
    // only "shared phrase here" (positions 0) is in all three docs
    assert(s3.toSet == Set((1L, 0L, 2L, 1L), (2L, 0L, 2L, 1L),
      (3L, 0L, 2L, 1L)))
  }

  test("plan: span dedup never falls back to cartesian/nested-loop") {
    val plan = SpanDedup.duplicateSpans(docs, "doc_id", "text")
      .queryExecution.executedPlan
    val bad = plan.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }
    assert(bad.isEmpty, s"fallback join in plan:\n$plan")
  }

  test("random corpora: spans match an in-memory reference on the same kernel") {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    for (_ <- 1 to 8) {
      val docs = (0 until 24).map { id =>
        val n = 3 + rnd.nextInt(20)
        (id.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      // reference: same positional kernel, dup detection in plain Scala
      val w = 3
      val grams: Map[Long, Seq[Long]] = docs.map { case (id, text) =>
        val arr = graft.functions.ShingleHashes.compute(
          org.apache.spark.unsafe.types.UTF8String.fromString(text), w)
        id -> (0 until arr.numElements()).map(arr.getLong)
      }.toMap
      val docsPerHash = grams.toSeq
        .flatMap { case (id, hs) => hs.map(h => (h, id)) }
        .groupBy(_._1).map { case (h, xs) => h -> xs.map(_._2).distinct.size }
      val expected = grams.flatMap { case (id, hs) =>
        val hits = hs.zipWithIndex.collect {
          case (h, pos) if docsPerHash(h) >= 2 => pos }
        // islands: consecutive positions merge
        val spans = hits.foldLeft(List.empty[(Int, Int, Int)]) {
          case ((s, e, n) :: rest, p) if p == e + 1 => (s, p, n + 1) :: rest
          case (acc, p) => (p, p, 1) :: acc
        }
        spans.map { case (st, en, n) =>
          (id, st.toLong, (en + w - 1).toLong, n.toLong) }
      }.toSet
      val got = SpanDedup.duplicateSpans(
        docs.toDF("doc_id", "text"), "doc_id", "text", width = w)
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got == expected)
    }
  }
}
