package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{DataQuality, Drift, Profile}

/** Specs for the feed-health / drift / reporting operators:
  * referential integrity, completeness, PSI, Pareto shares.
  */
class QualityOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  test("referentialCheck reports orphan keys with row counts") {
    val child = Seq((1L, "a"), (1L, "b"), (2L, "c"), (3L, "d"),
      (3L, "e"), (3L, "f")).toDF("fk", "payload")
    val parent = Seq(1L, 2L).toDF("pk")
    val got = DataQuality.referentialCheck(child, parent,
        Seq("fk" -> "pk"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(3L -> 3L))
  }

  test("referentialCheck: null FK is no-reference, not a violation") {
    val child = Seq(Some(1L), None, None).map(k => (k, "x"))
      .toDF("fk", "payload")
    val parent = Seq(1L).toDF("pk")
    assert(DataQuality.referentialCheck(child, parent,
      Seq("fk" -> "pk")).count() == 0)
  }

  test("feedCompleteness flags days under half the median") {
    val rows = Seq.tabulate(5) { d => (d, 100) } :+ ((5, 30)) // thin day
    val ev = rows.flatMap { case (d, n) =>
      Seq.fill(n)(java.sql.Timestamp.valueOf(s"2024-01-0${d + 1} 12:00:00"))
    }.toDF("ts")
    val got = Drift.feedCompleteness(ev, "ts")
      .select(col("day").cast("string"), col("n"), col("is_low"))
      .as[(String, Long, Int)].collect().sortBy(_._1)
    assert(got.count(_._3 == 1) == 1)
    assert(got.find(_._3 == 1).get._1 == "2024-01-06")
    assert(got.forall { case (_, n, low) => (n < 50) == (low == 1) })
  }

  test("psi: identical samples score zero; a shifted sample doesn't") {
    val ref = (1 to 400).map(_.toDouble).toDF("v")
    val same = Drift.psi(ref, ref, "v", nb = 4)
      .select("psi_term").as[Double].collect()
    assert(same.forall(_ == 0.0))
    val shifted = (301 to 700).map(_.toDouble).toDF("v")
    val terms = Drift.psi(ref, shifted, "v", nb = 4)
      .select("bucket", "psi_term").as[(Int, Double)].collect().toMap
    // buckets 0/1 emptied (q floored), buckets 2/3 gained mass: every
    // term positive, total far above the 0.2 alert line
    assert(terms.values.forall(_ > 0.0))
    assert(terms.values.sum > 0.2)
  }

  test("psi emits every bucket even when the current sample misses some") {
    val ref = (1 to 100).map(_.toDouble).toDF("v")
    val cur = Seq(1.0, 2.0).toDF("v") // all in bucket 0
    val got = Drift.psi(ref, cur, "v", nb = 4)
      .select("bucket").as[Int].collect().sorted
    assert(got.toSeq == Seq(0, 1, 2, 3))
  }

  test("paretoShare matches the single-window reference ordering") {
    val rnd = new scala.util.Random(99)
    val d = (1 to 500).map(i => (i.toLong, rnd.nextInt(1000) / 10.0))
      .toDF("k", "v")
    val got = Profile.paretoShare(d, Seq("k"), "v", partitions = 8)
      .select("k", "revenue", "cum_share")
      .as[(Long, Double, Double)].collect()
    // reference: plain global-window cumulative share
    val byKey = d.groupBy("k")
      .agg(sum(col("v").cast("decimal(18,2)")).as("w"))
      .as[(Long, java.math.BigDecimal)].collect()
    val total = byKey.map(r => BigDecimal(r._2)).sum
    val ordered = byKey.sortBy(r => (-BigDecimal(r._2), r._1))
    var run = BigDecimal(0)
    val want = ordered.map { case (k, w) =>
      run += BigDecimal(w)
      k -> (math.round((run / total).toDouble * 1e6) / 1e6)
    }.toMap
    assert(got.length == want.size)
    got.foreach { case (k, _, cs) =>
      assert(cs == want(k), s"key $k")
    }
    // last key's cumulative share closes at 1
    assert(got.map(_._3).max == 1.0)
  }
}
