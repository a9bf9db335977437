package graft

import java.sql.Date

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Scd

class ScdSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private val d0 = Date.valueOf("2020-01-01")
  private val d1 = Date.valueOf("2024-06-01")
  private val d2 = Date.valueOf("2024-07-01")

  private def dim = Seq(
    // key, segment, balance, eff_from, eff_to, is_current
    (1L, "AUTO", 10.0, d0, null.asInstanceOf[Date], true),
    (2L, "BIKE", 20.0, d0, null.asInstanceOf[Date], true),
    (3L, "AUTO", 30.0, d0, null.asInstanceOf[Date], true),
    // closed history row for key 1 — must pass through untouched
    (1L, "OLD", 5.0, Date.valueOf("2019-01-01"), d0, false))
    .toDF("k", "seg", "bal", "eff_from", "eff_to", "is_current")

  private def out(updates: org.apache.spark.sql.DataFrame) =
    Scd.scd2Apply(dim, updates, Seq("k"), Seq("seg", "bal"), lit(d1))
      .as[(Long, String, Double, Date, Option[Date], Boolean)]
      .collect().toSet

  test("changed row closes and re-opens; unchanged and closed pass through") {
    val updates = Seq((1L, "MOTO", 11.0)).toDF("k", "seg", "bal")
    val r = out(updates)
    assert(r == Set(
      (1L, "OLD", 5.0, Date.valueOf("2019-01-01"), Some(d0), false),
      (1L, "AUTO", 10.0, d0, Some(d1), false), // closed at batch date
      (1L, "MOTO", 11.0, d1, None, true),      // new open version
      (2L, "BIKE", 20.0, d0, None, true),
      (3L, "AUTO", 30.0, d0, None, true)))
  }

  test("identical update is a no-op; new key inserts open") {
    val updates = Seq((2L, "BIKE", 20.0), (9L, "SHIP", 90.0))
      .toDF("k", "seg", "bal")
    val r = out(updates)
    assert(r.contains((2L, "BIKE", 20.0, d0, None, true))) // untouched
    assert(r.contains((9L, "SHIP", 90.0, d1, None, true))) // inserted
    assert(r.size == 5)
  }

  test("null transitions are tracked changes (null-safe compare)") {
    val updates = Seq((2L, null.asInstanceOf[String], 20.0))
      .toDF("k", "seg", "bal")
    val r = out(updates)
    assert(r.contains((2L, "BIKE", 20.0, d0, Some(d1), false)))
    assert(r.exists(t => t._1 == 2L && t._2 == null && t._6))
  }

  test("two sequential batches stack history correctly") {
    val b1 = Scd.scd2Apply(dim, Seq((3L, "AUTO", 31.0)).toDF("k", "seg", "bal"),
      Seq("k"), Seq("seg", "bal"), lit(d1))
    val b2 = Scd.scd2Apply(b1, Seq((3L, "AUTO", 32.0)).toDF("k", "seg", "bal"),
      Seq("k"), Seq("seg", "bal"), lit(d2))
    val k3 = b2.filter(col("k") === 3)
      .as[(Long, String, Double, Date, Option[Date], Boolean)]
      .collect().toSet
    assert(k3 == Set(
      (3L, "AUTO", 30.0, d0, Some(d1), false),
      (3L, "AUTO", 31.0, d1, Some(d2), false),
      (3L, "AUTO", 32.0, d2, None, true)))
    // exactly one open row per key after any number of batches
    val opens = b2.filter(col("is_current")).groupBy(col("k"))
      .count().as[(Long, Long)].collect().toMap
    assert(opens.values.forall(_ == 1L))
  }

  test("scd1 overwrites in place and inserts new keys, no history") {
    val r = Scd.scd1Apply(
      dim.filter(col("is_current")).drop("eff_from", "eff_to", "is_current"),
      Seq((1L, "MOTO", 11.0), (9L, "SHIP", 90.0)).toDF("k", "seg", "bal"),
      Seq("k")).as[(Long, String, Double)].collect().toSet
    assert(r == Set((1L, "MOTO", 11.0), (2L, "BIKE", 20.0),
      (3L, "AUTO", 30.0), (9L, "SHIP", 90.0)))
  }

  test("plan: ONE join total — closed history bypasses it; legs share it") {
    val plan = Scd.scd2Apply(dim,
      Seq((1L, "M", 1.0)).toDF("k", "seg", "bal"),
      Seq("k"), Seq("seg", "bal"), lit(d1))
      .queryExecution.optimizedPlan
    val joins = plan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
    assert(joins.size == 1, s"expected exactly one join:\n$plan")
  }

  test("null-keyed open rows pass through; null-keyed updates are rejected") {
    // a null-keyed OPEN row can never match any update (null-rejecting
    // equi-join) — it must survive the batch untouched, not vanish
    val dimWithNull = dim.unionByName(
      Seq((Option.empty[Long], "NULLK", 77.0, d0,
        Option.empty[Date], true))
        .toDF("k", "seg", "bal", "eff_from", "eff_to", "is_current"))
    val r = Scd.scd2Apply(dimWithNull,
      Seq((1L, "MOTO", 11.0)).toDF("k", "seg", "bal"),
      Seq("k"), Seq("seg", "bal"), lit(d1))
      .as[(Option[Long], String, Double, Date, Option[Date], Boolean)]
      .collect().toSet
    assert(r.contains((None, "NULLK", 77.0, d0, None, true)))
    assert(r.exists(t => t._1.contains(1L) && t._2 == "MOTO" && t._6))
    // a null-keyed UPDATE fails the batch guard…
    val nullUpd = Seq((Option.empty[Long], "X", 1.0)).toDF("k", "seg", "bal")
    intercept[IllegalArgumentException] {
      Scd.scd2Apply(dim, nullUpd, Seq("k"), Seq("seg", "bal"), lit(d1))
        .count()
    }
    // …and inserts as a new open row when the guard is waived
    val ins = Scd.scd2Apply(dim, nullUpd, Seq("k"), Seq("seg", "bal"),
      lit(d1), validateBatch = false)
      .filter(col("k").isNull)
      .as[(Option[Long], String, Double, Date, Option[Date], Boolean)]
      .collect().toSet
    assert(ins == Set((None, "X", 1.0, d1, None, true)))
  }

  test("duplicate-keyed update batch is rejected (fan-out corrupts)") {
    val updates = Seq((1L, "A", 1.0), (1L, "B", 2.0)).toDF("k", "seg", "bal")
    intercept[IllegalArgumentException] { out(updates) }
    // opt-out still works for pre-validated upstreams
    val ok = Scd.scd2Apply(dim, Seq((9L, "S", 9.0)).toDF("k", "seg", "bal"),
      Seq("k"), Seq("seg", "bal"), lit(d1), validateBatch = false)
    assert(ok.filter(col("k") === 9).count() == 1)
  }
}
