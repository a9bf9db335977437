package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{GlueFrame, GlueFrameCollection}

class GlueFrameSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def df = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, null, 30.0),
    (4L, "boom", 40.0)).toDF("id", "s", "v")

  test("filterRecords: lookup/cast failures drop the row silently") {
    // NullPointerException path: s.length on null row → drop (the
    // reference's KeyError/TypeError contract, dynamicframe_filter.py)
    val gf = GlueFrame(df).filterRecords(r => r.getString(1).length > 0)
    assert(gf.data.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 4L))
    assert(gf.errorsCount() == 0)
  }

  test("filterRecords: other exceptions divert to error channel") {
    // getString on the null row returns null (no exception), so row 3
    // falls through to the predicate and is kept
    val gf = GlueFrame(df).filterRecords({ r =>
      if (r.getString(1) == "boom") throw new RuntimeException("bad record")
      r.getDouble(2) > 15.0
    }, stage = "s1")
    assert(gf.data.select("id").as[Long].collect().sorted.toSeq == Seq(2L, 3L))
    assert(gf.errorsCount() == 1)
    assert(gf.stageErrorsCount("s1") == 1)
    val err = gf.errorsAsFrame.collect().head
    assert(err.getAs[String]("errorMessage").contains("bad record"))
    assert(err.getAs[String]("record").contains("\"id\":4"))
  }

  test("mapRecords: null result and exception become error records") {
    val out = StructType(Seq(StructField("id", LongType),
      StructField("len", IntegerType)))
    val gf = GlueFrame(df).mapRecords({ r =>
      if (r.getLong(0) == 2L) null
      else Row(r.getLong(0), r.getString(1).length) // NPE on id=3
    }, out, stage = "m1")
    assert(gf.data.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 4L))
    assert(gf.stageErrorsCount("m1") == 2)
  }

  test("assertErrorThreshold fails over threshold, passes under") {
    val gf = GlueFrame(df).filterRecords({ r =>
      if (r.getLong(0) >= 3L) throw new RuntimeException("x")
      true
    }, stage = "t")
    // NPE on id=3 is a drop; id=4 errors... both >=3 throw RuntimeException
    assert(gf.errorsCount() == 2)
    intercept[IllegalStateException](gf.assertErrorThreshold(1, 10))
    intercept[IllegalStateException](gf.assertErrorThreshold(10, 1))
    gf.assertErrorThreshold(2, 2) // no throw
  }

  test("errors accumulate across chained stages") {
    val gf = GlueFrame(df)
      .filterRecords({ r =>
        if (r.getLong(0) == 1L) throw new RuntimeException("a"); true
      }, stage = "s1")
      .filterRecords({ r =>
        if (r.getLong(0) == 2L) throw new RuntimeException("b"); true
      }, stage = "s2")
    assert(gf.stageErrorsCount("s1") == 1)
    assert(gf.stageErrorsCount("s2") == 1)
    assert(gf.errorsCount() == 2)
  }

  test("collection: select/map/flatMap, missing key → empty frame") {
    implicit val s = spark
    val coll = GlueFrameCollection(Map(
      "a" -> GlueFrame(df.filter($"id" <= 2)),
      "b" -> GlueFrame(df.filter($"id" > 2))))
    assert(coll.select("a").data.count() == 2)
    assert(coll.select("nope").data.count() == 0)
    val mapped = coll.map(g => g.transform(_.select("id")))
    assert(mapped.select("b").data.columns.toSeq == Seq("id"))
    val flat = coll.flatMap((k, g) => Seq(s"$k-1" -> g, s"$k-2" -> g))
    assert(flat.keys == Seq("a-1", "a-2", "b-1", "b-2"))
  }
}
