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

  test("writeFrame returns sink-cast rejects as the errors frame") {
    // data_sink.py:32-43 contract: write returns the errors frame.
    // "123" casts to the target int; "abc" and "12.5.6" reject.
    val dir = java.nio.file.Files
      .createTempDirectory("graft-sink-errors").toString
    val in = Seq((1L, "123"), (2L, "abc"), (3L, "12.5.6"))
      .toDF("id", "qty")
    val target = StructType(Seq(
      StructField("id", LongType), StructField("qty", IntegerType)))
    val errs = graft.sources.Sinks.writeFrame(GlueFrame(in), "file",
      options = Map("path" -> s"$dir/t"), targetSchema = Some(target))
    val bad = errs.collect()
    assert(bad.length == 2)
    assert(bad.forall(_.getAs[String]("stage") == "sink"))
    assert(bad.forall(_.getAs[String]("errorMessage")
      .contains("sink cast failed: qty")))
    assert(bad.map(_.getAs[String]("record")).sorted.toSeq
      .map(r => r.contains("abc") || r.contains("12.5.6"))
      .forall(identity))
    // the written table holds only the surviving row, cast to the
    // target schema
    val written = spark.read.parquet(s"$dir/t")
    assert(written.schema == target)
    assert(written.as[(Long, Int)].collect().toSeq == Seq((1L, 123)))
    in.unpersist()
  }

  test("writeFrame without a schema passes upstream errors through") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-sink-plain").toString
    val gf = GlueFrame(df).filterRecords({ r =>
      if (r.getString(1) == "boom") throw new RuntimeException("boom")
      true
    }, stage = "s1")
    val errs = graft.sources.Sinks.writeFrame(gf, "file",
      options = Map("path" -> s"$dir/t"))
    assert(errs.collect().map(_.getAs[String]("stage")).toSeq == Seq("s1"))
    assert(spark.read.parquet(s"$dir/t").count() == 3)
  }

  test("collection write fans out per member name (useFrameName)") {
    // context.py:295-354 / data_sink.py:42-50: writing a collection
    // writes each member under its name — here the canonical use,
    // landing a relationalize result (root + child) in ONE call.
    val dir = java.nio.file.Files
      .createTempDirectory("graft-coll-sink").toString
    val nested = Seq(
      (1L, Seq("x", "y")),
      (2L, Seq("z"))).toDF("id", "words")
    val tables = graft.operators.NestedOps
      .relationalize(nested, "root", idCol = Some("id"))
    val coll = GlueFrameCollection(
      tables.map { case (k, v) => k -> GlueFrame(v) })
    val errs = graft.sources.Sinks.writeCollection(coll, "file",
      options = Map("path" -> dir))
    assert(errs.count() == 0)
    val root = spark.read.parquet(s"$dir/root")
    val child = spark.read.parquet(s"$dir/root_words")
    assert(root.count() == 2)
    assert(child.count() == 3)
    // members with sink-cast rejects merge into one errors frame
    val dir2 = java.nio.file.Files
      .createTempDirectory("graft-coll-sink2").toString
    val bad = GlueFrameCollection(Map(
      "ok"  -> GlueFrame(Seq((1L, "5")).toDF("id", "qty")),
      "rej" -> GlueFrame(Seq((2L, "abc")).toDF("id", "qty"))))
    val target = StructType(Seq(
      StructField("id", LongType), StructField("qty", IntegerType)))
    val errs2 = graft.sources.Sinks.writeCollection(bad, "file",
      options = Map("path" -> dir2),
      targetSchemas = Map("ok" -> target, "rej" -> target))
    val rows = errs2.collect()
    assert(rows.length == 1 && rows.head.getAs[String]("stage") == "sink:rej")
    bad.frames.values.foreach(_.data.unpersist())
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
