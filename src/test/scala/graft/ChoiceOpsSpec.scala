package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GType._
import graft.operators.ChoiceOps

class ChoiceOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def choiceDf = {
    val base = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "raw")
    ChoiceOps.withChoiceColumn(base, "c", Seq(
      GLong   -> when($"id" % 2 === 0, $"raw"),
      GString -> when($"id" % 2 === 1, concat(lit("s"), $"raw")))).drop("raw")
  }

  test("choice columns carry metadata and are discoverable") {
    assert(ChoiceOps.choiceColumns(choiceDf) == Seq("c"))
  }

  test("resolveChoice project:long keeps only that branch") {
    val r = ChoiceOps.resolveChoice(choiceDf, Seq("c" -> "project:long"))
    assert(r.schema("c").dataType == LongType)
    assert(r.orderBy("id").select("c").collect().map(_.get(0)).toSeq ==
      Seq(null, 20L, null))
  }

  test("resolveChoice cast:string coalesces branches") {
    val r = ChoiceOps.resolveChoice(choiceDf, Seq("c" -> "cast:string"))
    assert(r.orderBy("id").select("c").as[String].collect().toSeq ==
      Seq("s10", "20", "s30"))
  }

  test("resolveChoice make_struct keeps struct, drops the tag") {
    val r = ChoiceOps.resolveChoice(choiceDf, Seq("c" -> "make_struct"))
    assert(r.schema("c").dataType.isInstanceOf[StructType])
    assert(ChoiceOps.choiceColumns(r).isEmpty)
  }

  test("resolveChoice make_cols flattens branches in place") {
    val r = ChoiceOps.resolveChoice(choiceDf, Seq("c" -> "make_cols"))
    assert(r.columns.toSeq == Seq("id", "c_long", "c_string"))
    assert(r.orderBy("id").select("c_string").collect().map(_.get(0)).toSeq ==
      Seq("s10", null, "s30"))
  }

  test("global choice action applies to every choice column") {
    val r = ChoiceOps.resolveChoice(choiceDf, choice = "cast:string")
    assert(r.schema("c").dataType == StringType)
  }

  test("resolveChoice MATCH_CATALOG casts choices to the catalog type") {
    // catalog table declaring c as STRING (temp views resolve through
    // spark.table exactly like metastore tables)
    Seq((0L, "x")).toDF("id", "c").createOrReplaceTempView("cat_target")
    val r = ChoiceOps.resolveChoice(choiceDf,
      choice = "MATCH_CATALOG", tableName = "cat_target")
    assert(r.schema("c").dataType == StringType)
    assert(ChoiceOps.choiceColumns(r).isEmpty)
    assert(r.orderBy("id").select("c").as[String].collect().toSeq ==
      Seq("s10", "20", "s30"))
  }

  test("MATCH_CATALOG leaves choice columns the catalog does not know") {
    Seq((0L, 1.0)).toDF("id", "unrelated").createOrReplaceTempView("cat_miss")
    val r = ChoiceOps.resolveChoice(choiceDf,
      choice = "MATCH_CATALOG", tableName = "cat_miss")
    assert(ChoiceOps.choiceColumns(r) == Seq("c")) // unresolved, not dropped
  }

  test("choice inference on read: mixed JSON surfaces choice columns") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-choice-infer").toString + "/j"
    val lines = Seq(
      """{"id": 1, "v": 10, "meta": {"tag": "a"}}""",
      """{"id": 2, "v": "ten", "meta": {"tag": 7}}""",
      """{"id": 3, "v": 30}""",
      """{"id": 4, "v": null}""",
      "not json at all")
    lines.toDF("value").repartition(2).write.text(dir)
    val df = graft.sources.ChoiceInfer.readJson(spark, dir)
    // unparseable record dropped; null/missing absorbed by the merge
    assert(df.count() == 4)
    assert(graft.operators.ChoiceOps.choiceColumns(df) == Seq("v"))
    // branch routing respects the per-record JSON type: the quoted
    // "ten" must NOT land in the long branch (variant gets coerce;
    // the kind guard is what keeps the branches honest)
    val rows = df.selectExpr("id", "v.long", "v.string")
      .as[(Long, Option[Long], Option[String])].collect().toSet
    assert(rows == Set(
      (1L, Some(10L), None), (2L, None, Some("ten")),
      (3L, Some(30L), None), (4L, None, None)))
    // nested choice under a struct gets its own encoded column
    val tag = df.select(col("meta.tag")).schema.head
    assert(graft.core.GlueTypes.isChoiceField(tag))
    // end-to-end: resolve the way a user would
    val resolved = ChoiceOps.resolveChoice(df, Seq("v" -> "cast:string"))
    assert(resolved.schema("v").dataType == StringType)
    assert(resolved.select("v").as[Option[String]].collect().toSet ==
      Set(Some("10"), Some("ten"), Some("30"), None))
  }

  test("choice inference round-trips through the ported merge algebra") {
    // raw records -> inferred GStruct: the same shape mergeDataTypes
    // (gluetypes.py:395-432) computes — long+string conflict becomes a
    // canonical two-branch choice; pure paths stay atomic
    val dir = java.nio.file.Files
      .createTempDirectory("graft-choice-rt").toString + "/j"
    Seq("""{"a": 1, "b": 2.5}""", """{"a": "x", "b": 3}""")
      .toDF("value").write.text(dir)
    val parsed = spark.read.text(dir)
      .select(try_parse_json(col("value")).as("v"))
    val inferred = graft.sources.ChoiceInfer.inferSchema(parsed)
    assert(inferred == GStruct(Seq(
      GField("a", GChoice.of(Seq(GLong, GString))),
      GField("b", GChoice.of(Seq(GDouble, GLong))))))
  }

  test("union merges mismatched types into a choice and pads missing cols") {
    val a = Seq((1L, 5L)).toDF("id", "x")             // x: long
    val b = Seq((2L, "s", true)).toDF("id", "x", "y") // x: string, extra y
    val u = ChoiceOps.union(a, b)
    assert(u.count() == 2)
    assert(ChoiceOps.choiceColumns(u) == Seq("x"))
    val resolved = ChoiceOps.resolveChoice(u, Seq("x" -> "cast:string"))
    assert(resolved.orderBy("id").select("x").as[String].collect().toSeq ==
      Seq("5", "s"))
    // y padded with null on a's side
    assert(resolved.filter($"id" === 1L).select("y").collect().head.isNullAt(0))
  }

  test("union of identical schemas stays choice-free") {
    val a = Seq((1L, "p")).toDF("id", "v")
    val b = Seq((2L, "q")).toDF("id", "v")
    val u = ChoiceOps.union(a, b)
    assert(ChoiceOps.choiceColumns(u).isEmpty)
    assert(u.count() == 2)
  }
}
