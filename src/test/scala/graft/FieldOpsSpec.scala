package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.FieldOps
import graft.operators.FieldOps.Mapping
import graft.core.FieldPath

class FieldOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def nested = Seq((1L, "a", 2.0, true)).toDF("id", "s", "d", "b")
    .select($"id", struct($"s", struct($"d", $"b").as("deep")).as("info"))

  test("FieldPath parses quoted segments") {
    assert(FieldPath.parse("a.b.c") == Seq("a", "b", "c"))
    assert(FieldPath.parse("`a.b`.c") == Seq("a.b", "c"))
    assert(FieldPath.render(Seq("a.b", "c")) == "`a.b`.c")
  }

  test("selectFields keeps nested structure for partial struct selection") {
    val r = FieldOps.selectFields(nested, Seq("id", "info.deep.b"))
    assert(r.columns.toSeq == Seq("id", "info"))
    val info = r.schema("info").dataType.asInstanceOf[StructType]
    assert(info.fieldNames.toSeq == Seq("deep"))
    assert(r.select($"info.deep.b").as[Boolean].head())
  }

  test("dropFields removes nested paths via dropFields") {
    val r = FieldOps.dropFields(nested, Seq("info.deep.d"))
    val deep = r.schema("info").dataType.asInstanceOf[StructType]("deep")
      .dataType.asInstanceOf[StructType]
    assert(deep.fieldNames.toSeq == Seq("b"))
  }

  test("renameField renames within a nested struct") {
    val r = FieldOps.renameField(nested, "info.s", "info.renamed")
    val info = r.schema("info").dataType.asInstanceOf[StructType]
    assert(info.fieldNames.contains("renamed") && !info.fieldNames.contains("s"))
    assert(r.select($"info.renamed").as[String].head() == "a")
  }

  test("renamePositional renames headerless columns like the pipeline") {
    val df = Seq(("x", "y", "z")).toDF("_c0", "_c1", "_c2")
    val r  = FieldOps.renamePositional(df, Seq("a", "b"))
    assert(r.columns.toSeq == Seq("a", "b", "_c2"))
  }

  test("applyMapping reassembles nested targets") {
    val df = Seq((1, "n", 2.5)).toDF("id", "name", "score")
    val r = FieldOps.applyMapping(df, Seq(
      Mapping.cast("id", "key", "long"),
      Mapping.cast("name", "meta.label", "string"),
      Mapping.cast("score", "meta.value", "decimal(10,2)")))
    assert(r.columns.toSeq == Seq("key", "meta"))
    assert(r.select($"meta.label").as[String].head() == "n")
    assert(r.schema("meta").dataType.asInstanceOf[StructType]("value")
      .dataType == DecimalType(10, 2))
  }

  test("splitRows routes null predicates to the non-matching side") {
    val df = Seq[(java.lang.Long, String)]((1L, "a"), (null, "b"), (30L, "c"))
      .toDF("v", "tag")
    val (m, nm) = FieldOps.splitRows(df, Map("v" -> Map(">" -> 10)))
    assert(m.select("tag").as[String].collect().toSeq == Seq("c"))
    assert(nm.select("tag").as[String].collect().sorted.toSeq == Seq("a", "b"))
  }

  test("dropNullFields drops nested NullType leaves") {
    val df = Seq((1L, "x")).toDF("id", "s")
      .withColumn("n1", lit(null))
      .withColumn("st", struct($"s".as("keep"), lit(null).as("n2")))
    val r = FieldOps.dropNullFields(df)
    assert(r.columns.toSeq == Seq("id", "s", "st"))
    assert(r.schema("st").dataType.asInstanceOf[StructType].fieldNames.toSeq ==
      Seq("keep"))
  }

  test("dropNullFields prunes NullType inside arrays of structs") {
    val df = Seq((1L, "x")).toDF("id", "s")
      .withColumn("arr", array(
        struct($"s".as("keep"), lit(null).as("n2")),
        struct(lit("y").as("keep"), lit(null).as("n2"))))
      .withColumn("allnull", array(struct(lit(null).as("n3"))))
    val r = FieldOps.dropNullFields(df)
    assert(r.columns.toSeq == Seq("id", "s", "arr"))
    val elem = r.schema("arr").dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType]
    assert(elem.fieldNames.toSeq == Seq("keep"))
    assert(r.select(expr("arr[1].keep")).as[String].head() == "y")
  }

  test("dropNullFields keeps maps and deep mixed nesting intact") {
    val df = Seq((1L, "x")).toDF("id", "s")
      .withColumn("m", map(lit("k"), lit(null)))  // maps are skipped
      .withColumn("deep", struct(
        array(struct($"s".as("a"), lit(null).as("b"))).as("arr"),
        lit(null).as("gone")))
    val r = FieldOps.dropNullFields(df)
    assert(r.columns.toSeq == Seq("id", "s", "m", "deep"))
    val deep = r.schema("deep").dataType.asInstanceOf[StructType]
    assert(deep.fieldNames.toSeq == Seq("arr"))
    val elem = deep("arr").dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType]
    assert(elem.fieldNames.toSeq == Seq("a"))
  }
}
