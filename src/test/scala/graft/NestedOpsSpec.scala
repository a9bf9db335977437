package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.NestedOps

class NestedOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  test("unnest flattens deep structs to dotted names") {
    val df = Seq((1L, ("x", (2.0, true)))).toDF("id", "a")
      .select($"id", $"a._1".as("s"),
        struct($"a._2._1".as("d"), struct($"a._2._2".as("b")).as("inner"))
          .as("nest"))
    val flat = NestedOps.unnest(df)
    assert(flat.columns.toSeq == Seq("id", "s", "nest.d", "nest.inner.b"))
    assert(flat.collect().head.getBoolean(3))
  }

  test("relationalize with natural key links root and child") {
    val df = Seq((10L, Seq("a", "b")), (20L, Seq("c")))
      .toDF("k", "arr")
    val tables = NestedOps.relationalize(df, "t", idCol = Some("k"))
    val root  = tables("t")
    val child = tables("t_arr")
    assert(root.columns.toSeq == Seq("k", "arr"))
    assert(root.filter($"k" === 10L).select("arr").as[Long].head() == 10L)
    assert(child.columns.toSeq == Seq("id", "index", "arr.val"))
    assert(child.filter($"id" === 10L).count() == 2)
    assert(child.filter($"id" === 20L).select($"`arr.val`").as[String]
      .head() == "c")
  }

  test("relationalize default key is content-deterministic") {
    val df = Seq((10L, Seq("a")), (20L, Seq("b"))).toDF("k", "arr")
    val t1 = NestedOps.relationalize(df, "t")
    val t2 = NestedOps.relationalize(df, "t")
    // same content → same generated keys on recompute (retry-stable)
    assert(t1("t").collect().toSet == t2("t").collect().toSet)
    val rootIds  = t1("t").select("arr").as[Long].collect().toSet
    val childIds = t1("t_arr").select("id").as[Long].collect().toSet
    assert(rootIds == childIds)
  }

  test("relationalize explodes arrays of structs into flat child tables") {
    val df = Seq((1L, Seq((7L, "x"), (8L, "y"))))
      .toDF("k", "items")
      .select($"k", transform($"items",
        e => struct(e.getField("_1").as("n"), e.getField("_2").as("s")))
        .as("items"))
    val child = NestedOps.relationalize(df, "r", idCol = Some("k"))("r_items")
    assert(child.columns.toSeq == Seq("id", "index", "items.val.n", "items.val.s"))
    assert(child.orderBy("index").select($"`items.val.s`").as[String]
      .collect().toSeq == Seq("x", "y"))
  }

  test("relationalize stagingPath stages members and reads them back") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rel_stage")
      .toString
    val df = Seq((10L, Seq("a", "b")), (20L, Seq("c"))).toDF("k", "arr")
    val staged = NestedOps.relationalize(df, "t", idCol = Some("k"),
      stagingPath = Some(dir))
    // staged parquet exists per member, and the frames scan the staging
    assert(new java.io.File(s"$dir/t").exists())
    assert(new java.io.File(s"$dir/t_arr").exists())
    assert(staged("t").count() == 2)
    assert(staged("t_arr").count() == 3)
    val plan = staged("t_arr").queryExecution.executedPlan.toString
    assert(plan.contains("t_arr"), s"child does not scan staging:\n$plan")
    // same content as the unstaged plans
    val lazyTables = NestedOps.relationalize(df, "t", idCol = Some("k"))
    assert(staged("t_arr").collect().toSet == lazyTables("t_arr").collect().toSet)
  }

  test("unbox json with explicit schema and with inference") {
    val df = Seq((1L, """{"a": 5, "b": "x"}"""), (2L, """{"a": 6}"""))
      .toDF("id", "payload")
    val explicit = NestedOps.unbox(df, "payload", "json",
      Map("withSchema" -> "a BIGINT, b STRING"))
    assert(explicit.schema("payload").dataType.isInstanceOf[StructType])
    assert(explicit.filter($"id" === 1L).select($"payload.b").as[String]
      .head() == "x")
    val inferred = NestedOps.unbox(df, "payload", "json")
    assert(inferred.filter($"id" === 2L).select($"payload.a").as[Long]
      .head() == 6L)
  }

  test("unbox csv with separator") {
    val df = Seq((1L, "5|x")).toDF("id", "payload")
    val r = NestedOps.unbox(df, "payload", "csv",
      Map("withSchema" -> "n INT, s STRING", "separator" -> "|"))
    assert(r.select($"payload.n").as[Int].head() == 5)
  }

  test("unbox avro decodes binary records (round-trip via avro writer)") {
    val schemaJson =
      """{"type": "record", "name": "rec", "fields": [
        |  {"name": "a", "type": "long"},
        |  {"name": "b", "type": ["null", "string"]},
        |  {"name": "tags", "type": {"type": "array", "items": "string"}}]}"""
        .stripMargin
    val schema = new org.apache.avro.Schema.Parser().parse(schemaJson)
    def encode(a: Long, b: String, tags: Seq[String]): Array[Byte] = {
      import scala.jdk.CollectionConverters._
      val rec = new org.apache.avro.generic.GenericData.Record(schema)
      rec.put("a", a); rec.put("b", b); rec.put("tags", tags.asJava)
      val out = new java.io.ByteArrayOutputStream()
      val enc = org.apache.avro.io.EncoderFactory.get().binaryEncoder(out, null)
      new org.apache.avro.generic.GenericDatumWriter[
        org.apache.avro.generic.GenericRecord](schema).write(rec, enc)
      enc.flush(); out.toByteArray
    }
    val df = Seq((1L, encode(10L, "x", Seq("t1", "t2"))),
      (2L, encode(20L, null, Nil))).toDF("id", "payload")
    val r = NestedOps.unbox(df, "payload", "avro",
      Map("withSchema" -> schemaJson))
    assert(r.schema("payload").dataType.isInstanceOf[StructType])
    assert(r.orderBy("id").select($"payload.a").as[Long].collect().toSeq ==
      Seq(10L, 20L))
    assert(r.orderBy("id").select($"payload.b").collect().map(_.get(0)).toSeq ==
      Seq("x", null))
    assert(r.filter($"id" === 1L).select($"payload.tags").as[Seq[String]]
      .head() == Seq("t1", "t2"))
  }

  test("unnestDdbJson collapses DynamoDB typed structs") {
    val df = Seq((1L, ("v", null: String)), (2L, (null: String, "9")))
      .toDF("id", "c")
      .select($"id", struct($"c._1".as("S"), $"c._2".as("N")).as("c"))
    val r = NestedOps.unnestDdbJson(df)
    assert(r.orderBy("id").select("c").as[String].collect().toSeq ==
      Seq("v", "9"))
  }

  test("unnestDdbJson collapses nested M / L / SS / NS encodings") {
    // one DynamoDB-export item: attrs is M{name: S, scores: NS,
    // tags: L[S], flag: BOOL}
    val json =
      """{"id": 1, "attrs": {"M": {
        |  "name":   {"S": "x"},
        |  "scores": {"NS": ["1", "2"]},
        |  "tags":   {"L": [{"S": "a"}, {"S": "b"}]},
        |  "flag":   {"BOOL": true}}}}""".stripMargin.replace("\n", " ")
    val df = spark.read.json(Seq(json).toDS)
    val r  = NestedOps.unnestDdbJson(df)
    assert(r.select($"attrs.name").as[String].head() == "x")
    assert(r.select($"attrs.scores").as[Seq[String]].head() == Seq("1", "2"))
    assert(r.select($"attrs.tags").as[Seq[String]].head() == Seq("a", "b"))
    assert(r.select($"attrs.flag").as[String].head() == "true")
  }

  test("unnestDdbJson keeps mixed scalar+complex kinds as a struct") {
    // rows disagree: one S, one L — cannot collapse to a single type
    val j1 = """{"id": 1, "v": {"S": "plain"}}"""
    val j2 = """{"id": 2, "v": {"L": [{"S": "in-list"}]}}"""
    val df = spark.read.json(Seq(j1, j2).toDS)
    val r  = NestedOps.unnestDdbJson(df)
    assert(r.schema("v").dataType.isInstanceOf[StructType])
    assert(r.filter($"id" === 1).select($"v.S").as[String].head() == "plain")
    assert(r.filter($"id" === 2).select($"v.L").as[Seq[String]].head() ==
      Seq("in-list"))
  }
}
