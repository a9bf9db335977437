package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.api.{GraftContext, GraftFrame}
import graft.operators.PhysicalOps

class ApiSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private lazy val ctx = GraftContext(spark)

  test("GraftContext.readTsv gives headerless _cN string columns") {
    val f = Files.createTempFile("graft_api", ".tsv")
    Files.write(f, "1\tx\n2\ty".getBytes)
    val frame = ctx.readTsv(f.toString)
    assert(frame.df.columns.toSeq == Seq("_c0", "_c1"))
    assert(frame.count() == 2)
  }

  test("fluent chain: applyMapping → filter → resolveChoice → write") {
    val f = Files.createTempFile("graft_api2", ".tsv")
    Files.write(f, "1\t10\n2\tbad\n3\t30".getBytes)
    val out = Files.createTempDirectory("graft_api_out").toString + "/t"
    val chained = ctx.readTsv(f.toString)
      .applyMapping(Seq(
        ("_c0", "", "id", "int"),
        ("_c1", "", "v", "string")))
      .filter(col("id") =!= 2)
      .renameField("v", "value")
      .writeParquet(out, mode = "overwrite")
    assert(chained.df.columns.toSeq == Seq("id", "value"))
    assert(spark.read.parquet(out).count() == 2)
  }

  test("splitRows / splitFields return named collections") {
    val frame = ctx.readParquet(s"${SparkFixture.sfDir}/orders.parquet")
    val rows = frame.splitRows(Map("o_totalprice" -> Map(">" -> 1000)))
    assert(rows("matched").count() + rows("unmatched").count() == frame.count())
    val fields = frame.splitFields(Seq("o_orderkey", "o_orderstatus"))
    assert(fields("selected").df.columns.length == 2)
    assert(!fields("remaining").df.columns.contains("o_orderkey"))
  }

  test("record-level ops keep the error channel through the facade") {
    val frame = GraftFrame(graft.core.GlueFrame(
      Seq((1L, "a"), (2L, "boom")).toDF("id", "s")))
    val filtered = frame.filterRecords({ r =>
      if (r.getString(1) == "boom") throw new RuntimeException("x")
      true
    }, transformationCtx = "fx")
    assert(filtered.count() == 1)
    assert(filtered.errorsCount() == 1)
    assert(filtered.stageErrorsCount("fx") == 1)
    intercept[IllegalStateException](filtered.assertErrorThreshold(0, 10))
  }

  test("join / merge / union parity methods") {
    val o = ctx.readParquet(s"${SparkFixture.sfDir}/orders.parquet")
      .selectFields(Seq("o_orderkey", "o_custkey"))
    val c = ctx.readParquet(s"${SparkFixture.sfDir}/customer.parquet")
      .selectFields(Seq("c_custkey", "c_name"))
    val joined = o.join(Seq("o_custkey"), Seq("c_custkey"), c)
    assert(joined.df.columns.toSeq ==
      Seq("o_orderkey", "o_custkey", "c_custkey", "c_name"))
    assert(joined.count() == o.count()) // every order has a customer
    val u = o.union(o)
    assert(u.count() == 2 * o.count())
  }

  test("saltedJoin is result-identical to the plain equi-join") {
    // skewed left: 90% of rows share one key
    val left = (1 to 200).map(i =>
      (if (i <= 180) 7L else i.toLong % 5, s"l$i")).toDF("lk", "lv")
    val right = Seq((7L, "hot"), (1L, "r1"), (2L, "r2"), (9L, "miss"))
      .toDF("rk", "rv")
    val plain = graft.operators.Joins
      .equiJoin(left, Seq("lk"), right, Seq("rk"))
      .collect().map(_.toSeq).toSet
    val salted = graft.operators.Joins
      .saltedJoin(left, Seq("lk"), right, Seq("rk"), salts = 8)
      .collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(plain.nonEmpty)
  }

  test("asOfJoin attaches the latest right row at or before left time") {
    val left = Seq((1L, 10L, "e1"), (1L, 20L, "e2"), (1L, 5L, "e0"),
      (2L, 50L, "e3")).toDF("k", "t", "name")
    val right = Seq((1L, 10L, 100.0), (1L, 15L, 150.0), (2L, 60L, 600.0))
      .toDF("k", "rt", "v")
    val out = graft.operators.Joins.asOfJoin(left, right, Seq("k"), "t", "rt")
    assert(out.columns.toSeq == Seq("k", "t", "name", "v"))
    val got = out.select($"name", $"v").as[(String, Option[Double])]
      .collect().toMap
    assert(got("e0").isEmpty)         // before the first right row
    assert(got("e1").contains(100.0)) // inclusive at equal time
    assert(got("e2").contains(150.0)) // greatest rt <= 20
    assert(got("e3").isEmpty)         // right row is in the future
  }

  test("asOfJoin matches a brute-force reference on random data") {
    val rnd = new scala.util.Random(7)
    val left = (1 to 300).map(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(100).toLong, i.toLong))
    val right = (1 to 80).map(i =>
        (rnd.nextInt(5).toLong, rnd.nextInt(100).toLong, i.toLong * 10))
      .groupBy(r => (r._1, r._2)).map(_._2.maxBy(_._3)).toSeq // unique (k,t)
    val got = graft.operators.Joins.asOfJoin(
        left.toDF("k", "t", "lid"), right.toDF("k", "rt", "payload"),
        Seq("k"), "t", "rt")
      .select($"lid", $"payload").as[(Long, Option[Long])].collect().toMap
    assert(got.size == left.size)
    left.foreach { case (k, t, lid) =>
      val expect = right.filter(r => r._1 == k && r._2 <= t)
        .sortBy(_._2).lastOption.map(_._3)
      assert(got(lid) == expect, s"lid=$lid k=$k t=$t")
    }
  }

  test("rangeJoin matches a brute-force BETWEEN join and plans no nested loop") {
    val rnd = new scala.util.Random(13)
    val pts = (1 to 400).map(i => (i.toLong, rnd.nextInt(1000).toLong))
    val ivs = (1 to 60).map { i =>
      val lo = rnd.nextInt(1000).toLong
      (i.toLong, lo, lo + rnd.nextInt(40).toLong - 5) // some hi < lo
    }
    val got = graft.operators.Joins.rangeJoin(
        pts.toDF("pid", "p"), ivs.toDF("iid", "lo", "hi"),
        "p", "lo", "hi", bucketWidth = 16)
      .select($"pid", $"iid").as[(Long, Long)].collect().sorted.toSeq
    val expect = (for {
      (pid, p) <- pts; (iid, lo, hi) <- ivs if p >= lo && p <= hi
    } yield (pid, iid)).sorted
    assert(got == expect)
    // the rewrite must be an equi-join on the bucket id, never a
    // broadcast nested loop / cartesian over the range predicate
    val plan = graft.operators.Joins.rangeJoin(
        pts.toDF("pid", "p"), ivs.toDF("iid", "lo", "hi"),
        "p", "lo", "hi", bucketWidth = 16)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("topNPerKey matches per-key sort-take and aggregates partially") {
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(99)
    val rows = (1 to 2000).map(i =>
      (rnd.nextInt(7).toLong, rnd.nextInt(400), i.toLong))
    val df = rows.toDF("k", "v", "id").repartition(8)
    val out = graft.operators.TopN.topNPerKey(
      df, Seq("k"), Seq(col("v"), col("id")), n = 5)
    assert(out.columns.toSeq == Seq("k", "v", "id"))
    val got = out.as[(Long, Int, Long)].collect().toSet
    val expect = rows.groupBy(_._1).values
      .flatMap(_.sortBy(r => (r._2, r._3)).take(5)).toSet
    assert(got == expect)
    // plan: a partial top_k heap runs BEFORE the exchange (object hash
    // aggregate), and no window sort of the full input exists
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"))
    assert(plan.contains("partial_top_k"))
    assert(!plan.contains("Window"))
    // descending sense via negation; string payloads round-trip the
    // spill serializer
    val s = Seq(("a", 3L, "x3"), ("a", 9L, "x9"), ("a", 5L, "x5"),
      ("b", 1L, "y1")).toDF("g", "score", "tag").repartition(4)
    val top = graft.operators.TopN.topNPerKey(
        s, Seq("g"), Seq(col("score") * -1), n = 2)
      .select("g", "score", "tag").as[(String, Long, String)]
      .collect().toSet
    assert(top == Set(("a", 9L, "x9"), ("a", 5L, "x5"), ("b", 1L, "y1")))
  }

  test("physical passthroughs: repartition / coalesce / minPartitions") {
    val frame = ctx.readParquet(s"${SparkFixture.sfDir}/lineitem.parquet")
    assert(frame.repartition(6).getNumPartitions == 6)
    assert(frame.repartition(6).coalesce(2).getNumPartitions == 2)
    assert(frame.repartition(6).coalesce(12).getNumPartitions == 6) // narrow
    assert(frame.repartition(6).coalesce(12, shuffle = true)
      .getNumPartitions == 12)
    assert(PhysicalOps.getNumPartitions(
      PhysicalOps.withMinPartitions(frame.df, 4)) >= 4)
  }

  test("spigot tees a sample and passes the frame through") {
    val out = Files.createTempDirectory("graft_spigot").toString + "/s"
    val frame = ctx.readParquet(s"${SparkFixture.sfDir}/nation.parquet")
    val through = frame.spigot(out, topk = 5)
    assert(through.count() == 25)
    assert(spark.read.json(out).count() == 5)
  }

  test("spigot executes the upstream plan once (persisted tee)") {
    val acc = spark.sparkContext.longAccumulator("upstream_rows")
    val upstream = ctx.readParquet(s"${SparkFixture.sfDir}/nation.parquet")
      .df.select(col("n_nationkey"))
      .map { r => acc.add(1); r.getInt(0) }(org.apache.spark.sql.Encoders.scalaInt)
      .toDF("k")
    val out = Files.createTempDirectory("graft_spigot_once").toString + "/s"
    val through = graft.sources.Sinks.spigot(upstream, out, topk = 5)
    assert(through.count() == 25)   // main flow after the tee
    assert(acc.value <= 25,         // each row computed at most once
      s"upstream re-executed: ${acc.value} evaluations for 25 rows")
    through.unpersist()
  }

  test("catalog sink + source round-trip (S4/S10)") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    spark.sql("DROP TABLE IF EXISTS graft_cat_t")
    // the in-memory catalog forgets tables across JVMs but their
    // managed locations persist — clear any leftover
    val loc = java.nio.file.Paths.get("spark-warehouse/graft_cat_t")
    if (java.nio.file.Files.exists(loc)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.delete(p))
    }
    graft.sources.Sinks.write(df, "catalog",
      options = Map("table" -> "graft_cat_t"))
    val back = graft.sources.Sources.fromCatalog(spark, "default", "graft_cat_t")
    assert(back.count() == 2)
    // push-down predicate is sugar for where()
    assert(graft.sources.Sources.fromCatalog(spark, "default", "graft_cat_t",
      pushDownPredicate = Some(col("id") === 1L)).count() == 1)
  }

  test("sampled source caps rows (S5/A3)") {
    val frame = ctx.readParquet(s"${SparkFixture.sfDir}/orders.parquet")
    assert(ctx.sampleFrame(frame, 7).count() == 7)
  }

  test("withFrameSchema attaches a declared schema (R9)") {
    val f = Files.createTempFile("graft_r9", ".tsv")
    Files.write(f, "1\tx\n2\ty".getBytes)
    val typed = ctx.withFrameSchema(
      ctx.readTsv(f.toString).renameField("_c0", "id").renameField("_c1", "v"),
      "id INT, v STRING")
    assert(typed.df.schema("id").dataType ==
      org.apache.spark.sql.types.IntegerType)
    assert(typed.df.select(sum(col("id"))).collect().head.getLong(0) == 3L)
  }

  test("fromRdd wraps Row and case-class RDDs (S6)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("v", StringType)))
    val rows = spark.sparkContext.parallelize(Seq(Row(1L, "a"), Row(2L, "b")))
    val df = graft.sources.Sources.fromRdd(spark, rows, schema)
    assert(df.columns.toSeq == Seq("id", "v"))
    assert(df.count() == 2)
    val prods = spark.sparkContext.parallelize(Seq((3L, "c"), (4L, "d")))
    assert(graft.sources.Sources.fromRdd(spark, prods).count() == 2)
  }

  test("transform registry lists all 22 reference transforms (C5)") {
    import graft.operators.TransformRegistry
    // ALL_TRANSFORMS, awsglue/transforms/__init__.py:30-33
    val expected = Set("Unbox", "RenameField", "DropFields", "SplitFields",
      "SelectFields", "SplitRows", "UnnestFrame", "Relationalize",
      "SelectFromCollection", "MapToCollection", "ErrorsAsDynamicFrame",
      "FlatMap", "DropNullFields", "Join", "ApplyMapping", "Repartition",
      "ResolveChoice", "Spigot", "Filter", "Map", "Coalesce", "Union")
    assert(TransformRegistry.names.toSet == expected)
    assert(TransformRegistry.names.length == 22)
    // case-insensitive lookup like get_transform (__init__.py:40-42)
    assert(TransformRegistry.getTransform("resolvechoice").isDefined)
    assert(TransformRegistry.getTransform("nope").isEmpty)
    // describe emits parseable JSON with the transform.py:76-83 shape
    val json = TransformRegistry.describeTransform("ApplyMapping")
    assert(json.contains("\"name\": \"ApplyMapping\""))
    assert(json.contains("\"args\""))
    assert(json.contains("\"location\": \"graft.operators.FieldOps.applyMapping\""))
    assert(TransformRegistry.describeTransform("nope") == "{}")
  }

  test("profile computes exact per-column stats; approxProfile agrees on shape") {
    import graft.operators.Profile
    val df = Seq(
      (1L, Some(10.5), "a"), (2L, Some(10.5), "b"),
      (3L, None, "a"), (4L, Some(-2.0), "c")
    ).toDF("k", "v", "s")
    val p = Profile.profile(df, Seq("k", "v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(p("k") == ((4L, 4L, 1.0, 4.0)))
    assert(p("v") == ((3L, 2L, -2.0, 10.5)))
    // approx variant: same schema, same row set, nulls/min/max exact,
    // HLL++ distinct within its rsd on tiny cardinalities (= exact here)
    val a = Profile.approxProfile(df, Seq("k", "v"))
    assert(a.schema == Profile.profile(df, Seq("k", "v")).schema)
    val am = a.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(am("k")._1 == 4L && am("k")._3 == 1.0 && am("k")._4 == 4.0)
    assert(am("k")._2 == 4L && am("v")._2 == 2L)
  }

  test("partitioned parquet read-back prunes partitions in the scan") {
    val path = "target/tmp_part_spec/t"
    Seq((1L, "a"), (2L, "a"), (3L, "b"))
      .toDF("k", "p")
      .write.mode("overwrite").partitionBy("p").parquet(path)
    val rd = spark.read.parquet(path).filter($"p" === "a")
    assert(rd.count() == 2L)
    // the partition predicate must land in PartitionFilters (pruned at
    // planning — directories for p=b are never listed into tasks), not
    // in a post-scan Filter
    val scan = rd.queryExecution.executedPlan.toString()
    assert(scan.contains("PartitionFilters") &&
      scan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("(p"), s"partition filter not pushed:\n$scan")
  }

  test("SQL functions register from the shared registry") {
    // getOrCreate in this JVM returns the fixture session, so drive the
    // live-session path; GraftExtensions wraps the same registry
    GraftFunctions.register(spark)
    val got = spark.sql(
      "SELECT simhash64('a b c') AS s, size(shingle_hashes('a b c d', 2)) AS n," +
      " size(minhash_signature(shingle_hashes('a b c d', 2), 16)) AS m," +
      " sorted_intersect_count(array(1L, 3L, 5L), array(3L, 4L, 5L)) AS i," +
      " dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d," +
      " bounded_levenshtein('kitten', 'sitting', 3) AS bl," +
      " bounded_levenshtein('kitten', 'sitting', 2) AS blm")
      .collect().head
    assert(got.getAs[Long]("s") != 0L)
    assert(got.getAs[Int]("n") == 3)
    assert(got.getAs[Int]("m") == 16)
    assert(got.getAs[Int]("i") == 2)
    assert(got.getAs[Double]("d") == 11.0)
    assert(got.getAs[Int]("bl") == 3)
    assert(got.getAs[Int]("blm") == -1)
  }
}
