package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.StarLoad
import graft.pipeline.StarLoad.JdbcWarehouse
import graft.sources.{Sinks, Sources}

/** S2/S9 JDBC source/sink exercised against embedded Derby (bundled
  * with the Spark distribution) — the same DataFrameReader/Writer
  * path a Redshift/Postgres URL takes, minus the COPY staging that is
  * an environment concern (SURVEY §7.3).
  */
class JdbcSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private val url    = "jdbc:derby:memory:graftjdbc;create=true"
  private val driver = "org.apache.derby.iapi.jdbc.AutoloadedDriver"
  private def opts(table: String) = Map(
    "url" -> url, "dbtable" -> table, "driver" -> driver)

  test("jdbc sink append + source read round-trips (S2/S9)") {
    val df = Seq((1, 100.5), (2, 200.25)).toDF("id", "total")
    Sinks.write(df, "jdbc", options = opts("t_roundtrip"))
    val back = Sources.source(spark, "jdbc", options = opts("t_roundtrip"))
    assert(back.count() == 2)
    assert(back.filter(col("id") === 2).select("total").as[Double]
      .head() == 200.25)
    // append semantics: a second write adds rows, never replaces
    Sinks.write(df, "jdbc", options = opts("t_roundtrip"))
    assert(Sources.source(spark, "jdbc", options = opts("t_roundtrip"))
      .count() == 4)
  }

  test("JdbcWarehouse dim load is incremental and idempotent over JDBC") {
    val wh = new JdbcWarehouse(spark, Map("url" -> url, "driver" -> driver))
    assert(wh.read("t_dim_missing").isEmpty) // first-load branch
    val spec = StarLoad.DimSpec(
      table = "t_dim",
      inputPath = writeTsv(Seq("1\t{AAA}", "2\t{BBB}", "3\t{CCC}")),
      columnNames = Seq("k", "guid"),
      projection = Seq("k", "guid"),
      casts = Map("k" -> "int"),
      businessKeys = Seq("k"))
    assert(StarLoad.loadDim(spark, spec, wh) == 3L)
    assert(StarLoad.loadDim(spark, spec, wh) == 0L) // idempotent over JDBC
    val more = spec.copy(inputPath =
      writeTsv(Seq("2\t{BBB}", "4\t{DDD}")))
    assert(StarLoad.loadDim(spark, more, wh) == 1L) // only the new key
    assert(wh.read("t_dim").get.count() == 4L)
  }

  test("jdbcPartitioned reads through parallel range scans") {
    val df = (1 to 40).map(i => (i, s"row$i")).toDF("id", "v")
    Sinks.write(df, "jdbc", options = opts("t_ranged"))
    val back = Sources.jdbcPartitioned(spark, url, "t_ranged",
      partitionColumn = "id", lowerBound = 1L, upperBound = 41L,
      numPartitions = 4,
      options = Map("driver" -> driver))
    // the scan itself is split: >1 input partition, each a range query
    assert(back.rdd.getNumPartitions == 4)
    // bounds steer the split only — rows outside them still load
    val narrow = Sources.jdbcPartitioned(spark, url, "t_ranged",
      partitionColumn = "id", lowerBound = 10L, upperBound = 20L,
      numPartitions = 3,
      options = Map("driver" -> driver))
    assert(narrow.count() == 40)
    assert(back.select(sum(col("id"))).as[Long].head() == (1 to 40).sum)
  }

  test("staged jdbc write: stage once, reload retry-safe (S9 COPY shape)") {
    val staging = java.nio.file.Files
      .createTempDirectory("graft-staging").toString + "/t"
    val df = Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v")
    Sinks.writeJdbcStaged(df, staging, opts("t_staged"),
      keyColumns = Seq("id"))
    def loaded() =
      Sources.source(spark, "jdbc", options = opts("t_staged")).count()
    assert(loaded() == 3)
    // retrying the LOAD phase from the same staged files (the
    // crashed-mid-load scenario) must not duplicate keyed rows
    Sinks.loadStagedJdbc(spark, staging, opts("t_staged"),
      keyColumns = Seq("id"))
    assert(loaded() == 3)
    // without keys the load is COPY's plain bulk append
    Sinks.loadStagedJdbc(spark, staging, opts("t_staged"))
    assert(loaded() == 6)
  }

  private def writeTsv(rows: Seq[String]): String = {
    val f = java.nio.file.Files.createTempFile("graft_jdbc", ".tsv")
    java.nio.file.Files.write(f, rows.mkString("\n").getBytes("UTF-8"))
    f.toString
  }
}
