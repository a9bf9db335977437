package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bucketing

/** Bucketed co-located joins: same content as a plain join, and —
  * the point — zero Exchange operators in the physical plan when
  * both sides share the bucket layout.
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  /** Drop the table and its managed location (a crashed earlier run
    * can leave the directory behind with no catalog entry).
    */
  private def fresh(table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val dir = new java.io.File(s"spark-warehouse/$table")
    if (dir.exists()) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(dir)
    }
  }

  /** Count shuffle exchanges in the FINAL (post-AQE) plan; the action
    * runs first so adaptive planning has resolved.
    */
  private def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect()
    // ShuffleExchangeExec renders as "Exchange hashpartitioning(...)";
    // don't count broadcast or reused exchanges
    "Exchange (hash|range|Single)".r
      .findAllIn(df.queryExecution.executedPlan.toString).size
  }

  test("bucketed join is shuffle-free and matches the plain join") {
    val left = (1 to 1000).map(i => (i % 97, s"l$i")).toDF("k", "lv")
    val right = (1 to 500).map(i => (i % 97, i * 2)).toDF("k", "rv")
    fresh("bspec_left"); fresh("bspec_right")
    Bucketing.writeBucketed(left, "bspec_left", Seq("k"), 8, sortCols = Seq("k"))
    Bucketing.writeBucketed(right, "bspec_right", Seq("k"), 8, sortCols = Seq("k"))

    val bucketed = Bucketing.bucketedJoin(spark, "bspec_left", "bspec_right", Seq("k"))
    // disable broadcast so the comparison join actually shuffles
    val plain = left.hint("merge").join(right, Seq("k"))

    assert(shuffles(bucketed) == 0, "bucketed join must not exchange")
    assert(shuffles(plain) > 0, "comparison merge join should exchange")

    val norm = (df: org.apache.spark.sql.DataFrame) =>
      df.select("k", "lv", "rv").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getInt(2))).sorted.toSeq
    assert(norm(bucketed) == norm(plain))

    spark.sql("DROP TABLE bspec_left")
    spark.sql("DROP TABLE bspec_right")
  }

  test("aggregation on the bucket key reuses the stored layout") {
    val df = (1 to 1000).map(i => (i % 31, i.toLong)).toDF("k", "v")
    fresh("bspec_agg")
    Bucketing.writeBucketed(df, "bspec_agg", Seq("k"), 4)
    val agg = spark.table("bspec_agg").groupBy("k").sum("v")
    assert(shuffles(agg) == 0, "groupBy on bucket key must not exchange")
    assert(agg.count() == 31)
    spark.sql("DROP TABLE bspec_agg")
  }

  test("writer produces one file per bucket, not one per task") {
    val df = (1 to 200).map(i => (i, i.toString)).toDF("k", "v")
    fresh("bspec_files")
    Bucketing.writeBucketed(df, "bspec_files", Seq("k"), 4)
    val loc = spark.sql("DESCRIBE EXTENDED bspec_files")
      .filter($"col_name" === "Location").head.getString(1)
    val files = new java.io.File(new java.net.URI(loc)).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files == 4, s"expected 4 bucket files, found $files")
    spark.sql("DROP TABLE bspec_files")
  }
}
