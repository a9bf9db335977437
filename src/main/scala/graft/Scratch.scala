package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway diagnostics main (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Ad-hoc timing of one query in isolation:
    //   sbt "runMain graft.Scratch q41_jaccard_pairs /root/testdata/sf0.1"
    // SPARK_GRAFT_EXPLAIN=1 additionally prints the formatted plan.
    val name  = if (args.length > 0) args(0) else "q01_agg"
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    SparkEntry.queries.get(name).foreach { fn =>
      if (sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1"))
        fn(spark, sfDir).explain("formatted")
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val n  = df.queryExecution.toRdd.count()
      println(f"[scratch] $name: rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
      // post-execution: the FINAL adaptive plan (shows ReusedExchange)
      if (sys.env.get("SPARK_GRAFT_EXPLAIN").contains("2"))
        println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
