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
    import graft.ml.Dedup

    val d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id"), col("text"))
    val doubled = d.unionByName(d.withColumn("doc_id", col("doc_id") + 100000))

    val withBands = doubled
      .select(col("doc_id"),
        Dedup.shingleHashes(col("text"), 3).as("__sh"))
      .select(col("doc_id"),
        Dedup.minhashSignature(col("__sh"), 64).as("__sig"))
      .select(col("doc_id"), col("__sig"),
        Dedup.lshBandKeys(col("__sig"), 16, 4).as("__bands"))
      .persist()

    val exploded = withBands.select(col("doc_id"),
      posexplode(col("__bands")).as(Seq("bandIdx", "band")))

    // buckets (by HASH, as minhashDedup groups) that contain 1862
    val b1862 = exploded.filter(col("doc_id") === 1862)
      .select(col("bandIdx").as("bi1862"), col("band"))
    val mates = exploded.join(b1862, "band")
      .filter(col("doc_id") < 1862)
      .select(col("doc_id"), col("bandIdx"), col("bi1862"), col("band"))
    println("[scratch] smaller-id bucket mates of 1862 (by hash):")
    mates.show(20, truncate = false)

    // the signatures of 1862 and any mate
    val ids = 1862L +: mates.select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSeq
    println("[scratch] signatures (band slices of 4):")
    withBands.filter(col("doc_id").isin(ids: _*))
      .select(col("doc_id"), col("__sig"))
      .collect().foreach { r =>
        val sig = r.getSeq[Long](1)
        println(s"[scratch] doc=${r.getLong(0)} " +
          sig.grouped(4).zipWithIndex
            .map { case (g, i) => s"b$i:${g.mkString(",")}" }.mkString(" "))
      }
    spark.stop()
  }
}
