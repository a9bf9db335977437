package graft

import org.apache.spark.sql.SparkSession

/** Local stand-in for the driver's t1 smoke: run SparkEntry.entry and
  * assert rows > 0. Usage: sbt "runMain graft.Smoke".
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n  = df.count()
    df.show(5, truncate = false)
    println(s"[smoke] entry rows=$n " + (if (n > 0) "OK" else "EMPTY"))

    // Pipeline replay surface: the reference's DimProductCategory load
    // against its own extract, twice (second run must insert 0).
    val refExtract = "/root/reference/data/ProductCategory.csv"
    if (new java.io.File(refExtract).exists()) {
      import graft.pipeline.StarLoad
      val spec = StarLoad.DimSpec(
        table = "DimProductCategory",
        inputPath = refExtract,
        columnNames = Seq("productCategorykey", "name", "rowGuid", "modifiedDate"),
        projection = Seq("productCategorykey", "rowGuid"),
        renames = Map("rowGuid" -> "productCategoryAlternateKey"),
        casts = Map("productCategorykey" -> "int"),
        businessKeys = Seq("productCategorykey"))
      val whDir = java.nio.file.Files.createTempDirectory("graft_smoke_wh")
      val wh    = new StarLoad.ParquetWarehouse(spark, whDir.toString)
      val first  = StarLoad.loadDim(spark, spec, wh)
      val second = StarLoad.loadDim(spark, spec, wh)
      println(s"[smoke] dim replay first=$first second=$second " +
        (if (first == 4 && second == 0) "OK" else "UNEXPECTED"))
    }

    // Streaming surface: events through the micro-batch driver.
    {
      import graft.streaming.MicroBatch
      import org.apache.spark.sql.{Dataset, Row}
      val src = java.nio.file.Files.createTempDirectory("graft_smoke_src").toString
      val ckp = java.nio.file.Files.createTempDirectory("graft_smoke_ckp").toString
      val events = spark.read
        .parquet("/root/testdata/sf0.001/events.parquet")
        .select("event_id", "event_type", "value")
      events.write.mode("overwrite").parquet(src)
      val stream = spark.readStream.schema(events.schema).parquet(src)
      val seen = new java.util.concurrent.atomic.AtomicLong(0)
      val q = MicroBatch.forEachBatch(stream,
        (b: Dataset[Row], _: Long) => { seen.addAndGet(b.count()); () },
        windowSize = "1 seconds", checkpointLocation = ckp)
      try q.processAllAvailable() finally q.stop()
      println(s"[smoke] streaming rows=${seen.get()} " +
        (if (seen.get() == events.count()) "OK" else "UNEXPECTED"))
    }

    spark.stop()
    if (n <= 0) sys.exit(1)
  }
}
