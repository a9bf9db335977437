package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.storage.StorageLevel

/** Micro-batch driver (SURVEY §2.7 T1-T3).
  *
  * Re-expresses the reference's forEachBatch wrapper
  * (awsglue/context.py:602-664): persist each batch (configurable
  * storage level, default MEMORY_AND_DISK), skip empty batches, record
  * per-batch metrics (numRecords, processing time), retry the user
  * function up to `batchMaxRetries` ∈ [0,100] (default 3) with backoff
  * min(attempt,5)s resetting on success, fixed processing-time trigger
  * equal to `windowSize`, mandatory checkpointLocation.
  *
  * Structured-Streaming-first: this wraps `writeStream.foreachBatch`,
  * so state, offsets and exactly-once bookkeeping come from Spark's
  * checkpoint machinery; the wrapper only adds the Glue batch policy.
  * Event-time windows / watermarks / stateful ops are exposed by Spark
  * directly (T4 — beyond-parity, nothing to wrap).
  */
object MicroBatch {

  final case class BatchMetrics(
      batchId: Long,
      numRecords: Long,
      processingTimeMs: Long,
      attempts: Int)

  /** Parse "5 seconds" / "2 minutes" / "1 hour" shaped window sizes
    * (context.py:562-581).
    */
  def parseWindowMillis(windowSize: String): Long = {
    val parts = windowSize.trim.toLowerCase.split("\\s+")
    require(parts.length == 2, s"bad windowSize: $windowSize")
    val n = parts(0).toLong
    val unit = parts(1) match {
      case "second" | "seconds" => 1000L
      case "minute" | "minutes" => 60000L
      case "hour" | "hours"     => 3600000L
      case other => throw new IllegalArgumentException(s"bad unit: $other")
    }
    n * unit
  }

  /** The Glue batch policy around a user batch function. Exposed
    * separately so tests can drive it without a streaming query.
    */
  def runBatch(
      batch: Dataset[Row],
      batchId: Long,
      batchFn: (Dataset[Row], Long) => Unit,
      batchMaxRetries: Int,
      storageLevel: StorageLevel,
      onMetrics: BatchMetrics => Unit,
      sleepMs: Long => Unit = ms => Thread.sleep(ms)): Unit = {
    require(batchMaxRetries >= 0 && batchMaxRetries <= 100,
      s"batchMaxRetries must be in [0,100], got $batchMaxRetries") // context.py:643
    batch.persist(storageLevel)
    try {
      if (batch.take(1).nonEmpty) { // empty-batch skip, context.py:632
        var attempt = 0
        var done    = false
        val t0      = System.nanoTime()
        while (!done) {
          try {
            batchFn(batch, batchId)
            done = true
          } catch {
            case scala.util.control.NonFatal(e) =>
              attempt += 1
              if (attempt > batchMaxRetries) throw e
              sleepMs(math.min(attempt, 5) * 1000L) // backoff, context.py:644-645
          }
        }
        onMetrics(BatchMetrics(batchId, batch.count(),
          (System.nanoTime() - t0) / 1000000L, attempt + 1))
      }
    } finally batch.unpersist()
  }

  /** forEachBatch (context.py:602-664): start the wrapped query. */
  def forEachBatch(
      df: DataFrame,
      batchFn: (Dataset[Row], Long) => Unit,
      windowSize: String,
      checkpointLocation: String,
      batchMaxRetries: Int = 3,
      storageLevel: StorageLevel = StorageLevel.MEMORY_AND_DISK,
      onMetrics: BatchMetrics => Unit = _ => ()): StreamingQuery = {
    require(checkpointLocation != null && checkpointLocation.nonEmpty,
      "checkpointLocation is mandatory")
    df.writeStream
      .foreachBatch((b: Dataset[Row], id: java.lang.Long) =>
        runBatch(b, id, batchFn, batchMaxRetries, storageLevel, onMetrics))
      .trigger(Trigger.ProcessingTime(parseWindowMillis(windowSize)))
      .option("checkpointLocation", checkpointLocation)
      .start()
  }

  /** getSampleStreamingDynamicFrame (T2, context.py:553-599): run the
    * stream into a memory sink for one polling window, return the first
    * `recordPollingLimit` rows as a batch frame. The reference's
    * validation at context.py:584-585 is inverted (raises unless
    * windowSize ≥ pollingTime); we implement the documented contract —
    * polling must cover at least one window.
    */
  def sampleStream(
      spark: SparkSession,
      stream: DataFrame,
      windowSize: String = "1 seconds",
      pollingTimeMs: Long = 10000,
      recordPollingLimit: Int = 100): DataFrame = {
    require(pollingTimeMs >= parseWindowMillis(windowSize),
      "pollingTimeMs must cover at least one window")
    val name = s"graft_sample_${System.nanoTime()}"
    val q = stream.writeStream
      .format("memory").queryName(name)
      .trigger(Trigger.ProcessingTime(parseWindowMillis(windowSize)))
      .start()
    try {
      val deadline = System.currentTimeMillis() + pollingTimeMs
      var out = spark.sql(s"SELECT * FROM $name LIMIT $recordPollingLimit")
      while (out.isEmpty && System.currentTimeMillis() < deadline) {
        Thread.sleep(math.min(200L, pollingTimeMs))
        out = spark.sql(s"SELECT * FROM $name LIMIT $recordPollingLimit")
      }
      // materialize before stopping the query
      val rows = out.collect()
      spark.createDataFrame(
        java.util.Arrays.asList(rows: _*), stream.schema)
    } finally q.stop()
  }
}
