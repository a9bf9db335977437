package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time operations (SURVEY §2.7 T3/T4 — beyond-parity exposure).
  *
  * The reference only has processing-time micro-batches (trigger =
  * windowSize); real event-time semantics — tumbling/sliding windows,
  * watermarked late-data handling, within-watermark dedup — are Spark
  * built-ins that this engine exposes as first-class operators. Works
  * identically on batch frames (no watermark) and streaming frames.
  */
object EventTime {

  /** Nanos-since-epoch → timestamp (for events tables carrying
    * TIMESTAMP(NANOS), surfaced as long via nanosAsLong).
    */
  def nanosToTimestamp(c: Column): Column = timestamp_micros((c / 1000).cast("long"))

  /** Event-time column → TimestampType regardless of how the source
    * shipped it: nanos-long (TIMESTAMP(NANOS) under nanosAsLong) maps
    * through [[nanosToTimestamp]]; native timestamp flavors
    * (TIMESTAMP / TIMESTAMP_NTZ, micros) just cast.
    */
  def asTimestamp(df: DataFrame, c: String): Column =
    df.schema(c).dataType match {
      case org.apache.spark.sql.types.LongType => nanosToTimestamp(col(c))
      case _ => col(c).cast("timestamp")
    }

  /** Tumbling (or sliding, when `slide` is given) event-time windowed
    * aggregation. On a streaming frame, set `watermark` to bound state
    * and admit late data up to that delay.
    */
  def windowedAgg(
      df: DataFrame,
      tsCol: String,
      windowDuration: String,
      aggs: Seq[Column],
      groupBy: Seq[Column] = Nil,
      slide: Option[String] = None,
      watermark: Option[String] = None): DataFrame = {
    val withWm = watermark.fold(df)(w => df.withWatermark(tsCol, w))
    val win = slide match {
      case Some(s) => window(col(tsCol), windowDuration, s)
      case None    => window(col(tsCol), windowDuration)
    }
    withWm.groupBy(win +: groupBy: _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Session windows: gap-based grouping per key. */
  def sessionAgg(
      df: DataFrame, tsCol: String, gap: String,
      keys: Seq[Column], aggs: Seq[Column],
      watermark: Option[String] = None): DataFrame = {
    val withWm = watermark.fold(df)(w => df.withWatermark(tsCol, w))
    withWm.groupBy(session_window(col(tsCol), gap) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Event-time dedup that tolerates late duplicates up to the
    * watermark (dropDuplicatesWithinWatermark on streams; plain
    * dropDuplicates on batch frames).
    */
  def dedupWithinWatermark(
      df: DataFrame, keys: Seq[String], tsCol: String,
      watermark: String): DataFrame =
    if (df.isStreaming)
      df.withWatermark(tsCol, watermark).dropDuplicatesWithinWatermark(keys)
    else df.dropDuplicates(keys)

  /** Streaming near-duplicate filter: drop documents whose SimHash
    * fingerprint was already seen within the watermark. The signature
    * is a codegen'd per-row kernel (no shuffle added beyond the dedup
    * state store); state is keyed by one 8-byte long per kept doc and
    * ages out with the watermark — bounded regardless of stream
    * length. Hamming-0 (exact and trivially-rewritten) duplicates
    * drop; near-dups beyond bit-identity need the batch
    * [[graft.ml.Dedup.simhashDedup]] bucket pass.
    */
  def nearDupFilterWithinWatermark(
      df: DataFrame, textCol: String, tsCol: String,
      watermark: String): DataFrame = {
    val sig = df.withColumn("__simhash",
      graft.ml.Dedup.simhash64(col(textCol)))
    val deduped =
      if (df.isStreaming)
        sig.withWatermark(tsCol, watermark)
          .dropDuplicatesWithinWatermark(Seq("__simhash"))
      else sig.dropDuplicates("__simhash")
    deduped.drop("__simhash")
  }
}
