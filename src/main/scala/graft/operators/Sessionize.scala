package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based batch sessionization over event streams at rest: group a
  * key's events into sessions split wherever the inter-event gap
  * exceeds a threshold — the batch twin of the streaming session
  * windows in [[graft.streaming.EventTime]].
  *
  * Shape: ONE shuffle on the session key, then two window passes over
  * the same (key, ts) sort order (Spark executes both in a single
  * Sort + Window chain — the second window reuses the first's
  * ordering, no re-shuffle, no re-sort). No self-join, no range
  * blow-up: cost is sort-per-key-group, which survives a 100 TB event
  * table the same way any keyed window does. Skewed whale users are
  * the usual caveat — cap per-key history upstream or pre-split by
  * day before sessionizing.
  */
object Sessionize {

  /** Tag every event with its per-key session index (1-based, in time
    * order). `tsCol` must be numeric (epoch nanos/micros/seconds —
    * whatever unit, `gap` is in the same unit); a new session starts
    * when the gap since the key's previous event exceeds `gap`.
    * Ordering ties on (key, ts) are stable for session ASSIGNMENT
    * (equal timestamps never exceed the gap, so ties land in the same
    * session and the index is deterministic).
    */
  def sessionize(
      df: DataFrame, keyCol: String, tsCol: String, gap: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
    val boundary = when(
      lag(col(tsCol), 1).over(w).isNull ||
        col(tsCol) - lag(col(tsCol), 1).over(w) > gap, 1).otherwise(0)
    df.withColumn("session_seq",
      sum(boundary).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Collapse to one row per session: key, session index, start/end
    * timestamps, event count. Built on [[sessionize]] plus one
    * aggregation keyed on (key, session_seq) — map-side combine
    * collapses each partition's share of a session before the shuffle.
    */
  def sessions(
      df: DataFrame, keyCol: String, tsCol: String, gap: Long): DataFrame =
    sessionize(df, keyCol, tsCol, gap)
      .groupBy(col(keyCol), col("session_seq"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"))
}
