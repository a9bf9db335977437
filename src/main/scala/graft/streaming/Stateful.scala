package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Custom keyed state (SURVEY §2.7 T4, beyond-parity): arbitrary
  * per-key state via mapGroupsWithState / flatMapGroupsWithState.
  *
  * State lives in the stream's checkpointed state store, partitioned by
  * key — nothing accumulates on the driver, so keyed-state operators
  * scale with executors like any shuffle. Both operators also run on
  * batch frames (state is then per-job, which degenerates to a plain
  * aggregation — same results, no checkpoint needed).
  */
object Stateful {

  final case class KeyTotals(key: String, count: Long, sum: Double)

  /** Running per-key (count, sum) maintained across micro-batches:
    * each batch emits the updated totals for the keys it touched
    * (update-mode semantics).
    */
  def runningTotals(
      df: DataFrame, keyCol: String, valueCol: String): Dataset[KeyTotals] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("string"), col(valueCol).cast("double"))
      .as[(String, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Double), KeyTotals](
        GroupStateTimeout.NoTimeout) {
        case (k, rows, state) =>
          var (c, s) = state.getOption.getOrElse((0L, 0.0))
          rows.foreach { r => c += 1L; s += r._2 }
          state.update((c, s))
          KeyTotals(k, c, s)
      }
  }

  /** Streaming first-sighting filter: a key is emitted exactly once
    * over the stream's lifetime (state = "seen" flag per key) — the
    * unbounded-history complement of dropDuplicatesWithinWatermark.
    */
  def firstSeen(df: DataFrame, keyCol: String): Dataset[String] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("string")).as[String]
      .groupByKey(identity)
      .flatMapGroupsWithState[Boolean, String](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        case (k, _, state) =>
          if (state.exists) Iterator.empty
          else { state.update(true); Iterator.single(k) }
      }
  }
}
