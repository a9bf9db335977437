package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins (SURVEY §2.7 T4, beyond-parity): the
  * watermarked interval equi-join — the shape behind click/impression
  * matching, order/payment correlation, and every "join two event
  * streams near in time" pipeline.
  *
  * Both sides carry a watermark and the time condition is a bounded
  * interval, so Spark's symmetric hash join can EVICT state: each
  * side buffers only rows younger than watermark + bound, giving the
  * bounded-memory execution an unbounded stream join cannot have.
  * Without the interval condition the state store grows forever —
  * that is the failure mode this wrapper exists to make impossible
  * (the bounds are required parameters, not an option).
  *
  * Also runs on batch frames, degenerating to a plain interval join
  * (same results, no state), which is what the specs exploit.
  */
object StreamJoins {

  /** `left ⋈ right` on `keyCol` with `right.ts ∈ [left.ts - lower,
    * left.ts + upper]`. Output columns are the two inputs' columns
    * prefixed `l_`/`r_` (a stream-stream join cannot deduplicate the
    * key column the way a batch `using` join would, so the prefixes
    * keep the schema collision-free for downstream sinks).
    *
    * `joinType` supports the stream-stream-legal set (inner,
    * leftOuter, rightOuter, fullOuter); outer variants emit their
    * null-padded rows only once the watermark passes the join bound,
    * per Spark semantics.
    */
  def intervalJoin(
      left: DataFrame, right: DataFrame,
      keyCol: String,
      leftTsCol: String, rightTsCol: String,
      watermark: String,
      lowerBound: String, upperBound: String,
      joinType: String = "inner"): DataFrame = {
    val l = left.columns.foldLeft(left)((d, c) =>
      d.withColumnRenamed(c, s"l_$c")).withWatermark(s"l_$leftTsCol", watermark)
    val r = right.columns.foldLeft(right)((d, c) =>
      d.withColumnRenamed(c, s"r_$c")).withWatermark(s"r_$rightTsCol", watermark)
    l.join(r,
      col(s"l_$keyCol") === col(s"r_$keyCol") &&
        col(s"r_$rightTsCol") >= col(s"l_$leftTsCol") -
          expr(s"INTERVAL $lowerBound") &&
        col(s"r_$rightTsCol") <= col(s"l_$leftTsCol") +
          expr(s"INTERVAL $upperBound"),
      joinType)
  }
}
