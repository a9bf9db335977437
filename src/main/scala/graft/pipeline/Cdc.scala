package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture log compaction — the ingest step in front of
  * every warehouse load the reference pipeline performs (pipeline.py
  * reads full snapshots; a production feed arrives as an
  * insert/update/delete log that must be collapsed to current state
  * before the dimension and fact loads can run).
  *
  * Scale posture: latest-wins is ONE hash aggregation on the key —
  * `max_by(payload, seq)` partial-aggregates map-side, so a log with
  * heavy per-key churn (the common CDC shape: few hot keys, many
  * updates) collapses inside the scan before the exchange; only one
  * surviving row per key per input partition crosses the wire. A
  * window (`row_number over key order by seq desc`) would shuffle the
  * WHOLE log and sort every partition — never use it for this.
  */
object Cdc {

  /** Collapse a CDC log to final table state.
    *
    * `log` carries `keys ++ (seqCol, opCol) ++ payload`. Per key the
    * row with the highest `seqCol` wins; if its `opCol` equals
    * `deleteOp` the key is dropped from the output. Emits one row per
    * surviving key: the key columns, the winning payload columns, and
    * `n_ops` (total log entries seen for the key — the churn metric a
    * compaction scheduler feeds on).
    *
    * `seqCol` must be unique per key (LSN / commit offset — every real
    * CDC source provides one); with duplicated seqs the winner among
    * the tied rows is partition-order-dependent.
    *
    * A winning row with a NULL op is NOT a delete: the key survives
    * (null-safe comparison) with its payload, so malformed log rows
    * surface in the output instead of silently erasing keys.
    */
  def compact(
      log: DataFrame,
      keys: Seq[String],
      seqCol: String,
      opCol: String,
      deleteOp: String = "D"): DataFrame = {
    require(keys.nonEmpty, "cdcCompact needs at least one key column")
    val payload = log.columns
      .filterNot(c => keys.contains(c) || c == seqCol || c == opCol)
    val winner = max_by(
      struct((opCol +: payload).map(col): _*), col(seqCol))
    val agg = log
      .groupBy(keys.map(col): _*)
      .agg(winner.as("_win"), count(lit(1)).as("n_ops"))
    val outCols = keys.map(col) ++
      payload.map(c => col(s"_win.$c").as(c)) :+ col("n_ops")
    // Null-SAFE delete test: a plain `=!=` is null-rejecting, so a
    // malformed log row with a NULL op would act as a silent delete.
    // A null op is not a delete — the key survives and the bad value
    // surfaces in the output where a DQ rule can catch it.
    agg.filter(!(col(s"_win.$opCol") <=> lit(deleteOp)))
      .select(outCols: _*)
  }
}
