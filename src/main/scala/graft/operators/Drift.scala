package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution-drift and feed-health monitors — the checks a
  * production pipeline schedules between ingest and load, where the
  * failure mode is not a crash but a silently thinner or skewed feed.
  */
object Drift {

  /** Feed completeness by day: each day's event count against the
    * median daily count, flagging days below `threshold`·median —
    * the "yesterday's partition half-arrived" detector. Returns
    * (day, n, ratio, is_low) for every day present.
    *
    * The day aggregate collapses the data to one row per day
    * (map-side combined); the median of THAT table rides the exact
    * nearest-rank quantile kernel and re-attaches as a broadcast
    * single row. Note the check cannot see days with ZERO rows — pair
    * it with a calendar anti-join ([[Resample.dailyFillForward]]'s
    * grid) when absent days must alert too.
    */
  def feedCompleteness(
      df: DataFrame, tsCol: String,
      threshold: Double = 0.5): DataFrame = {
    val daily = df.groupBy(col(tsCol).cast("date").as("day"))
      .agg(count(lit(1)).as("n"))
    val med = graft.ml.Sketches.exactQuantiles(daily, "n", Seq(0.5))
      .agg(min(col("n")).as("__med"))
    daily.crossJoin(broadcast(med))
      .select(col("day"), col("n"),
        round(col("n").cast("double") / col("__med"), 6).as("ratio"),
        when(col("n").cast("double") < lit(threshold) * col("__med"), 1)
          .otherwise(0).as("is_low"))
  }

  /** Population Stability Index between a reference and a current
    * sample of `valueCol`, per bucket: the standard model-monitoring
    * drift score (PSI = Σ (p−q)·ln(p/q); > 0.2 conventionally means
    * investigate). Buckets are the REFERENCE's equi-depth edges (the
    * convention — drift is measured against where the reference
    * population sat), every bucket emitted for both samples, shares
    * 6dp-rounded and floored at `floor` before the log so an empty
    * bucket contributes a large-but-finite term. Returns
    * (bucket, p_ref, q_cur, psi_term).
    *
    * Two count aggregates (one per sample, each collapsing to nb
    * rows) over the edge-assignment projection; edges come from the
    * exact-quantile kernel as one broadcast row. Nothing here scales
    * with anything but nb.
    */
  def psi(
      ref: DataFrame, cur: DataFrame, valueCol: String,
      nb: Int = 4, floor: Double = 1e-6): DataFrame = {
    require(nb >= 2, "need at least two buckets")
    val qs = (1 until nb).map(i => i.toDouble / nb)
    val aggs = qs.zipWithIndex.map { case (q, i) =>
      min(when(col("p") === q, col(valueCol))).as(s"__e$i")
    }
    val edges = graft.ml.Sketches.exactQuantiles(ref, valueCol, qs)
      .agg(aggs.head, aggs.tail: _*)
    def bucketed(df: DataFrame, outCol: String): DataFrame = {
      val bucket = (0 until nb - 1)
        .map(i => when(col(valueCol) > col(s"__e$i"), 1).otherwise(0))
        .reduce(_ + _)
      df.filter(col(valueCol).isNotNull)
        .crossJoin(broadcast(edges))
        .groupBy(bucket.as("bucket"))
        .agg(count(lit(1)).as(outCol))
    }
    val refC = bucketed(ref, "__nr")
    val curC = bucketed(cur, "__nc")
    val grid = edges.select(
      explode(sequence(lit(0), lit(nb - 1))).as("bucket"))
    val joined = grid
      .join(refC, Seq("bucket"), "left")
      .join(curC, Seq("bucket"), "left")
      .crossJoin(broadcast(refC.agg(sum(col("__nr")).as("__tr"))))
      .crossJoin(broadcast(curC.agg(sum(col("__nc")).as("__tc"))))
    val p = greatest(
      round(coalesce(col("__nr"), lit(0L)).cast("double") / col("__tr"), 6),
      lit(floor))
    val q = greatest(
      round(coalesce(col("__nc"), lit(0L)).cast("double") / col("__tc"), 6),
      lit(floor))
    joined.select(col("bucket"), p.as("p_ref"), q.as("q_cur"),
      round((p - q) * log(p / q), 6).as("psi_term"))
  }
}
