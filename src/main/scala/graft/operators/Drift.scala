package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
    * (map-side combined); the median of THAT table is ONE scalar —
    * collected as bounded driver metadata
    * ([[graft.ml.Sketches.exactQuantileValues]]), so the flag pass is
    * a stateless projection with a literal bound instead of a second
    * execution of the day aggregate feeding a broadcast row (r17:
    * the broadcast-row subplan re-ran the aggregate once per plan
    * reference). Note the check cannot see days with ZERO rows — pair
    * it with a calendar anti-join ([[Resample.dailyFillForward]]'s
    * grid) when absent days must alert too.
    */
  def feedCompleteness(
      df: DataFrame, tsCol: String,
      threshold: Double = 0.5): DataFrame = {
    val daily = df.groupBy(col(tsCol).cast("date").as("day"))
      .agg(count(lit(1)).as("n"))
    val med = graft.ml.Sketches
      .exactQuantileValues(daily, "n", Seq(0.5)).head
    val medCol = (if (med == null) lit(null) else lit(med)).cast("long")
    // the day aggregate runs once for the median and once in the
    // returned (lazy) flag pass — both map-side-combined collapses of
    // the same scan; a persist + eager checkpoint here measured
    // SLOWER than the duplicated small aggregate (r17)
    daily.select(col("day"), col("n"),
      round(col("n").cast("double") / medCol, 6).as("ratio"),
      when(col("n").cast("double") < lit(threshold) * medCol, 1)
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
    * Plan shape (r17 rework — the broadcast-row formulation
    * re-executed the quantile subplan once per plan reference: 24
    * parquet scans / 120 exchanges in the q150 plan for nb = 4):
    * the nb−1 edges collect as bounded driver metadata
    * ([[graft.ml.Sketches.exactQuantileValues]]); both samples'
    * bucket counts ride ONE tagged-union aggregation pass (each
    * side's bucket is computed in its own value type BEFORE the
    * union, so comparison semantics are unchanged); and the final
    * nb-row grid — counts, totals, shares, psi terms — is assembled
    * from the collected (≤ 2·nb rows, bounded by construction)
    * counts with the same column expressions as before, so every
    * rounding step is engine arithmetic on identical inputs.
    */
  def psi(
      ref: DataFrame, cur: DataFrame, valueCol: String,
      nb: Int = 4, floor: Double = 1e-6): DataFrame = {
    require(nb >= 2, "need at least two buckets")
    val spark = ref.sparkSession
    val qs = (1 until nb).map(i => i.toDouble / nb)
    val vType = ref.schema(valueCol).dataType
    val edges = graft.ml.Sketches.exactQuantileValues(ref, valueCol, qs)
    def litOf(v: Any): Column =
      (if (v == null) lit(null) else lit(v)).cast(vType)
    val bucket = edges
      .map(e => when(col(valueCol) > litOf(e), 1).otherwise(0))
      .reduce(_ + _)
    def bucketed(df: DataFrame, side: Int): DataFrame =
      df.filter(col(valueCol).isNotNull)
        .select(bucket.as("bucket"), lit(side).as("__side"))
    // one map-side-combined aggregation covers BOTH samples (2·nb
    // result rows — bounded by construction, safe to collect)
    val counts = bucketed(ref, 0).unionByName(bucketed(cur, 1))
      .groupBy(col("__side"), col("bucket"))
      .agg(count(lit(1)).as("__n"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2)))
      .toMap
    def tot(side: Int): java.lang.Long = {
      val s = counts.collect { case ((sd, _), n) if sd == side => n }
      if (s.isEmpty) null else java.lang.Long.valueOf(s.sum)
    }
    val (tr, tc) = (tot(0), tot(1))
    // nb-row local grid with the SAME expressions as the broadcast
    // formulation — all rounding/flooring stays engine arithmetic
    val rows = (0 until nb).map { b =>
      org.apache.spark.sql.Row(b,
        counts.get((0, b)).map(java.lang.Long.valueOf).orNull,
        counts.get((1, b)).map(java.lang.Long.valueOf).orNull, tr, tc)
    }
    val grid = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      org.apache.spark.sql.types.StructType.fromDDL(
        "bucket int, __nr long, __nc long, __tr long, __tc long"))
    val p = greatest(
      round(coalesce(col("__nr"), lit(0L)).cast("double") / col("__tr"), 6),
      lit(floor))
    val q = greatest(
      round(coalesce(col("__nc"), lit(0L)).cast("double") / col("__tc"), 6),
      lit(floor))
    grid.select(col("bucket"), p.as("p_ref"), q.as("q_cur"),
      round((p - q) * log(p / q), 6).as("psi_term"))
  }
}
