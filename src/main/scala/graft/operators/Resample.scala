package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample an irregular per-key event
  * stream onto a complete fixed-step time grid and forward-fill the
  * gaps — the preprocessing every downstream window/trend computation
  * assumes (a day with no events must surface as a row, carrying the
  * last observed value, or a 7-day moving average silently shortens
  * its denominator).
  *
  * Scale posture (100 TB of events): the grid is generated per key
  * from that key's own [min, max] span (`sequence` + `explode`), so
  * grid volume is Σ_k span_k/step — proportional to the OUTPUT, never
  * a cross join against a global calendar dimension. Aggregation to
  * the grid step, span computation, grid join, and the fill window
  * all hash on the key: one logical key shuffle feeds the chain, and
  * the fill is a single ascending-sort window per key (`last` with
  * ignoreNulls over an unbounded-preceding frame — a running O(1)
  * carry, no per-row rescan). Keys are independent — a 10⁹-key corpus
  * parallelizes to any executor count; only a single key whose span
  * dwarfs memory would need step coarsening.
  */
object Resample {

  /** Daily grid + forward fill.
    *
    * Aggregates `valueCol` per (`keyCol`, day) with a decimal sum,
    * expands each key's [first day, last day] span to one row per
    * day, and forward-fills days with no observations from the most
    * recent observed day. Returns `keyCol`, `day`, `filled` (DOUBLE;
    * decimal-exact before the final cast), and `is_gap` (1 when the
    * day had no events).
    */
  def dailyFillForward(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String): DataFrame = {
    val daily = events
      .groupBy(col(keyCol), col(tsCol).cast("date").as("day"))
      .agg(sum(col(valueCol).cast("decimal(18,4)")).as("_v"))
    val grid = daily
      .groupBy(col(keyCol))
      .agg(min(col("day")).as("_d0"), max(col("day")).as("_d1"))
      .select(col(keyCol),
        explode(sequence(col("_d0"), col("_d1"), expr("interval 1 day")))
          .as("day"))
    val w = Window.partitionBy(keyCol).orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq(keyCol, "day"), "left")
      .select(col(keyCol), col("day"),
        last(col("_v"), ignoreNulls = true).over(w).cast("double")
          .as("filled"),
        when(col("_v").isNull, lit(1)).otherwise(lit(0)).as("is_gap"))
  }

  /** Trailing moving average over a regularized per-key series (run
    * it on [[dailyFillForward]]'s output — on a grid WITH holes a
    * "7-row" frame silently spans more than 7 days, which is the bug
    * gap-filling exists to prevent). Adds `mean_<windowRows>`:
    * the mean of the last `windowRows` rows (fewer at the series
    * head), decimal-summed inside the frame and 6dp-rounded so frame
    * accumulation order cannot diverge between engines.
    *
    * The frame rides the SAME (key, day) sort the fill used — one
    * logical key shuffle serves fill and rolling stats; the trailing
    * frame is a running computation, not a per-row rescan.
    */
  def rollingMean(
      grid: DataFrame,
      keyCol: String,
      dayCol: String,
      valueCol: String,
      windowRows: Int): DataFrame = {
    require(windowRows >= 1, "windowRows must be >= 1")
    val w = Window.partitionBy(keyCol).orderBy(dayCol)
      .rowsBetween(-(windowRows - 1), Window.currentRow)
    grid.withColumn(s"mean_$windowRows",
      round(sum(col(valueCol).cast("decimal(18,4)")).over(w)
        .cast("double") / count(lit(1)).over(w), 6))
  }

  /** Truncated exponentially-weighted moving average over a
    * regularized series: smoothed_t = Σ_{i<k} αⁱ·v_{t−i} / Σ αⁱ with
    * α = 1/2, truncated at `windowRows` terms and re-normalized over
    * the terms actually present (short at the series head). Scaling
    * both sides by 2^(k−1) turns the weights into INTEGERS
    * (2^(k−1−i)), so numerator and denominator are exact decimal/
    * integer sums and the recurrence — which a streaming EWMA
    * computes sequentially and no parallel engine can reproduce
    * float-exactly — becomes an order-free windowed dot product,
    * identical on any engine. Adds `ewma` (6dp double).
    *
    * k lag() references over ONE (key, day) sort — the same single
    * key shuffle as the rest of the regularized-series family.
    */
  def ewma(
      grid: DataFrame,
      keyCol: String,
      dayCol: String,
      valueCol: String,
      windowRows: Int = 7): DataFrame = {
    require(windowRows >= 1 && windowRows <= 20,
      "windowRows must be in [1, 20]")
    val w = Window.partitionBy(keyCol).orderBy(dayCol)
    val v = col(valueCol).cast("decimal(18,4)")
    val terms = (0 until windowRows).map { i =>
      val wt = 1L << (windowRows - 1 - i)
      val lv = if (i == 0) v else lag(v, i).over(w)
      (when(lv.isNotNull, (lv * lit(wt)).cast("decimal(28,4)"))
        .otherwise(lit(null).cast("decimal(28,4)")),
        when(lv.isNotNull, lit(wt)).otherwise(lit(0L)))
    }
    val num = terms.map(t => coalesce(t._1, lit(0).cast("decimal(28,4)")))
      .reduce(_ + _)
    val den = terms.map(_._2).reduce(_ + _)
    grid.withColumn("ewma",
      round(num.cast("double") / den.cast("double"), 6))
  }

  /** Rolling-baseline anomaly flags over a regularized series: each
    * row compared against the mean ± k·stddev of the PRECEDING
    * `baselineRows` rows (current row excluded — an anomaly must not
    * vote on its own baseline). Adds `base_mean`, `base_sigma` (6dp,
    * population stddev) and `is_anomaly` (0/1; rows with fewer than
    * `minBaseline` preceding rows flag 0 — a 1-row baseline calls
    * everything anomalous).
    *
    * Both baseline moments come from decimal frame sums (Σv, Σv²
    * exact; only the final mean/σ drop to rounded doubles), over the
    * SAME (key, day) sort the fill and rolling mean use — still one
    * logical key shuffle for the whole regularized-series family.
    */
  def rollingAnomaly(
      grid: DataFrame,
      keyCol: String,
      dayCol: String,
      valueCol: String,
      baselineRows: Int = 7,
      k: Double = 2.0,
      minBaseline: Int = 3): DataFrame = {
    require(baselineRows >= 1 && minBaseline >= 1)
    val w = Window.partitionBy(keyCol).orderBy(dayCol)
      .rowsBetween(-baselineRows, -1)
    val v = col(valueCol).cast("decimal(18,4)")
    val n = count(v).over(w)
    val mu = round(sum(v).over(w).cast("double") / n, 6)
    val sg = round(sqrt(greatest(lit(0.0),
      sum((v * v).cast("decimal(38,8)")).over(w).cast("double") / n -
        (sum(v).over(w).cast("double") / n) *
        (sum(v).over(w).cast("double") / n))), 6)
    grid
      .withColumn("base_mean", mu)
      .withColumn("base_sigma", sg)
      .withColumn("is_anomaly",
        when(n >= minBaseline && col(valueCol).isNotNull &&
          abs(col(valueCol) - col("base_mean")) >
            lit(k) * col("base_sigma"), 1).otherwise(0))
  }
}
