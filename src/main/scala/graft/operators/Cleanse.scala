package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Statistical cleansing: null imputation and outlier flagging — the
  * repair half of the DQ story ([[DataQuality]] detects, this fixes).
  * Complements the reference's drop-side operators (DropNullFields,
  * dynamicframe.py's drop_nulls) with the keep-and-repair path a
  * warehouse load usually wants.
  *
  * Scale posture: every strategy computes its statistics in ONE
  * aggregation pass (mode via a per-column count-max, still one
  * shuffle each), then applies them with a broadcast-style cross join
  * of the single stats row — never a driver collect, so the plan is
  * identical on 60k rows and 100 TB. Sums route through DECIMAL per
  * the repo-wide oracle numeric policy, so a mean imputed on two
  * engines is the same double.
  */
object Cleanse {

  /** Impute nulls in `meanCols` with the column mean (4dp, decimal-
    * summed) and in `modeCols` with the column mode (most frequent
    * non-null value; ties break to the smallest value, so the result
    * is deterministic on any engine and any partitioning).
    *
    * One stats row cross-joined in: mean columns need one aggregate
    * pass over the frame; each mode column adds one (value-keyed,
    * map-side-combined) count aggregate. All stats attach via a
    * broadcast nested-loop join of a SINGLE row — no collect, no
    * second scan of the data in the apply stage.
    */
  def imputeNulls(
      df: DataFrame,
      meanCols: Seq[String],
      modeCols: Seq[String] = Nil): DataFrame = {
    require(meanCols.nonEmpty || modeCols.nonEmpty, "nothing to impute")
    val meanAggs = meanCols.map(c =>
      round(try_divide(sum(col(c).cast("decimal(28,4)")).cast("double"),
        count(col(c))), 4).as(s"__mean_$c"))

    var out = df
    if (meanAggs.nonEmpty) {
      val stats = df.agg(meanAggs.head, meanAggs.tail: _*)
      out = out.crossJoin(broadcast(stats))
      for (c <- meanCols)
        out = out.withColumn(c, coalesce(col(c), col(s"__mean_$c")))
      out = out.drop(meanCols.map(c => s"__mean_$c"): _*)
    }
    for (c <- modeCols) {
      // Deterministic mode: highest count, then SMALLEST value on
      // ties — the TakeOrderedAndProject over the per-value counts is
      // a top-1, not a global sort, and the count aggregate map-side
      // combines, so a mode column costs one key shuffle regardless
      // of row count (mode columns are categorical by definition, so
      // the distinct-value table is small).
      val best = df.filter(col(c).isNotNull)
        .groupBy(col(c).as("__v")).agg(count(lit(1)).as("__n"))
        .orderBy(col("__n").desc, col("__v").asc).limit(1)
        .select(col("__v").as(s"__mode_$c"))
      out = out.crossJoin(broadcast(best))
        .withColumn(c, coalesce(col(c), col(s"__mode_$c")))
        .drop(s"__mode_$c")
    }
    out
  }

  /** Impute nulls with constants (the `na.fill` shape, kept on the
    * library surface so pipelines don't reach for raw Spark).
    */
  def fillConstants(df: DataFrame, values: Map[String, Any]): DataFrame =
    df.na.fill(values)

  /** Winsorize: clamp `valueCol` into its [loQ, hiQ] quantile range —
    * the keep-and-repair alternative to dropping tail rows. Bounds
    * are NEAREST-RANK quantiles (rank floor(q·(n−1))+1 — actual data
    * values) computed by [[graft.ml.Sketches.exactQuantiles]]'s
    * histogram + distributed-prefix-sum plan, NOT the value-counting
    * `percentile` aggregate: a high-cardinality measure column (the
    * normal winsorize target) makes the counting aggregate buffer
    * every distinct value in one reducer — the first version of this
    * operator did exactly that and the bench scaling gate flagged it
    * 8.5× superlinear on the 10× step. Bounds then attach as one
    * broadcast row; the clamp is a stateless projection.
    */
  def winsorize(
      df: DataFrame,
      valueCol: String,
      loQ: Double = 0.01, hiQ: Double = 0.99): DataFrame = {
    require(loQ >= 0 && hiQ <= 1 && loQ < hiQ, "need 0 <= loQ < hiQ <= 1")
    // two scalars — bounded driver metadata (the flagOutliersMad
    // convention, via [[graft.ml.Sketches.exactQuantileValues]]);
    // the clamp is then a stateless projection with literal bounds
    // instead of a cross join against a broadcast row whose subplan
    // re-ran the quantile machinery per plan reference
    val vType = df.schema(valueCol).dataType
    val Seq(lo, hi) = graft.ml.Sketches
      .exactQuantileValues(df, valueCol, Seq(loQ, hiQ))
    def litOf(v: Any) = (if (v == null) lit(null) else lit(v)).cast(vType)
    df.withColumn(valueCol,
      least(greatest(col(valueCol), litOf(lo)), litOf(hi)))
  }

  /** Flag rows whose `valueCol` is a z-score outlier: |x - mean| >
    * k * stddev, with mean and the POPULATION stddev computed from
    * decimal sums (sqrt of an engine-exact double), rounded to 6dp
    * before the comparison so both engines draw the same boundary.
    * Adds `is_outlier` (int 0/1); rows with null values flag 0.
    */
  def flagOutliers(
      df: DataFrame,
      valueCol: String,
      k: Double = 3.0): DataFrame = {
    // (18,6): the square stays at precision 37 — inside decimal-38,
    // so the sum of squares is exact; (28,6)^2 would overflow and
    // round. Values above 1e12 need a two-level sum instead.
    val x = col(valueCol).cast("decimal(18,6)")
    val stats = df.agg(
      sum(x).cast("double").as("__sx"),
      sum((x * x).cast("decimal(38,12)")).cast("double").as("__sxx"),
      count(col(valueCol)).cast("double").as("__n"))
      .select(
        round(try_divide(col("__sx"), col("__n")), 6).as("__mu"),
        round(sqrt(greatest(lit(0.0),
          try_divide(col("__sxx"), col("__n")) -
            try_divide(col("__sx"), col("__n")) *
            try_divide(col("__sx"), col("__n")))), 6).as("__sigma"))
    df.crossJoin(broadcast(stats))
      .withColumn("is_outlier",
        when(col(valueCol).isNotNull &&
          abs(col(valueCol) - col("__mu")) > lit(k) * col("__sigma"), 1)
          .otherwise(0))
      .drop("__mu", "__sigma")
  }

  /** Flag rows by the ROBUST (median/MAD) outlier rule:
    * |x − median| > k · MAD, where MAD = median(|x − median|).
    * The z-score rule ([[flagOutliers]]) breaks on the exact data it
    * targets — heavy outliers inflate the mean and stddev until they
    * mask themselves; median and MAD have a 50% breakdown point, so
    * the rule survives arbitrarily corrupted tails.
    *
    * Both medians are NEAREST-RANK (rank floor(0.5·(n−1))+1 — actual
    * data values, engine-exact) via
    * [[graft.ml.Sketches.exactQuantiles]]'s histogram +
    * distributed-prefix-sum plan — same discipline and same scale
    * rationale as [[winsorize]] (a value-counting percentile
    * aggregate buffers every distinct value in one reducer). Two
    * quantile passes + one stateless projection; each median attaches
    * as a broadcast single row. Adds `is_outlier` (0/1; nulls flag 0).
    */
  def flagOutliersMad(
      df: DataFrame,
      valueCol: String,
      k: Double = 3.0): DataFrame = {
    // ONE value histogram serves both medians: the deviation
    // distribution |v − median| is a projection of the histogram
    // already in hand, re-aggregated over DISTINCT values only — the
    // data itself is scanned and shuffled once, not twice.
    val hist = df.select(col(valueCol).as("__v"))
      .groupBy(col("__v")).agg(count(lit(1)).as("__c"))
      .persist()
    // Each median is ONE scalar — collected as bounded driver
    // metadata (the bloom-bits/centroids convention), which lets the
    // histogram release before returning and leaves the flag pass a
    // pure stateless projection with literal bounds.
    val med = lit(graft.ml.Sketches
      .exactQuantilesWeighted(hist, "__v", "__c", Seq(0.5))
      .agg(min(col("__v"))).collect()(0).get(0))
    val devHist = hist
      .groupBy(abs(col("__v") - med).as("__d"))
      .agg(sum(col("__c")).as("__c"))
    val mad = lit(graft.ml.Sketches
      .exactQuantilesWeighted(devHist, "__d", "__c", Seq(0.5))
      .agg(min(col("__d"))).collect()(0).get(0))
    hist.unpersist()
    // null med/mad (empty input) makes the predicate null -> flag 0
    df.withColumn("is_outlier",
      when(col(valueCol).isNotNull &&
        abs(col(valueCol) - med) > lit(k) * mad, 1)
        .otherwise(0))
  }

  /** Per-group min-max feature scaling: `scaledCol` :=
    * (x − group min)/(group max − group min), 6dp-rounded; a
    * constant group (max = min) scales to 0.0, nulls stay null.
    *
    * The group extrema ride an unordered whole-partition window —
    * ONE key shuffle serves extrema and scaling (a groupBy+join
    * formulation shuffles twice and re-materializes the frame).
    * Groups are independent; group count can be data-sized.
    */
  def minMaxScale(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      scaledCol: String = "scaled"): DataFrame = {
    require(keyCols.nonEmpty, "minMaxScale needs at least one key column")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
    val mn = min(col(valueCol)).over(w)
    val mx = max(col(valueCol)).over(w)
    df.withColumn(scaledCol,
      when(col(valueCol).isNull, lit(null).cast("double"))
        .when(mx === mn, lit(0.0))
        .otherwise(round((col(valueCol) - mn) / (mx - mn), 6)))
  }
}
