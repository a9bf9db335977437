package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column profiling: per-column non-null counts, distinct counts, and
  * min/max, delivered as one row per column — the data-quality summary
  * a warehouse load (SURVEY §1.5) runs before trusting a feed, and a
  * training-data pipeline runs per shard.
  *
  * Two variants with the same output schema
  * (col_name, n_nonnull, n_distinct, min_val, max_val):
  *
  * - [[profile]] is exact. Multiple `count(DISTINCT ...)` aggregates
  *   make Catalyst plan an Expand (one input replica per distinct
  *   aggregate) — exactness costs a ×columns blowup of the scan rows
  *   into the partial aggregate. Right for audits and as the oracle.
  * - [[approxProfile]] swaps distinct counts for HyperLogLog++
  *   (`approx_count_distinct`): a single pass, no Expand, constant
  *   memory per column — the variant to run over 100 TB, where the
  *   exact version's replicated shuffle is the bottleneck and a ~2%
  *   cardinality error changes no decision.
  *
  * Both collapse to ONE aggregation job: the per-column results come
  * back as a single row of scalars (columns × 4 values — bytes on the
  * driver), which is then exploded into the row-per-column shape, so
  * profiling N columns never means N scans.
  */
object Profile {

  private def shape(df: DataFrame, cols: Seq[String],
      distinctAgg: Column => Column): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__n_$c"),
        distinctAgg(col(c)).as(s"__d_$c"),
        min(col(c)).cast("double").as(s"__min_$c"),
        max(col(c)).cast("double").as(s"__max_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      struct(lit(c).as("col_name"),
        col(s"__n_$c").as("n_nonnull"),
        col(s"__d_$c").as("n_distinct"),
        col(s"__min_$c").as("min_val"),
        col(s"__max_$c").as("max_val"))
    }
    one.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
  }

  /** Exact profile: min/max are cast to DOUBLE, so pass numeric (or
    * date/timestamp-free) columns; exact while values round-trip
    * through a double (|v| < 2^53).
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame =
    shape(df, cols, countDistinct(_))

  /** Single-pass profile with HLL++ distinct estimates (default
    * relative standard deviation 0.05, tightened here to 0.01 — the
    * sketch is still bytes per column).
    */
  def approxProfile(df: DataFrame, cols: Seq[String],
      rsd: Double = 0.01): DataFrame =
    shape(df, cols, c => approx_count_distinct(c, rsd))

  /** Join/aggregation-key skew report: the top-k heaviest keys with
    * their row share (6dp) and the salt factor that would level each
    * back down to a mean-sized task. THE pre-flight check before a
    * 100 TB shuffle — AQE splits sort-merge skew at runtime, but
    * bucketed joins, aggregations over the hot key, and anything
    * pinned to a fixed partitioning need the [[graft.operators
    * .Joins.saltedJoin]] treatment sized from exactly this table.
    *
    * One map-side-combined count per key + a top-k (TakeOrdered, not
    * a global sort); the mean attaches as a broadcast one-row frame.
    * `suggested_salts` = ceil(cnt / mean) capped at `maxSalts` — 1
    * for non-skewed keys, the replication factor for hot ones. All
    * integer/ratio math, deterministic on any engine (ratio ties in
    * the top-k break by key value).
    */
  def skewReport(
      df: DataFrame, keyCols: Seq[String], k: Int = 20,
      maxSalts: Int = 64): DataFrame = {
    require(keyCols.nonEmpty && k >= 1)
    val counts = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("cnt"))
    val stats = counts.agg(
      count(lit(1)).as("__nkeys"),
      sum(col("cnt")).as("__nrows"))
    counts.crossJoin(broadcast(stats))
      .select(keyCols.map(col) ++ Seq(
        col("cnt"),
        round(try_divide(col("cnt"), col("__nrows")), 6).as("share"),
        least(
          // cnt*nkeys through DOUBLE: the long product overflows (and
          // ANSI-throws) at ~1e12 rows x 1e9 keys; a salt suggestion
          // does not need exact integer math
          ceil(try_divide(col("cnt").cast("double") * col("__nkeys"),
            col("__nrows"))).cast("int"),
          lit(maxSalts)).as("suggested_salts")): _*)
      .orderBy(col("cnt").desc +: keyCols.map(col(_).asc): _*)
      .limit(k)
  }

  /** Equi-width histogram of a numeric column: `nb` buckets spanning
    * [min, max], every bucket emitted (zero-count buckets included —
    * a histogram with holes silently dropped is how bimodal
    * distributions get misread). Returns (bucket, lo, hi, n).
    *
    * One stats aggregate (min/max as a broadcast single row), one
    * stateless bucket projection, one count aggregate, and a
    * driver-sized bucket-grid right join to surface empty buckets —
    * the scan is touched once and no global sort happens anywhere.
    * Bucket membership is `floor((v − min) · nb / (max − min))`
    * clamped to nb−1 (so v = max lands in the top bucket) — plain
    * IEEE double steps, reproducible on any engine that evaluates
    * the same expression. A constant column (min = max) degenerates
    * to every row in bucket 0.
    */
  def histogram(df: DataFrame, valueCol: String, nb: Int): DataFrame = {
    require(nb >= 1, "need at least one bucket")
    val v = col(valueCol).cast("double")
    val stats = df.filter(v.isNotNull)
      .agg(min(v).as("__mn"), max(v).as("__mx"))
    val bucket = when(col("__mx") === col("__mn"), lit(0))
      .otherwise(least(
        floor((v - col("__mn")) * lit(nb) / (col("__mx") - col("__mn"))),
        lit(nb - 1)).cast("int"))
    val counts = df.filter(v.isNotNull).crossJoin(broadcast(stats))
      .groupBy(bucket.as("bucket")).agg(count(lit(1)).as("n"))
    val grid = stats.select(
      explode(sequence(lit(0), lit(nb - 1))).as("bucket"),
      col("__mn"), col("__mx"))
    grid.join(counts, Seq("bucket"), "left")
      .select(col("bucket"),
        (col("__mn") + col("bucket") * (col("__mx") - col("__mn"))
          / lit(nb)).as("lo"),
        (col("__mn") + (col("bucket") + 1) * (col("__mx") - col("__mn"))
          / lit(nb)).as("hi"),
        coalesce(col("n"), lit(0L)).as("n"))
  }

  /** Equi-depth (quantile) binning: assign each row the bucket of its
    * `valueCol` among `nb` population-quantile bins — the binning that
    * stays informative under skew, where [[histogram]]'s equi-width
    * buckets collapse (one bucket takes 99% of a heavy-tailed
    * column). Adds `bucket` (0-based; nulls get null).
    *
    * Edges are NEAREST-RANK quantiles at i/nb via
    * [[graft.ml.Sketches.exactQuantiles]] (histogram + distributed
    * prefix sums — same never-a-value-counting-aggregate rationale as
    * winsorize); the nb−1 edges attach as ONE broadcast row and the
    * assignment `Σ 1[v > edge_i]` is a stateless projection. Ties at
    * an edge go to the lower bucket (v > edge, strictly).
    */
  def equiDepthBins(df: DataFrame, valueCol: String, nb: Int): DataFrame = {
    require(nb >= 2, "need at least two bins")
    val qs = (1 until nb).map(i => i.toDouble / nb)
    // the nb−1 edges collect as bounded driver metadata
    // ([[graft.ml.Sketches.exactQuantileValues]] — the
    // flagOutliersMad convention): the former broadcast-row
    // formulation re-executed the whole quantile subplan once per
    // reference of the RETURNED frame (q176 referenced it twice),
    // where literal edges make the assignment a stateless projection
    val vType = df.schema(valueCol).dataType
    val edges = graft.ml.Sketches.exactQuantileValues(df, valueCol, qs)
    val bucket = edges
      .map(e => when(col(valueCol) >
        (if (e == null) lit(null) else lit(e)).cast(vType), 1)
        .otherwise(0))
      .reduce(_ + _)
    df.withColumn("bucket",
      when(col(valueCol).isNull, lit(null).cast("int"))
        .otherwise(bucket))
  }

  /** Join fan-out pre-flight: the EXACT output cardinality a join on
    * `keyCols` would produce — Σ_k count_left(k)·count_right(k) — and
    * the top-k contributing keys, computed from the two per-key count
    * aggregates WITHOUT running the join. The companion of
    * [[skewReport]]: that one flags a skewed shuffle, this one flags
    * a fan-out explosion (the duplicate-keyed dimension that turns a
    * "lookup" into a row multiplier) before it burns the cluster.
    *
    * Cost: one aggregation per side + an inner join of the per-key
    * COUNT tables (bounded by distinct keys, not rows) + a top-k.
    * Returns the top `k` keys by contribution with both side counts,
    * the pair product, and its share of the exact total output rows.
    */
  def joinFanout(
      left: DataFrame, right: DataFrame,
      keys: Seq[(String, String)], k: Int = 20): DataFrame = {
    require(keys.nonEmpty && k >= 1)
    val lc = left.groupBy(keys.map { case (l, _) => col(l) }: _*)
      .agg(count(lit(1)).as("n_left"))
    // Right keys rename before the join: a self-estimate (left ==
    // right, the accidental-self-join check) would otherwise carry
    // ambiguous attributes.
    val rc = right.groupBy(keys.map { case (_, r) => col(r) }: _*)
      .agg(count(lit(1)).as("n_right"))
      .select(keys.zipWithIndex.map { case ((_, r), i) =>
        col(r).as(s"__rk$i") } :+ col("n_right"): _*)
    val cond = keys.zipWithIndex
      .map { case ((l, _), i) => col(l) === col(s"__rk$i") }
      .reduce(_ && _)
    val joined = lc.join(rc, cond)
      .select(keys.map { case (l, _) => col(l) } ++
        Seq(col("n_left"), col("n_right"),
          (col("n_left") * col("n_right")).as("out_rows")): _*)
    val total = joined.agg(sum(col("out_rows")).as("__total"))
    joined.crossJoin(broadcast(total))
      .select(keys.map { case (l, _) => col(l) } ++
        Seq(col("n_left"), col("n_right"), col("out_rows"),
          round(try_divide(col("out_rows"), col("__total")), 6)
            .as("share")): _*)
      .orderBy(col("out_rows").desc +:
        keys.map { case (l, _) => col(l).asc }: _*)
      .limit(k)
  }

  /** Pareto (cumulative-share) report: keys ranked by their summed
    * value descending, each with its share and RUNNING share of the
    * total — the "which 20% of parts carry 80% of revenue" readout.
    * Returns (keys..., revenue, share, cum_share); revenue is
    * decimal-summed and surfaced as double.
    *
    * The raw table collapses to per-key sums first (data-sized →
    * key-cardinality). The running sum over the ranked keys is a
    * DISTRIBUTED prefix sum, not a global window (`Window.orderBy`
    * with no partition funnels every key through one task): range-
    * repartition by (value desc, keys), per-partition running sums in
    * parallel, then a partition-count-sized offset table broadcast
    * back — the same shape as the packing manifest
    * ([[graft.ml.TextAnalysis.packingManifest]]).
    */
  def paretoShare(
      df: DataFrame, keyCols: Seq[String], valueCol: String,
      partitions: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(keyCols.nonEmpty, "paretoShare needs at least one key column")
    val p = if (partitions > 0) partitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val order = col("revenue").desc +: keyCols.map(col(_).asc)
    // cached before the range exchange: boundary sampling would
    // re-run the corpus revenue aggregate (packingManifestFrom
    // lesson); key-cardinality sized, released in the epilogue
    val src = df
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col(valueCol).cast("decimal(18,2)")).as("revenue"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val local = src
      .repartitionByRange(p, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__local",
        sum(col("revenue")).over(
          Window.partitionBy(col("__pid")).orderBy(order: _*)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .persist()
    val prefixes = local.groupBy(col("__pid"))
      .agg(sum(col("revenue")).as("__t"))
      .withColumn("__prefix",
        coalesce(sum(col("__t")).over(
          Window.partitionBy(pmod(col("__pid"), lit(1)))
            .orderBy(col("__pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0)))
      .select(col("__pid"), col("__prefix"))
    val total = local.agg(sum(col("revenue")).as("__total"))
    val out = local.join(broadcast(prefixes), Seq("__pid"))
      .crossJoin(broadcast(total))
      .select(keyCols.map(col) ++ Seq(
        col("revenue").cast("double").as("revenue"),
        round(col("revenue").cast("double") / col("__total")
          .cast("double"), 6).as("share"),
        round((col("__local") + col("__prefix")).cast("double") /
          col("__total").cast("double"), 6).as("cum_share")): _*)
    // session-cache hygiene (the jaccardPairs contract): materialize
    // the result, release the CacheManager-registered intermediate
    val materialized = out.localCheckpoint()
    local.unpersist()
    src.unpersist()
    materialized
  }

  /** Chi-square contingency cells for two categorical columns: per
    * (a, b) cell the observed count `o`, the independence-expected
    * count `e` = row_total·col_total/N, and the cell's chi² term
    * (o−e)²/e — the association screen a feature-selection or
    * drift-detection pass runs over category pairs. Σ chi2_cell
    * against the χ² distribution with (|A|−1)(|B|−1) dof is the test
    * statistic; per-cell terms are returned so the caller can see
    * WHERE the dependence lives, not just that it exists.
    *
    * One count aggregation over the data; marginals re-aggregate the
    * |A|·|B|-sized cell table (driver-small for real categoricals)
    * and come back as broadcasts. `e` and the chi² term are 6dp-
    * rounded doubles derived from exact integer counts — identical
    * on any engine evaluating the same expression.
    */
  def chiSquare(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df.groupBy(col(aCol), col(bCol))
      .agg(count(lit(1)).as("o"))
    val rowT = cells.groupBy(col(aCol)).agg(sum(col("o")).as("__ra"))
    val colT = cells.groupBy(col(bCol)).agg(sum(col("o")).as("__cb"))
    val tot = cells.agg(sum(col("o")).as("__n"))
    val e = round(col("__ra").cast("double") * col("__cb") / col("__n"), 6)
    cells.join(broadcast(rowT), Seq(aCol))
      .join(broadcast(colT), Seq(bCol))
      .crossJoin(broadcast(tot))
      .select(col(aCol), col(bCol), col("o"), e.as("e"),
        round(pow(col("o") - e, 2) / e, 6).as("chi2_cell"))
  }
}
