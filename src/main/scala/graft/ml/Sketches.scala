package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{HllRho, Mix64}

/** Distributed sketch operators for corpus-scale statistics: HLL-style
  * distinct counting, count-min frequency estimation, and
  * deterministic hash sampling.
  *
  * Scale posture (100 TB):
  * - every sketch here reduces to a map-side-combinable groupBy over a
  *   FIXED key space (2^p registers, depth×width counters) — the
  *   shuffle payload is bounded by the sketch size, not the data, and
  *   partial aggregation collapses each partition's contribution
  *   before anything moves;
  * - sampling is a stateless projection (hash + mask compare): no
  *   shuffle, no RNG state, reproducible across retries/splits — the
  *   property Bernoulli RNG sampling loses under task re-execution;
  * - all kernels are the engine-portable [[Mix64]]/FNV family so
  *   results hash-match a replay in any engine (the driver's DuckDB
  *   oracle replays them in mod-2^64 SQL arithmetic).
  */
object Sketches {

  /** HLL-style register table over the hashed key column: register =
    * low `p` bits of mix64(key), rank = trailing-zero rho of the
    * remaining bits ([[HllRho]]). Returns one row per OCCUPIED
    * register: (register int, rho int) — the integer-exact sketch
    * state; merge across shards/engines = max per register.
    */
  def hllRegisters(df: DataFrame, keyCol: String, p: Int = 10): DataFrame = {
    val z = Mix64.mix64(col(keyCol).cast("long"), 0)
    df.select(
        z.bitwiseAND(lit((1L << p) - 1)).cast("int").as("register"),
        HllRho.hllRho(z, p).as("rho"))
      .groupBy(col("register"))
      .agg(max(col("rho")).as("rho"))
  }

  /** Distinct-count estimate from a register table: the classic
    * `alpha_m · m² / Σ 2^{−M_j}` with the small-range linear-counting
    * correction; unoccupied registers count as 2^0. Register tables
    * are at most 2^p rows, so this aggregates to one row — driver
    * receives a single double.
    */
  def hllEstimate(registers: DataFrame, p: Int): DataFrame = {
    val m = 1L << p
    val alpha =
      if (p == 4) 0.673 else if (p == 5) 0.697
      else if (p == 6) 0.709 else 0.7213 / (1.0 + 1.079 / m)
    registers
      .agg(
        sum(pow(lit(2.0), -col("rho"))).as("occSum"),
        count(lit(1)).as("occ"))
      .select(
        (lit(alpha * m.toDouble * m.toDouble) /
          (col("occSum") + (lit(m) - col("occ")).cast("double"))).as("raw"),
        (lit(m) - col("occ")).as("zeros"))
      .select(
        when(col("raw") <= lit(2.5 * m) && col("zeros") > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / col("zeros")))
          .otherwise(col("raw")).as("estimate"))
  }

  /** Count-min sketch counter table over a token column: for each of
    * `depth` seeded hash rows, bucket = mix64(fnv(token), seed) masked
    * to `width` buckets. Returns (d int, bucket int, cnt long) — the
    * full counter matrix, depth×width rows max, mergeable by
    * addition. Tokens are pre-hashed with the FNV-1a shingle kernel
    * (n = 1) so the shuffle key is a long, never the token text.
    */
  def cmsCounters(
      tok: DataFrame, tokenCol: String,
      depth: Int = 4, width: Int = 1024): DataFrame = {
    val fnv = element_at(
      graft.functions.ShingleHashes.shingleHashes(col(tokenCol), 1), 1)
    tok.select(fnv.as("__h"))
      .select(col("__h"), explode(sequence(lit(0), lit(depth - 1))).as("d"))
      .select(col("d"),
        seededBucket(col("__h"), col("d"), depth, width).as("bucket"))
      .groupBy(col("d"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** mix64 with a data-driven seed (the CMS depth index): the native
    * [[Mix64]] kernel takes a LITERAL seed (it's baked into codegen),
    * so the small static depth domain is expanded into a CASE chain —
    * `depth` branches of the codegen'd kernel, exact under any SQL
    * arithmetic mode.
    */
  private def seededBucket(
      h: Column, d: Column, depth: Int, width: Int): Column = {
    val cases = (0 until depth).foldLeft(lit(null).cast("long")) { (acc, s) =>
      when(d === lit(s), Mix64.mix64(h, 1000 + s)).otherwise(acc)
    }
    cases.bitwiseAND(lit(width.toLong - 1)).cast("int")
  }

  /** CMS point-estimate for given tokens: min over depth rows of the
    * counter at that token's bucket. `counters` is the (d, bucket,
    * cnt) matrix; `items` any frame with `tokenCol`. The counter
    * matrix is depth×width rows — broadcastable by construction.
    */
  def cmsEstimate(
      counters: DataFrame, items: DataFrame, tokenCol: String,
      depth: Int = 4, width: Int = 1024): DataFrame = {
    val fnv = element_at(
      graft.functions.ShingleHashes.shingleHashes(col(tokenCol), 1), 1)
    val probes = items
      .withColumn("__h", fnv)
      .withColumn("d", explode(sequence(lit(0), lit(depth - 1))))
      .withColumn("bucket", seededBucket(col("__h"), col("d"), depth, width))
    // the counter column is renamed before the join: `items` may carry
    // its own count column of the same name
    probes
      .join(broadcast(counters.withColumnRenamed("cnt", "__cms_cnt")),
        Seq("d", "bucket"), "left")
      .groupBy(items.columns.map(col): _*)
      .agg(min(coalesce(col("__cms_cnt"), lit(0L))).as("cms_est"))
  }

  /** Deterministic stratified sampling: keep a row iff the low 10 bits
    * of mix64(key) fall under the stratum's rate (rates expressed in
    * 1024ths for integer-exact thresholds). Stateless projection — no
    * shuffle, no RNG, stable under task retry and input re-splitting;
    * the sample of a 100 TB table is reproducible from the key alone.
    * `rates1024` maps stratum value → threshold in [0, 1024]; strata
    * not present in the map are dropped.
    */
  /** Deterministic data-mixture resampling: each stratum (source,
    * language, quality band …) gets a weight in 1024ths that may
    * EXCEED 1024 — whole multiples replicate the row (training
    * epochs), the fractional remainder samples it by the same
    * [[Mix64]] bucket rule as [[stratifiedSample]]. A row with weight
    * 1536 appears once always plus once more iff bucket < 512; weight
    * 2048 appears exactly twice. Output adds an `epoch` column
    * (0-based copy index) so downstream shuffles can tell replicas
    * apart.
    *
    * Scale posture: a stateless projection + explode — no shuffle, no
    * RNG state; replicas are generated where the row is read, and
    * re-executed tasks regenerate identical output.
    */
  def weightedMix(
      df: DataFrame, keyCol: String, stratumCol: String,
      weights1024: Map[String, Int], default1024: Int = 0,
      seed: Int = 7): DataFrame = {
    val w = weights1024.foldLeft(lit(default1024.toLong)) {
      case (acc, (k, v)) =>
        when(col(stratumCol) === lit(k), lit(v.toLong)).otherwise(acc)
    }
    val bucket = Mix64.mix64(col(keyCol).cast("long"), seed)
      .bitwiseAND(lit(1023L))
    val copies = (floor(w / lit(1024)).cast("long") +
      when(bucket < w % 1024, lit(1L)).otherwise(lit(0L))).cast("int")
    df.withColumn("__copies", copies)
      .filter(col("__copies") > 0)
      .withColumn("epoch", explode(sequence(lit(0), col("__copies") - 1)))
      .drop("__copies")
  }

  /** Per-group EXACT quantiles via Spark's `percentile` aggregate
    * (value-counting, so memory scales with DISTINCT values per
    * group, not rows — right for measure columns with bounded
    * domains; for unbounded domains use the global histogram path
    * ([[exactQuantiles]]) or approx_percentile). One groupBy
    * exchange; all requested quantiles compute from the same
    * per-group value map. Output: keyCols + one 4dp-rounded column
    * per (label, q) + `n` (group size).
    */
  def groupQuantiles(
      df: DataFrame, keyCols: Seq[String], valueCol: String,
      qs: Seq[(String, Double)]): DataFrame = {
    require(qs.nonEmpty, "need at least one quantile")
    val aggs = qs.map { case (label, q) =>
      round(expr(s"percentile($valueCol, $q)"), 4).as(label)
    } :+ count(lit(1)).as("n")
    df.groupBy(keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** [[weightedMix]] with the stratum→weight map coming from a FRAME
    * (`weights`: stratumCol + a `w1024` long column) instead of a
    * literal — broadcast-joined so the mixture stays a stateless
    * projection; strata absent from `weights` drop.
    */
  def weightedMixFrame(
      df: DataFrame, keyCol: String, stratumCol: String,
      weights: DataFrame, seed: Int = 7): DataFrame = {
    val joined = df.join(broadcast(weights), Seq(stratumCol), "inner")
    val w = col("w1024")
    val bucket = Mix64.mix64(col(keyCol).cast("long"), seed)
      .bitwiseAND(lit(1023L))
    val copies = (floor(w / lit(1024)).cast("long") +
      when(bucket < w % 1024, lit(1L)).otherwise(lit(0L))).cast("int")
    joined.withColumn("__copies", copies)
      .filter(col("__copies") > 0)
      .withColumn("epoch", explode(sequence(lit(0), col("__copies") - 1)))
      .drop("__copies", "w1024")
  }

  /** Temperature-resampled data mixture (the multilingual-LM α=0.5
    * recipe): each stratum's target share ∝ √count, so small sources
    * up-sample and dominant ones down-sample toward `targetRows`
    * total expected output rows. The per-stratum weight derivation is
    * ALL integer arithmetic — isqrt = floor(√count) (exact: sqrt of a
    * long-valued double is correctly rounded), an integer total, and
    * one `div` — so the mixture is bit-reproducible on any engine and
    * any partitioning; the only doubles ever touched are inside the
    * exact floor(sqrt(long)).
    *
    * Plan: one tiny per-stratum count aggregate → weight frame →
    * [[weightedMixFrame]]'s broadcast join + stateless replication.
    * Nothing data-sized shuffles; the corpus scan happens twice
    * (count + apply) — cache upstream if the scan dominates.
    */
  def temperatureMix(
      df: DataFrame, keyCol: String, stratumCol: String,
      targetRows: Long, seed: Int = 7): DataFrame = {
    require(targetRows > 0, "targetRows must be positive")
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("__c"))
      .withColumn("__isq", floor(sqrt(col("__c"))).cast("long"))
    val tot = counts.agg(sum(col("__isq")).as("__tot"))
    // the weight product through DECIMAL(38,0): 1024*targetRows*isq
    // overflows (and ANSI-throws) as a long at realistic large-corpus
    // configs (T ~ 1e11, isq ~ 1e6); decimal-38 holds ~1e38 and `div`
    // stays exact integer floor-division on both engines (DuckDB runs
    // the replay in HUGEINT)
    val weights = counts.crossJoin(broadcast(tot))
      .withColumn("w1024",
        expr(s"(CAST(1024 AS DECIMAL(38,0)) * CAST($targetRows AS DECIMAL(38,0))" +
          s" * CAST(__isq AS DECIMAL(38,0)))" +
          s" div (CAST(__tot AS DECIMAL(38,0)) * CAST(__c AS DECIMAL(38,0)))"))
      .select(col(stratumCol), col("w1024"))
    weightedMixFrame(df, keyCol, stratumCol, weights, seed)
  }

  def stratifiedSample(
      df: DataFrame, keyCol: String, stratumCol: String,
      rates1024: Map[String, Int], seed: Int = 7): DataFrame = {
    val bucket = Mix64.mix64(col(keyCol).cast("long"), seed)
      .bitwiseAND(lit(1023L))
    val threshold = rates1024.foldLeft(lit(-1L)) { case (acc, (k, v)) =>
      when(col(stratumCol) === lit(k), lit(v.toLong)).otherwise(acc)
    }
    df.filter(bucket < threshold)
  }

  /** Weighted priority sample: a FIXED-SIZE deterministic sample per
    * stratum in which a row's selection odds scale with its stratum
    * weight — the "keep n per source, favoring the high-value
    * sources" draw a corpus-mixing pipeline runs (the rate-based
    * [[stratifiedSample]] keeps a proportion; this keeps a count).
    *
    * Priority = (splitmix64(key) with the sign bit cleared) div
    * weight — an integer everywhere, so the order is engine- and
    * partitioning-exact (no float keys); the n SMALLEST priorities
    * win, so doubling a weight halves a row's expected priority. The
    * per-stratum winners come from the bounded-state top-k aggregate
    * ([[graft.operators.TopN.topNPerKey]] — a heap of n rows per
    * stratum in the aggregation buffer, never a sort of the data).
    *
    * Strata ABSENT from `weights` are DROPPED: an unlisted stratum
    * defaults to weight 0 and is excluded before the priority draw
    * (explicit zero weights are rejected by the precondition, so only
    * unlisted strata drop). An incomplete map is therefore a filter,
    * not an error — list every stratum you want represented.
    */
  def weightedPrioritySample(
      df: DataFrame, keyCol: String, stratumCol: String,
      weights: Map[String, Long], n: Int, seed: Int = 7): DataFrame = {
    require(n >= 1 && weights.nonEmpty && weights.values.forall(_ >= 1))
    val w = weights.foldLeft(lit(0L)) { case (acc, (k, v)) =>
      when(col(stratumCol) === lit(k), lit(v)).otherwise(acc)
    }
    val pr = Mix64.mix64(col(keyCol).cast("long"), seed)
      .bitwiseAND(lit(Long.MaxValue))
    // `div` (truncating integer division) on a non-negative hash ==
    // floor division, so both engines agree without a negative-
    // rounding caveat.
    val bound = df.filter(w > 0)
      .withColumn("__wps_p", pr).withColumn("__wps_w", w)
      .withColumn("priority", expr("__wps_p div __wps_w"))
      .drop("__wps_p", "__wps_w")
    graft.operators.TopN.topNPerKey(bound, Seq(stratumCol),
      Seq(col("priority"), col(keyCol)), n)
  }

  /** Per-group ordinary-least-squares trend: slope and intercept of
    * y over x within each key group, from the closed form
    * slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²) — the "is this metric
    * drifting up" readout over per-day aggregates.
    *
    * ONE map-side-combined aggregation carries all five sums; the
    * sums ride DECIMAL (exact — float Σxy would be
    * partition-order-dependent) and only the final division drops to
    * 6dp-rounded doubles, so both engines draw identical lines. `x`
    * must fit decimal(10,0) (a day/bucket index, not a timestamp in
    * micros — rebase first); a constant-x group returns null slope.
    */
  def groupTrend(
      df: DataFrame, keyCols: Seq[String], xCol: String,
      yCol: String): DataFrame = {
    require(keyCols.nonEmpty, "groupTrend needs at least one key column")
    val x = col(xCol).cast("decimal(10,0)")
    val y = col(yCol).cast("decimal(18,4)")
    val agg = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(x).cast("double").as("__sx"),
        sum(y).cast("double").as("__sy"),
        sum((x * y).cast("decimal(38,4)")).cast("double").as("__sxy"),
        sum((x * x).cast("decimal(28,0)")).cast("double").as("__sxx"))
    val denom = col("n") * col("__sxx") - col("__sx") * col("__sx")
    val slope = round(
      try_divide(col("n") * col("__sxy") - col("__sx") * col("__sy"),
        denom), 6)
    val intercept = round(
      try_divide(col("__sy") - slope * col("__sx"), col("n")), 6)
    agg.select(keyCols.map(col) :+ col("n") :+ slope.as("slope") :+
      intercept.as("intercept"): _*)
  }

  /** Per-group Pearson correlation of two measures, from the closed
    * form over six decimal-exact sums in ONE map-side-combined
    * aggregation — same engine-exactness discipline as [[groupTrend]]
    * (a float Σxy would be partition-order-dependent; the only
    * doubles are the final closed-form arithmetic, identical on any
    * engine). Returns (keys..., n, r) with r 6dp-rounded; a
    * zero-variance side yields null.
    */
  def groupCorrelation(
      df: DataFrame, keyCols: Seq[String], xCol: String,
      yCol: String): DataFrame = {
    require(keyCols.nonEmpty, "groupCorrelation needs key columns")
    val x = col(xCol).cast("decimal(18,4)")
    val y = col(yCol).cast("decimal(18,4)")
    val agg = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(x).cast("double").as("__sx"),
        sum(y).cast("double").as("__sy"),
        sum((x * y).cast("decimal(38,8)")).cast("double").as("__sxy"),
        sum((x * x).cast("decimal(38,8)")).cast("double").as("__sxx"),
        sum((y * y).cast("decimal(38,8)")).cast("double").as("__syy"))
    val num = col("n") * col("__sxy") - col("__sx") * col("__sy")
    val den = sqrt((col("n") * col("__sxx") - col("__sx") * col("__sx")) *
      (col("n") * col("__syy") - col("__sy") * col("__sy")))
    agg.select(keyCols.map(col) :+ col("n") :+
      round(try_divide(num, den), 6).as("r"): _*)
  }

  /** Exact heavy hitters with CMS cross-check: top-k tokens by exact
    * corpus frequency (groupBy + TakeOrdered — partial aggregation
    * collapses per-partition counts before the shuffle) with each
    * token's count-min estimate joined on. est ≥ exact always; the
    * gap measures collision error at the configured width.
    */
  def heavyHitters(
      tok: DataFrame, tokenCol: String, k: Int = 20,
      depth: Int = 4, width: Int = 1024): DataFrame = {
    val exact = tok.groupBy(col(tokenCol))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col(tokenCol))
      .limit(k)
    val counters = cmsCounters(tok, tokenCol, depth, width)
    cmsEstimate(counters, exact, tokenCol, depth, width)
      .orderBy(col("cnt").desc, col(tokenCol))
  }

  /** EXACT quantiles of a column without a global sort — the profiling
    * primitive `approx_percentile` trades away and `Window.orderBy`
    * (no partition) cannot survive at scale (it collapses the table
    * into one task). For each requested fraction `p` the value at
    * 1-based rank `floor(p * (n-1)) + 1` of the sorted column is
    * returned — the same "lower interpolation" rule as DuckDB's
    * `quantile_disc`/numpy's `interpolation='lower'`.
    *
    * Plan shape (all stages distributed):
    *  1. value histogram: `groupBy(value).count()` — map-side combine
    *     collapses duplicates before the only data-sized shuffle;
    *  2. range-repartition the (value, count) table by value and take
    *     per-partition running sums in parallel;
    *  3. lift local sums to global rank intervals with a
    *     partition-count-sized prefix table (broadcast) — the
    *     [[TextAnalysis.packingManifest]] distributed-prefix-sum
    *     pattern;
    *  4. each quantile's rank probes the interval table with a
    *     broadcast range join — `ps.length` rows against the
    *     histogram, never data × data.
    *
    * The histogram is persisted: range boundaries are sampled, so the
    * totals pass and the probe join must see one consistent
    * partitioning (recomputation could re-sample different bounds).
    *
    * Returns (p double, value) sorted by p.
    */
  def exactQuantiles(
      df: DataFrame, valueCol: String, ps: Seq[Double],
      partitions: Int = 0): DataFrame =
    exactQuantilesWeighted(
      df.select(col(valueCol).as("v"))
        .groupBy(col("v")).agg(count(lit(1)).as("c")),
      "v", "c", ps, partitions)
      .select(col("p"), col("v").as(valueCol))

  /** [[exactQuantiles]] over a PRE-AGGREGATED (value, count)
    * histogram — the rank machinery without rebuilding the value
    * histogram. Exists because derived distributions are often cheap
    * projections of a histogram already in hand: the median absolute
    * deviation re-aggregates |v − median| over the ORIGINAL
    * histogram's distinct values instead of scanning the data again
    * ([[graft.operators.Cleanse.flagOutliersMad]]). Rows must carry
    * unique values (a grouped histogram does by construction).
    *
    * CACHE OWNERSHIP: persists the histogram (twice — raw ahead of
    * the boundary-sampling range exchange, and prefix-summed) for the
    * lifetime of the returned LAZY frame — caller releases after
    * materialization
    * ([[graft.operators.PhysicalOps.releaseCaches]]); see
    * [[graft.ml.TextAnalysis.packingManifestFrom]]'s contract note.
    */
  /** [[exactQuantiles]] materialized to DRIVER literals — `ps.length`
    * scalars, the bounded-driver-metadata convention
    * ([[graft.operators.Cleanse.flagOutliersMad]]'s medians, the
    * bloom-bits/centroids discipline). Exists because quantile EDGES
    * are almost always consumed as a broadcast row referenced from
    * several plan branches (PSI's two bucket passes + grid, the
    * winsorize clamp, equi-depth assignment), and each reference
    * re-executes the whole histogram + range-prefix subplan — the
    * r17 q150 plan held 24 parquet scans and 120 exchanges for a
    * 4-bucket PSI. Collecting the edges once turns every consumer
    * into a stateless projection with literal bounds. Returns the
    * value at each fraction IN `ps` ORDER (null when the input is
    * empty), as raw JVM values of the value column's external type.
    */
  def exactQuantileValues(
      df: DataFrame, valueCol: String, ps: Seq[Double],
      partitions: Int = 0): Seq[Any] = {
    // release exactly the internal histogram persists this call
    // created (collect = the materialization the cache contract
    // wants) — never the caller's own caches, which a blanket
    // releaseCaches() would evict out from under a pipeline
    val sc = df.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val got = exactQuantiles(df, valueCol, ps, partitions)
      .collect().map(r => (r.getDouble(0), r.get(1))).toMap
    sc.getPersistentRDDs.foreach { case (id, rdd) =>
      if (!before.contains(id)) rdd.unpersist(blocking = false)
    }
    ps.map(p => got.getOrElse(p, null))
  }

  def exactQuantilesWeighted(
      hist0: DataFrame, valueCol: String, countCol: String,
      ps: Seq[Double], partitions: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"fractions must be in [0, 1], got $ps")
    val nPart = if (partitions > 0) partitions
      else hist0.sparkSession.sessionState.conf.numShufflePartitions
    val hist = hist0
      .select(col(valueCol).as("v"), col(countCol).as("c"))
      // cached before the range exchange: boundary sampling would
      // re-run the upstream value-histogram aggregate (the
      // packingManifestFrom lesson); the histogram is distinct-value
      // sized, so the cache is bounded
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      .repartitionByRange(nPart, col("v"))
      .sortWithinPartitions(col("v"))
      .withColumn("__pid", spark_partition_id())
      // inclusive running count via the stateful prefix-sum kernel —
      // a window over __pid would re-shuffle the histogram a second
      // time (the packingManifestFrom plan-audit lesson)
      .withColumn("__hi_local",
        graft.functions.PartitionPrefixSum.partitionRunningTotal(col("c")))
      .persist()
    // ≤ `nPart` rows by construction (one per partition id); constant
    // partition key silences the global-window warning
    val totals = hist.groupBy(col("__pid"))
      .agg(sum(col("c")).as("__t"))
    val prefixes = totals
      .withColumn("__prefix",
        coalesce(sum(col("__t")).over(
          Window.partitionBy(pmod(col("__pid"), lit(1))).orderBy(col("__pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__prefix"))
    // total row count from the ≤ nPart-row per-partition totals, not
    // a second full scan of the (cached) histogram — same long sum,
    // one fewer data-sized aggregate per call (r17)
    val ranks = totals.agg(sum(col("__t")).as("__n"))
      .select(explode(typedlit(ps.sorted)).as("p"), col("__n"))
      .select(col("p"),
        (floor(col("p") * (col("__n") - 1)) + 1).cast("long").as("__k"))
    hist.join(broadcast(prefixes), Seq("__pid"))
      .withColumn("__hi", col("__prefix") + col("__hi_local"))
      .withColumn("__lo", col("__hi") - col("c") + 1)
      .join(broadcast(ranks),
        col("__k") >= col("__lo") && col("__k") <= col("__hi"))
      .select(col("p"), col("v").as(valueCol))
      .orderBy(col("p"))
  }
}
