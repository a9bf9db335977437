package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy record linkage (entity resolution): find left/right
  * record pairs whose compare fields are within an edit-distance
  * budget, without ever forming the cross product.
  *
  * The classic dedup/linkage discipline (Fellegi–Sunter framing;
  * public descriptions in the record-linkage literature): a cheap
  * BLOCKING key partitions both sides, candidate pairs form only
  * within a block, and the expensive field-similarity score runs on
  * candidates only. The emitted pairs usually feed
  * [[Graph.connectedComponents]] to form entity clusters.
  *
  * Scale posture (100 TB): the pair space is Σ_b |L_b|·|R_b| over
  * blocks — the blocking key's quality IS the cost model, so the
  * operator reports nothing globally quadratic. The join is a plain
  * equi-join on the block key (hash shuffle both sides, AQE handles a
  * skewed block); every distance runs as Spark's THRESHOLD
  * `levenshtein(l, r, k)` — a banded DP that touches only the
  * 2k+1-wide diagonal and aborts early, so a candidate pair costs
  * O(k·len) instead of O(len²), and for the ≥99% of block pairs that
  * are NOT matches the abort fires long before the band completes
  * (the unbounded form benched 6× slower on the same pair volume).
  * Within the threshold the banded result IS the exact distance, so
  * nothing is recomputed for survivors. A hot block (e.g. a NULL
  * or default-valued key) should be capped or salted upstream —
  * `maxBlockSize` EXCLUDES oversized blocks (both sides, so no
  * half-blocked pair can emit) rather than letting one block go
  * quadratic; run [[graft.operators.Profile.skewReport]] on the
  * block key to see what a given cap cuts.
  */
object Linkage {

  /** Candidate pairs within `maxDistance` total edit distance over
    * `compareCols` (summed per-field Levenshtein), blocked on
    * `blockCol` (pre-computed on both sides).
    *
    * Returns `leftIdCol`, `rightIdCol`, per-field distances
    * (`d_<field>`) and `distance` (the sum), one row per matched
    * pair. Blocks exceeding `maxBlockSize` ROWS on either side are
    * EXCLUDED entirely (a degenerate block key would otherwise
    * dominate the run quadratically); pass None to disable. The cap
    * deliberately counts rows, not distinct ids — the join's cost is
    * rows_left × rows_right, so a duplicate-keyed input is exactly as
    * expensive as a distinct one and is capped the same way.
    */
  def linkPairs(
      left: DataFrame,
      right: DataFrame,
      leftIdCol: String,
      rightIdCol: String,
      blockCol: String,
      compareCols: Seq[(String, String)],
      maxDistance: Int,
      maxBlockSize: Option[Int] = Some(10000)): DataFrame = {
    require(compareCols.nonEmpty, "linkPairs needs compare columns")
    require(leftIdCol != rightIdCol,
      s"leftIdCol and rightIdCol are both '$leftIdCol' — the output " +
        "would carry two identically-named id columns; rename one side")
    val l = left.select(
      (col(blockCol).as("_blk") +: col(leftIdCol).cast("long").as("_lid") +:
        compareCols.map { case (lc, _) => col(lc).as(s"_l_$lc") }): _*)
    val r = right.select(
      (col(blockCol).as("_blk") +: col(rightIdCol).cast("long").as("_rid") +:
        compareCols.map { case (_, rc) => col(rc).as(s"_r_$rc") }): _*)
    val (lf, rf) = maxBlockSize match {
      case None => (l, r)
      case Some(cap) =>
        // One small aggregate per side; blocks over the cap are cut
        // from BOTH sides so the output never contains a half-blocked
        // pair. Anti-join on a tiny hot-block list → broadcast.
        val hot = l.groupBy("_blk").agg(count(lit(1)).as("n"))
          .unionByName(r.groupBy("_blk").agg(count(lit(1)).as("n")))
          .groupBy("_blk").agg(max("n").as("n"))
          .filter(col("n") > cap)
          .select("_blk")
        (l.join(broadcast(hot), Seq("_blk"), "left_anti"),
          r.join(broadcast(hot), Seq("_blk"), "left_anti"))
    }
    // Banded distances: exact when <= maxDistance, -1 when above (a
    // field above the TOTAL budget can never survive, so -1 is a
    // clean reject). Computed once in a projection; the match filter
    // and the output read the materialized columns.
    val dists = compareCols.map { case (lc, rc) =>
      s"d_$lc" -> graft.functions.BoundedEditDistance.boundedLevenshtein(
        col(s"_l_$lc"), col(s"_r_$rc"), maxDistance)
    }
    val total = dists.map { case (n, _) => col(n) }.reduce(_ + _)
    val inBand = dists.map { case (n, _) => col(n) >= 0 }.reduce(_ && _)
    val outCols = col("_lid").as(leftIdCol) +: col("_rid").as(rightIdCol) +:
      dists.map { case (n, _) => col(n) } :+ total.as("distance")
    lf.join(rf, Seq("_blk"))
      .select(col("_lid") +: col("_rid") +:
        dists.map { case (n, c) => c.as(n) }: _*)
      .filter(inBand && total <= lit(maxDistance))
      .select(outCols: _*)
  }

  /** Sorted-neighborhood record linkage (Hernández/Stolfo's merge-
    * purge method; public descriptions only) — the OTHER classic
    * candidate discipline: both sides merge into one list sorted by
    * `sortKeyCol`, and only records within `windowSize` positions
    * compare. Where [[linkPairs]] needs a good equality blocking key,
    * this needs a good SORT key: near-duplicates land adjacent even
    * when every blocking attribute is dirty, and candidate volume is
    * exactly n·(w−1) — linear by construction, skew-free.
    *
    * The global sort position is a DISTRIBUTED rank, not a global
    * window: range-repartition on (sort key, side, id), per-partition
    * row_number, partition-count-sized offsets broadcast back — rank
    * is exact (prefix COUNTS, unaffected by boundary sampling), and
    * the neighbor probe is then a plain integer equi-join of each
    * record against rank+1..rank+w−1. Cross-side pairs within the
    * edit budget emit with their banded distance (same
    * [[graft.functions.BoundedEditDistance]] kernel).
    */
  def sortedNeighborPairs(
      left: DataFrame,
      right: DataFrame,
      leftIdCol: String,
      rightIdCol: String,
      sortKeyLeft: String,
      sortKeyRight: String,
      compareLeft: String,
      compareRight: String,
      maxDistance: Int,
      windowSize: Int = 10,
      partitions: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(leftIdCol != rightIdCol,
      "leftIdCol and rightIdCol must differ (output carries both)")
    require(windowSize >= 2, "windowSize must be >= 2")
    val p = if (partitions > 0) partitions
      else left.sparkSession.sessionState.conf.numShufflePartitions
    val l = left.select(col(leftIdCol).cast("long").as("_id"),
      lit(0).as("_side"), col(sortKeyLeft).as("_key"),
      col(compareLeft).as("_cmp"))
    val r = right.select(col(rightIdCol).cast("long").as("_id"),
      lit(1).as("_side"), col(sortKeyRight).as("_key"),
      col(compareRight).as("_cmp"))
    val order = Seq(col("_key").asc, col("_side").asc, col("_id").asc)
    // cached before the range exchange: boundary sampling re-runs
    // both caller frames' lineages otherwise (packingManifestFrom
    // lesson); four narrow columns, released in the epilogue
    val src = l.unionByName(r)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val local = src
      .repartitionByRange(p, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("__pid", spark_partition_id())
      // per-partition row number via the stateful prefix-sum kernel —
      // a row_number window over __pid would re-shuffle the corpus a
      // second time (the packingManifestFrom plan-audit lesson)
      .withColumn("__rn",
        graft.functions.PartitionPrefixSum.partitionRunningTotal(lit(1L)))
      .persist()
    val offsets = local.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__t"))
      .withColumn("__off",
        coalesce(sum(col("__t")).over(
          Window.partitionBy(pmod(col("__pid"), lit(1)))
            .orderBy(col("__pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__off"))
    val ranked = local.join(broadcast(offsets), Seq("__pid"))
      .select(col("_id"), col("_side"), col("_cmp"),
        (col("__rn") + col("__off")).as("_rank"))
    val probes = ranked.select(col("_id").as("_ida"),
        col("_side").as("_sa"), col("_cmp").as("_ca"),
        explode(sequence(col("_rank") + 1,
          col("_rank") + (windowSize - 1))).as("_rank"))
    val d = graft.functions.BoundedEditDistance.boundedLevenshtein(
      col("_ca"), col("_cmp"), maxDistance)
    val out = probes.join(ranked, Seq("_rank"))
      .filter(col("_sa") =!= col("_side"))
      .select(
        when(col("_sa") === 0, col("_ida")).otherwise(col("_id"))
          .as(leftIdCol),
        when(col("_sa") === 0, col("_id")).otherwise(col("_ida"))
          .as(rightIdCol),
        d.as("distance"))
      .filter(col("distance") >= 0 && col("distance") <= maxDistance)
    // session-cache hygiene: materialize the (small) pair output,
    // release the ranked table
    val materialized = out.localCheckpoint()
    local.unpersist()
    src.unpersist()
    materialized
  }
}
