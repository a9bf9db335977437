package graft.ml

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed graph operators for dedup pipelines.
  *
  * The near-dup operators ([[Dedup.jaccardPairs]], MinHash/SimHash
  * bucketing) emit PAIRS; turning pairs into deletion/keep decisions
  * needs the transitive closure — duplicate CLUSTERS. That is
  * connected components over the pair graph.
  */
object Graph {

  /** Connected components by min-label propagation with pointer
    * shortcutting: every node's label converges to the smallest node
    * id in its component. Returns (id, component) for every node
    * appearing in `edges`. Duplicate and self edges are tolerated
    * (the per-node min is idempotent), so inputs need no distinct.
    *
    * Round structure: neighbor labels union node labels, min per node
    * (one key shuffle), then one path-halving hop — each node's new
    * label is looked up in the previous label table
    * (`label := label(label)`), so label distance to the component
    * minimum roughly DOUBLES per round instead of shrinking by one.
    * Plain propagation needs diameter rounds; with shortcutting a
    * diameter-d chain converges in ~log2(d) rounds (the same O(log)
    * regime as the large-star/small-star rewrite of Kiveris et al.,
    * "Connected Components in MapReduce", SoCC'14, without rewriting
    * the edge table). Dup clusters are clique-ish and converge in 2
    * rounds; `maxIter` bounds adversarial inputs.
    *
    * Each round is ONE materializing job — including the convergence
    * decision. The round's row stream increments a change accumulator
    * as it fills the persisted label blocks, so "did any label move"
    * rides the materializing tasks themselves: no follow-up probe job,
    * no `Observation.get` (which blocks on the listener bus — a
    * backlogged bus in a long-lived session stalls every round), and
    * accumulator totals return with task completion, bus-free. A
    * retried task can only over-count, never under-count, so the
    * zero/non-zero convergence test is retry-safe. Lineage is
    * truncated at BOTH levels each round: the materialized
    * `RDD[InternalRow]` is (local-)checkpointed, and the next round
    * plans against a fresh `LogicalRDD` leaf over it — Catalyst never
    * sees the join tower. Round 1 folds the identity-label join into
    * a single aggregation over the edge table: with label(id)=id the
    * neighbor-min is just min(src) per dst, and the symmetrized table
    * lists every node as a dst.
    *
    * Scale posture (100 TB): the working set is (id, label) pairs —
    * 16 bytes/node — never documents. The symmetrized edge table is
    * produced from ONE scan of `edges` (explode of both directions,
    * not a self-union: the input's lineage is typically an expensive
    * near-dup pair kernel, and a union would evaluate it once per
    * branch), hash-partitioned on the join key with the partition
    * count pinned to `spark.sql.shuffle.partitions` so the per-round
    * join reuses its layout, and persisted. Pass `checkpointDir` on a
    * real cluster for RELIABLE label checkpoints that survive executor
    * loss; the local-checkpoint default stores blocks on executors and
    * is only appropriate for single-node / fast-retry runs. Superseded
    * local-checkpoint blocks are freed at RDD level (Dataset.unpersist
    * does not route to them), keeping one label table live.
    */
  def connectedComponents(
      edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 20,
      checkpointDir: Option[String] = None): DataFrame = {
    require(maxIter >= 1, s"maxIter must be >= 1 (got $maxIter)")
    val spark = edges.sparkSession
    val nPart = spark.sessionState.conf.numShufflePartitions
    checkpointDir.foreach(spark.sparkContext.setCheckpointDir)

    val sym = edges
      .select(explode(array(
        struct(col(srcCol).as("src"), col(dstCol).as("dst")),
        struct(col(dstCol).as("src"), col(srcCol).as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .repartition(nPart, col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    var prevRdd: RDD[InternalRow] = null
    var labels: DataFrame = null
    var changed = 1L
    var iter = 0
    val debug = sys.env.get("GRAFT_CC_DEBUG").contains("1")
    while (iter < maxIter && changed != 0L) {
      val roundT0 = System.nanoTime()
      val prop =
        if (iter == 0)
          sym.groupBy(col("dst"))
            .agg(min(col("src")).as("m"))
            .select(col("dst").as("id"),
              least(col("m"), col("dst")).as("component"),
              col("dst").as("prev"))
        else {
          val msgs = sym.join(labels, sym("src") === labels("id"))
            .select(sym("dst").as("id"), col("component"),
              lit(false).as("own"))
          val propagated = msgs
            .unionByName(labels.withColumn("own", lit(true)))
            .groupBy(col("id"))
            .agg(min(col("component")).as("component"),
              min(when(col("own"), col("component"))).as("prev"))
          // Path-halving hop: labels decrease monotonically (every
          // label table maps id -> value <= id), so the looked-up
          // label can only improve on the propagated one; left join +
          // coalesce keeps the row when the label already IS the
          // component minimum. The hop only pays off on long chains —
          // dup-cluster graphs are clique-ish and converge by round 2,
          // where the extra join+exchange per round is pure constant
          // cost — so it joins the plan from round 3 on: cliques never
          // see it, and a diameter-d chain still closes in
          // 2 + O(log d) rounds.
          val halved =
            if (iter < 2) propagated
            else propagated.as("n").join(labels.as("l"),
                col("n.component") === col("l.id"), "left")
              .select(col("n.id").as("id"),
                coalesce(col("l.component"), col("n.component"))
                  .as("component"),
                col("n.prev").as("prev"))
          halved
        }
      // ONE job: materialize the round's label blocks while counting
      // moved labels into an accumulator. The change flag is computed
      // in the plan (type-generic, null-safe); the task-side map only
      // reads the boolean and copies the unsafe row into the persisted
      // block. No probe job, no listener-bus wait — `acc.value` is
      // populated by task completion inside the count() itself.
      val round = prop.select(col("id"), col("component"),
        coalesce(col("component") =!= col("prev"), lit(true)).as("__chg"))
      val schema = round.schema
      val acc = spark.sparkContext.longAccumulator(s"graft.cc.changed.$iter")
      val rdd = round.queryExecution.toRdd.mapPartitions { it =>
        it.map { r =>
          if (r.getBoolean(2)) acc.add(1L)
          r.copy()
        }
      }
      if (checkpointDir.isDefined) {
        // reliable mode: cache first so the checkpoint-write job reads
        // blocks instead of recomputing the round
        rdd.persist(StorageLevel.MEMORY_AND_DISK)
        rdd.checkpoint()
      } else rdd.localCheckpoint()
      rdd.count()
      changed = acc.value
      // superseded label blocks: free at RDD level (these live outside
      // the CacheManager; Dataset.unpersist would be a no-op)
      if (prevRdd != null) prevRdd.unpersist(blocking = false)
      prevRdd = rdd
      labels = GraftBridge.internalCreateDataFrame(spark, rdd, schema)
        .select(col("id"), col("component"))
      if (debug) println(
        f"[cc] round $iter: ${(System.nanoTime() - roundT0) / 1e9}%.2f s, changed=$changed")
      iter += 1
    }
    sym.unpersist()
    labels
  }

  /** Fixed-point PageRank: ranks held as INTEGER `scale`-ths (default
    * millionths) so every iteration is integer-only arithmetic —
    * grouped sums are order-free and division is floor-div, which
    * makes the result bit-identical on any engine, partitioning, or
    * retry (a float PageRank differs in final ulps between runs, so
    * it can never be oracle-gated). The cost is the standard
    * fixed-point truncation: each hop loses < 1/scale per edge,
    * bounded and deterministic.
    *
    * Per iteration: rank(u)·dampNum div (dampDen·outdeg(u)) flows to
    * each out-neighbor (one edge-keyed join + one dst-keyed grouped
    * sum — the canonical Pregel round as two exchanges), plus the
    * (1−d) teleport mass. Dangling nodes leak their damped mass, the
    * usual simplification. The edge/out-degree tables are computed
    * once and persisted across iterations; intermediates unpersist
    * before returning (session-cache hygiene). Iterations are fixed
    * (`iters`), not convergence-tested — rank deltas shrink
    * geometrically, so a caller picks the horizon.
    *
    * Returns (node, pr) for every node in the edge table, pr in
    * `scale`-ths summing to ≤ nodes·scale.
    */
  def pageRankFixedPoint(
      edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 3,
      dampNum: Long = 85, dampDen: Long = 100,
      scale: Long = 1000000L): DataFrame = {
    require(iters >= 1 && dampDen > 0 && scale > 0)
    val e = edges.select(
      col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val teleport = (scale * (dampDen - dampNum)) / dampDen

    var pr = nodes.withColumn("pr", lit(scale))
    var prevRdd: RDD[InternalRow] = null
    for (_ <- 1 to iters) {
      val contrib = e
        .join(pr.withColumnRenamed("node", "src"), Seq("src"))
        .join(outdeg, Seq("src"))
        .select(col("dst").as("node"),
          expr(s"(pr * ${dampNum}L) div (${dampDen}L * deg)").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("in_mass"))
      val next = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(teleport) + coalesce(col("in_mass"), lit(0L))).as("pr"))
      // Truncate the per-iteration join tower at RDD level (the CC
      // pattern): materialize + localCheckpoint the InternalRow RDD,
      // free the SUPERSEDED iteration's blocks, re-plan against a
      // fresh leaf. Dataset.localCheckpoint per iteration would leak
      // one persisted RDD per round for the session's lifetime.
      val schema = next.schema
      val rdd = next.queryExecution.toRdd.map(_.copy())
      rdd.localCheckpoint()
      rdd.count()
      if (prevRdd != null) prevRdd.unpersist(blocking = false)
      prevRdd = rdd
      pr = GraftBridge.internalCreateDataFrame(
        edges.sparkSession, rdd, schema)
    }
    e.unpersist(); nodes.unpersist(); outdeg.unpersist()
    pr
  }

  /** Bounded k-core peeling: `iters` rounds of "drop every node whose
    * degree in the current subgraph is below k" (the standard core-
    * decomposition peel — Batagelj/Zaveršnik's sequential algorithm,
    * done level-synchronously as in the Quick/Wilkinson/Naughton
    * MapReduce formulation; public descriptions only). With `iters`
    * large enough to converge this yields the exact k-core; a small
    * fixed `iters` is the deterministic, oracle-checkable prefix
    * (identical round structure to [[pageRankFixedPoint]]).
    * Returns `(n, deg)` — surviving nodes with their degree in the
    * peeled subgraph (degree >= k by construction).
    *
    * Scale posture: each round is one degree aggregation plus two
    * semi-joins on the node id — all hash-partitioned on 8-byte keys,
    * nothing data-squared. The surviving edge set is materialized and
    * local-checkpointed per round (superseded blocks freed), so
    * Catalyst plans each peel against a flat leaf instead of a
    * growing join tower — the same discipline as the CC/PageRank
    * loops. Cost is rounds × m; when that flags at scale, the named
    * scale path is peeling the [[sampleEdgesDeterministic]] p-sample
    * at threshold ⌈k·p⌉ — sampled degrees concentrate at p·deg
    * (Chernoff), so the sampled core approximates the k-core
    * membership on ~p of the edge volume (graph sparsification; the
    * estimate is membership-approximate, not exact — use the full
    * peel when exact coreness is the contract).
    */
  def kCorePeel(
      edges: DataFrame, srcCol: String, dstCol: String,
      k: Int, iters: Int, canonical: Boolean = false): DataFrame = {
    require(k >= 1 && iters >= 1)
    // `canonical = true`: input is already distinct with src < dst —
    // skip the re-canonicalization distinct (an extra edge-set shuffle)
    val canon =
      if (canonical) edges.select(
        col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
      else edges
        .filter(col(srcCol) =!= col(dstCol))
        .select(
          least(col(srcCol), col(dstCol)).cast("long").as("u"),
          greatest(col(srcCol), col(dstCol)).cast("long").as("v"))
        .distinct()
    // Materialize the canonical edge set BEFORE round 1: the first
    // round references it three times (degree agg + two semi-joins),
    // and an expensive derivation upstream (e.g. a per-basket
    // self-join) would otherwise run three times. Same RDD-level
    // truncation as the per-round checkpoints, so nothing registers
    // with the CacheManager.
    val schema0 = canon.schema
    val rdd0 = canon.queryExecution.toRdd.map(_.copy())
    rdd0.localCheckpoint()
    rdd0.count()
    var e = GraftBridge.internalCreateDataFrame(
      edges.sparkSession, rdd0, schema0)
    var prevRdd: RDD[InternalRow] = rdd0
    for (_ <- 1 to iters) {
      val deg = e.select(col("u").as("n"))
        .unionAll(e.select(col("v").as("n")))
        .groupBy("n").agg(count(lit(1)).as("d"))
      val keep = deg.filter(col("d") >= k).select(col("n"))
      val next = e
        .join(keep.withColumnRenamed("n", "u"), Seq("u"), "leftsemi")
        .join(keep.withColumnRenamed("n", "v"), Seq("v"), "leftsemi")
        .select(col("u"), col("v"))
      // Same per-round lineage truncation as pageRankFixedPoint: the
      // surviving edge set materializes once per peel, superseded
      // blocks freed, next round plans against a fresh leaf.
      val schema = next.schema
      val rdd = next.queryExecution.toRdd.map(_.copy())
      rdd.localCheckpoint()
      rdd.count()
      if (prevRdd != null) prevRdd.unpersist(blocking = false)
      prevRdd = rdd
      e = GraftBridge.internalCreateDataFrame(edges.sparkSession, rdd, schema)
    }
    e.select(col("u").as("n")).unionAll(e.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("deg"))
      .filter(col("deg") >= k)
  }

  /** Deterministic edge sampling for approximate graph kernels: keep
    * edge (u, v) iff `mix64(u << 32 | v, seed) mod denom < keep` —
    * expected keep rate p = keep/denom, decided by a pure stateless
    * hash of the edge's own endpoints (the repo's splitmix64 kernel,
    * [[graft.functions.Mix64]]), so the sample is reproducible under
    * task retry / re-partitioning AND replayable exactly by the
    * DuckDB oracle (q64's stratified-sampler discipline — no RNG
    * state, no sampling variance between engines).
    *
    * `denom` must be a power of two: the oracle computes the mod on
    * the UNSIGNED 64-bit value while the engine's `pmod` sees the
    * signed long — the two agree exactly when the modulus divides
    * 2^64. Node ids must fit in 32 bits for the shift-combine to be
    * injective (true for every graph in this repo; at larger id
    * spaces re-key with a dense rank first — standard practice, since
    * 64-bit adjacency arithmetic wants compact ids anyway).
    *
    * Canonicalize (`u < v`) BEFORE sampling so both orientations of
    * an undirected edge share one keep decision.
    */
  /** The keep predicate of [[sampleEdgesDeterministic]], exposed so
    * callers can push the sampling BELOW their own exchanges: the
    * decision is a pure function of the edge's endpoints, so it
    * commutes with DISTINCT / repartition / join — filtering inside
    * an edge DERIVATION (before its dedup shuffle) removes ~(1−p) of
    * the rows from every downstream exchange instead of only from
    * the final result.
    */
  def edgeSampleKeep(
      src: Column, dst: Column,
      denom: Int, keep: Int, seed: Int,
      validateIds: Boolean = false): Column = {
    require(denom > 0 && (denom & (denom - 1)) == 0,
      s"denom must be a power of two (got $denom)")
    require(keep > 0 && keep <= denom, s"keep must be in [1, $denom]")
    val key = shiftleft(src.cast("long"), 32)
      .bitwiseOR(dst.cast("long"))
    val kept =
      pmod(graft.functions.Mix64.mix64(key, seed), lit(denom.toLong)) < keep
    if (!validateIds) kept
    else {
      // The shift-combine is injective only for ids in [0, 2^32):
      // out-of-range ids silently alias keys and skew the keep rate.
      // With validateIds the predicate fails LOUDLY instead — one
      // extra codegen'd comparison pair per row, off by default for
      // repo graphs whose id domain is proven by construction.
      val inRange = src.between(0L, 0xFFFFFFFFL) &&
        dst.between(0L, 0xFFFFFFFFL)
      when(inRange, kept).otherwise(raise_error(concat(
        lit("edgeSampleKeep: node id outside [0, 2^32) — key aliasing; " +
          "re-key with a dense rank first (src="),
        src.cast("string"), lit(", dst="), dst.cast("string"), lit(")"))))
    }
  }

  def sampleEdgesDeterministic(
      edges: DataFrame, srcCol: String, dstCol: String,
      denom: Int, keep: Int, seed: Int,
      validateIds: Boolean = false): DataFrame =
    edges.filter(
      edgeSampleKeep(col(srcCol), col(dstCol), denom, keep, seed,
        validateIds))

  /** DOULION-style sampled triangle estimate (Tsourakakis, Kang,
    * Miller & Faloutsos, "DOULION: counting triangles in massive
    * graphs with a coin", KDD'09 — public algorithm): sparsify with
    * [[sampleEdgesDeterministic]] at p = keep/denom, count triangles
    * exactly on the sample via [[triangleCounts]], scale by 1/p³. A
    * triangle survives iff all three edges do (probability p³), so
    * the estimate is UNBIASED; the paper bounds the variance at
    * T·(1/p³ − 1) + 2k·(1/p − 1) for T triangles and k pairs of
    * triangles sharing an edge — concentration is excellent exactly
    * where sampling matters (many triangles). The exact closure is
    * Θ(m^1.5); sampling at p cuts the expected intersection work by
    * ~p^1.5 and the candidate volume by p², which is THE scale path
    * past the second decade for [[triangleCounts]]'s two sf10 flags.
    *
    * Returns ONE row: (sampled_edges, tri_sampled, est_triangles)
    * with est_triangles = tri_sampled · (denom/keep)³ — integer-exact
    * when keep = 1, so the oracle replay hash-matches.
    */
  def triangleEstimateSampled(
      edges: DataFrame, srcCol: String, dstCol: String,
      denom: Int, keep: Int = 1, seed: Int = 61,
      broadcastEdgeLimit: Long = 8000000L,
      canonical: Boolean = false): DataFrame =
    triangleEstimateFromSample(
      sampleEdgesDeterministic(edges, srcCol, dstCol, denom, keep, seed),
      srcCol, dstCol, denom, keep, broadcastEdgeLimit, canonical)

  /** [[triangleEstimateSampled]] over an ALREADY-sampled edge set —
    * for callers that pushed [[edgeSampleKeep]] below their own edge
    * derivation (so the derivation's dedup exchange already ran on
    * ~p of the pairs). The caller owns the invariant that `sampled`
    * was drawn at exactly `keep`/`denom`; the scale factor here must
    * match or the estimate is biased.
    */
  def triangleEstimateFromSample(
      sampled0: DataFrame, srcCol: String, dstCol: String,
      denom: Int, keep: Int = 1,
      broadcastEdgeLimit: Long = 8000000L,
      canonical: Boolean = false): DataFrame = {
    // one derivation feeds the edge count AND the closure; without a
    // persist the upstream edge derivation (often a per-basket pair
    // expansion) runs twice. Persist only when the caller has not —
    // unconditionally unpersisting would evict a cache the caller
    // still holds (r11 advice).
    val weCache =
      sampled0.storageLevel == org.apache.spark.storage.StorageLevel.NONE
    val sampled = if (weCache) sampled0.persist() else sampled0
    val perNode = triangleCounts(sampled, srcCol, dstCol,
      broadcastEdgeLimit, canonical)
    // Σ per-node counts = 3·T on the sample (each triangle credits
    // its three corners once each)
    val m = sampled.agg(count(lit(1)).as("sampled_edges"))
    // integral `div`, not `/`: double division is exact only to 2^53
    // and this row is the query's one output
    val t = perNode.agg(coalesce(sum(col("n_tri")), lit(0L)).as("__s"))
      .select(expr("__s div 3").as("tri_sampled"))
    // 1/p³ scale: exact integer arithmetic when keep | denom (the
    // oracle-replayed configurations — keep = 1 always qualifies);
    // otherwise (denom/keep)³ is non-integral and rounding the SCALE
    // before multiplying biases the DOULION estimator by up to ~16%
    // (r11 advice) — compute the product in double precision and
    // round the final estimate instead (error ≤ 0.5 triangles).
    // saturate conservatively below Long.MaxValue: a double→long cast
    // of an overflowing value throws under ANSI (wraps otherwise) —
    // an estimate that large carries no information beyond "huge"
    def saturating(d: Column): Column =
      when(d >= 9.2e18, lit(Long.MaxValue))
        .otherwise(round(d).cast("long"))
    val est: Column =
      // exact long arithmetic needs q³ < 2^63, i.e. q < 2^21 — past
      // that q*q*q silently wraps (possibly negative); such extreme
      // sparsification falls through to the double path, which
      // saturates instead of wrapping (r12 review finding)
      if (denom % keep == 0 && (denom / keep) < (1 << 21)) {
        val scale = { val q = (denom / keep).toLong; q * q * q }
        // the PRODUCT must fit too: tri_sampled·scale ≥ 2^63 wraps
        // (or throws under ANSI) even when scale alone fits, e.g.
        // denom = 2^20, keep = 1, tri_sampled ≥ 9 — rows past the
        // per-row fit bound take the saturating double path (r12
        // advice)
        when(col("tri_sampled") <= lit(Long.MaxValue / scale),
          col("tri_sampled") * lit(scale))
          .otherwise(saturating(
            col("tri_sampled").cast("double") * lit(scale.toDouble)))
      } else saturating(col("tri_sampled").cast("double") *
        lit(math.pow(denom.toDouble / keep, 3)))
    val out = m.crossJoin(t) // two one-row frames — bounded metadata
      .select(col("sampled_edges"), col("tri_sampled"),
        est.as("est_triangles"))
      .localCheckpoint(true)
    if (weCache) sampled.unpersist()
    out
  }

  /** Per-node triangle counts by degree-oriented node iteration
    * (Schank/Wagner "forward" algorithm; the MapReduce formulation is
    * Suri & Vassilvitskii, WWW'11 — public algorithm descriptions
    * only).
    *
    * Input is an undirected edge list; direction, duplicates, and
    * self-loops are tolerated (edges canonicalize to `u < v` distinct
    * first). Returns `(node, n_tri)` for every node that closes at
    * least one triangle.
    *
    * Scale posture (100 TB of edges): the naive wedge join — pair up
    * every two neighbors of every node — generates Σ deg(v)² wedge
    * candidates, which a single celebrity node (deg 10⁷ in a web or
    * social graph) turns into 10¹⁴ rows. ORIENTATION is the fix:
    * each canonical edge points from its lower-(degree, id) endpoint
    * to the higher, so every node's out-degree is bounded by O(√m)
    * and the total intersection work is O(m^{3/2}) regardless of
    * skew — the best possible for exact counting. Θ(m^1.5) is
    * superlinear BY CONTRACT (a 10× edge step costs ~31.6×); when the
    * count, not the per-node attribution, is the product, the named
    * scale path is [[triangleEstimateSampled]] — the same closure on
    * a deterministic p-sample, unbiased at 1/p³.
    *
    * The closure itself never materializes wedges as rows: the
    * triangles through an oriented edge (x, y) are N⁺(x) ∩ N⁺(y), one
    * native merge scan of two sorted adjacency arrays per edge. Each
    * triangle is found exactly once (at its base edge — the pair of
    * lowest-ordered corners). Shuffles: degree agg, adjacency agg,
    * and — only past `broadcastEdgeLimit` edges, when the 8·m-byte
    * adjacency table stops being broadcastable — two equi-joins of
    * the edge list against it. The wedge volume then crosses the wire
    * as 8-byte array elements inside adjacency rows, not as ~30-byte
    * wedge rows through a sort — measured 10× faster on a 12M-edge
    * co-purchase graph (64s → 6s for the closure stage).
    */
  def triangleCounts(
      edges: DataFrame, srcCol: String, dstCol: String,
      broadcastEdgeLimit: Long = 8000000L,
      canonical: Boolean = false): DataFrame = {
    // canon feeds THREE plan references (the degree union's two legs
    // and the orientation join) — persist it, or the upstream edge
    // derivation (often a join in the caller) re-runs per reference.
    // `canonical = true` asserts the input is ALREADY distinct with
    // src < dst (e.g. generated by an in-row pair expansion) and skips
    // the re-canonicalization distinct — a full extra shuffle of the
    // edge set otherwise.
    // node ids ride as long end to end (the adjacency intersection
    // kernel is array<long>-typed); output `node` is long
    val canon = (if (canonical)
        edges.select(col(srcCol).cast("long").as("u"),
          col(dstCol).cast("long").as("v"))
      else edges
        .filter(col(srcCol) =!= col(dstCol))
        .select(
          least(col(srcCol), col(dstCol)).cast("long").as("u"),
          greatest(col(srcCol), col(dstCol)).cast("long").as("v"))
        .distinct())
      .persist()
    // Total-order rank (degree, id): ties on degree break by id, so
    // orientation is a strict total order and no edge is lost or
    // doubled.
    val deg = canon.select(col("u").as("n"))
      .unionAll(canon.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    val ranked = canon
      .join(deg.withColumnRenamed("n", "u").withColumnRenamed("d", "du"),
        Seq("u"))
      .join(deg.withColumnRenamed("n", "v").withColumnRenamed("d", "dv"),
        Seq("v"))
    val oriented = ranked.select(
      when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")),
        struct(col("u").as("a"), col("v").as("b")))
        .otherwise(struct(col("v").as("a"), col("u").as("b")))
        .as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
      .persist()
    val m = oriented.count() // materialize once; reused by both joins
    // EDGE-CENTRIC closure (Ortmann/Brandes-style adjacency
    // intersection, public formulation): the triangles through an
    // oriented edge (x, y) are exactly N⁺(x) ∩ N⁺(y) — each triangle
    // is found once, at its base edge (the two lowest-ordered corners)
    // — so the probe is ONE intersection of two sorted adjacency
    // arrays per edge, never a materialized wedge stream. The r8
    // wedge-row formulation shuffled Σ outdeg² ROWS (~30 bytes each,
    // plus a sort) once the edge table outgrew the broadcast guard;
    // here the shuffled unit is the 8-byte array ELEMENT and the
    // intersection runs in the zero-allocation native merge scan
    // ([[graft.functions.SortedIntersect]]) — measured 10× on the
    // sf1 co-purchase graph (413M wedges: 64s → 6s closure).
    //
    // Per-node attribution: edge corners x and y each count every
    // common neighbor; each common neighbor z counts once.
    val adj = oriented.groupBy(col("a"))
      .agg(sort_array(collect_list(col("b"))).as("ns"))
      .persist()
    // The adjacency table is 8·m bytes raw (≈2-4× built as an
    // in-memory broadcast relation). Under the guard it broadcasts
    // (both joins collapse map-side); the 8M-edge default keeps the
    // built relation in the low hundreds of MB — survivable on a
    // default-sized driver; raise it per deployment (the bench
    // environment runs 32M on a 24g heap). Past the guard, two
    // shuffled equi-joins on 8-byte keys take over — worst-case
    // shuffle O(m·√m) array elements, the same asymptotic volume as
    // wedge rows at a 3-4× smaller constant and no wedge-stream sort.
    def side(k: String, v: String) =
      adj.select(col("a").as(k), col("ns").as(v))
    val e2 = oriented.select(col("a").as("x"), col("b").as("y"))
    val withAdj =
      if (m <= broadcastEdgeLimit)
        e2.join(broadcast(side("x", "nx")), Seq("x"))
          .join(broadcast(side("y", "ny")), Seq("y"))
      else
        e2.join(side("x", "nx"), Seq("x"))
          .join(side("y", "ny"), Seq("y"))
    val withCommon = withAdj.select(col("x"), col("y"),
      graft.functions.SortedIntersect
        .sortedIntersect(col("nx"), col("ny")).as("zs"))
    // No separate filter on size(zs): predicate pushdown would inline
    // (and re-evaluate) the intersection into the filter — instead an
    // empty-intersection row maps to an empty contribution array,
    // which explode drops for free. zs is referenced several times
    // here, all within ONE projection, so CollapseProject's
    // non-cheap-duplication guard keeps the upstream alias
    // materialized: one intersection per edge, total.
    val emptyContrib = array().cast("array<struct<node:bigint,c:bigint>>")
    val out = withCommon
      .select(explode(when(size(col("zs")) > 0, concat(
        array(
          struct(col("x").as("node"), size(col("zs")).cast("long").as("c")),
          struct(col("y").as("node"), size(col("zs")).cast("long").as("c"))),
        transform(col("zs"), z => struct(z.as("node"), lit(1L).as("c")))))
        .otherwise(emptyContrib))
        .as("t"))
      .groupBy(col("t.node").as("node"))
      .agg(sum(col("t.c")).as("n_tri"))
    // Same session-cache hygiene as jaccardPairs: the (node, count)
    // output — per-node cardinality, far smaller than the edge set —
    // materializes via localCheckpoint (ContextCleaner-managed), and
    // the CacheManager-registered tables are released before
    // returning, so a long-lived session running many graphs
    // accumulates nothing.
    val materialized = out.localCheckpoint()
    adj.unpersist()
    oriented.unpersist()
    canon.unpersist()
    materialized
  }
}
