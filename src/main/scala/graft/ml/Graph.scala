package graft.ml

import org.apache.spark.sql.DataFrame
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
    * Each round is ONE materializing job: the label table is
    * checkpointed (truncating lineage — otherwise the plan nests one
    * join per round and planning time grows without bound), and
    * convergence is decided by a narrow limit-1 probe over the
    * checkpointed blocks (no shuffle, no re-execution; an Observation
    * metric would ride the job itself but its `get` blocks on the
    * listener bus, which backlogs in long-lived sessions). Round 1
    * folds the identity-label join into a single aggregation over the
    * edge table: with label(id)=id the neighbor-min is just min(src)
    * per dst, and the symmetrized table lists every node as a dst.
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

    // eager in both modes; reliable mode writes to checkpointDir
    def materialize(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint() else df.localCheckpoint()

    // Local-checkpoint blocks live outside the CacheManager, so
    // Dataset.unpersist is a no-op on them; unpersist the underlying
    // RDD instead. Reliable checkpoints are files — nothing to free
    // here (the ContextCleaner removes them with the reference).
    def free(df: DataFrame): Unit =
      if (checkpointDir.isEmpty) df.queryExecution.analyzed match {
        case lr: org.apache.spark.sql.execution.LogicalRDD =>
          lr.rdd.unpersist(blocking = false)
        case _ => ()
      }

    var current: DataFrame = null
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
      // Materialize the round, then decide convergence with a
      // narrow probe over the already-checkpointed blocks (limit-1
      // scan, no shuffle). An `Observation` on the checkpoint job
      // would avoid even that — but Observation.get waits on the
      // listener bus, and in a long-lived session (the 90-query
      // bench) a backlogged bus stalls every round for seconds; the
      // probe is bounded by the label table instead, which is tiny
      // by construction.
      val next = materialize(prop)
      changed =
        if (next.where(col("component") =!= col("prev")).isEmpty) 0L else 1L
      if (current != null) free(current)
      current = next
      labels = next.select(col("id"), col("component"))
      if (debug) println(
        f"[cc] round $iter: ${(System.nanoTime() - roundT0) / 1e9}%.2f s, changed=$changed")
      iter += 1
    }
    sym.unpersist()
    labels
  }
}
