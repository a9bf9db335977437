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

  /** Connected components by iterated min-label propagation: every
    * node's label converges to the smallest node id in its component.
    * Returns (id, component) for every node appearing in `edges`.
    *
    * Each round is one shuffle: neighbor labels union node labels,
    * min per node. Rounds needed = graph diameter — near-dup clusters
    * are dense (clique-ish), so 2-4 rounds in practice; `maxIter`
    * bounds adversarial chains. Convergence is detected with a
    * changed-label count per round (an aggregate over the label
    * table, NOT a collect of it) so the loop stops as soon as labels
    * are stable.
    *
    * Scale posture (100 TB): the working set is (id, label) pairs —
    * 16 bytes/node — never documents; each iteration's shuffle is
    * keyed on node id, so AQE handles skewed hub nodes. Labels are
    * persisted per round and the previous round freed, keeping one
    * label-table copy live. For graphs with whale components beyond
    * diameter ~20, swap the propagation step for the large-star/
    * small-star rewrite (Kiveris et al., "Connected Components in
    * MapReduce", SoCC'14) — same (id,label) layout, O(log²) rounds.
    */
  def connectedComponents(
      edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 20): DataFrame = {
    // Symmetrize once; (src,dst) longs only. Pre-partitioned on the
    // join key so the per-round join reuses this layout instead of
    // re-exchanging the (2×edge) table every iteration — on a real
    // cluster the edge table is the big side and this is the
    // difference between one edge shuffle total and one per round.
    val sym = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .unionByName(edges.select(
        col(dstCol).as("src"), col(srcCol).as("dst")))
      .distinct()
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // Each round's label table is localCheckpoint'ed: without lineage
    // truncation the plan NESTS one join+agg per round and both
    // planning time and driver memory grow without bound (the classic
    // iterative-DataFrame failure); the checkpoint materializes the
    // (id, label) pairs and restarts the plan from them — on a
    // cluster this is also what bounds recomputation on executor
    // loss mid-iteration.
    //
    // Convergence is decided INSIDE the round's aggregation: label
    // rows ride the union tagged `own = true`, so min(component)
    // (the new label) and min(own ? component) (the previous label)
    // fall out of the same shuffle. The changed-row count is then a
    // filter over the just-checkpointed pairs — a local scan, not the
    // join + second shuffle per round this loop used to pay.
    var iter = 0
    var converged = false
    var labels: DataFrame = null
    var prevCheckpoint: DataFrame = null
    while (iter < maxIter && !converged) {
      // neighbor messages: each edge forwards its src's current label.
      // Round 1's join with labels would be the identity (label == id),
      // so the edge table IS the message table — skip the join.
      val msgs =
        if (iter == 0)
          sym.select(col("dst").as("id"), col("src").as("component"),
            lit(false).as("own"))
        else
          sym.join(labels, sym("src") === labels("id"))
            .select(col("dst").as("id"), col("component"),
              lit(false).as("own"))
      val ownRows =
        if (iter == 0)
          sym.select(col("src").as("id"), col("src").as("component"),
            lit(true).as("own"))
        else labels.withColumn("own", lit(true))
      val next = msgs.unionByName(ownRows)
        .groupBy(col("id"))
        .agg(min(col("component")).as("component"),
          min(when(col("own"), col("component"))).as("prev"))
        .localCheckpoint()
      // local scan of the checkpointed pairs; no rows reach the driver
      val changed = next.filter(col("component") =!= col("prev")).count()
      if (prevCheckpoint != null) prevCheckpoint.unpersist()
      prevCheckpoint = next
      labels = next.select(col("id"), col("component"))
      converged = changed == 0L
      iter += 1
    }
    sym.unpersist()
    labels
  }
}
