package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental rollup maintenance — the materialized-view refresh a
  * warehouse runs instead of re-aggregating the world: keep the
  * persisted rollup at its grain, aggregate only the DELTA batch to
  * the same grain, and merge partial aggregates. Refresh cost scales
  * with the delta, never with the 100 TB base the rollup summarizes.
  *
  * Only ALGEBRAIC aggregates merge this way — sum, count, min, max
  * (and anything derived from them downstream: avg = sum/count,
  * stddev from (Σx, Σx², n)). Holistic aggregates (exact distinct,
  * exact median) do not; keep a sketch column (HLL for distinct — see
  * [[graft.ml.Sketches]]) when the rollup needs them.
  *
  * Determinism: merge order is a grouped aggregation, so integer and
  * DECIMAL columns are exact regardless of partitioning; double sum
  * columns inherit float addition-order sensitivity — route currency
  * sums through DECIMAL at the grain (the repo-wide policy).
  */
object IncrementalAgg {

  /** Aggregate a raw frame to the rollup grain: one sum column per
    * (outputName → input expression) plus a row count. Use for both
    * the initial build and each delta batch.
    */
  def atGrain(
      df: DataFrame, keys: Seq[String],
      sums: Seq[(String, Column)],
      minCols: Seq[String] = Nil, maxCols: Seq[String] = Nil,
      countCol: String = "n"): DataFrame = {
    require(keys.nonEmpty, "rollup needs a grain")
    val aggs = sums.map { case (name, e) => sum(e).as(name) } ++
      minCols.map(c => min(col(c)).as(s"min_$c")) ++
      maxCols.map(c => max(col(c)).as(s"max_$c")) :+
      count(lit(1)).as(countCol)
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Merge two same-grain partial rollups (the persisted base and an
    * [[atGrain]]-aggregated delta): sums and counts add, mins/maxes
    * combine. One grouped aggregation over rollup-sized inputs.
    */
  def merge(
      base: DataFrame, deltaAgg: DataFrame, keys: Seq[String],
      sumCols: Seq[String],
      minCols: Seq[String] = Nil, maxCols: Seq[String] = Nil,
      countCol: String = "n"): DataFrame = {
    val aggs = sumCols.map(c => sum(col(c)).as(c)) ++
      minCols.map(c => min(col(s"min_$c")).as(s"min_$c")) ++
      maxCols.map(c => max(col(s"max_$c")).as(s"max_$c")) :+
      sum(col(countCol)).as(countCol)
    base.unionByName(deltaAgg)
      .groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
