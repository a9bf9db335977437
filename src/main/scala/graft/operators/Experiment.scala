package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Mix64

/** A/B experiment readout: deterministic unit→variant assignment plus
  * the per-variant metric summary and lift vs control — the analysis
  * every event-logging warehouse (SURVEY §1.5's fact tables) runs
  * daily.
  *
  * Assignment is a pure hash of the unit id (splitmix64, seeded), so
  * it is stable across runs, engines, and partitionings — the property
  * that makes the experiment auditable. A unit's every row lands in
  * the same variant (assignment precedes any aggregation), which is
  * what makes unit-level randomization valid.
  *
  * Scale posture: one map-side-combinable aggregation keyed by the
  * handful of variants; the control row re-attaches as a broadcast
  * single row for lift. Nothing driver-sized depends on the data
  * volume.
  */
object Experiment {

  /** Per-variant (n, mean, lift vs variant 0). `variants` must be a
    * power of two: the bucket is the hash's low bits, which keeps the
    * signed/unsigned question out of cross-engine replays (a modulo
    * on a signed hash differs between engines on negative values).
    * Means are decimal-summed and 6dp-rounded before the lift
    * subtraction, so both engines draw identical lifts.
    */
  def abReport(
      df: DataFrame,
      unitCol: String,
      metricCol: String,
      variants: Int = 2,
      seed: Int = 17): DataFrame = {
    require(variants >= 2 && (variants & (variants - 1)) == 0,
      s"variants must be a power of two, got $variants")
    val assigned = df.withColumn("variant",
      Mix64.mix64(col(unitCol).cast("long"), seed)
        .bitwiseAND(lit((variants - 1).toLong)))
    val stats = assigned.groupBy(col("variant"))
      .agg(count(lit(1)).as("n"),
        round(sum(col(metricCol).cast("decimal(18,4)")).cast("double")
          / count(lit(1)), 6).as("mean"))
    val control = stats.filter(col("variant") === 0)
      .select(col("mean").as("__m0"))
    stats.crossJoin(broadcast(control))
      .select(col("variant"), col("n"), col("mean"),
        round(col("mean") - col("__m0"), 6).as("lift"))
  }
}
