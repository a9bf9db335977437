package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group top-n rows WITHOUT a window: the aggregate-shaped plan
  * for "k best rows per key" at corpus scale.
  *
  * The window idiom (`row_number() OVER (PARTITION BY key ORDER BY
  * ...) <= n`) shuffles and sorts EVERY row and runs each key in one
  * task — a hot key (one domain, one user, one label) becomes the
  * straggler. Here each row is folded into a size-capped heap by
  * [[graft.functions.TopK]]: partial aggregation reduces every
  * (partition, key) to ≤ n candidates BEFORE the exchange, so the
  * shuffle carries bounded state per group no matter how skewed the
  * input ([[graft.ml.Curation.domainCap]] is the same shape
  * specialized to min-ids; this is the general ordered version).
  */
object TopN {

  /** The n smallest rows per key group under the lexicographic order
    * of `orderCols` (negate a numeric column for descending). Include
    * a unique tie-breaker in `orderCols` for deterministic output —
    * ties beyond it resolve by the row payload itself. Rows where any
    * order column is null sort by Catalyst's interpreted struct
    * ordering (nulls first).
    *
    * Returns the original columns of the surviving rows.
    */
  def topNPerKey(
      df: DataFrame, keys: Seq[String], orderCols: Seq[Column],
      n: Int): DataFrame = {
    require(keys.nonEmpty, "topNPerKey needs at least one key column")
    require(orderCols.nonEmpty, "topNPerKey needs at least one order column")
    val item = struct(
      orderCols.zipWithIndex.map { case (c, i) => c.as(s"__o$i") } :+
        struct(df.columns.map(col).toSeq: _*).as("__row"): _*)
    df.groupBy(keys.map(col): _*)
      .agg(graft.functions.TopK.topK(item, n).as("__top"))
      .select(explode(col("__top")).as("__e"))
      .select(df.columns.toSeq.map(c =>
        col("__e").getField("__row").getField(c).as(c)): _*)
  }
}
