package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional file layout: Z-order (Morton) keys.
  *
  * Range-partitioning a table on ONE column gives file-level pruning
  * for that column only; queries filtering the other dimension read
  * everything. Interleaving the bits of two columns into a Morton key
  * and range-sorting by it gives every file a small bounding box in
  * BOTH dimensions, so min/max file statistics prune for either
  * predicate — the lakehouse layout trick (Delta/Iceberg `ZORDER BY`)
  * expressed as plain Spark: compute the key, `repartitionByRange` +
  * `sortWithinPartitions` on it, write. No table format required.
  *
  * Scale posture: the key is a stateless codegen'd projection (a
  * fixed chain of shift/mask ops — no UDF, no lambda); the write is
  * one range exchange, which any sorted write pays anyway.
  */
object Layout {

  /** Morton-interleave the low `bits` bits of two non-negative int
    * columns: result bit `2i` = bit `i` of `x`, bit `2i+1` = bit `i`
    * of `y`. Nearby (x, y) points land near each other in key order.
    * `bits` ≤ 31 per dimension (the result uses `2*bits` bits of a
    * long); values are masked to `bits` bits first, so callers bucket
    * wider domains (`% (1 << bits)`) before keying.
    */
  def zOrderKey(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val mask = (1L << bits) - 1
    val xm = x.cast("long").bitwiseAND(lit(mask))
    val ym = y.cast("long").bitwiseAND(lit(mask))
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(xm, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(ym, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** Write `df` Z-ordered on (xCol, yCol): range-partition and sort by
    * the Morton key so each output file covers a compact rectangle of
    * the (x, y) domain, then drop the key. Readers prune on either
    * column's min/max file statistics.
    */
  def zOrderedWrite(
      df: DataFrame, xCol: String, yCol: String, bits: Int,
      path: String, partitions: Int = 0): Unit = {
    val p = if (partitions > 0) partitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    df.withColumn("__z", zOrderKey(col(xCol), col(yCol), bits))
      .repartitionByRange(p, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Small-file compaction plan (the OPTIMIZE/maintenance pass every
    * long-lived table needs): assign each file to a rewrite bin of
    * ~`targetBytes`, per partition directory, so a compactor can
    * rewrite bin-by-bin. Bin assignment is the cumulative-sum rule
    * (bin = exclusive-prefix-bytes ÷ target) over files ordered
    * (size desc, file asc) — deterministic across runs, big files
    * first so bins fill tightly, and a file larger than the target
    * lands alone in its own bin.
    *
    * Scale posture: the input is the file LISTING — metadata, one row
    * per file (~millions of rows for 100 TB), not data. The window
    * partitions on the directory, so each task sorts one directory's
    * listing; no global sort, no data movement. Returns the input
    * plus a `bin` column.
    */
  def compactionPlan(
      files: DataFrame, partCol: String, fileCol: String,
      sizeCol: String, targetBytes: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(targetBytes >= 1, s"targetBytes must be >= 1 (got $targetBytes)")
    val w = Window.partitionBy(col(partCol))
      .orderBy(col(sizeCol).desc, col(fileCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    files
      .withColumn("__before", coalesce(sum(col(sizeCol)).over(w), lit(0L)))
      .withColumn("bin", floor(col("__before") / targetBytes).cast("int"))
      .drop("__before")
  }
}
