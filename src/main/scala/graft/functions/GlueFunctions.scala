package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar-function surface of the reference (awsglue/functions.py),
  * re-expressed as codegen-friendly built-in Column compositions —
  * no UDFs, so every call site stays inside whole-stage codegen.
  */
object GlueFunctions {

  /** replaceArrayElement(src, replace, idx) — awsglue/functions.py:17-20.
    * Replace the element at 0-based `idx` in an array column.
    * Composition: prefix ++ [replacement] ++ suffix. Out-of-range idx
    * leaves the array unchanged (slice yields the full prefix and an
    * empty suffix, and the replacement is only spliced when in range).
    */
  def replaceArrayElement(src: Column, replace: Column, idx: Int): Column = {
    require(idx >= 0, s"index must be >= 0, got $idx")
    val n = size(src)
    when(lit(idx) < n,
      concat(
        slice(src, 1, idx),
        array(replace),
        slice(src, lit(idx + 2), greatest(n - lit(idx + 1), lit(0)))))
      .otherwise(src)
  }

  /** namedStruct(name1, col1, name2, col2, ...) — functions.py:22-28. */
  def namedStruct(pairs: (String, Column)*): Column =
    struct(pairs.map { case (n, c) => c.as(n) }: _*)

  /** explodeWithIndex(col) — functions.py:30-33: explode an array with
    * its position, aliased (index, val). Returns the projection to
    * splice into a select.
    */
  def explodeWithIndex(c: Column): Seq[Column] = {
    // posexplode produces two output columns; alias at select time
    Seq(posexplode(c).as(Seq("index", "val")): Column)
  }

  /** Convenience: df.select(keys..., index, val) via posexplode. */
  def explodeWithIndex(df: DataFrame, arrayCol: String, keep: Seq[String]): DataFrame =
    df.select(keep.map(col) :+ posexplode(col(arrayCol)).as(Seq("index", "val")): _*)
}
