package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the sql-package-private Column↔Expression converters.
  *
  * Spark 4 made `Column` wrap a `ColumnNode` and moved the Expression
  * bridge to `classic.ExpressionUtils`, which is `private[sql]`.
  * Libraries that define custom Catalyst expressions (as this one does
  * for simhash etc.) conventionally expose them through a shim in the
  * `org.apache.spark.sql` package — the same approach Spark's own
  * connectors use.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** DataFrame over an already-materialized `RDD[InternalRow]` (a
    * `LogicalRDD` leaf — cuts Catalyst lineage the same way
    * `Dataset.checkpoint` does, without a second job). The RDD must
    * produce rows matching `schema`; rows must be safe to hold
    * (`.copy()` unsafe rows before persisting).
    */
  def internalCreateDataFrame(
      spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession].internalCreateDataFrame(rdd, schema)
}
