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

  /** Like [[internalCreateDataFrame]], but the leaf DECLARES a hash
    * partitioning over `keyCols` with `numPartitions` partitions, plus
    * accurate row-count statistics. A plain `internalCreateDataFrame`
    * leaf reports Unknown partitioning, so every downstream join or
    * aggregation keyed the way the rows are ALREADY laid out pays a
    * fresh Exchange; iterative kernels (connected components,
    * PageRank, k-core) re-materialize a keyed table every round and
    * were paying that Exchange tax 2-3x per round.
    *
    * THE CALLER OWNS THE TRUTH OF THE DECLARATION: the rows in `rdd`
    * must really be laid out as `HashPartitioning(keyCols,
    * numPartitions)` (Spark's murmur3 `hashpartitioning`) — i.e. the
    * plan that produced them ended in an exchange on exactly those
    * keys at exactly that count, NOT coalesced or locally re-read by
    * AQE. A trailing `repartition(numPartitions, keys…)`
    * (REPARTITION_BY_NUM, which AQE never coalesces, skew-splits, or
    * converts to local reads) is the reliable way to guarantee it. A
    * false declaration makes co-partitioned joins silently WRONG.
    *
    * Why not `LogicalRDD.fromDataset` (the `Dataset.checkpoint`
    * bridge): under AQE the executed plan is an
    * `AdaptiveSparkPlanExec`, which never finalizes its
    * `outputPartitioning` — the copied declaration degrades to
    * Unknown; and the optimizer's alias elision can leave the copied
    * partitioning referencing exprIds absent from the analyzed
    * output. Declaring over the leaf's OWN attributes sidesteps both.
    */
  def internalCreateDataFrameHashPartitioned(
      spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType,
      keyCols: Seq[String],
      numPartitions: Int,
      rowCount: Long,
      avgRowBytes: Int): DataFrame = {
    val session = spark.asInstanceOf[classic.SparkSession]
    val attrs =
      org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(schema)
    val keyAttrs = keyCols.map { k =>
      attrs.find(_.name == k).getOrElse(throw new IllegalArgumentException(
        s"key column $k not in schema ${schema.fieldNames.mkString(",")}"))
    }
    val partitioning = org.apache.spark.sql.catalyst.plans.physical
      .HashPartitioning(keyAttrs, numPartitions)
    val stats = org.apache.spark.sql.catalyst.plans.logical.Statistics(
      sizeInBytes = (BigInt(rowCount) * avgRowBytes).max(1),
      rowCount = Some(BigInt(rowCount)))
    classic.Dataset.ofRows(session,
      execution.LogicalRDD(attrs, rdd, partitioning, Nil,
        isStreaming = false, None)(session, Some(stats), None))
  }
}
