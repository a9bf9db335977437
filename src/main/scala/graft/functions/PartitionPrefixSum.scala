package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Nondeterministic, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._

/** Running sum of `child` WITHIN the physical partition, in row order —
  * the [[org.apache.spark.sql.catalyst.expressions.MonotonicallyIncreasingID]]
  * pattern (per-partition mutable state, reset by partition
  * initialization) applied to the distributed-prefix-sum idiom.
  *
  * Why this exists: the prefix-sum operators (packing manifests,
  * equi-depth ranks, Pareto shares, token budgets) all compute
  * per-partition running totals after a range exchange. Expressed as
  * `Window.partitionBy(spark_partition_id())`, Catalyst cannot prove
  * the data is already clustered by physical partition — it IS, by
  * definition — so WindowExec inserts a SECOND full shuffle
  * (`hashpartitioning(__pid)`) that re-ships every payload column.
  * The q104 plan audit found the pack stage shipping its token_ids
  * arrays over the wire twice for this reason alone. This expression
  * computes the same running total in the projection itself: zero
  * extra exchange, zero window state, one long of mutable state per
  * task.
  *
  * `inclusive = false` (default) yields the EXCLUSIVE prefix — the sum
  * of STRICTLY PRECEDING rows (the `rowsBetween(unboundedPreceding,
  * -1)` shape every offset computation wants); `inclusive = true`
  * yields the running total INCLUDING the current row (the
  * `currentRow` shape; with `lit(1)` as the child it is `row_number`).
  * Null child values contribute 0, matching `sum`'s null-skipping.
  *
  * Correctness contract (the caller owns it, as with
  * `spark_partition_id`): rows must already be ordered as intended
  * within the partition (place this directly above
  * `sortWithinPartitions`), and the expression must sit in a
  * projection evaluated once per row — declared non-deterministic and
  * stateful precisely so Catalyst never duplicates, reorders, or
  * pushes anything across it. Task retries re-run the partition from
  * scratch (partition init resets the accumulator), so results are
  * deterministic for a deterministic, sorted input.
  */
case class PartitionPrefixSum(
    child: Expression, inclusive: Boolean = false)
    extends UnaryExpression with Nondeterministic {

  override def dataType: DataType = LongType

  override def nullable: Boolean = false

  override def stateful: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case IntegerType | LongType | ShortType | ByteType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"partition_prefix_sum requires an integral child, got $other")
    }

  @transient private[this] var acc: Long = 0L

  override protected def initializeInternal(partitionIndex: Int): Unit =
    acc = 0L

  override protected def evalInternal(input: InternalRow): Any = {
    val v = child.eval(input)
    val add = if (v == null) 0L else v.asInstanceOf[Number].longValue()
    if (inclusive) { acc += add; acc }
    else { val prev = acc; acc += add; prev }
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val accVar = ctx.addMutableState("long", "graftPrefixAcc",
      useFreshName = true)
    ctx.addPartitionInitializationStatement(s"$accVar = 0L;")
    val c = child.genCode(ctx)
    val add = s"(${c.isNull} ? 0L : (long) ${c.value})"
    val body =
      if (inclusive)
        s"""
        |${c.code}
        |$accVar += $add;
        |long ${ev.value} = $accVar;
        |""".stripMargin
      else
        s"""
        |${c.code}
        |long ${ev.value} = $accVar;
        |$accVar += $add;
        |""".stripMargin
    ev.copy(code = code"$body", isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): PartitionPrefixSum = copy(child = newChild)

  override def prettyName: String = "partition_prefix_sum"
}

object PartitionPrefixSum {

  /** Exclusive per-partition running sum (preceding rows only). */
  def partitionPrefixSum(c: Column): Column =
    GraftBridge.column(PartitionPrefixSum(GraftBridge.expression(c)))

  /** Inclusive per-partition running sum (through the current row). */
  def partitionRunningTotal(c: Column): Column =
    GraftBridge.column(
      PartitionPrefixSum(GraftBridge.expression(c), inclusive = true))
}
