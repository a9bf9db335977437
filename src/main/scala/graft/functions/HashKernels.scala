package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Seeded 64-bit mixing scalar for sampling / sketch operators.
  *
  * mix64(x, seed) = splitmix64 finalizer over
  * (x + (seed+1)·0x9e3779b97f4a7c15) — the SAME seeded family as
  * [[MinHashSignature]], exposed as a scalar so deterministic
  * sampling, CMS bucketing, and HLL registers share one
  * engine-portable kernel (replayed in DuckDB with mod-2^64 HUGEINT
  * arithmetic; see SparkEntry's sqlMixStage helpers).
  *
  * Why not xxhash64/hash(): Spark's built-ins are not implemented in
  * the oracle engine, so results could only be rows-checked. A shared
  * portable kernel lets every sampling decision hash-match.
  */
case class Mix64(child: Expression, seed: Int) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"mix64 requires a bigint column, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    Mix64.compute(input.asInstanceOf[Long], seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Mix64.compute($c, $seed)")

  override protected def withNewChildInternal(newChild: Expression): Mix64 =
    copy(child = newChild)

  override def prettyName: String = "mix64"
}

object Mix64 {

  def mix64(c: Column, seed: Int): Column =
    GraftBridge.column(Mix64(GraftBridge.expression(c), seed))

  def compute(x: Long, seed: Int): Long = {
    var z = x + (seed + 1) * 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}

/** HLL-style rank for a hashed key: with the low `p` bits spent on the
  * register index, rho = (trailing zeros of z >>> p) + 1, and
  * 64 − p + 1 when the remaining bits are all zero. The
  * trailing-zero formulation (Flajolet–Martin style) is chosen over
  * leading-zeros because it replays EXACTLY in portable SQL: the
  * lowest set bit is `u & -u`, a power of two whose log2 is exact in
  * double — no float-boundary risk at any magnitude.
  */
case class HllRho(child: Expression, p: Int) extends UnaryExpression {
  require(p >= 4 && p <= 20, s"hll precision must be in [4,20], got $p")

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hll_rho requires a bigint column, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    HllRho.compute(input.asInstanceOf[Long], p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HllRho.compute($c, $p)")

  override protected def withNewChildInternal(newChild: Expression): HllRho =
    copy(child = newChild)

  override def prettyName: String = "hll_rho"
}

object HllRho {

  def hllRho(c: Column, p: Int): Column =
    GraftBridge.column(HllRho(GraftBridge.expression(c), p))

  def compute(z: Long, p: Int): Int = {
    val w = z >>> p
    if (w == 0L) 64 - p + 1
    else java.lang.Long.numberOfTrailingZeros(w) + 1
  }
}
