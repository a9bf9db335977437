package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All `bands` sign-LSH band codes of one vector in a single pass —
  * band b's code has bit p set iff dot(vec, planes(b·r + p)) ≥ 0.
  *
  * Why not `bands` separate [[graft.ml.Similarity.lshCode]] columns
  * (the previous banded projection): each lshCode is an
  * `aggregate(zip_with(typedlit(matrix), ...))` whose plane slice
  * rides the generated code as a LITERAL — at the recall-sized
  * default's big configurations (64 bands × 14 planes × 64 dims =
  * 57k literal doubles) the projection blows past JIT-friendly
  * method sizes and walks three lambda indirections per element.
  * Here the FULL plane matrix rides as one referenced JVM
  * `double[][]` and a tight primitive loop emits every band code in
  * one traversal (measured on q197's sf10 shape: the 64-column
  * lambda projection was the dominant term of a 274 s run).
  *
  * BIT PARITY with the composed form (the oracle surface): the
  * per-plane dot accumulates ascending over min(vecLen, dim) with
  * per-element float→double widening — exactly
  * [[graft.functions.DotProduct.compute]] after the `cast
  * ("array<double>")` — and the sign test is the same `>= 0`, so
  * band b of this kernel equals `lshCode(vec, planes.slice(b·r,
  * b·r + r))` bit-for-bit (spec-pinned; the single-table band-0
  * prefix property and every inlined-plane SQL replay depend on it).
  *
  * NULL input → NULL output (one divergence from the composed form,
  * which coded a NULL vector to bucket 0 via `when`'s null-to-
  * otherwise fall-through): a NULL-coded row is thereby EXCLUDED
  * from the candidate join instead of colliding in bucket 0 and
  * being dropped at the exact verify — the final pair output is
  * identical, with less junk in the exchange. NULL ELEMENTS read as
  * 0.0 exactly like the cast + getDouble path they replace.
  */
case class LshBandCodes(
    child: Expression, planes: Array[Array[Double]], r: Int)
    extends UnaryExpression {

  require(r > 0 && planes.length % r == 0,
    s"planes (${planes.length}) must be a multiple of r = $r")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"lsh_band_codes requires array<float|double>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    LshBandCodes.compute(
      input.asInstanceOf[ArrayData], planes, r, isFloat)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mat = ctx.addReferenceObj("planes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = graft.functions.LshBandCodes.compute(
      |  $c, $mat, $r, $isFloat);
      |""".stripMargin)
  }

  override protected def withNewChildInternal(
      newChild: Expression): LshBandCodes = copy(child = newChild)

  override def prettyName: String = "lsh_band_codes"
}

object LshBandCodes {

  def lshBandCodes(
      vec: Column, planes: Seq[Array[Double]], r: Int): Column =
    GraftBridge.column(LshBandCodes(
      GraftBridge.expression(vec), planes.toArray, r))

  def compute(
      a: ArrayData, planes: Array[Array[Double]], r: Int,
      isFloat: Boolean): ArrayData = {
    val bands = planes.length / r
    val vecLen = a.numElements()
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var code = 0L
      var p = 0
      while (p < r) {
        val plane = planes(b * r + p)
        val n = math.min(vecLen, plane.length)
        var acc = 0.0
        var i = 0
        while (i < n) {
          // a null element reads as 0.0 — the cast-array getDouble
          // behavior of the composed dot this kernel replaces
          val x =
            if (a.isNullAt(i)) 0.0
            else if (isFloat) a.getFloat(i).toDouble
            else a.getDouble(i)
          acc += x * plane(i)
          i += 1
        }
        if (acc >= 0) code |= 1L << p
        p += 1
      }
      out(b) = code
      b += 1
    }
    new GenericArrayData(out)
  }
}
