package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization kernels (Jégou/Douze/Schmid, "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011 — the layout
  * FAISS's IVFPQ popularized): a `dim`-vector splits into `m`
  * contiguous subvectors of `dim/m` components; each subvector codes
  * to the index of its nearest centroid in that subspace's `ksub`-row
  * codebook; an asymmetric-distance (ADC) scan scores a code against
  * a query by `m` table lookups instead of `dim` multiplies.
  *
  * Why kernels and not `transform`/`aggregate` compositions: encode is
  * an argmin over `ksub` centroids PER SUBSPACE per row — the same
  * interpreter-weight lambda tax [[NearestCentroid]] measured 15× on
  * the IVF build applies `m`-fold here; and the codebooks/lookup table
  * are bounded driver-side metadata (m·ksub·dsub doubles — the same
  * boundedness that lets FAISS hold them in RAM per shard), so they
  * ride `addReferenceObj` like [[VocabEncode]]'s vocabulary: shipped
  * once per executor with the task binary, never per row, zero
  * shuffle. All three expressions codegen into whole-stage spans.
  *
  * Array-typed fields keep the [[VocabRef]] lesson for free: Scala
  * case-class equality/hashCode on a JVM array is reference identity,
  * so Catalyst canonicalization never iterates the codebook contents.
  *
  * MALFORMED INPUT STAYS NULL ([[NearestCentroid]]'s hygiene contract):
  * a vector whose length differs from m·dsub, a null element, a null or
  * out-of-range cluster/code — each yields NULL, never a silent
  * truncation that would misfile the row into the index.
  */
case class PqEncode(
    child: Expression, books: Array[Array[Array[Double]]])
    extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)

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
        s"pq_encode requires array<float|double>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    PqEncode.computeOrNull(input.asInstanceOf[ArrayData], books, isFloat)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val b = ctx.addReferenceObj("books", books, "double[][][]")
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("graftPqEnc")
      s"""
      |org.apache.spark.sql.catalyst.util.ArrayData $r =
      |  graft.functions.PqEncode.computeOrNull($c, $b, $isFloat);
      |if ($r == null) { ${ev.isNull} = true; }
      |else { ${ev.value} = $r; }
      |""".stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): PqEncode = copy(child = newChild)

  override def prettyName: String = "pq_encode"
}

object PqEncode {

  def pqEncode(vec: Column, books: Array[Array[Array[Double]]]): Column =
    GraftBridge.column(PqEncode(GraftBridge.expression(vec), books))

  /** Argmin per subspace, first-minimum tie-break (strictly-less
    * replaces), partial sums accumulated in element order so distances
    * are bit-identical to any engine summing the same order; a
    * centroid is abandoned early once its partial sum exceeds the
    * current best (squared distance only grows — the argmin and the
    * tie rule are unchanged).
    */
  def computeOrNull(
      a: ArrayData, books: Array[Array[Array[Double]]],
      isFloat: Boolean): ArrayData = {
    val m = books.length
    if (m == 0 || books(0).length == 0) return null
    val dsub = books(0)(0).length
    val n = a.numElements()
    if (n != m * dsub) return null
    var i = 0
    while (i < n) { // null element → null code (centroid-kernel parity)
      if (a.isNullAt(i)) return null
      i += 1
    }
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      val cb = books(j)
      val off = j * dsub
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cb.length) {
        val row = cb(c)
        var d = 0.0
        var dd = 0
        while (dd < dsub && d < bestD) {
          val x =
            if (isFloat) a.getFloat(off + dd).toDouble
            else a.getDouble(off + dd)
          val diff = x - row(dd)
          d += diff * diff
          dd += 1
        }
        if (dd == dsub && d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(j) = best
      j += 1
    }
    new GenericArrayData(codes)
  }
}

/** Asymmetric-distance (ADC) score: `Σ_j table(j)(code(j))` — the
  * query's per-subspace dot products with every centroid, precomputed
  * driver-side as an m×ksub table, summed over the row's code in
  * subspace order (a defined order so scores replay bit-identically).
  * NULL on a code of the wrong arity or with an out-of-range entry.
  */
case class PqAdc(child: Expression, table: Array[Array[Double]])
    extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pq_adc requires array<int>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    PqAdc.computeOrNull(input.asInstanceOf[ArrayData], table)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val t = ctx.addReferenceObj("table", table, "double[][]")
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("graftPqAdc")
      s"""
      |java.lang.Double $r =
      |  graft.functions.PqAdc.computeOrNull($c, $t);
      |if ($r == null) { ${ev.isNull} = true; }
      |else { ${ev.value} = $r.doubleValue(); }
      |""".stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): PqAdc = copy(child = newChild)

  override def prettyName: String = "pq_adc"
}

object PqAdc {

  def pqAdc(code: Column, table: Array[Array[Double]]): Column =
    GraftBridge.column(PqAdc(GraftBridge.expression(code), table))

  def computeOrNull(
      a: ArrayData, table: Array[Array[Double]]): java.lang.Double = {
    val m = table.length
    if (a.numElements() != m) return null
    var s = 0.0
    var j = 0
    while (j < m) {
      if (a.isNullAt(j)) return null
      val c = a.getInt(j)
      if (c < 0 || c >= table(j).length) return null
      s += table(j)(c)
      j += 1
    }
    java.lang.Double.valueOf(s)
  }
}

/** Multi-query ADC: `Σ_j tables(qIdx)(j)(code(j))` — one precomputed
  * m×ksub table per query in an eval BATCH, so a single scan of the
  * code table scores every (row, query) pair at O(m) lookups instead
  * of O(dim) multiplies (the batched form of [[PqAdc]] — the eval
  * shape [[graft.ml.Similarity.knnClassify]] pioneered, with the
  * query-side tables riding the task binary once per executor).
  * NULL on a malformed code or an out-of-range query index.
  */
case class PqAdcMulti(
    left: Expression, right: Expression,
    tables: Array[Array[Array[Double]]])
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_adc_multi requires (array<int>, int), got ($l, $r)")
    }

  override def nullSafeEval(code: Any, qIdx: Any): Any =
    PqAdcMulti.computeOrNull(code.asInstanceOf[ArrayData],
      qIdx.asInstanceOf[Int], tables)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val t = ctx.addReferenceObj("tables", tables, "double[][][]")
    nullSafeCodeGen(ctx, ev, (c, q) => {
      val r = ctx.freshName("graftPqAdcM")
      s"""
      |java.lang.Double $r =
      |  graft.functions.PqAdcMulti.computeOrNull($c, $q, $t);
      |if ($r == null) { ${ev.isNull} = true; }
      |else { ${ev.value} = $r.doubleValue(); }
      |""".stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcMulti =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "pq_adc_multi"
}

object PqAdcMulti {

  def pqAdcMulti(
      code: Column, qIdx: Column,
      tables: Array[Array[Array[Double]]]): Column =
    GraftBridge.column(PqAdcMulti(GraftBridge.expression(code),
      GraftBridge.expression(qIdx), tables))

  def computeOrNull(
      a: ArrayData, qIdx: Int,
      tables: Array[Array[Array[Double]]]): java.lang.Double = {
    if (qIdx < 0 || qIdx >= tables.length) return null
    PqAdc.computeOrNull(a, tables(qIdx))
  }
}

/** Coarse residual: `vec - centroids(cluster)`, elementwise in double —
  * what IVF-PQ actually quantizes (the residual's spread is a fraction
  * of the vector's, so the same ksub buys more precision; Jégou §IV.B).
  * NULL on malformed vectors, a null/out-of-range cluster, or a
  * dimension mismatch with the centroid matrix.
  */
case class ResidualVec(
    left: Expression, right: Expression,
    centroids: Array[Array[Double]])
    extends BinaryExpression {

  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)

  override def nullable: Boolean = true

  private lazy val isFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _) | ArrayType(DoubleType, _),
            IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"residual_vec requires (array<float|double>, int), got ($l, $r)")
    }

  override def nullSafeEval(vec: Any, cluster: Any): Any =
    ResidualVec.computeOrNull(vec.asInstanceOf[ArrayData],
      cluster.asInstanceOf[Int], centroids, isFloat)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mat = ctx.addReferenceObj("centroids", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev, (v, c) => {
      val r = ctx.freshName("graftResid")
      s"""
      |org.apache.spark.sql.catalyst.util.ArrayData $r =
      |  graft.functions.ResidualVec.computeOrNull($v, $c, $mat, $isFloat);
      |if ($r == null) { ${ev.isNull} = true; }
      |else { ${ev.value} = $r; }
      |""".stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ResidualVec =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "residual_vec"
}

object ResidualVec {

  def residualVec(
      vec: Column, cluster: Column,
      centroids: Array[Array[Double]]): Column =
    GraftBridge.column(ResidualVec(GraftBridge.expression(vec),
      GraftBridge.expression(cluster), centroids))

  def computeOrNull(
      a: ArrayData, cluster: Int, m: Array[Array[Double]],
      isFloat: Boolean): ArrayData = {
    if (cluster < 0 || cluster >= m.length) return null
    val cen = m(cluster)
    val n = a.numElements()
    if (n != cen.length) return null
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      i += 1
    }
    val out = new Array[Double](n)
    i = 0
    while (i < n) {
      val x =
        if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      out(i) = x - cen(i)
      i += 1
    }
    new GenericArrayData(out)
  }
}
