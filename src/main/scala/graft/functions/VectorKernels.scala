package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Nearest-centroid assignment: argmin over squared L2 distance to a
  * centroid matrix carried INSIDE the expression as a plain JVM
  * `double[][]`, scanned in one tight primitive loop.
  *
  * Why not `transform(typedlit(matrix), c -> aggregate(zip_with(...)))`
  * (the previous [[graft.ml.Similarity]] assign): the typedlit matrix
  * is a single Literal node (fine), but the higher-order-function
  * evaluation allocates a zipped ArrayData per centroid per ROW,
  * boxes through three lambda indirections per ELEMENT, and
  * materializes the full nlist-length distance array only for argmin
  * to throw it away — nlist×dim×rows×iters of interpreter-weight
  * work on the k-means build's hottest path, growing with
  * autoNlist = √n. Measured on the sf10 embeddings table (200k
  * vectors, nlist = 448): the lambda assign put the 3-iteration
  * k-means build past a killed 15 minutes; this kernel builds the
  * same index in 83 s (same summation order, bit-identical distances
  * and assignments — first-minimum tie-break, matching
  * `array_position(d, array_min(d))`).
  *
  * The inner loop early-abandons a centroid once its partial sum
  * exceeds the current best — squared distance only grows, so the
  * argmin (including the first-wins tie rule: strictly-less replaces,
  * equal keeps the earlier index) is unchanged.
  *
  * MALFORMED VECTORS STAY NULL (the lambda parity that matters for
  * data hygiene): a vector whose length differs from the centroid
  * dimension, or that contains a null element, yields a NULL cluster
  * — exactly what the old `zip_with`/`aggregate` composition produced
  * via null propagation. Truncating to a common prefix instead would
  * CONFIDENTLY MISFILE the corrupt row into the IVF index (it shows
  * up as a NULL partition directory today, which is the signal a
  * 100 TB ingest needs).
  *
  * Input: array<float> or array<double> (floats widen to double per
  * element, exactly as the lambda's `.cast("double")` did). Output:
  * the 0-based centroid index, INT (nullable).
  */
case class NearestCentroid(
    child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType

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
        s"nearest_centroid requires array<float|double>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    NearestCentroid.computeOrNull(
      input.asInstanceOf[ArrayData], centroids, isFloat)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the matrix rides as a referenced JVM object, not literals
    val mat = ctx.addReferenceObj("centroids", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("graftNc") // unique per codegen scope
      s"""
      |java.lang.Integer $r =
      |  graft.functions.NearestCentroid.computeOrNull($c, $mat, $isFloat);
      |if ($r == null) { ${ev.isNull} = true; }
      |else { ${ev.value} = $r.intValue(); }
      |""".stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): NearestCentroid = copy(child = newChild)

  override def prettyName: String = "nearest_centroid"
}

object NearestCentroid {

  def nearestCentroid(vec: Column, centroids: Seq[Seq[Double]]): Column =
    GraftBridge.column(NearestCentroid(GraftBridge.expression(vec),
      centroids.map(_.toArray).toArray))

  /** Boxed so malformed input (dim mismatch, null element, empty
    * matrix) can return null — see the class doc.
    */
  def computeOrNull(
      a: ArrayData, m: Array[Array[Double]],
      isFloat: Boolean): java.lang.Integer = {
    if (m.length == 0) return null
    val dim = m(0).length
    val n = a.numElements()
    if (n != dim) return null
    var i = 0
    while (i < n) { // null element → null cluster (lambda parity)
      if (a.isNullAt(i)) return null
      i += 1
    }
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < m.length) {
      val row = m(c)
      var d = 0.0
      var j = 0
      while (j < n && d <= bestD) { // early abandon: d only grows
        val x = if (isFloat) a.getFloat(j).toDouble else a.getDouble(j)
        val diff = x - row(j)
        d += diff * diff
        j += 1
      }
      if (j == n && d < bestD) { bestD = d; best = c }
      c += 1
    }
    java.lang.Integer.valueOf(best)
  }
}

/** The `nprobe` nearest centroids (0-based indices, ordered by
  * squared-L2 distance ascending, index ascending on ties) — the
  * [[NearestCentroid]] argmin generalized to a top-n, for operators
  * that multi-probe EVERY CORPUS ROW (r15: `nearDupPairsIvf` assigns
  * the whole table to its nprobe nearest cells; the lambda
  * composition `slice(array_sort(zip_with(dists, sequence, struct)))`
  * it replaces carries an nlist×dim literal matrix through codegen —
  * the exact generated-code blowup [[LshBandCodes]] killed for band
  * codes — and materializes + sorts the full nlist distance array per
  * row). Distances accumulate in the same per-element order as the
  * lambda's `aggregate(zip_with(...))`, and the (distance, index)
  * ordering matches its `array_sort(struct(d, i))`, so selections are
  * bit-identical to the composed form (spec-pinned). Malformed
  * vectors (dim mismatch, null element, a NaN element) yield NULL,
  * the [[NearestCentroid]] hygiene contract — the NaN case extends
  * it (r15 advice): a NaN distance is incomparable, so the strict-<
  * selection here and the lambda's array_sort (which orders NaN
  * greatest) could pick DIFFERENT probe sets; returning NULL keeps
  * the bit-parity claim total instead of scoping it to finite
  * inputs. Infinities stay comparable (consistently ordered by both
  * forms) and pass through.
  */
case class TopNCentroids(
    child: Expression, centroids: Array[Array[Double]], n: Int)
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
        s"top_n_centroids requires array<float|double>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    TopNCentroids.computeOrNull(
      input.asInstanceOf[ArrayData], centroids, n, isFloat)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the matrix rides as a referenced JVM object, not literals
    val mat = ctx.addReferenceObj("centroids", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("graftTnc")
      s"""
      |org.apache.spark.sql.catalyst.util.ArrayData $r =
      |  graft.functions.TopNCentroids.computeOrNull(
      |    $c, $mat, $n, $isFloat);
      |if ($r == null) { ${ev.isNull} = true; }
      |else { ${ev.value} = $r; }
      |""".stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): TopNCentroids = copy(child = newChild)

  override def prettyName: String = "top_n_centroids"
}

object TopNCentroids {

  def topNCentroids(
      vec: Column, centroids: Seq[Seq[Double]], n: Int): Column =
    GraftBridge.column(TopNCentroids(GraftBridge.expression(vec),
      centroids.map(_.toArray).toArray, n))

  def computeOrNull(
      a: ArrayData, m: Array[Array[Double]], n: Int,
      isFloat: Boolean): ArrayData = {
    if (m.length == 0) return null
    val dim = m(0).length
    val len = a.numElements()
    if (len != dim) return null
    var i = 0
    while (i < len) { // null element → null probes (lambda parity)
      if (a.isNullAt(i)) return null
      i += 1
    }
    val dists = new Array[Double](m.length)
    var c = 0
    while (c < m.length) {
      val row = m(c)
      var d = 0.0
      var j = 0
      while (j < len) { // same accumulation order as the lambda fold
        val x = if (isFloat) a.getFloat(j).toDouble else a.getDouble(j)
        val diff = x - row(j)
        d += diff * diff
        j += 1
      }
      // a NaN distance (NaN element) is incomparable — see class doc
      if (java.lang.Double.isNaN(d)) return null
      dists(c) = d
      c += 1
    }
    val k = math.min(n, m.length)
    val idx = Array.range(0, m.length)
    // partial selection sort on (distance, index) — O(k·nlist), no
    // boxing, and k (= nprobe) is small by contract
    var pos = 0
    while (pos < k) {
      var best = pos
      var s = pos + 1
      while (s < idx.length) {
        if (dists(idx(s)) < dists(idx(best)) ||
            (dists(idx(s)) == dists(idx(best)) && idx(s) < idx(best)))
          best = s
        s += 1
      }
      val t = idx(pos); idx(pos) = idx(best); idx(best) = t
      pos += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOfRange(idx, 0, k))
  }
}
