package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native expressions for the shingle → minhash pipeline.
  *
  * Why expressions and not Column compositions: Spark evaluates
  * non-lambda subexpressions inside higher-order-function lambdas once
  * PER ELEMENT, and CollapseProject re-inlines staged intermediate
  * columns into every consumer — a composed
  * `transform(sequence(...), i -> hash(slice(split(text), i, n)))`
  * therefore re-splits the text for every window (O(tokens²) per row;
  * measured minutes at 600k docs). These kernels are one tight pass
  * per row and stay inside whole-stage codegen via static calls.
  */

/** Hashed word-level n-gram shingles of a string: array<long>.
  * Tokenization matches TextAnalysis.tokens (trim, lower, split \s+).
  * Texts with fewer than `n` tokens produce one shingle of the
  * available tokens, mirroring the Column-based slice semantics.
  */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes requires a string column, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleHashes.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)

  override def prettyName: String = "shingle_hashes"
}

object ShingleHashes {

  def shingleHashes(c: Column, n: Int): Column =
    GraftBridge.column(ShingleHashes(GraftBridge.expression(c), n))

  /** One pass: tokenize, then rolling FNV-1a over each n-token window
    * (token boundaries separated by a 0x20 byte, matching a join-with-
    * space then hash).
    */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val s   = text.toString.toLowerCase
    val len = s.length
    // collect token [start,end) offsets
    val starts = new java.util.ArrayList[Integer]()
    val ends   = new java.util.ArrayList[Integer]()
    var i = 0
    while (i < len) {
      while (i < len && Character.isWhitespace(s.charAt(i))) i += 1
      val st = i
      while (i < len && !Character.isWhitespace(s.charAt(i))) i += 1
      if (i > st) { starts.add(st); ends.add(i) }
    }
    val t = starts.size()
    val numShingles = math.max(t - n + 1, 1)
    val out = new Array[Long](if (t == 0) 0 else numShingles)
    if (t == 0) return new GenericArrayData(out)
    var w = 0
    while (w < numShingles) {
      var h = 0xcbf29ce484222325L
      var k = w
      val kEnd = math.min(w + n, t)
      while (k < kEnd) {
        if (k > w) { h ^= 0x20L; h *= 0x100000001b3L } // token separator
        var p = starts.get(k).intValue()
        val e = ends.get(k).intValue()
        while (p < e) {
          val c = s.charAt(p)
          h ^= (c & 0xff); h *= 0x100000001b3L
          h ^= (c >> 8);   h *= 0x100000001b3L
          p += 1
        }
        k += 1
      }
      out(w) = h
      w += 1
    }
    new GenericArrayData(out)
  }
}

/** MinHash signature of a hashed-shingle array: `numHashes` simulated
  * permutations via splitmix64-style seed mixing, minima kept in one
  * pass. Input array<long> → output array<long> of length numHashes.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {
  require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature requires array<bigint>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    MinHashSignature.compute(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashSignature.compute($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)

  override def prettyName: String = "minhash_signature"
}

object MinHashSignature {

  def minhashSignature(c: Column, numHashes: Int): Column =
    GraftBridge.column(MinHashSignature(GraftBridge.expression(c), numHashes))

  def compute(shingles: ArrayData, numHashes: Int): ArrayData = {
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      val s = shingles.getLong(i)
      var seed = 0
      while (seed < numHashes) {
        // splitmix64 finalizer over (shingle ^ seeded golden-ratio step)
        var z = s + (seed + 1) * 0x9e3779b97f4a7c15L
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        z = z ^ (z >>> 31)
        if (z < sig(seed)) sig(seed) = z
        seed += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }
}

/** Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken, SIGMOD
  * 2003): over the POSITIONAL rolling-hash sequence, slide a window of
  * `w` hashes and keep each window's minimum (signed 64-bit order);
  * the distinct selected values, ascending, are the fingerprint. Any
  * shared substring of length ≥ w+shingle−1 tokens between two
  * documents is guaranteed to share a fingerprint hash.
  * Input array<long> (positional — NOT deduplicated/sorted) →
  * output sorted array<long>. Fewer than `w` hashes → one window over
  * what exists; empty input → empty fingerprint.
  */
case class Winnow(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 1, s"winnow window must be >= 1, got $w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow requires array<bigint>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    Winnow.compute(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Winnow.compute($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): Winnow =
    copy(child = newChild)

  override def prettyName: String = "winnow"
}

object Winnow {

  def winnow(c: Column, w: Int): Column =
    GraftBridge.column(Winnow(GraftBridge.expression(c), w))

  /** O(n) sliding-window minima via a monotonic index deque, then
    * distinct + sort of the selected values.
    */
  def compute(hashes: ArrayData, w: Int): ArrayData = {
    val n = hashes.numElements()
    if (n == 0) return new GenericArrayData(new Array[Long](0))
    val deque = new Array[Int](n) // indices, values increasing
    var head = 0
    var tail = 0 // exclusive
    val selected = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) {
      val v = hashes.getLong(i)
      while (tail > head && hashes.getLong(deque(tail - 1)) >= v) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1
      // first complete window ends at i = w-1; shorter inputs emit
      // their single clipped window at the last element
      if (i >= w - 1 || i == n - 1) selected.add(hashes.getLong(deque(head)))
      i += 1
    }
    val out = new Array[Long](selected.size())
    val it = selected.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }
}
