package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 64-bit SimHash over whitespace tokens of a string column.
  *
  * SimHash (Charikar 2002, "Similarity estimation techniques from
  * rounding algorithms"): hash each token to 64 bits; for each bit
  * position sum +1/-1 votes across tokens; the sign per position forms
  * the fingerprint. Near-duplicate texts land at small Hamming
  * distance.
  *
  * Implemented as a Catalyst `UnaryExpression` with `doGenCode`
  * delegating to a static JVM method, so it stays inside whole-stage
  * codegen (a Scala UDF here would break the codegen span and add
  * encoder round-trips on a 100 TB scan).
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"simhash64 requires a string column, got ${child.dataType}")
  }

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}

object SimHash64 {

  /** Column API: simhash64($"text"). */
  def simhash64(c: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(SimHash64(GraftBridge.expression(c)))
  }

  /** Static kernel invoked from generated code (and from eval). */
  def compute(text: UTF8String): Long = {
    val votes = new Array[Int](64)
    val s = text.toString.toLowerCase
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && Character.isWhitespace(s.charAt(i))) i += 1
      val start = i
      while (i < n && !Character.isWhitespace(s.charAt(i))) i += 1
      if (i > start) {
        val h = tokenHash(s, start, i)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** Stable 64-bit token hash (FNV-1a over UTF-16 code units) — fixed
    * algorithm, independent of JVM hashCode.
    */
  private def tokenHash(s: String, from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until) {
      val c = s.charAt(i)
      h ^= (c & 0xff); h *= 0x100000001b3L
      h ^= (c >> 8);   h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Hamming distance between two simhash fingerprints. */
  def hamming(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.bit_count(a.bitwiseXOR(b)).cast("int")
}
