package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Vocabulary-encode kernel: map an array of tokens to
  * (n_tokens, n_oov, token_ids) in ONE pass against a hash map that
  * rides inside the expression as a plain JVM reference — the
  * [[NearestCentroid]] pattern applied to tokenizer application.
  *
  * Why not the declarative encode (posexplode → broadcast vocab join →
  * groupBy collect_list(struct(pos, tid)) → sort_array): that plan
  * ships one row PER TOKEN through a reassembly exchange whose payload
  * is the output itself, and the collect_list aggregation holds every
  * document's token structs in aggregation state — at the second
  * decade that exchange IS the cost of the encode stage (q102's sf10
  * step measured 8.1x before this kernel). The vocabulary is bounded
  * metadata by construction (minCount pruning keeps it MBs for TB
  * corpora — the same boundedness argument that lets it broadcast),
  * so the lookup belongs in the scan projection: zero shuffle, tokens
  * never leave their input partition, one primitive-loop pass per
  * document.
  *
  * Parity with the join path (spec-pinned in MlSpec): OOV and null
  * tokens class to `oovId`; output field types match the old
  * composition exactly (int, int, array<long>).
  *
  * The three struct fields are projected out of ONE evaluation —
  * Spark's subexpression elimination (interpreted and codegen) binds
  * the shared struct child once per row, so extracting n_tokens,
  * n_oov, and token_ids does not re-run the lookup loop.
  */
/** Identity-equality wrapper for the vocabulary map. The expression is
  * a case class, so Catalyst canonicalization and hash-based plan
  * structures call equals/hashCode on every field — with the raw
  * HashMap as a field that iterates all (up to 4M) entries, uncached,
  * potentially repeatedly during optimization (r12 advice). The map
  * reference is shared across every `copy`/`withNewChildInternal` of
  * one expression anyway, so reference identity IS the right equality;
  * two independently-built identical vocabularies comparing unequal
  * only costs a missed subexpression-elimination, never correctness.
  */
final class VocabRef(
    val map: java.util.HashMap[UTF8String, java.lang.Long])
    extends Serializable {
  override def equals(o: Any): Boolean = o match {
    case v: VocabRef => v.map eq map
    case _           => false
  }
  override def hashCode(): Int = System.identityHashCode(map)
  override def toString: String = s"VocabRef(${map.size} entries)"
}

case class VocabEncode(
    child: Expression,
    vocab: VocabRef,
    oovId: Long)
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_oov", IntegerType, nullable = false),
    StructField("token_ids", ArrayType(LongType, containsNull = false),
      nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"vocab_encode requires array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    VocabEncode.compute(input.asInstanceOf[ArrayData], vocab.map, oovId)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the vocab rides as a referenced JVM object, not literals —
    // shipped once per executor with the task binary, like a
    // broadcast table, never per row
    val map = ctx.addReferenceObj("vocab", vocab.map, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
      |${ev.value} = graft.functions.VocabEncode.compute($c, $map, ${oovId}L);
      |""".stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): VocabEncode = copy(child = newChild)

  override def prettyName: String = "vocab_encode"
}

object VocabEncode {

  def vocabEncode(
      tokens: Column,
      vocab: java.util.HashMap[UTF8String, java.lang.Long],
      oovId: Long): Column =
    GraftBridge.column(
      VocabEncode(GraftBridge.expression(tokens), new VocabRef(vocab),
        oovId))

  /** Build the reference map from collected (token, token_id) rows.
    * Keys are [[UTF8String]] so the per-token probe compares the
    * scan's binary representation directly — no String decode per
    * token. Entries arrive as JVM Strings (already copied out of any
    * row buffers); a variant collecting UTF8String rows directly
    * would have to clone each key before insertion.
    */
  def buildMap(
      entries: Array[(String, Long)]): java.util.HashMap[UTF8String, java.lang.Long] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long](
      math.max(16, (entries.length / 0.75).toInt + 1))
    entries.foreach { case (t, id) =>
      m.put(UTF8String.fromString(t), java.lang.Long.valueOf(id))
    }
    m
  }

  def compute(
      a: ArrayData,
      vocab: java.util.HashMap[UTF8String, java.lang.Long],
      oovId: Long): InternalRow = {
    val n = a.numElements()
    val ids = new Array[Long](n)
    var oov = 0
    var i = 0
    while (i < n) {
      // null token ≡ OOV (the join path's coalesce(tid, oov) parity)
      val t = if (a.isNullAt(i)) null else vocab.get(a.getUTF8String(i))
      if (t == null) { ids(i) = oovId; oov += 1 }
      else ids(i) = t.longValue()
      i += 1
    }
    new GenericInternalRow(Array[Any](n, oov, new GenericArrayData(ids)))
  }
}
