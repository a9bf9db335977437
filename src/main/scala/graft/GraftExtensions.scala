package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{BoundedEditDistance, DotProduct, MinHashSignature, ShingleHashes, SimHash64, SortedIntersectCount, Winnow}

/** SQL registration of the engine's native expressions.
  *
  * Two entry points over one registry:
  * - config-based: `.config("spark.sql.extensions", "graft.GraftExtensions")`
  *   (or `.withExtensions(new GraftExtensions)`) at session build time;
  * - [[GraftFunctions.register]] for an already-running session.
  *
  * {{{
  * spark.sql("SELECT simhash64(text), shingle_hashes(text, 3) FROM docs")
  * }}}
  */
object GraftFunctions {

  type Builder = Seq[Expression] => Expression

  val registry: Seq[(FunctionIdentifier, ExpressionInfo, Builder)] = Seq(
    (new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "simhash64(text)")
        SimHash64(args.head)
      }),
    (new FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "shingle_hashes(text, n)")
        ShingleHashes(args.head, intArg(args(1), "shingle_hashes n"))
      }),
    (new FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "minhash_signature(shingles, numHashes)")
        MinHashSignature(args.head, intArg(args(1), "minhash_signature numHashes"))
      }),
    (new FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName,
        "sorted_intersect_count"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "sorted_intersect_count(a, b)")
        SortedIntersectCount(args.head, args(1))
      }),
    (new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "dot_product(a, b)")
        DotProduct(args.head, args(1))
      }),
    (new FunctionIdentifier("winnow"),
      new ExpressionInfo(classOf[Winnow].getName, "winnow"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "winnow(hashes, w)")
        Winnow(args.head, intArg(args(1), "winnow w"))
      }),
    (new FunctionIdentifier("bounded_levenshtein"),
      new ExpressionInfo(classOf[BoundedEditDistance].getName,
        "bounded_levenshtein"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "bounded_levenshtein(a, b, k)")
        BoundedEditDistance(args.head, args(1),
          intArg(args(2), "bounded_levenshtein k"))
      }))

  /** Register into a live session's function registry. */
  def register(spark: SparkSession): Unit =
    registry.foreach { case (id, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(id.funcName, builder, "scala_udf")
    }

  private def intArg(e: Expression, what: String): Int = e.eval(null) match {
    case i: Int  => i
    case l: Long => l.toInt
    case other   => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.registry.foreach(ext.injectFunction)
}
