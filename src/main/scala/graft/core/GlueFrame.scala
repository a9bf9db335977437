package graft.core

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A frame with a parallel error channel (SURVEY §1.1, §2.9 C4).
  *
  * The reference threads an error side-channel through every transform:
  * records carry isError/errorMessage, frames expose
  * errorsAsDynamicFrame / errorsCount / stageErrorsCount /
  * assertErrorThreshold, and per-transform stageThreshold /
  * totalThreshold fail the job lazily (awsglue/dynamicframe.py:
  * 87-90, 107-115, 493-519; transforms/errors_as_dynamicframe.py:15-45).
  *
  * Spark-first: `data` and `errors` are two lazy DataFrames sharing the
  * upstream plan. Error rows carry the offending record as JSON plus
  * message and stage. Record-level map/filter use typed row lambdas
  * (the reference ships rows to Python workers — dynamicframe.py:59-63;
  * here they stay in the JVM, one serialization boundary instead of
  * three).
  *
  * Exception taxonomy (dynamicframe_filter.py:17-65 /
  * dynamicframe_map.py:17-71, translated Python→Scala): in `filter`,
  * lookup/cast errors (KeyError/ValueError/TypeError ≈
  * NoSuchElementException/ClassCastException/NumberFormatException/
  * NullPointerException) silently DROP the row; any other exception
  * marks the row as an error but keeps the pipeline running. In `map`,
  * a null result or any exception produces an error record preserving
  * the original row.
  */
final case class GlueFrame(
    data: DataFrame,
    errors: DataFrame,
    name: String = "") {

  import GlueFrame._

  def sparkSession: SparkSession = data.sparkSession

  /** Apply a DataFrame op to the data channel, keeping errors. */
  def transform(f: DataFrame => DataFrame): GlueFrame = copy(data = f(data))

  /** Record-level filter with the reference's error contract. */
  def filterRecords(f: Row => Boolean, stage: String = "filter"): GlueFrame = {
    val marked = mark(data) { row =>
      try { if (f(row)) Keep else Drop }
      catch {
        case _: NoSuchElementException | _: ClassCastException |
            _: NumberFormatException | _: NullPointerException => Drop
        case scala.util.control.NonFatal(e) => Err(e.toString)
      }
    }
    split(marked, stage)
  }

  /** Record-level map; the output schema must be supplied (the
    * reference infers it per-record — bounded-schema is the
    * scale-sane contract).
    */
  def mapRecords(f: Row => Row, outSchema: StructType,
      stage: String = "map"): GlueFrame = {
    val inSchema = data.schema
    implicit val enc: Encoder[Row] = Encoders.row(StructType(Seq(
      StructField("out", outSchema),
      StructField("rec", inSchema),
      StructField("err", StringType))))
    val marked = data.map { row =>
      try {
        val out = f(row)
        if (out == null) Row(null, row, "map function returned null")
        else Row(out, null, null)
      } catch {
        case scala.util.control.NonFatal(e) => Row(null, row, e.toString)
      }
    }
    val ok = marked.filter(col("err").isNull)
      .select(col("out.*"))
    val bad = marked.filter(col("err").isNotNull).select(
      to_json(col("rec")).as("record"),
      col("err").as("errorMessage"),
      lit(stage).as("stage"))
    GlueFrame(ok, unionErrors(errors, bad), name)
  }

  // ------------------------------------------------------ error surface

  /** errorsAsDynamicFrame (errors_as_dynamicframe.py:15-45). */
  def errorsAsFrame: DataFrame = errors

  /** Total error count across all stages (dynamicframe.py:493-519). */
  def errorsCount(): Long = errors.count()

  def stageErrorsCount(stage: String): Long =
    errors.filter(col("stage") === stage).count()

  /** assertErrorThreshold: fail the job if any stage exceeds
    * `stageThreshold` or the total exceeds `totalThreshold` — lazy,
    * like the reference (checked on call, not per transform).
    */
  def assertErrorThreshold(stageThreshold: Long = 0, totalThreshold: Long = 0): GlueFrame = {
    val perStage = errors.groupBy(col("stage")).count().collect()
    val total    = perStage.map(_.getLong(1)).sum
    perStage.foreach { r =>
      if (r.getLong(1) > stageThreshold)
        throw new IllegalStateException(
          s"stage ${r.getString(0)}: ${r.getLong(1)} errors > $stageThreshold")
    }
    if (total > totalThreshold)
      throw new IllegalStateException(s"total $total errors > $totalThreshold")
    this
  }

  // -------------------------------------------------------------- impl

  private def split(marked: DataFrame, stage: String): GlueFrame = {
    val dataCols = data.columns.toIndexedSeq.map(c => col(FieldPath.quote(c)))
    val ok = marked.filter(col(StatusCol) === KeepCode)
      .select(dataCols: _*)
    val bad = marked.filter(col(StatusCol) === ErrCode).select(
      to_json(struct(dataCols: _*)).as("record"),
      col(ErrCol).as("errorMessage"),
      lit(stage).as("stage"))
    GlueFrame(ok, unionErrors(errors, bad), name)
  }

  private def mark(df: DataFrame)(judge: Row => Verdict): DataFrame = {
    val schema = df.schema
    val outSchema = schema
      .add(StatusCol, IntegerType).add(ErrCol, StringType)
    implicit val enc: Encoder[Row] = Encoders.row(outSchema)
    df.map { row =>
      val (code, msg) = judge(row) match {
        case Keep   => (KeepCode, null)
        case Drop   => (DropCode, null)
        case Err(m) => (ErrCode, m)
      }
      Row.fromSeq(row.toSeq :+ code :+ msg)
    }
  }
}

object GlueFrame {

  private val StatusCol = "__glue_status"
  private val ErrCol    = "__glue_err"
  private val KeepCode  = 1
  private val DropCode  = 0
  private val ErrCode   = 2

  private sealed trait Verdict
  private case object Keep            extends Verdict
  private case object Drop            extends Verdict
  private final case class Err(m: String) extends Verdict

  val errorSchema: StructType = StructType(Seq(
    StructField("record", StringType),
    StructField("errorMessage", StringType),
    StructField("stage", StringType)))

  def emptyErrors(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      new java.util.ArrayList[Row](), errorSchema)

  def apply(df: DataFrame): GlueFrame =
    GlueFrame(df, emptyErrors(df.sparkSession))

  def apply(df: DataFrame, name: String): GlueFrame =
    GlueFrame(df, emptyErrors(df.sparkSession), name)

  private[core] def unionErrors(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
}

/** DynamicFrameCollection (SURVEY §2.9 C1-C3;
  * awsglue/dynamicframe.py:522-593; transforms/
  * collection_transforms.py:15-155): a named bundle of frames with
  * select / map / flatMap combinators. Missing key → empty frame with
  * no columns, matching dynamicframe.py:548-556.
  */
final case class GlueFrameCollection(frames: Map[String, GlueFrame]) {

  def keys: Seq[String] = frames.keys.toSeq.sorted

  /** SelectFromCollection (collection_transforms.py:15-53). */
  def select(key: String)(implicit spark: SparkSession): GlueFrame =
    frames.getOrElse(key,
      GlueFrame(spark.emptyDataFrame, GlueFrame.emptyErrors(spark)))

  /** MapToCollection (collection_transforms.py:55-93). */
  def map(f: GlueFrame => GlueFrame): GlueFrameCollection =
    GlueFrameCollection(frames.map { case (k, v) => k -> f(v) })

  /** FlatMap (collection_transforms.py:96-155). */
  def flatMap(f: (String, GlueFrame) => Seq[(String, GlueFrame)]): GlueFrameCollection =
    GlueFrameCollection(frames.toSeq.flatMap { case (k, v) => f(k, v) }.toMap)
}
