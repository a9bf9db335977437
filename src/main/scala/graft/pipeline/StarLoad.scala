package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{FieldOps, Joins}
import graft.sources.Sources

/** The reference's warehouse-load program (SURVEY §3 EP1/EP2),
  * generalized: headerless TSV extract → positional rename → projection
  * → renames → casts → incremental anti-join against the warehouse →
  * append. Six dimension loads + composite-key fact load
  * (pipeline.py:84-153 per dim; 834-1013 fact).
  *
  * Differences from the reference, by design (SURVEY §7.3):
  * - the left-join + "key is null" + drop idiom is emitted directly as
  *   `left_anti` (same semantics, half the shuffle);
  * - the reference's 17 eager count() actions collapse to one count per
  *   load (the appended batch), computed from the frame being written;
  * - warehouse access is behind [[Warehouse]]: JDBC in production,
  *   parquet locally — identical append-only contract.
  */
object StarLoad {

  /** One dimension load (EP1). */
  final case class DimSpec(
      table: String,
      inputPath: String,
      columnNames: Seq[String],          // positional rename of _c0.._cN
      projection: Seq[String],           // business columns
      renames: Map[String, String] = Map.empty,
      casts: Map[String, String] = Map.empty,
      businessKeys: Seq[String])

  /** Fact load (EP2): detail ⋈ header then incremental append. */
  final case class FactSpec(
      table: String,
      detailPath: String,
      detailColumns: Seq[String],
      headerPath: String,
      headerColumns: Seq[String],
      joinKey: String,
      renames: Map[String, String] = Map.empty,
      casts: Map[String, String] = Map.empty,
      projection: Seq[String],
      businessKeys: Seq[String])

  /** Append-only warehouse boundary (S9/S10). */
  trait Warehouse {
    def read(table: String): Option[DataFrame]
    def append(table: String, df: DataFrame): Unit
  }

  /** Local stand-in with the same append semantics as the JDBC sink. */
  final class ParquetWarehouse(spark: SparkSession, dir: String) extends Warehouse {
    private def path(table: String) = s"$dir/$table"
    def read(table: String): Option[DataFrame] =
      if (new java.io.File(path(table)).exists())
        Some(spark.read.parquet(path(table)))
      else None
    def append(table: String, df: DataFrame): Unit =
      df.write.mode("append").parquet(path(table))
  }

  /** Production sink: JDBC append (write_dynamic_frame_from_jdbc_conf,
    * awsglue/context.py:407-436). A missing target table reads as None
    * (first-load branch), matching [[ParquetWarehouse]] — the reference
    * assumes pre-created Redshift tables (ddl.sql) but guards on
    * count()>0; this keeps the same observable flow without the DDL
    * prerequisite.
    */
  final class JdbcWarehouse(spark: SparkSession, options: Map[String, String])
      extends Warehouse {
    def read(table: String): Option[DataFrame] =
      try {
        val df = spark.read.format("jdbc")
          .options(options + ("dbtable" -> table)).load()
        df.schema // schema resolution probes the table eagerly
        Some(df)
      } catch { case _: Exception => None }
    def append(table: String, df: DataFrame): Unit =
      df.write.format("jdbc").mode("append")
        .options(options + ("dbtable" -> table)).save()
  }

  /** Shape the raw TSV frame per the spec (rename/select/rename/cast —
    * pipeline.py:89-98).
    */
  def shapeDim(spark: SparkSession, spec: DimSpec): DataFrame = {
    val raw     = Sources.readTsv(spark, spec.inputPath)
    val named   = FieldOps.renamePositional(raw, spec.columnNames)
    val selected = named.select(spec.projection.map(col): _*)
    val renamed = spec.renames.foldLeft(selected) { case (df, (from, to)) =>
      df.withColumnRenamed(from, to)
    }
    FieldOps.castColumns(renamed, spec.casts)
  }

  /** Run one dimension load; returns number of rows appended. */
  def loadDim(spark: SparkSession, spec: DimSpec, wh: Warehouse): Long = {
    val incoming = shapeDim(spark, spec)
    val fresh = wh.read(spec.table) match {
      case Some(existing) =>
        Joins.insertOnlyNew(incoming, existing, spec.businessKeys)
      case None => incoming
    }
    // single action per load: count the batch we are about to append
    val toInsert = fresh.persist()
    try {
      val n = toInsert.count()
      if (n > 0) wh.append(spec.table, toInsert)
      n
    } finally { toInsert.unpersist(); () }
  }

  /** Run the fact load (EP2: pipeline.py:834-1013). Null-valued
    * business keys never match the anti-join and are therefore always
    * re-inserted — the reference's (preserved) semantics, SURVEY J4.
    */
  def loadFact(spark: SparkSession, spec: FactSpec, wh: Warehouse): Long = {
    val detail = FieldOps.renamePositional(
      Sources.readTsv(spark, spec.detailPath), spec.detailColumns)
    val header = FieldOps.renamePositional(
      Sources.readTsv(spark, spec.headerPath), spec.headerColumns)
    val joined = detail.join(header, Seq(spec.joinKey), "inner")
    val renamed = spec.renames.foldLeft(joined) { case (df, (from, to)) =>
      df.withColumnRenamed(from, to)
    }
    val shaped = FieldOps.castColumns(renamed, spec.casts)
      .select(spec.projection.map(col): _*)
    val fresh = wh.read(spec.table) match {
      case Some(existing) =>
        Joins.insertOnlyNewComposite(shaped, existing, spec.businessKeys)
      case None => shaped
    }
    val toInsert = fresh.persist()
    try {
      val n = toInsert.count()
      if (n > 0) wh.append(spec.table, toInsert)
      n
    } finally { toInsert.unpersist(); () }
  }
}
