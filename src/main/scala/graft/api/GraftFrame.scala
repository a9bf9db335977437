package graft.api

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType
import org.apache.spark.storage.StorageLevel

import graft.core.{GlueFrame, GlueFrameCollection}
import graft.operators._
import graft.sources.{Sinks, Sources}

/** The user-facing frame API — method-for-method parity with the
  * reference's DynamicFrame surface (awsglue/dynamicframe.py), so a
  * pipeline written against the reference maps 1:1:
  *
  * {{{
  * val ctx = GraftContext(spark)
  * ctx.readTsv(path)
  *    .applyMapping(Seq(("\_c0","", "id", "int"), ("\_c1","", "name", "string")))
  *    .filter(col("id") > 0)
  *    .resolveChoice(choice = "cast:string")
  *    .writeParquet(out)
  * }}}
  *
  * Everything delegates to the operator layer (pure Column plans);
  * this class adds no execution logic — it is the ergonomic shell plus
  * the error-channel bookkeeping.
  */
final case class GraftFrame(gf: GlueFrame) {

  def df: DataFrame = gf.data
  def errors: DataFrame = gf.errorsAsFrame
  def name: String = gf.name
  def spark: SparkSession = gf.sparkSession

  private def next(d: DataFrame): GraftFrame = copy(gf = gf.copy(data = d))

  // ------------------------------------------------------ projection ops

  /** select_fields (dynamicframe.py:203-217). */
  def selectFields(paths: Seq[String]): GraftFrame =
    next(FieldOps.selectFields(df, paths))

  /** drop_fields (dynamicframe.py:187-201). */
  def dropFields(paths: Seq[String]): GraftFrame =
    next(FieldOps.dropFields(df, paths))

  /** rename_field (dynamicframe.py:271-282). */
  def renameField(from: String, to: String): GraftFrame =
    next(FieldOps.renameField(df, from, to))

  /** apply_mapping (dynamicframe.py:347-388): (source, sourceType,
    * target, targetType) tuples.
    */
  def applyMapping(mappings: Seq[(String, String, String, String)]): GraftFrame =
    next(FieldOps.applyMapping(df, mappings.map { case (s, st, t, tt) =>
      FieldOps.Mapping(s, st, t, tt)
    }))

  /** split_fields (dynamicframe.py:219-236). */
  def splitFields(paths: Seq[String]): GraftFrameCollection2 = {
    val (sel, rest) = FieldOps.splitFields(df, paths)
    GraftFrameCollection2(Map("selected" -> next(sel), "remaining" -> next(rest)))
  }

  /** split_rows (dynamicframe.py:238-269). */
  def splitRows(spec: Map[String, Map[String, Any]]): GraftFrameCollection2 = {
    val (m, nm) = FieldOps.splitRows(df, spec)
    GraftFrameCollection2(Map("matched" -> next(m), "unmatched" -> next(nm)))
  }

  // -------------------------------------------------------- record ops

  /** filter with the error-channel contract (dynamicframe.py:80-94). */
  def filterRecords(f: Row => Boolean, transformationCtx: String = "filter"): GraftFrame =
    GraftFrame(gf.filterRecords(f, transformationCtx))

  /** map with the error-channel contract (dynamicframe.py:101-118). */
  def mapRecords(f: Row => Row, outSchema: StructType,
      transformationCtx: String = "map"): GraftFrame =
    GraftFrame(gf.mapRecords(f, outSchema, transformationCtx))

  /** Column-predicate filter (the codegen fast path). */
  def filter(c: Column): GraftFrame = next(df.filter(c))

  // -------------------------------------------------------- schema ops

  /** resolveChoice (dynamicframe.py:394-434), incl. the MATCH_CATALOG
    * global action with database/tableName.
    */
  def resolveChoice(specs: Seq[(String, String)] = Nil,
      choice: String = null,
      database: String = null,
      tableName: String = null): GraftFrame =
    next(ChoiceOps.resolveChoice(df, specs, choice, database, tableName))

  /** unnest (dynamicframe.py:310-322). */
  def unnest(): GraftFrame = next(NestedOps.unnest(df))

  /** relationalize (dynamicframe.py:324-345). */
  def relationalize(rootName: String, idCol: Option[String] = None): GraftFrameCollection2 =
    GraftFrameCollection2(NestedOps.relationalize(df, rootName, idCol)
      .map { case (k, v) => k -> next(v) })

  /** unbox (dynamicframe.py:162-185). */
  def unbox(field: String, format: String,
      options: Map[String, String] = Map.empty): GraftFrame =
    next(NestedOps.unbox(df, field, format, options))

  /** unnest_ddb_json (dynamicframe.py:390-392). */
  def unnestDdbJson(): GraftFrame = next(NestedOps.unnestDdbJson(df))

  /** drop_nulls / DropNullFields (transforms/drop_nulls.py). */
  def dropNullFields(): GraftFrame = next(FieldOps.dropNullFields(df))

  // --------------------------------------------------------- join / set

  /** join (dynamicframe.py:302-308): multi-key equality inner join. */
  def join(paths1: Seq[String], paths2: Seq[String], other: GraftFrame): GraftFrame =
    next(Joins.equiJoin(df, paths1, other.df, paths2))

  /** mergeDynamicFrame (dynamicframe.py:436-461). */
  def merge(staging: GraftFrame, keys: Seq[String]): GraftFrame =
    next(Joins.mergeFrames(df, staging.df, keys))

  /** union (dynamicframe.py:463-475) — choice-aware schema merge. */
  def union(other: GraftFrame): GraftFrame =
    next(ChoiceOps.union(df, other.df))

  // ---------------------------------------------------------- physical

  def repartition(n: Int): GraftFrame = next(PhysicalOps.repartition(df, n))
  def coalesce(n: Int, shuffle: Boolean = false): GraftFrame =
    next(PhysicalOps.coalesce(df, n, shuffle))
  def getNumPartitions: Int = PhysicalOps.getNumPartitions(df)
  def persist(level: StorageLevel = StorageLevel.MEMORY_AND_DISK): GraftFrame =
    next(PhysicalOps.persist(df, level))
  def count(): Long = df.count()

  /** spigot (dynamicframe.py:296-300): tee a sample, pass through. */
  def spigot(path: String, topk: Int = 100, prob: Double = 1.0): GraftFrame =
    next(Sinks.spigot(df, path, topk, prob))

  // ------------------------------------------------------ error surface

  def errorsCount(): Long = gf.errorsCount()
  def stageErrorsCount(stage: String): Long = gf.stageErrorsCount(stage)
  def assertErrorThreshold(stageThreshold: Long = 0, totalThreshold: Long = 0): GraftFrame = {
    gf.assertErrorThreshold(stageThreshold, totalThreshold); this
  }

  // ------------------------------------------------------------- sinks

  def writeParquet(path: String, mode: String = "append"): GraftFrame = {
    Sinks.write(df, "file", "parquet", Map("path" -> path), mode); this
  }

  def write(connectionType: String, format: String = null,
      options: Map[String, String] = Map.empty,
      mode: String = "append"): GraftFrame = {
    Sinks.write(df, connectionType, format, options, mode); this
  }
}

/** Named bundle of frames (DynamicFrameCollection parity). */
final case class GraftFrameCollection2(frames: Map[String, GraftFrame]) {
  def keys: Seq[String] = frames.keys.toSeq.sorted
  def apply(key: String): GraftFrame = frames(key)
  def select(key: String)(implicit spark: SparkSession): GraftFrame =
    frames.getOrElse(key,
      GraftFrame(GlueFrame(spark.emptyDataFrame, GlueFrame.emptyErrors(spark))))
  def map(f: GraftFrame => GraftFrame): GraftFrameCollection2 =
    GraftFrameCollection2(frames.map { case (k, v) => k -> f(v) })
  def flatMap(f: (String, GraftFrame) => Seq[(String, GraftFrame)]): GraftFrameCollection2 =
    GraftFrameCollection2(frames.toSeq.flatMap { case (k, v) => f(k, v) }.toMap)
}

/** GlueContext parity (awsglue/context.py): the reader/writer entry
  * points, returning [[GraftFrame]]s.
  */
final case class GraftContext(spark: SparkSession) {

  private def wrap(df: DataFrame, name: String = ""): GraftFrame =
    GraftFrame(GlueFrame(df, GlueFrame.emptyErrors(spark), name))

  /** create_dynamic_frame.from_options (context.py:222-237). */
  def createFrameFromOptions(
      connectionType: String, format: String = null,
      options: Map[String, String] = Map.empty,
      pushDownPredicate: Option[Column] = None,
      transformationCtx: String = ""): GraftFrame =
    wrap(Sources.source(spark, connectionType, format, options,
      pushDownPredicate), transformationCtx)

  /** create_dynamic_frame.from_catalog (context.py:158-188). */
  def createFrameFromCatalog(database: String, table: String,
      pushDownPredicate: Option[Column] = None,
      transformationCtx: String = ""): GraftFrame =
    wrap(Sources.fromCatalog(spark, database, table, pushDownPredicate),
      transformationCtx)

  /** The pipeline's read_tsv (pipeline.py:43-44). */
  def readTsv(path: String): GraftFrame = wrap(Sources.readTsv(spark, path))

  def readParquet(path: String): GraftFrame = wrap(spark.read.parquet(path))

  /** create_sample_dynamic_frame (context.py:239-281). */
  def sampleFrame(frame: GraftFrame, num: Int): GraftFrame =
    GraftFrame(frame.gf.copy(data = Sources.sample(frame.df, num)))

  /** with_frame_schema (R9, dynamicframe.py:65-67): attach a known
    * schema instead of inferring — columns are matched by name, cast
    * and reordered to the declared shape.
    */
  def withFrameSchema(frame: GraftFrame, ddl: String): GraftFrame = {
    val schema = org.apache.spark.sql.types.StructType.fromDDL(ddl)
    GraftFrame(frame.gf.copy(data = frame.df.select(
      schema.fields.toIndexedSeq.map(f =>
        org.apache.spark.sql.functions.col(f.name).cast(f.dataType)
          .as(f.name)): _*)))
  }

  /** add_ingestion_time_columns (context.py:666-674). */
  def addIngestionTimeColumns(frame: GraftFrame,
      granularity: String = "hour"): GraftFrame =
    GraftFrame(frame.gf.copy(
      data = FieldOps.addIngestionTimeColumns(frame.df, granularity)))

  /** forEachBatch (context.py:602-664). */
  def forEachBatch(stream: DataFrame,
      batchFn: (org.apache.spark.sql.Dataset[Row], Long) => Unit,
      windowSize: String, checkpointLocation: String,
      batchMaxRetries: Int = 3): org.apache.spark.sql.streaming.StreamingQuery =
    graft.streaming.MicroBatch.forEachBatch(stream, batchFn, windowSize,
      checkpointLocation, batchMaxRetries)
}
