package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.core.{GlueFrame, GlueFrameCollection}

/** Sink dispatch (SURVEY §2.1 S8-S11).
  *
  * Reference: awsglue/context.py:295-354 `getSink` + data_sink.py:17-50;
  * the pipeline's only sink is the JDBC/Redshift append
  * (context.py:407-436, used ×6 in pipeline.py). Spark-first: the
  * DataFrameWriter already carries the format dispatch; this layer only
  * pins the append semantics and the spigot side-write.
  */
object Sinks {

  /** Generic sink (context.py:295-354). */
  def write(
      df: DataFrame,
      connectionType: String,
      format: String = null,
      options: Map[String, String] = Map.empty,
      mode: String = "append"): Unit = connectionType.toLowerCase match {
    case "file" | "s3" =>
      val path = options.getOrElse("path", sys.error("file sink needs 'path'"))
      df.write.mode(mode).options(options - "path")
        .format(Option(format).getOrElse("parquet")).save(path)
    case "jdbc" | "redshift" =>
      // Identical append semantics to the reference's COPY-via-staging
      // (write_dynamic_frame_from_jdbc_conf, context.py:407-436); real
      // Redshift staging is an environment concern, not a plan concern.
      df.write.format("jdbc").mode(mode).options(options).save()
    case "catalog" =>
      df.write.mode(mode).saveAsTable(options("table"))
    case other => sys.error(s"unsupported sink connection type: $other")
  }

  /** Staged warehouse write — the reference's COPY shape
    * (context.py:407-436): Glue never row-inserts into Redshift; it
    * stages the frame to S3 files, then issues ONE bulk COPY. Same
    * two-phase split here: stage the frame to `stagingDir` as parquet
    * (columnar, schema-carrying), then bulk-load the staged files
    * over JDBC. The point of staging is decoupling the expensive
    * distributed compute from the warehouse load: a failed load
    * re-runs from the staged files via [[loadStagedJdbc]] without
    * recomputing the frame.
    */
  def writeJdbcStaged(
      df: DataFrame,
      stagingDir: String,
      options: Map[String, String],
      mode: String = "append",
      keyColumns: Seq[String] = Nil): Unit = {
    df.write.mode("overwrite").parquet(stagingDir)
    loadStagedJdbc(df.sparkSession, stagingDir, options, mode, keyColumns)
  }

  /** The load phase alone — rerunnable after a warehouse failure.
    * With `keyColumns` the load is retry-safe: staged rows whose key
    * already landed are anti-joined away against the target (the
    * key-only read prunes columns through the JDBC source), so a
    * crashed-then-retried load never duplicates. Without keys it is a
    * plain bulk append, exactly COPY's contract.
    */
  def loadStagedJdbc(
      spark: org.apache.spark.sql.SparkSession,
      stagingDir: String,
      options: Map[String, String],
      mode: String = "append",
      keyColumns: Seq[String] = Nil): Unit = {
    val staged = spark.read.parquet(stagingDir)
    val toLoad =
      if (keyColumns.isEmpty) staged
      else scala.util.Try(
          spark.read.format("jdbc").options(options).load()
            .select(keyColumns.map(col): _*))
        .toOption // absent table -> first load
        .fold(staged)(existing =>
          staged.join(existing, keyColumns, "left_anti"))
    toLoad.write.format("jdbc").mode(mode).options(options).save()
  }

  /** Sink write returning the errors frame — the reference contract:
    * every `DataSink.write` returns an errors DynamicFrame
    * (awsglue/data_sink.py:32-43; `writeFrame` ×6 in pipeline.py), so
    * "write and inspect the rejects" is a first-class path.
    *
    * When `targetSchema` is given (the sink's table schema), rows with
    * a value that fails its column cast are split OFF before the
    * write — they land in the returned errors frame as
    * (record JSON, errorMessage, stage) alongside the frame's
    * accumulated upstream errors; surviving rows are written cast to
    * the target types, in target-column order. Without a schema the
    * write is as-is and only upstream errors are returned.
    *
    * The input is persisted (caller owns unpersist, as with [[spigot]])
    * so the write action and the lazy reject scan share one upstream
    * evaluation. try_cast keeps the split inside codegen — no row
    * lambdas, no ANSI cast throw.
    */
  def writeFrame(
      frame: GlueFrame,
      connectionType: String,
      format: String = null,
      options: Map[String, String] = Map.empty,
      mode: String = "append",
      targetSchema: Option[StructType] = None,
      stage: String = "sink"): DataFrame = targetSchema match {
    case None =>
      write(frame.data, connectionType, format, options, mode)
      frame.errors
    case Some(schema) =>
      val df = frame.data
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val fields = schema.fields.toSeq
        .filter(f => df.columns.contains(f.name))
      def failsCast(f: org.apache.spark.sql.types.StructField) =
        col(f.name).isNotNull && col(f.name).try_cast(f.dataType).isNull
      val rejected = fields.map(failsCast)
        .reduceOption(_ || _).getOrElse(lit(false))
      val ok = df.filter(!rejected)
        .select(fields.map(f =>
          col(f.name).try_cast(f.dataType).as(f.name)): _*)
      write(ok, connectionType, format, options, mode)
      val bad = df.filter(rejected).select(
        to_json(struct(df.columns.toIndexedSeq.map(col): _*)).as("record"),
        concat(lit("sink cast failed: "), concat_ws(",",
          array(fields.map(f => when(failsCast(f), lit(f.name))): _*)))
          .as("errorMessage"),
        lit(stage).as("stage"))
      frame.errors.unionByName(bad)
  }

  /** Collection sink fan-out — the reference's `useFrameName` contract
    * (awsglue/context.py:295-354; data_sink.py:42-50): writing a
    * DynamicFrameCollection writes EACH member frame under its own
    * name, so a relationalize result (root + child tables) lands with
    * one call. Name mapping per sink type: file/s3 sinks write to
    * `path/<name>`; catalog and jdbc sinks write to
    * `<table>_<name>` with the member name sanitized to identifier
    * characters (relationalize child keys carry dots). Returns the
    * members' errors frames merged in key order — the same
    * errors-frame contract as [[writeFrame]].
    *
    * Members write sequentially by sorted key (deterministic; each
    * member write is itself a distributed job, so there is no cluster
    * idle time to recover by overlapping them).
    */
  def writeCollection(
      coll: GlueFrameCollection,
      connectionType: String,
      format: String = null,
      options: Map[String, String] = Map.empty,
      mode: String = "append",
      targetSchemas: Map[String, StructType] = Map.empty): DataFrame = {
    require(coll.frames.nonEmpty, "cannot write an empty collection")
    def ident(k: String) = k.replaceAll("[^A-Za-z0-9_]", "_")
    val errorFrames = coll.keys.map { k =>
      val memberOpts = connectionType.toLowerCase match {
        case "file" | "s3" =>
          val base = options.getOrElse("path",
            sys.error("file sink needs 'path'"))
          options + ("path" -> s"${base.stripSuffix("/")}/$k")
        case "catalog" =>
          val base = options.getOrElse("table",
            sys.error("catalog sink needs 'table'"))
          options + ("table" -> s"${base}_${ident(k)}")
        case "jdbc" | "redshift" =>
          val base = options.getOrElse("dbtable",
            sys.error("jdbc sink needs 'dbtable'"))
          options + ("dbtable" -> s"${base}_${ident(k)}")
        case other => sys.error(s"unsupported sink connection type: $other")
      }
      writeFrame(coll.frames(k), connectionType, format, memberOpts, mode,
        targetSchemas.get(k), stage = s"sink:$k")
    }
    errorFrames.reduce(_ unionByName _)
  }

  /** Spigot (dynamicframe.py:296-300; field_transforms.py:431-469): tee
    * a small sample of records to a path mid-pipeline without altering
    * the flow. `topk` caps the sample; `prob` subsamples.
    *
    * The input is persisted before the side-write and the PERSISTED
    * frame is returned, so the upstream plan executes once, not once
    * for the tee and again for the main flow (SURVEY §2.1 maps the
    * reference's tee to `df.cache()` + side-write). The caller owns
    * unpersist after its terminal write.
    */
  def spigot(
      df: DataFrame,
      path: String,
      topk: Int = 100,
      prob: Double = 1.0): DataFrame = {
    val cached  = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sampled = if (prob < 1.0)
      cached.sample(withReplacement = false, prob, seed = 42L) else cached
    sampled.limit(topk).write.mode("overwrite").json(path)
    cached
  }
}
