package graft.sources

import org.apache.spark.sql.DataFrame

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
