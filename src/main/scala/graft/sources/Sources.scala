package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Source dispatch (SURVEY §2.1).
  *
  * Re-expresses the reference's source factory
  * (awsglue/context.py:86-120 `getSource`; data_source.py:17-45) as a
  * thin dispatch over Spark's DataFrameReader: connection types
  * "file"/"s3" route through a format reader, "jdbc"/"redshift" through
  * the JDBC source, "parquet"/"orc" short-circuit to Spark SQL
  * datasources exactly like the reference's `Spark_SQL_Formats`
  * (context.py:53). Predicate pushdown: the reference threads
  * `push_down_predicate` into every source (context.py:86,104,...); here
  * it is sugar for `.where` applied before any other op, which Catalyst
  * pushes into the scan (PushedFilters / partition pruning).
  */
object Sources {

  /** Formats Spark reads natively without a format adapter — mirrors
    * `Spark_SQL_Formats` (context.py:53).
    */
  val SparkSqlFormats: Set[String] = Set("parquet", "orc")

  /** Headerless tab-separated read, all-string schema — the pipeline's
    * `read_tsv` (pipeline.py:43-44), used for every AdventureWorks
    * extract. Columns come out `_c0.._cN` string, matching the
    * reference's inference-free default.
    */
  def readTsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("sep", "\t").csv(path)

  /** Generic source factory (context.py:86-120). */
  def source(
      spark: SparkSession,
      connectionType: String,
      format: String = null,
      options: Map[String, String] = Map.empty,
      pushDownPredicate: Option[Column] = None): DataFrame = {
    val df = connectionType.toLowerCase match {
      case "file" | "s3" =>
        val path = options.getOrElse("path",
          options.getOrElse("paths", sys.error("file source needs 'path'")))
        val fmt = Option(format).getOrElse(sys.error("file source needs format"))
        require(fmt != "lzo", "lzo compression requires an explicit format") // context.py:97-99
        spark.read.options(options - "path" - "paths").format(fmt).load(path)
      case "jdbc" | "redshift" =>
        // Redshift COPY/UNLOAD staging is environment-bound; locally the
        // JDBC datasource carries identical read semantics (SURVEY §7.3).
        spark.read.format("jdbc").options(options).load()
      case "parquet" | "orc" =>
        spark.read.options(options - "path").format(connectionType)
          .load(options.getOrElse("path", sys.error("needs 'path'")))
      case other => sys.error(s"unsupported connection type: $other")
    }
    pushDownPredicate.fold(df)(df.where) // Catalyst pushes into the scan
  }

  /** Range-partitioned JDBC read — the first-class 100 TB ingest path
    * (the reference threads `hashfield`/`hashexpression`/`hashpartitions`
    * through its JDBC sources, context.py:120 options pass-through;
    * Spark's equivalent is partitionColumn/bounds/numPartitions). A
    * plain JDBC read is ONE connection streaming the whole table
    * through one task; this helper makes the parallel form explicit
    * instead of an options incantation: `numPartitions` concurrent
    * range scans `WHERE col >= lo AND col < hi`, each its own input
    * partition. Bounds only steer the range split — rows outside
    * [lower, upper) still load (Spark's documented semantics), so a
    * stale min/max never silently drops data. Pick a clustered,
    * roughly-uniform numeric/date column; size numPartitions to the
    * warehouse's concurrent-cursor budget, not the executor count.
    */
  def jdbcPartitioned(
      spark: SparkSession,
      url: String, table: String,
      partitionColumn: String, lowerBound: Long, upperBound: Long,
      numPartitions: Int,
      options: Map[String, String] = Map.empty): DataFrame = {
    require(numPartitions >= 1, "numPartitions must be >= 1")
    require(upperBound > lowerBound, "upperBound must exceed lowerBound")
    spark.read.format("jdbc")
      .options(options)
      .option("url", url)
      .option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound.toString)
      .option("upperBound", upperBound.toString)
      .option("numPartitions", numPartitions.toString)
      .load()
  }

  /** Catalog source (context.py:158-188): metastore table + optional
    * partition predicate.
    */
  def fromCatalog(
      spark: SparkSession,
      database: String,
      table: String,
      pushDownPredicate: Option[Column] = None): DataFrame = {
    val df = spark.table(s"$database.$table")
    pushDownPredicate.fold(df)(df.where)
  }

  /** Sampled source (context.py:239-281 / data_source.py:42-45): first-N
    * records. `limit` short-circuits the scan (LocalLimit pushdown).
    */
  def sample(df: DataFrame, num: Int): DataFrame = df.limit(num)

  /** RDD source (S6, context.py:152-156 create_dynamic_frame_from_rdd):
    * wrap an existing RDD as a frame. Row RDDs need the schema; Product
    * (case-class) RDDs derive it from the type.
    */
  def fromRdd(
      spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.Row],
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.createDataFrame(rdd, schema)

  def fromRdd[A <: Product : scala.reflect.runtime.universe.TypeTag](
      spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[A]): DataFrame =
    spark.createDataFrame(rdd)

  /** Min-partitions control on read (context.py:73-84): widen small
    * scans so downstream parallelism is not bottlenecked by file
    * count. Decided from leaf-scan partitioning (no plan execution) —
    * see [[graft.operators.PhysicalOps.withMinPartitions]].
    */
  def withMinPartitions(df: DataFrame, minPartitions: Int): DataFrame =
    graft.operators.PhysicalOps.withMinPartitions(df, minPartitions)
}
