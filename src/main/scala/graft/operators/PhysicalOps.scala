package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Partitioning / physical passthroughs (SURVEY §2.8 X1-X5).
  *
  * Thin by design: repartition/coalesce/persist are already the right
  * Spark primitives (awsglue/dynamicframe.py:477-491; transforms/
  * repartition.py, coalesce.py). The one semantic to preserve:
  * Coalesce(shuffle=true) means a full repartition, not a narrow
  * coalesce (transforms/coalesce.py:15-66).
  */
object PhysicalOps {

  /** X1: Repartition (dynamicframe.py:481-485). */
  def repartition(df: DataFrame, n: Int): DataFrame = df.repartition(n)

  /** X2: Coalesce (dynamicframe.py:487-491): `shuffle=true` routes
    * through a shuffle so downstream parallelism can also grow.
    */
  def coalesce(df: DataFrame, n: Int, shuffle: Boolean = false): DataFrame =
    if (shuffle) df.repartition(n) else df.coalesce(n)

  /** Leaf-scan partition count WITHOUT executing anything: collect
    * the physical plan's leaves and ask each one's lazily-constructed
    * RDD. `df.rdd` would build the ADAPTIVE plan, and AQE materializes
    * every upstream shuffle stage just to answer the question — a
    * separate QueryExecution whose work the real query cannot reuse.
    * Leaves have no upstream stages, so their RDDs cost nothing to
    * build. The number is the SCAN parallelism (summed across leaves),
    * which is what both callers — read-time widening and pre-kernel
    * re-split — reason about; post-shuffle parallelism is AQE's job.
    */
  def scanPartitions(df: DataFrame): Int =
    df.queryExecution.sparkPlan.collectLeaves()
      .map(_.execute().getNumPartitions).sum

  /** X3: getNumPartitions (dynamicframe.py:477-479). Exact answer —
    * including post-shuffle — so this one does pay plan execution on
    * AQE plans with shuffles; prefer [[scanPartitions]] inside
    * operators. toRdd is the raw physical RDD (no row-conversion
    * stage appended, unlike Dataset.rdd).
    */
  def getNumPartitions(df: DataFrame): Int =
    df.queryExecution.toRdd.getNumPartitions

  /** X4: min-partitions control after read (context.py:73-84): widen
    * small scans; never shrinks. Decided from leaf-scan partitioning,
    * so asking costs no execution.
    */
  def withMinPartitions(df: DataFrame, minPartitions: Int): DataFrame =
    if (scanPartitions(df) >= minPartitions) df
    else df.repartition(minPartitions)

  /** X5: persist/unpersist with Glue's default level
    * (MEMORY_AND_DISK, context.py:632-637).
    */
  def persist(df: DataFrame,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame =
    df.persist(level)

  def unpersist(df: DataFrame): DataFrame = df.unpersist()

  /** Release every persisted RDD in the session — the consume side of
    * the caller-owned cache-release contract on LAZY operators that
    * persist internally ([[graft.ml.TextAnalysis.packingManifestFrom]],
    * [[graft.ml.TextAnalysis.buildVocab]],
    * [[graft.ml.Sketches.exactQuantilesWeighted]]: each caches its
    * input ahead of a range exchange because RangePartitioner's
    * boundary sampling re-executes the child lineage, and the cache
    * must outlive the returned frame's first materialization, so the
    * operator CANNOT release it). Pattern: materialize the result
    * (write/collect/count), then call this; a long-lived multi-query
    * JVM that skips it accumulates dead blocks (r12 advice — the
    * Verify/Bench per-query sweep, packaged for library callers).
    * Blocking so the executor memory is actually free on return.
    */
  def releaseCaches(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))

  /** Re-split the input of a CPU-dense kernel (minhash: 64 hash
    * finalizers per shingle; k-means: nlist×dim multiply-adds per
    * vector) when the scan produced fewer splits than the cluster has
    * slots. A small parquet file arrives as 1-2 partitions and the
    * kernel then runs on 1-2 cores while the rest idle — measured 6×
    * on the minhash signature pass at local[32]. At scale this is a
    * no-op: a 100 TB scan has orders of magnitude more splits than
    * slots, so the guard fails and no shuffle is added.
    */
  def ensureParallelism(df: DataFrame): DataFrame =
    withMinPartitions(df, df.sparkSession.sparkContext.defaultParallelism)
}
