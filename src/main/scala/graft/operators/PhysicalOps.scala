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

  /** X3: getNumPartitions (dynamicframe.py:477-479). */
  def getNumPartitions(df: DataFrame): Int = df.rdd.getNumPartitions

  /** X4: min-partitions control after read (context.py:73-84). */
  def withMinPartitions(df: DataFrame, minPartitions: Int): DataFrame =
    if (getNumPartitions(df) >= minPartitions) df else df.repartition(minPartitions)

  /** X5: persist/unpersist with Glue's default level
    * (MEMORY_AND_DISK, context.py:632-637).
    */
  def persist(df: DataFrame,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame =
    df.persist(level)

  def unpersist(df: DataFrame): DataFrame = df.unpersist()

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
