package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Bucketed (pre-shuffled) catalog tables: the co-located join path.
  *
  * A fact-table join at 100 TB is dominated by the two exchanges that
  * hash both sides to the join key. When the same join recurs (every
  * incremental load joins the same fact to the same dimensions — the
  * reference pipeline re-joins its staging tables on every run,
  * pipeline.py:885-886), the exchange can be paid ONCE at write time:
  * `bucketBy(n, key)` persists the hash-partitioned layout in the
  * catalog, and every later equi-join on the bucket key reads both
  * sides already co-partitioned — Catalyst plans the join with ZERO
  * Exchange operators (asserted in BucketingSpec). This is Spark's
  * storage-level answer to the warehouse's distribution keys
  * (DISTKEY in the reference's Redshift DDL, redshift_ddl.sql).
  *
  * Scale posture: bucket count is a physical knob decoupled from
  * cluster size — pick ~2-4× total executor cores at the target
  * scale so one bucket fits an executor's memory for the sorted
  * merge. Rows are pre-shuffled by the writer (one `repartition` on
  * the bucket key), so each task writes exactly one file per bucket
  * it owns instead of numBuckets small files per task — the
  * small-file explosion that otherwise caps bucketed layouts at
  * lake scale.
  */
object Bucketing {

  /** Write `df` as a bucketed catalog table. `sortCols` additionally
    * sorts within each bucket file, letting a later sort-merge join
    * skip its per-partition sort when files align one-per-bucket.
    */
  /** `location`: store the table's files there (an EXTERNAL table)
    * instead of under the session warehouse — callers that must not
    * mutate shared directories (a parallel bench, a read-only
    * warehouse) point this at their own temp dir.
    */
  def writeBucketed(
      df: DataFrame, table: String,
      bucketCols: Seq[String], numBuckets: Int,
      sortCols: Seq[String] = Nil,
      mode: String = "overwrite",
      location: Option[String] = None): Unit = {
    require(bucketCols.nonEmpty, "bucketCols must be non-empty")
    require(numBuckets > 0, s"numBuckets must be positive (got $numBuckets)")
    // pre-shuffle on the bucket key: one file per bucket per owning
    // task, not numBuckets files per input task
    val prepared = df.repartition(numBuckets, bucketCols.map(col): _*)
    val writer = prepared.write
      .mode(mode)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    val placed = location.fold(writer)(p => writer.option("path", p))
    (if (sortCols.nonEmpty) placed.sortBy(sortCols.head, sortCols.tail: _*)
     else placed).saveAsTable(table)
  }

  /** Equi-join two tables on their shared bucket key. When both were
    * written with [[writeBucketed]] on `keys` with equal bucket
    * counts, the plan contains no Exchange — the join runs on the
    * stored layout.
    */
  def bucketedJoin(
      spark: SparkSession, leftTable: String, rightTable: String,
      keys: Seq[String], joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), keys, joinType)
}
