package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Storage lifecycle ops (SURVEY §2.1 S12; context.py:461-545
  * `purge_s3_path` / `purge_table`): delete data files older than a
  * retention period, optionally writing the reference's
  * Success.csv / Failed.csv manifests, and — for catalog tables —
  * drop partitions the purge emptied.
  *
  * Spark-first shape: the reference's backend is an S3 batch job;
  * here the same contract runs on the Hadoop FileSystem API, so one
  * implementation serves s3a:// on a real cluster and file:/ in
  * tests. Listing streams on the driver (a metadata scan — S3 LIST /
  * namenode ops, no data moves); the DELETES are distributed over the
  * cluster as a Dataset of paths, because removing millions of
  * objects one RPC at a time from the driver is the actual bottleneck
  * at lake scale. Only (path, ok) strings shuffle.
  *
  * `transition_*` (context.py:461-545 `transition_s3_path` /
  * `transition_table`): true S3 storage-class flips do not exist in
  * the FileSystem abstraction, so the portable analogue here MOVES
  * cold files into a `.tier=<class>/` directory under the same root,
  * preserving the relative layout. The dot prefix means tiered files
  * vanish from default Spark/Hive scans of the root (the analogue of
  * GLACIER objects needing restore before read) while staying fully
  * readable by pointing a reader at the tier root — and the same
  * retention/manifest machinery as purge applies. Moves are
  * distributed like the purge deletes: same-FS rename is a metadata
  * op; a cross-FS fallback copies then deletes.
  */
object Lifecycle {

  final case class PurgeResult(deleted: Long, failed: Long, retained: Long)

  /** Delete files under `path` older than `retentionHours` (default
    * 168 = 7 days, the reference's default). Directories are left in
    * place ([[purgeTable]] handles partition dropping, where emptiness
    * has catalog meaning).
    */
  def purgePath(
      spark: SparkSession, path: String,
      retentionHours: Int = 168,
      manifestFilePath: Option[String] = None): PurgeResult = {
    val (ok, bad, retained) = purgeOnce(spark, path, retentionHours)
    manifestFilePath.foreach(writeManifest(spark, _, ok, bad))
    PurgeResult(ok.length.toLong, bad.length.toLong, retained)
  }

  /** Purge a catalog table's files; partitions whose every file was
    * purged are dropped from the catalog, as the reference documents.
    * `partitionPredicate` (SQL over the partition columns) restricts
    * which partitions are considered — evaluated against the
    * catalog's partition list, never the data.
    */
  def purgeTable(
      spark: SparkSession, table: String,
      retentionHours: Int = 168,
      partitionPredicate: String = "",
      manifestFilePath: Option[String] = None): PurgeResult = {
    val cat = spark.sessionState.catalog
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    val meta = cat.getTableMetadata(ident)
    val partCols = meta.partitionColumnNames
    if (partCols.isEmpty)
      return purgePath(spark, meta.location.toString,
        retentionHours, manifestFilePath)

    val selected = selectPartitions(spark, ident, partCols, partitionPredicate)

    val hadoopConf = spark.sessionState.newHadoopConf()
    var allOk = Seq.empty[String]; var allBad = Seq.empty[String]
    var retained = 0L
    selected.foreach { p =>
      val loc = p.location.toString
      val (ok, bad, ret) = purgeOnce(spark, loc, retentionHours)
      allOk ++= ok; allBad ++= bad; retained += ret
      val fs = new Path(loc).getFileSystem(hadoopConf)
      val empty = !fs.exists(new Path(loc)) ||
        !fs.listFiles(new Path(loc), true).hasNext
      if (empty) {
        val spec = partCols.map(c => s"$c='${p.spec(c)}'").mkString(", ")
        spark.sql(s"ALTER TABLE $table DROP IF EXISTS PARTITION ($spec)")
      }
    }
    manifestFilePath.foreach(writeManifest(spark, _, allOk, allBad))
    PurgeResult(allOk.length.toLong, allBad.length.toLong, retained)
  }

  /** Partition selection via the catalog: `partitionPredicate` (SQL
    * over the partition columns) is evaluated on a LOCAL frame of
    * partition values (strings, as the metastore stores them) — the
    * filter reads catalog metadata, never table data.
    */
  private def selectPartitions(
      spark: SparkSession,
      ident: org.apache.spark.sql.catalyst.TableIdentifier,
      partCols: Seq[String],
      partitionPredicate: String)
      : Seq[org.apache.spark.sql.catalyst.catalog.CatalogTablePartition] = {
    import org.apache.spark.sql.functions.{col, expr}
    val parts = spark.sessionState.catalog.listPartitions(ident)
    if (partitionPredicate.trim.isEmpty) parts
    else {
      val rows = parts.map(p =>
        org.apache.spark.sql.Row.fromSeq(partCols.map(p.spec(_))))
      val schema = org.apache.spark.sql.types.StructType(partCols.map(c =>
        org.apache.spark.sql.types.StructField(c,
          org.apache.spark.sql.types.StringType)))
      val keySet = spark
        .createDataFrame(new java.util.ArrayList(
          scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
          schema)
        .filter(expr(partitionPredicate))
        .select(partCols.map(col): _*)
        .collect()
        .map(_.toSeq.map(String.valueOf)).toSet
      parts.filter(p => keySet.contains(partCols.map(p.spec(_))))
    }
  }

  final case class TransitionResult(
      transitioned: Long, failed: Long, retained: Long)

  /** Move files under `path` older than `retentionHours` into the
    * tier directory (default `.tier=<storageClass>` under `path`),
    * preserving relative layout. Already-tiered files (anything under
    * the tier root) are never re-listed. Returns counts; optional
    * Success.csv / Failed.csv manifests list the MOVED source paths,
    * the same contract as [[purgePath]].
    */
  def transitionPath(
      spark: SparkSession, path: String,
      storageClass: String = "cold",
      retentionHours: Int = 168,
      tierRoot: Option[String] = None,
      manifestFilePath: Option[String] = None): TransitionResult = {
    val (ok, bad, retained) = transitionOnce(
      spark, path, storageClass, retentionHours, tierRoot)
    manifestFilePath.foreach(writeManifest(spark, _, ok, bad))
    TransitionResult(ok.length.toLong, bad.length.toLong, retained)
  }

  /** One path's transition pass: driver-side metadata listing,
    * distributed moves. Returns (movedSrcPaths, failedSrcPaths,
    * retainedCount) — the [[purgeOnce]] shape, so both public entry
    * points write manifests of THIS run's source paths.
    */
  private def transitionOnce(
      spark: SparkSession, path: String,
      storageClass: String, retentionHours: Int,
      tierRoot: Option[String]): (Seq[String], Seq[String], Long) = {
    require(retentionHours >= 0, "retentionHours must be >= 0")
    val hadoopConf = spark.sessionState.newHadoopConf()
    val root = new Path(path)
    val fs = root.getFileSystem(hadoopConf)
    if (!fs.exists(root)) return (Nil, Nil, 0L)
    val qRoot = fs.makeQualified(root).toString.stripSuffix("/") + "/"
    val qTier = fs.makeQualified(new Path(
      tierRoot.getOrElse(s"${qRoot.stripSuffix("/")}/.tier=$storageClass")))
      .toString.stripSuffix("/") + "/"
    val cutoff = System.currentTimeMillis() - retentionHours * 3600000L

    // driver-side metadata listing, like purge: (src, dest) pairs
    // only. EVERY tier directory is excluded, not just this call's —
    // transitioning to "glacier" after an earlier "cold" pass must
    // not re-tier (and thereby nest and hide) the cold files.
    val moves = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    // Listed paths whose qualified spelling does not share the
    // computed qRoot prefix (viewfs mount resolution, symlink
    // canonicalization) cannot be relativized — stripPrefix would
    // silently keep the full URI and the move target would become a
    // malformed nested path. Fail them visibly instead of moving to a
    // wrong destination.
    val unrelatable = scala.collection.mutable.ArrayBuffer.empty[String]
    var retained = 0L
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile) {
        val p = st.getPath.toString
        if (!p.startsWith(qRoot) && !p.startsWith(qTier)) unrelatable += p
        else {
          val rel = p.stripPrefix(qRoot)
          val tiered = p.startsWith(qTier) ||
            rel.startsWith(".tier=") || rel.contains("/.tier=")
          if (!tiered) {
            if (st.getModificationTime < cutoff)
              moves += ((p, qTier + rel))
            else retained += 1
          }
        }
      }
    }
    if (moves.isEmpty) return (Nil, unrelatable.toSeq, retained)

    // distributed move: rename (metadata-only on one FS), copy+delete
    // across filesystems; each task resolves the FS once
    val confB = spark.sparkContext.broadcast(
      new SerializableHadoopConf(hadoopConf))
    import spark.implicits._
    val outcomes = spark.createDataset(moves.toSeq)
      .mapPartitions { pairs =>
        var taskFs: org.apache.hadoop.fs.FileSystem = null
        pairs.map { case (srcS, dstS) =>
          val src = new Path(srcS); val dst = new Path(dstS)
          if (taskFs == null) taskFs = src.getFileSystem(confB.value.value)
          val ok = try {
            taskFs.mkdirs(dst.getParent)
            taskFs.rename(src, dst) || {
              val dstFs = dst.getFileSystem(confB.value.value)
              org.apache.hadoop.fs.FileUtil.copy(
                taskFs, src, dstFs, dst, true, true, confB.value.value)
            }
          } catch { case scala.util.control.NonFatal(_) => false }
          (srcS, ok)
        }
      }
      .collect() // bounded by the move list the driver already holds

    val (okPairs, badPairs) = outcomes.partition(_._2)
    (okPairs.map(_._1).toSeq,
      badPairs.map(_._1).toSeq ++ unrelatable.toSeq, retained)
  }

  /** Transition a catalog table's cold files (context.py:461-501
    * `transition_table`). Unpartitioned tables tier under the table
    * location; partitioned tables tier each selected partition's files
    * under ONE table-level tier root, mirroring the partition-relative
    * layout, so the tiered view of the whole table is readable from
    * `<location>/.tier=<class>` with the original partition dirs.
    * `partitionPredicate` restricts the considered partitions via the
    * catalog, as in [[purgeTable]].
    */
  def transitionTable(
      spark: SparkSession, table: String,
      storageClass: String = "cold",
      retentionHours: Int = 168,
      partitionPredicate: String = "",
      manifestFilePath: Option[String] = None): TransitionResult = {
    val cat = spark.sessionState.catalog
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    val meta = cat.getTableMetadata(ident)
    val hc = spark.sessionState.newHadoopConf()
    // normalize URI spellings before any prefix comparison — catalog
    // table and partition locations can qualify differently
    // ("file:/x" vs "file:///x")
    def qualify(u: String): String = {
      val p = new Path(u)
      p.getFileSystem(hc).makeQualified(p).toString.stripSuffix("/")
    }
    val loc = qualify(meta.location.toString)
    if (meta.partitionColumnNames.isEmpty)
      return transitionPath(spark, loc, storageClass, retentionHours,
        manifestFilePath = manifestFilePath)

    val tierRoot = s"$loc/.tier=$storageClass"
    var allOk = Seq.empty[String]; var allBad = Seq.empty[String]
    var retained = 0L
    selectPartitions(spark, ident, meta.partitionColumnNames,
        partitionPredicate).foreach { p =>
      val pLoc = qualify(p.location.toString)
      // a partition relocated OUTSIDE the table location (ALTER ...
      // SET LOCATION) cannot mirror under the table tier root — its
      // "relative" path would be a full URI; tier it under its own
      // location instead, the same place a per-path transition of
      // that partition would use
      val target =
        if (!pLoc.startsWith(loc + "/") && pLoc != loc) None
        else {
          val rel = pLoc.stripPrefix(loc).stripPrefix("/")
          Some(if (rel.isEmpty) tierRoot else s"$tierRoot/$rel")
        }
      val (ok, bad, ret) = transitionOnce(spark, pLoc, storageClass,
        retentionHours, target)
      allOk ++= ok; allBad ++= bad; retained += ret
    }
    // one table-level manifest, listing THIS run's moved source paths
    // — the same contract as purgeTable
    manifestFilePath.foreach(writeManifest(spark, _, allOk, allBad))
    TransitionResult(allOk.length.toLong, allBad.length.toLong, retained)
  }

  /** One path's purge pass: driver-side streaming list, distributed
    * deletes. Returns (deletedPaths, failedPaths, retainedCount).
    */
  private def purgeOnce(
      spark: SparkSession, path: String,
      retentionHours: Int): (Seq[String], Seq[String], Long) = {
    require(retentionHours >= 0, "retentionHours must be >= 0")
    val hadoopConf = spark.sessionState.newHadoopConf()
    val root = new Path(path)
    val fs = root.getFileSystem(hadoopConf)
    if (!fs.exists(root)) return (Nil, Nil, 0L)
    val cutoff = System.currentTimeMillis() - retentionHours * 3600000L

    val candidates = scala.collection.mutable.ArrayBuffer.empty[String]
    var retained = 0L
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile) {
        if (st.getModificationTime < cutoff)
          candidates += st.getPath.toString
        else retained += 1
      }
    }
    if (candidates.isEmpty) return (Nil, Nil, retained)

    // distributed delete: each task opens the FS once per partition
    // and deletes its slice; the broadcast carries the Hadoop conf so
    // executors resolve the same filesystem the driver listed
    val confB = spark.sparkContext.broadcast(
      new SerializableHadoopConf(hadoopConf))
    import spark.implicits._
    val outcomes = spark.createDataset(candidates.toSeq)
      .mapPartitions { paths =>
        var taskFs: org.apache.hadoop.fs.FileSystem = null
        paths.map { s =>
          val p = new Path(s)
          if (taskFs == null) taskFs = p.getFileSystem(confB.value.value)
          val ok = try taskFs.delete(p, false)
          catch { case scala.util.control.NonFatal(_) => false }
          (s, ok)
        }
      }
      .collect() // bounded by the candidate list the driver already holds

    val (okPairs, badPairs) = outcomes.partition(_._2)
    (okPairs.map(_._1).toSeq, badPairs.map(_._1).toSeq, retained)
  }

  /** Hadoop Configuration is not Serializable; ship it via its own
    * Writable encoding (the standard wrapper pattern).
    */
  private final class SerializableHadoopConf(
      @transient var value: org.apache.hadoop.conf.Configuration)
    extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject(); value.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      value = new org.apache.hadoop.conf.Configuration(false)
      value.readFields(in)
    }
  }

  // reference manifest contract: Success.csv / Failed.csv under the
  // manifest path (context.py:474-476)
  private def writeManifest(
      spark: SparkSession, dir: String,
      ok: Seq[String], bad: Seq[String]): Unit = {
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    def write(name: String, lines: Seq[String]): Unit = {
      val out = fs.create(new Path(dir, name), true)
      try out.write((lines.mkString("\n") + "\n").getBytes("UTF-8"))
      finally out.close()
    }
    write("Success.csv", ok)
    write("Failed.csv", bad)
  }
}
