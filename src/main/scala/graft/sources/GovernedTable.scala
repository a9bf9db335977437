package graft.sources

import scala.collection.mutable

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Governed-table transactions (SURVEY §2.1 S13; context.py:676-683
  * `start_transaction` / `commit_transaction` / `cancel_transaction`,
  * plus the `erieTxId` / `asOfTime` read options at context.py:241).
  *
  * The reference delegates to a lake-governance service; the
  * Spark-first analogue is a manifest-based commit protocol over the
  * Hadoop FileSystem API — the public Delta/Iceberg design (Armbrust
  * et al., "Delta Lake: High-Performance ACID Table Storage over
  * Cloud Object Stores", VLDB 2020):
  *
  *   table/
  *     _txlog/v00000001.txt   committed snapshot manifests
  *     data/txn-<id>-<k>/     parquet written by one transaction
  *
  * A transaction stages parquet under uniquely-named `data/txn-*`
  * directories (never visible to readers — visibility is decided
  * only by manifests), then commit publishes `_txlog/v<N>.txt` with
  * `create(overwrite = false)`, so exactly one writer wins each
  * version number. Appends retry against the new head (append ∘
  * append commutes); overwrites detect a moved head and abort, the
  * optimistic-concurrency rule governed tables document. Cancel
  * deletes the staged directories and nothing else.
  *
  * Scale posture: a manifest lists a snapshot's data files — pure
  * metadata; no data file is ever moved or rewritten by commit,
  * cancel, or time travel, so commit cost is independent of table
  * size. O(files) manifest text per version is the same trade Delta
  * makes before checkpoint compaction; a 100 TB deployment would add
  * periodic manifest checkpoints (concatenate head, drop history) —
  * an offline metadata rewrite, not a protocol change. On stores
  * without atomic create-if-absent (S3 before conditional PUTs) the
  * version create needs a coordination service, exactly as Delta on
  * S3 ships; HDFS/ABFS/GCS and conditional-PUT S3 satisfy it natively.
  */
object GovernedTable {

  /** One transaction's driver-side state. `baseVersion` pins the
    * snapshot all reads inside the transaction see (snapshot
    * isolation); `staged` collects this transaction's parquet dirs.
    */
  final class Txn private[GovernedTable] (
      val id: String,
      val tableDir: String,
      val readOnly: Boolean,
      val baseVersion: Long) {
    private[GovernedTable] val staged = mutable.Buffer.empty[String]
    private[GovernedTable] var overwrite = false
    private[GovernedTable] var done = false
  }

  /** context.py:676-677. Pins the current committed version as the
    * transaction's read snapshot.
    */
  def startTransaction(
      spark: SparkSession, tableDir: String,
      readOnly: Boolean = false): Txn = {
    val fs = fileSystem(spark, tableDir)
    new Txn(java.util.UUID.randomUUID().toString.take(12), tableDir,
      readOnly, latestVersion(fs, tableDir))
  }

  /** Stage a write inside the transaction. `mode` is "append" or
    * "overwrite"; an overwrite anywhere makes the whole transaction
    * an overwrite (its commit publishes only this transaction's
    * files, and conflicts if the head moved since start).
    */
  def write(spark: SparkSession, txn: Txn, df: DataFrame,
      mode: String = "append"): Unit = {
    require(!txn.readOnly, s"transaction ${txn.id} is read-only")
    require(!txn.done, s"transaction ${txn.id} already ended")
    require(mode == "append" || mode == "overwrite",
      s"unknown write mode '$mode'")
    if (mode == "overwrite") { txn.overwrite = true; txn.staged.clear() }
    val dir = s"${txn.tableDir}/data/txn-${txn.id}-${txn.staged.size}"
    df.write.parquet(dir)
    txn.staged += dir
  }

  /** context.py:679-680. Publishes the transaction's staged files as
    * the next table version; returns whether the commit took effect.
    * The version-manifest create is the atomic commit point
    * (`waitForCommit` has nothing to wait for — the rename-free
    * create IS the durable publish), so both waitForCommit modes
    * return after the same call.
    */
  def commitTransaction(spark: SparkSession, txn: Txn,
      waitForCommit: Boolean = true): Boolean = {
    require(!txn.done, s"transaction ${txn.id} already ended")
    if (txn.staged.isEmpty) { txn.done = true; return true } // read-only commit
    val fs = fileSystem(spark, txn.tableDir)
    val staged = txn.staged.flatMap(listParquet(fs, _)).toSeq
    var attempts = 0
    while (attempts < 20) {
      val head = latestVersion(fs, txn.tableDir)
      if (txn.overwrite && head != txn.baseVersion)
        return false // head moved under an overwrite: abort, caller cancels
      val files =
        if (txn.overwrite) staged
        else snapshotFiles(fs, txn.tableDir, head) ++ staged
      val mode = if (txn.overwrite) "overwrite" else "append"
      if (publish(fs, txn.tableDir, head + 1, txn.id, mode, files)) {
        txn.done = true
        return true
      }
      attempts += 1 // another append won this version; re-read the head
    }
    false
  }

  /** context.py:682-683. Deletes the staged data; committed
    * transactions cannot be cancelled.
    */
  def cancelTransaction(spark: SparkSession, txn: Txn): Unit = {
    require(!txn.done, s"transaction ${txn.id} already committed")
    val fs = fileSystem(spark, txn.tableDir)
    txn.staged.foreach(d => fs.delete(new Path(d), true))
    txn.staged.clear()
    txn.done = true
  }

  /** Latest committed snapshot. */
  def read(spark: SparkSession, tableDir: String): DataFrame = {
    val fs = fileSystem(spark, tableDir)
    readVersion(spark, tableDir, latestVersion(fs, tableDir))
  }

  /** Time travel to an explicit version.
    *
    * Schema evolution contract: a snapshot's files are read with
    * parquet `mergeSchema`, so a column added by a later append is
    * PRESENT in every version whose manifest lists both old and new
    * files, with nulls for rows from pre-addition files — and absent
    * from earlier versions, which still read with their original
    * schema. An INCOMPATIBLE change (the same column re-typed) fails
    * the read with Spark's merge error instead of silently picking
    * one footer's schema, which is the failure mode of the default
    * single-footer inference. Merging reads one footer per file — a
    * distributed metadata pass, the trade Delta avoids by storing the
    * schema in the log; a manifest-header schema entry is the
    * checkpoint-era upgrade path here.
    */
  def readVersion(spark: SparkSession, tableDir: String,
      version: Long): DataFrame = {
    require(version >= 1, s"no committed version $version in $tableDir")
    val files = snapshotFiles(fileSystem(spark, tableDir), tableDir, version)
    spark.read.option("mergeSchema", "true").parquet(files: _*)
  }

  /** The `asOfTime` read (context.py:241): the newest version
    * committed at or before the timestamp. Versions retired by
    * [[vacuum]] are skipped, not errors — only RETAINED manifests
    * participate, so timestamp reads keep working after history
    * trimming (a timestamp older than all retained versions still
    * fails, which is the contract: that data is gone).
    */
  def readAsOf(spark: SparkSession, tableDir: String,
      timestampMillis: Long): DataFrame = {
    val fs = fileSystem(spark, tableDir)
    val v = (1L to latestVersion(fs, tableDir))
      .filter(ver => fs.exists(versionPath(tableDir, ver)))
      .filter(committedAt(fs, tableDir, _) <= timestampMillis)
    require(v.nonEmpty, s"no version of $tableDir committed by $timestampMillis")
    readVersion(spark, tableDir, v.max)
  }

  /** The `erieTxId` read: the transaction's pinned snapshot plus its
    * own staged writes — a transaction reads its own uncommitted
    * data, never anyone else's.
    */
  def readWithTxn(spark: SparkSession, txn: Txn): DataFrame = {
    val fs = fileSystem(spark, txn.tableDir)
    val base =
      if (txn.overwrite) Seq.empty
      else snapshotFiles(fs, txn.tableDir, txn.baseVersion)
    val files = base ++ txn.staged.flatMap(listParquet(fs, _))
    require(files.nonEmpty,
      s"transaction ${txn.id} has no visible snapshot of ${txn.tableDir}")
    // same evolution contract as [[readVersion]]: staged files may
    // add columns relative to the pinned snapshot
    spark.read.option("mergeSchema", "true").parquet(files: _*)
  }

  final case class CompactResult(
      filesBefore: Int, filesAfter: Int, version: Long)

  /** Multi-snapshot maintenance (the governed-table OPTIMIZE): rewrite
    * the CURRENT snapshot's accumulated small files into ~`targetBytes`
    * outputs and publish the result as a new OVERWRITE version through
    * the normal transaction protocol — so compaction is itself atomic,
    * concurrency-checked, and time-travel-transparent (older versions
    * still read the original files; no data file is deleted here —
    * vacuuming superseded files once no retained version references
    * them is [[Lifecycle.purgePath]]'s job).
    *
    * The output file count comes from [[graft.operators.Layout
    * .compactionPlan]] over the manifest's listing (driver-side
    * metadata, one `getFileStatus` per current file); the rewrite is
    * ONE distributed job with `coalesce` — input splits concatenate
    * into bins without a shuffle, the property that makes compaction
    * affordable at lake scale. Returns false-equivalent (unchanged
    * version) if a concurrent overwrite moved the head; callers retry.
    */
  def compact(spark: SparkSession, tableDir: String,
      targetBytes: Long = 64L << 20): CompactResult = {
    require(targetBytes > 0, "targetBytes must be positive")
    import org.apache.spark.sql.functions.col
    val fs = fileSystem(spark, tableDir)
    val head = latestVersion(fs, tableDir)
    require(head >= 1, s"no committed version in $tableDir")
    val files = snapshotFiles(fs, tableDir, head)
    if (files.isEmpty) return CompactResult(0, 0, head)
    import spark.implicits._
    // bin across the WHOLE snapshot (one logical directory): the
    // per-txn staging dirs are commit-history artifacts, not a
    // partition layout a compactor should respect
    val listing = files.map { f =>
      (tableDir, f, fs.getFileStatus(new Path(f)).getLen)
    }.toDF("dir", "file", "bytes")
    val nBins = graft.operators.Layout
      .compactionPlan(listing, "dir", "file", "bytes", targetBytes)
      .select(col("dir"), col("bin")).distinct().count().toInt.max(1)
    val txn = startTransaction(spark, tableDir)
    write(spark, txn,
      readVersion(spark, tableDir, txn.baseVersion).coalesce(nBins),
      mode = "overwrite")
    if (!commitTransaction(spark, txn)) {
      cancelTransaction(spark, txn) // head moved: leave the table as-is
      CompactResult(files.length, files.length, head)
    } else {
      val newHead = latestVersion(fs, tableDir)
      CompactResult(files.length,
        snapshotFiles(fs, tableDir, newHead).length, newHead)
    }
  }

  final case class VersionInfo(
      version: Long, committedAtMillis: Long, txnId: String,
      mode: String, numFiles: Int)

  /** The table's commit history (the governed-table DESCRIBE HISTORY):
    * one entry per RETAINED version, newest first — version number,
    * commit timestamp, committing transaction id, mode
    * (append/overwrite), and the snapshot's file count. Versions
    * retired by [[vacuum]] are absent, matching [[readAsOf]]'s
    * skip-retired rule. Pure manifest metadata: O(retained versions)
    * small file reads, no data touched — cheap enough to drive
    * monitoring dashboards against a 100 TB table.
    */
  def history(spark: SparkSession, tableDir: String): Seq[VersionInfo] = {
    val fs = fileSystem(spark, tableDir)
    (1L to latestVersion(fs, tableDir))
      .filter(v => fs.exists(versionPath(tableDir, v)))
      .map { v =>
        val lines = readManifest(fs, tableDir, v)
        def hdr(k: String): Option[String] =
          lines.collectFirst { case l if l.startsWith(k + "=") =>
            l.stripPrefix(k + "=") }
        VersionInfo(
          version = v,
          committedAtMillis = hdr("committedAt").map(_.toLong).getOrElse(0L),
          txnId = hdr("txnId").getOrElse(""),
          mode = hdr("mode").getOrElse(""),
          numFiles = lines.count(l => !HeaderKeys.exists(l.startsWith)))
      }
      .sortBy(-_.version)
  }

  final case class VacuumResult(
      versionsDropped: Long, filesDeleted: Long, filesKept: Long)

  /** Reference-aware garbage collection (the governed-table VACUUM):
    * retire history older than the last `keepVersions` snapshots and
    * delete every data file no RETAINED version references. This is
    * the correct cleanup rule for a versioned table — a purely
    * age-based purge would delete files the current snapshot still
    * reads (old files stay live forever under append-only commits)
    * and would keep superseded post-compaction files forever (they
    * can be young). Time travel remains valid for all retained
    * versions; reads of dropped versions fail, which is the contract.
    *
    * Safety order matters: the manifests of dropped versions are
    * removed FIRST, so a crash mid-vacuum leaves orphaned (unreadable,
    * unreferenced) data files for the next vacuum rather than live
    * manifests pointing at deleted data. An IN-FLIGHT transaction's
    * staged files are unreferenced until its commit — `minAgeHours`
    * must exceed the longest transaction you allow (Delta's
    * retention-window rule). The DEFAULT is Delta's 168h (7 days):
    * vacuuming with 0 deletes a concurrent in-flight transaction's
    * young staged files, so its later commit publishes a manifest
    * pointing at missing data. 0 is available only as a deliberate
    * opt-in for quiesced maintenance windows. Like the commit
    * protocol, everything here is manifest metadata + file deletes —
    * cost is O(files), independent of data bytes.
    */
  def vacuum(spark: SparkSession, tableDir: String,
      keepVersions: Int = 1, minAgeHours: Int = 168): VacuumResult = {
    require(keepVersions >= 1, "keepVersions must be >= 1")
    require(minAgeHours >= 0, "minAgeHours must be >= 0")
    val fs = fileSystem(spark, tableDir)
    val head = latestVersion(fs, tableDir)
    require(head >= 1, s"no committed version in $tableDir")
    val cutoff = math.max(1L, head - keepVersions + 1)
    val retained = (cutoff to head)
      .flatMap(snapshotFiles(fs, tableDir, _)).toSet
    var dropped = 0L
    (1L until cutoff).foreach { v =>
      if (fs.delete(versionPath(tableDir, v), false)) dropped += 1
    }
    // every parquet under data/ that no retained manifest lists (and
    // that is old enough to not be a live transaction's staging)
    val ageCutoff = System.currentTimeMillis() - minAgeHours * 3600000L
    val dataRoot = s"$tableDir/data"
    val all =
      if (fs.exists(new Path(dataRoot))) listParquet(fs, dataRoot)
      else Seq.empty[String]
    val dropCandidates = all.filterNot(retained.contains)
    val drop = dropCandidates.filter(f =>
      fs.getFileStatus(new Path(f)).getModificationTime < ageCutoff)
    drop.foreach(f => fs.delete(new Path(f), false))
    // staged-but-never-committed txn dirs and dirs emptied above
    val dataDir = new Path(tableDir, "data")
    if (fs.exists(dataDir)) fs.listStatus(dataDir).foreach { st =>
      if (st.isDirectory && !fs.listFiles(st.getPath, true).hasNext)
        fs.delete(st.getPath, true)
    }
    VacuumResult(dropped, drop.length.toLong,
      (all.length - drop.length).toLong)
  }

  // ----------------------------------------------------------------- log

  private def fileSystem(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())

  private def logDir(tableDir: String) = new Path(tableDir, "_txlog")

  private def versionPath(tableDir: String, v: Long) =
    new Path(logDir(tableDir), f"v$v%08d.txt")

  private def latestVersion(fs: FileSystem, tableDir: String): Long = {
    val dir = logDir(tableDir)
    if (!fs.exists(dir)) return 0L
    fs.listStatus(dir).iterator
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".txt") =>
        n.stripPrefix("v").stripSuffix(".txt").toLong }
      .foldLeft(0L)(math.max)
  }

  /** Manifest wire format: `key=value` header lines then one data
    * file path per line. Plain text keeps the log greppable and the
    * reader dependency-free.
    */
  private def publish(fs: FileSystem, tableDir: String, version: Long,
      txnId: String, mode: String, files: Seq[String]): Boolean = {
    val header = Seq(
      s"version=$version",
      s"committedAt=${System.currentTimeMillis()}",
      s"txnId=$txnId",
      s"mode=$mode")
    val body = (header ++ files).mkString("\n") + "\n"
    val target = versionPath(tableDir, version)
    fs.mkdirs(target.getParent)
    if (Option(target.toUri.getScheme).forall(_ == "file")) {
      // LocalFileSystem's create(overwrite=false) is check-THEN-create,
      // not atomic: two racing committers can both pass the exists
      // check and the second silently overwrites the first's manifest
      // while both report success (observed as 12 commits / 11
      // manifests in the appender-race spec). POSIX link(2) IS atomic
      // and fails with EEXIST, so local publish = write the manifest
      // to a dot-tmp sibling (invisible to latestVersion's v*.txt
      // listing), hard-link it into place, delete the tmp. Readers
      // can never observe a partial manifest — the link appears with
      // complete content or not at all.
      val t = java.nio.file.Paths.get(target.toUri.getPath)
      val tmp = t.resolveSibling(s".tmp-$txnId-$version")
      java.nio.file.Files.write(tmp, body.getBytes("UTF-8"))
      try { java.nio.file.Files.createLink(t, tmp); true }
      catch { case _: java.nio.file.FileAlreadyExistsException => false }
      finally java.nio.file.Files.deleteIfExists(tmp)
    } else try {
      // HDFS-like stores: create(overwrite=false) is the namenode's
      // atomic exclusive create — the durable commit point. (S3 would
      // need an external coordinator; out of scope here, as in OSS
      // Delta.)
      val out = fs.create(target, false)
      try out.write(body.getBytes("UTF-8")) finally out.close()
      true
    } catch { case _: java.io.IOException => false }
  }

  private def readManifest(fs: FileSystem, tableDir: String,
      version: Long): Seq[String] = {
    val p = versionPath(tableDir, version)
    require(fs.exists(p), s"no committed version $version in $tableDir")
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
    finally in.close()
  }

  private val HeaderKeys = Seq("version=", "committedAt=", "txnId=", "mode=")

  private def snapshotFiles(fs: FileSystem, tableDir: String,
      version: Long): Seq[String] =
    if (version == 0L) Seq.empty // the empty pre-creation snapshot
    else readManifest(fs, tableDir, version)
      .filterNot(l => HeaderKeys.exists(l.startsWith)) // paths may contain '='

  private def committedAt(fs: FileSystem, tableDir: String,
      version: Long): Long =
    readManifest(fs, tableDir, version)
      .collectFirst { case l if l.startsWith("committedAt=") =>
        l.stripPrefix("committedAt=").toLong }
      .getOrElse(0L)

  private def listParquet(fs: FileSystem, dir: String): Seq[String] = {
    val out = mutable.Buffer.empty[String]
    val it = fs.listFiles(new Path(dir), true)
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && st.getPath.getName.endsWith(".parquet"))
        out += st.getPath.toString
    }
    out.toSeq
  }
}
