package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ml.TextAnalysis

/** Continuous-ingestion exact dedup: the streaming twin of
  * [[graft.ml.Dedup.incrementalExact]]. Every micro-batch is
  * fingerprint-anti-joined against the accumulated store, deduped
  * WITHIN the batch (first occurrence by smallest id), survivors
  * handed to `emit` and their fingerprints appended to the store —
  * so a document seen in any earlier batch (or earlier in this one)
  * never emits twice.
  *
  * The store is a parquet directory of 16-byte MD5 fingerprints, NOT
  * document text — at 100 TB of corpus the store is GBs, and the
  * anti-join ships batch fingerprints only. A batch replayed after a
  * failure re-appends fingerprints it already wrote; the store is a
  * SET under anti-join semantics, so duplicate fingerprint rows cost
  * bytes, never correctness (compact the store offline when it
  * matters). Emission is at-least-once on replay, the same contract
  * as any non-transactional foreachBatch sink.
  */
object StreamDedup {

  /** Fingerprint-store schema: one column `fp` (hex MD5 string). */
  def loadStore(spark: SparkSession, storePath: String): DataFrame = {
    val path = new org.apache.hadoop.fs.Path(storePath)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    // a [[compactStore]] interrupted between its two swap renames
    // leaves the store at `.compact-old`; restore rather than silently
    // treating the store as empty (which would re-emit every
    // previously-seen document)
    val old = new org.apache.hadoop.fs.Path(
      storePath.stripSuffix("/") + ".compact-old")
    if (!fs.exists(path) && fs.exists(old) && !fs.rename(old, path))
      // fail loudly, mirroring compactStore's recovery: falling
      // through to the empty-store branch here would silently re-emit
      // every previously-seen document — the exact failure this
      // recovery exists to prevent
      sys.error(s"stream-dedup store recovery failed: cannot rename " +
        s"$old back to $path")
    if (fs.exists(path)) spark.read.parquet(storePath)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(
          "fp", org.apache.spark.sql.types.StringType))))
  }

  /** One micro-batch through the dedup policy; exposed separately so
    * tests (and batch backfills) can drive it without a stream.
    * Returns the surviving rows.
    */
  def dedupBatch(
      batch: Dataset[Row], textCol: String, idCol: String,
      storePath: String): DataFrame = {
    val spark = batch.sparkSession
    val withFp = batch
      .withColumn("__fp", TextAnalysis.fingerprint(col(textCol)))
    // against the store, then within-batch first-occurrence
    val fresh = withFp
      .join(loadStore(spark, storePath).withColumnRenamed("fp", "__fp"),
        Seq("__fp"), "left_anti")
    val winners = fresh.groupBy(col("__fp"))
      .agg(min(col(idCol)).as(idCol))
    // Eagerly materialize and SEVER the lineage before appending: the
    // survivors' plan reads storePath (the anti-join), and a parquet
    // append to that same path makes Spark recache-by-path every
    // cached reader — a lazily-persisted plan would re-execute against
    // the post-append store and dedup its own output away.
    val out = fresh.join(winners, Seq("__fp", idCol), "left_semi")
      .localCheckpoint()
    out.select(col("__fp").as("fp")).distinct()
      .write.mode("append").parquet(storePath)
    out.drop("__fp")
  }

  final case class CompactResult(
      filesBefore: Int, filesAfter: Int, distinctFps: Long)

  /** Offline store maintenance: rewrite the fingerprint store as
    * DISTINCT fingerprints in size-targeted files. The streaming path
    * appends one file per micro-batch and tolerates duplicate rows
    * (the store is a set under anti-join semantics), so a long-lived
    * ingestion grows the store in BATCHES, not in distinct documents
    * — and a 16-byte-row store with millions of tiny files pays its
    * cost in open()s, not bytes. Compaction restores O(distinct) size
    * and a bounded file count: one distinct shuffle, files binned to
    * `targetBytes` (the [[graft.operators.Layout.compactionPlan]]
    * sizing discipline applied to the store's single directory), then
    * an atomic-as-two-renames swap. Run while the stream is stopped —
    * a reader racing the swap can observe a missing directory; the
    * pre-swap store is kept at `<store>.compact-old` until the swap
    * completes, so a crash mid-swap loses nothing.
    */
  def compactStore(
      spark: SparkSession, storePath: String,
      targetBytes: Long = 64L << 20): CompactResult = {
    require(targetBytes > 0, "targetBytes must be positive")
    val path = new org.apache.hadoop.fs.Path(storePath)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    val tmp = new org.apache.hadoop.fs.Path(
      storePath.stripSuffix("/") + ".compact-tmp")
    val old = new org.apache.hadoop.fs.Path(
      storePath.stripSuffix("/") + ".compact-old")
    // crash-window recovery: a JVM death between the two swap renames
    // leaves the store missing but the pre-swap copy at `.compact-old`
    // — restore it before anything else (and before any reader could
    // mistake the missing dir for an empty store)
    if (!fs.exists(path) && fs.exists(old)) {
      if (!fs.rename(old, path))
        sys.error(s"compactStore: crash recovery rename failed for $old")
    }
    if (!fs.exists(path)) return CompactResult(0, 0, 0L)
    def dataFiles() = fs.listStatus(path).toSeq.filter { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith("_") && !n.startsWith(".")
    }
    val before = dataFiles()
    // a store dir holding only _SUCCESS markers (empty first batch)
    // has nothing to compact — and parquet can't infer its schema
    if (before.isEmpty) return CompactResult(0, 0, 0L)
    val nOut = math.max(1L,
      (before.map(_.getLen).sum + targetBytes - 1) / targetBytes).toInt
    fs.delete(tmp, true); fs.delete(old, true)
    spark.read.parquet(storePath).distinct()
      .repartition(nOut)
      .write.mode("overwrite").parquet(tmp.toString)
    if (!fs.rename(path, old) || !fs.rename(tmp, path))
      sys.error(s"compactStore: swap failed for $storePath " +
        s"(pre-compaction store preserved at $old)")
    fs.delete(old, true)
    val after = spark.read.parquet(storePath)
    CompactResult(before.length, dataFiles().length, after.count())
  }

  /** Band-key store for the NEAR-dup policy: one column `band`
    * (xxhash64 LSH band key, 8 bytes/row). Same crash-window recovery
    * as [[loadStore]] — [[compactStore]] is schema-agnostic (distinct
    * + rewrite), so the same maintenance applies to this store.
    */
  def loadBandStore(spark: SparkSession, storePath: String): DataFrame = {
    val path = new org.apache.hadoop.fs.Path(storePath)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    val old = new org.apache.hadoop.fs.Path(
      storePath.stripSuffix("/") + ".compact-old")
    if (!fs.exists(path) && fs.exists(old) && !fs.rename(old, path))
      sys.error(s"band-store recovery failed: cannot rename $old to $path")
    val hasData = fs.exists(path) && {
      val it = fs.listFiles(path, false)
      var found = false
      while (!found && it.hasNext) {
        val n = it.next().getPath.getName
        found = !n.startsWith("_") && !n.startsWith(".")
      }
      found
    }
    if (hasData) spark.read.parquet(storePath)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(
          "band", org.apache.spark.sql.types.LongType))))
  }

  /** One micro-batch through the NEAR-dup policy — the streaming twin
    * of [[graft.ml.Dedup.incrementalMinhash]] composed with the
    * within-batch min-id band policy of [[graft.ml.Dedup.minhashDedup]]:
    * a batch document drops when any of its LSH band keys collides
    * with the accumulated store (a re-crawl differing only by a
    * boilerplate tail, which defeats the exact fingerprint policy) or
    * when a surviving smaller-id batch doc shares a band; survivors'
    * band keys append to the store.
    *
    * One signature pass per batch: the (id, band) table is computed
    * once and persisted — the store anti-join, the within-batch
    * bucket-min resolution, and the store append all read it. Text
    * never joins; every shuffle moves 8-byte band keys or ids. The
    * survivor set is eagerly materialized (localCheckpoint) BEFORE
    * the store append so no surviving plan re-reads the just-appended
    * store (the [[dedupBatch]] recache lesson).
    */
  def nearDedupBatch(
      batch: Dataset[Row], textCol: String, idCol: String,
      storePath: String, numHashes: Int = 64, bands: Int = 16,
      shingleSize: Int = 3): DataFrame = {
    val spark = batch.sparkSession
    val store = loadBandStore(spark, storePath)
    val bt = graft.ml.Dedup.minhashBandTable(
      batch.toDF(), textCol, idCol, numHashes, bands, shingleSize)
      .persist()
    // against the store: ANY band collision drops the document
    val hit = bt.join(store, Seq("band"), "left_semi")
      .select(col(idCol)).distinct()
    val keptBands = bt.join(hit, Seq(idCol), "left_anti")
    // within-batch: deterministic min-id-per-bucket winner (the
    // minhashDedup policy over the store-surviving docs only)
    val bucketMin = keptBands.groupBy(col("band"))
      .agg(min(col(idCol)).as("__bucket_min"))
    val docMin = keptBands.join(bucketMin, "band")
      .groupBy(col(idCol))
      .agg(min(col("__bucket_min")).as("__doc_min"))
      .filter(col("__doc_min") === col(idCol))
      .select(col(idCol))
    val out = batch.join(docMin, Seq(idCol), "left_semi")
      .localCheckpoint()
    // survivors' bands from the SAME band table — reads only cached /
    // checkpointed inputs, never the store being appended
    bt.join(out.select(col(idCol)), Seq(idCol), "left_semi")
      .select(col("band")).distinct()
      .write.mode("append").parquet(storePath)
    bt.unpersist()
    out.toDF()
  }

  /** Wire [[nearDedupBatch]] into a streaming query — near-dup
    * survivors to `emit`, band keys accumulating at `storePath`. Same
    * at-least-once emission contract as [[dedupStream]].
    */
  def nearDedupStream(
      stream: DataFrame, textCol: String, idCol: String,
      storePath: String, checkpointLocation: String,
      numHashes: Int = 64, bands: Int = 16, shingleSize: Int = 3)(
      emit: (DataFrame, Long) => Unit): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val out = nearDedupBatch(batch, textCol, idCol, storePath,
          numHashes, bands, shingleSize)
        try emit(out, batchId)
        finally { out.unpersist(); () }
      }
      .start()

  /** Wire [[graft.ml.IncrementalSemDedup.ingest]] into a streaming
    * query — the SEMANTIC (embedding) twin of [[nearDedupStream]]:
    * each micro-batch codes under the store's committed band family,
    * pairs against everything ingested so far, and `emit` receives
    * the batch rows surviving the closure SO FAR. Create the store
    * with [[graft.ml.IncrementalSemDedup.initStore]] BEFORE starting
    * the stream (the band family is a committed layout, not a
    * per-batch decision). Emission is at-least-once on replay like
    * every non-transactional foreachBatch sink, and PROVISIONAL under
    * transitivity (a later batch can demote an emitted survivor — see
    * the IncrementalSemDedup emission contract); the authoritative
    * set at any point is `IncrementalSemDedup.survivors`, which
    * equals full-recompute `semDedup` over everything ingested.
    */
  def semDedupStream(
      stream: DataFrame, idCol: String, vecCol: String,
      storePath: String, checkpointLocation: String,
      broadcastVectorLimit: Long = 2000000L,
      maxIter: Int = 20,
      storeCheckpointDir: Option[String] = None,
      autoCompactMinFiles: Int = 0)(
      emit: (DataFrame, Long) => Unit): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val out = graft.ml.IncrementalSemDedup.ingest(
          batch.sparkSession, storePath, batch.toDF(), idCol, vecCol,
          broadcastVectorLimit, maxIter, storeCheckpointDir,
          // a RESTARTED stream replays its last micro-batch — the
          // fail-fast collision guard would poison-pill the recovery,
          // so replayed ids FILTER instead: already-ingested rows
          // skip, the emission recomputes over the whole delivered
          // batch (at-least-once, like every twin in this file)
          skipExistingIds = true,
          // a long-lived stream appends one file set per micro-batch;
          // a positive threshold lets the store compact itself between
          // ingests instead of waiting for an operator (r15 finding)
          autoCompactMinFiles = autoCompactMinFiles)
        emit(out, batchId)
      }
      .start()

  /** Wire [[dedupBatch]] into a streaming query: survivors of each
    * batch go to `emit`, fingerprints accumulate at `storePath`.
    */
  def dedupStream(
      stream: DataFrame, textCol: String, idCol: String,
      storePath: String, checkpointLocation: String)(
      emit: (DataFrame, Long) => Unit): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val out = dedupBatch(batch, textCol, idCol, storePath)
        try emit(out, batchId)
        finally { out.unpersist(); () }
      }
      .start()

  /** Built-in-path twin of [[dedupStream]] for time-local duplicates:
    * fingerprint the text, then `dropDuplicatesWithinWatermark` — the
    * dedup state lives in Spark's checkpointed state store and is
    * EVICTED once older than the watermark `delay`, so state stays
    * bounded by (arrival rate × delay) instead of corpus lifetime.
    *
    * The two policies answer different questions. This one: "have I
    * seen this text RECENTLY" — right for retry storms, double-sends,
    * at-least-once replays, where duplicates cluster in time and
    * exactly-once state management (per-batch transactional, replay-
    * safe) matters more than history depth. [[dedupStream]]: "have I
    * seen this text EVER" — the external fingerprint store never
    * evicts, the contract corpus dedup needs. At 100 TB of stream
    * history the state-store path is the only bounded one; pair it
    * with a periodic batch [[graft.ml.Dedup.exact]] pass for the
    * long-range duplicates the watermark let through.
    *
    * Returns the transformed STREAMING frame — attach any sink
    * (append mode; the watermark requires event-time column `tsCol`).
    */
  def dedupStreamWithinWatermark(
      stream: DataFrame, textCol: String, tsCol: String,
      delay: String): DataFrame =
    stream
      .withColumn("__fp", TextAnalysis.fingerprint(col(textCol)))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")
}
