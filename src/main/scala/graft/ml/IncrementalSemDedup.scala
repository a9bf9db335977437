package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental SemDeDup: semantic (embedding) near-dup dedup that
  * ingests a growing corpus BATCH BY BATCH instead of recomputing the
  * whole corpus per call (r14 verdict #1 — [[Similarity.semDedup]]
  * re-codes and re-verifies EVERYTHING on every call; a production
  * corpus grows by increments, and at 100 TB a full recompute per
  * increment was the last non-scalable default in the dedup family).
  * The embedding twin of the MinHash band store
  * ([[graft.streaming.StreamDedup.loadBandStore]] /
  * `nearDedupBatch`), with one crucial upgrade: this store keeps
  * enough state for the result to EQUAL the full recompute.
  *
  * == Store layout (a managed directory, like the ANN indexes) ==
  *
  *  - `$path/_manifest` — the [[Similarity.writeIndexManifest]]
  *    format: the COMMITTED band family (dim, bands, planes_per_band,
  *    seed), the threshold, the id column, and an `ingested_rows`
  *    counter. The family commits at [[initStore]] — exactly like a
  *    persisted LSH index commits its plane count — because
  *    auto-resizing per batch would code different batches under
  *    different families and equality with any one full run would be
  *    meaningless. Re-size = rebuild (re-init + re-ingest).
  *  - `$path/rows` — (id, u, codes): the L2-normalized vector and the
  *    per-band LSH codes of every ingested row, appended per batch.
  *    Candidate generation reads (id, codes) only — parquet column
  *    pruning keeps the per-batch store scan to ~8·bands bytes per
  *    ingested row; `u` is read only by the broadcast verify.
  *  - `$path/pairs` — (id_a, id_b): every VERIFIED near-dup pair seen
  *    so far. The pair graph is tiny relative to the corpus (only
  *    true near-dups), and it is exactly the state transitivity
  *    needs.
  *
  * == Why the result equals full recompute ==
  *
  * A pair of the union collides in some band iff both rows share that
  * band's code — a pure function of the committed family — so
  * decomposing the union's candidate set by ARRIVAL ORDER loses
  * nothing: batch-internal pairs come from the batch self-join,
  * batch-vs-earlier pairs from the batch-vs-store join, and
  * earlier-vs-earlier pairs are already in `pairs`. Verification is
  * the same normalized dot at the same threshold. The survivor rule
  * (each connected component keeps its min id; unpaired rows survive)
  * runs over the ACCUMULATED pair graph, so [[survivors]] after N
  * ingests is row-identical to [[Similarity.semDedup]] over the
  * union at the same (bands, planesPerBand, seed) — oracle-gated
  * (q215) and spec-pinned.
  *
  * == Emission semantics — the transitivity contract ==
  *
  * [[ingest]] returns the batch rows that survive the closure SO FAR.
  * That answer is PROVISIONAL: a later batch can bridge two
  * components (or bring a smaller id into one), demoting an
  * already-emitted survivor — transitivity across batches means no
  * per-batch emission can be final, even under ascending-id
  * ingestion (ids 1, 2 distinct today; id 3 near both tomorrow ⇒ the
  * merged component keeps only 1). The authoritative set at any point
  * is [[survivors]]; treat per-batch emissions as "new data worth
  * keeping today", the way the survivor-band MinHash policy does
  * (whose store, by contrast, FORGETS dropped docs' bands — its
  * batch-vs-full divergence is stated in q110's contract; this store
  * remembers everything precisely so the final answer converges).
  *
  * == Scale posture (100 TB) ==
  *
  * Per ingest: one banding kernel pass over the BATCH only (the CPU
  * that dominates full recomputes — the store's codes never
  * recompute); one skinny (id, band, code) join of the batch against
  * the store's pruned code scan (the store side streams; the batch
  * side broadcasts under `broadcastVectorLimit`); a verify in which
  * the batch's vectors broadcast and the STORE contributes only the
  * vectors its matched candidate ids semi-select — never a
  * corpus-sized broadcast or a per-candidate vector shuffle (pass a
  * `checkpointDir` on a real cluster); connected components over the
  * PAIR GRAPH only (16-byte edges, not the corpus); and a batch-sized
  * anti-join. The terms that grow with the corpus are pruned store
  * scans (codes for candidates, vectors for the semi-join, ids for
  * the optional replay guard) — read-only IO proportional to n, the
  * same posture as the MinHash band store, with no corpus-sized
  * exchange anywhere.
  *
  * Reference for the pattern: the reference's job-bookmark
  * incremental contract (`/root/reference/awsglue/context.py`
  * transformation_ctx plumbing) — process only what arrived, keep
  * state external, never reprocess the lake.
  */
object IncrementalSemDedup {

  /** Commit an (empty) incremental-semdedup store: the band family,
    * threshold, and id column are decided HERE and validated on every
    * later ingest. `bands = 0` sizes the family with
    * [[Similarity.bandsForRecall]] at the threshold (capped at
    * `maxBands`, the [[Similarity.MaxAutoBands]] default, with the
    * same logged recall floor as the batch default); `minCosine >=
    * 1.0` needs only one band (colinear vectors code identically
    * everywhere). Returns the committed band count.
    */
  def initStore(
      spark: SparkSession, path: String,
      dim: Int, minCosine: Double,
      planesPerBand: Int = 4, bands: Int = 0,
      targetRecall: Double = 0.95,
      maxBands: Int = Similarity.MaxAutoBands,
      seed: Long = 42L, idCol: String = "id"): Int = {
    require(dim >= 1, s"dim must be >= 1 (got $dim)")
    require(planesPerBand >= 1,
      s"planesPerBand must be >= 1 (got $planesPerBand)")
    require(bands >= 0, s"bands must be >= 0 (0 = recall-sized; got $bands)")
    require(bands > 0 || minCosine > -1.0,
      s"minCosine = $minCosine admits every pair — no LSH screen " +
        "helps; use nearDupPairsExact batch-side, or pass bands " +
        "explicitly and knowingly")
    val existing = Similarity.readIndexMeta(spark, path)
    require(existing.isEmpty,
      s"a store already exists at $path (kind = " +
        s"${existing.getOrElse("kind", "?")}) — re-init means a NEW " +
        "band family; point at a fresh directory or delete the old one")
    val b =
      if (bands > 0) bands
      else if (minCosine >= 1.0) 1
      else Similarity.autoBands(minCosine, planesPerBand, targetRecall,
        maxBands)
    Similarity.writeIndexManifest(spark, path, Seq(
      "kind" -> "semdedup", "dim" -> dim.toString,
      "bands" -> b.toString, "planes_per_band" -> planesPerBand.toString,
      "seed" -> seed.toString, "min_cosine" -> minCosine.toString,
      "id_col" -> idCol, "ingested_rows" -> "0"))
    b
  }

  /** Ingest one batch AND return the batch rows surviving the closure
    * so far (see the emission contract above) — [[ingestOnly]] plus a
    * connected-components pass over the accumulated pair graph. The
    * emission is what a streaming consumer wants per micro-batch; a
    * BULK loader replaying history should call [[ingestOnly]] per
    * batch and [[survivors]] once at the end instead — the closure is
    * the one per-ingest cost that is pure overhead when nobody reads
    * the emission (measured: the q215 shape spends roughly half its
    * wall in per-batch closures).
    */
  def ingest(
      spark: SparkSession, path: String,
      batch: DataFrame, idCol: String, vecCol: String,
      broadcastVectorLimit: Long = 2000000L,
      maxIter: Int = 20,
      checkpointDir: Option[String] = None,
      checkIdCollision: Boolean = true,
      skipExistingIds: Boolean = false): DataFrame = {
    ingestOnly(spark, path, batch, idCol, vecCol, broadcastVectorLimit,
      checkpointDir, checkIdCollision, skipExistingIds)
    val idType = Similarity.readIndexMeta(spark, path)("id_type")
    batch.join(
      currentLosers(spark, path, idType, maxIter, checkpointDir)
        .withColumnRenamed("id", idCol),
      Seq(idCol), "left_anti")
  }

  /** Ingest one batch without computing an emission: code it under
    * the committed family, find its pairs against the store and
    * within itself, append (rows, pairs), republish the manifest.
    * Returns the ingested row count. Batch ids must be globally
    * unique — duplicates within the batch, or collisions with
    * already-ingested ids, fail fast (`checkIdCollision = false`
    * skips the store-id scan for callers whose id space guarantees
    * it, e.g. a monotone ingestion-time key). `skipExistingIds = true`
    * replaces the collision FAILURE with a FILTER: already-ingested
    * ids drop from the batch and only genuinely new rows ingest —
    * the replay semantics an at-least-once delivery (foreachBatch
    * restart, a retried loader) needs, where throwing would
    * poison-pill the pipeline on its own recovery. A fully-replayed
    * batch is then a no-op ingest (counters +0, nothing appended).
    */
  def ingestOnly(
      spark: SparkSession, path: String,
      batch: DataFrame, idCol: String, vecCol: String,
      broadcastVectorLimit: Long = 2000000L,
      checkpointDir: Option[String] = None,
      checkIdCollision: Boolean = true,
      skipExistingIds: Boolean = false): Long = {
    val meta = Similarity.readIndexMeta(spark, path)
    require(meta.get("kind").contains("semdedup"),
      s"no semdedup store at $path — create one with initStore")
    require(meta("id_col") == idCol,
      s"store at $path was committed over id column " +
        s"'${meta("id_col")}' — ingest called with '$idCol'")
    val dim = meta("dim").toInt
    val b = meta("bands").toInt
    val r = meta("planes_per_band").toInt
    val seed = meta("seed").toLong
    val minCosine = meta("min_cosine").toDouble
    val priorN = meta("ingested_rows").toLong
    // the id TYPE commits with the first batch: a later batch with a
    // different type would append a divergent parquet schema into
    // rows/ and break the min-id survivor ordering
    val idType = batch.schema(idCol).dataType.simpleString
    meta.get("id_type").foreach { t =>
      require(t == idType,
        s"store at $path holds ${t} ids — batch brings $idType")
    }
    val all = Similarity.hyperplanes(dim, b * r, seed)
    // replay tolerance: under skipExistingIds the already-ingested ids
    // FILTER out here (one skinny store-id scan — the same scan the
    // fail-fast guard pays) and everything below sees new rows only
    val src =
      if (skipExistingIds && priorN > 0)
        batch.join(spark.read.parquet(s"$path/rows")
          .select(col("id").as(idCol)), Seq(idCol), "left_anti")
      else batch
    // one kernel pass codes every band; u is the SAME normalize the
    // batch verify uses, so scores are bit-equal with full recompute.
    // The normalize is guarded: a NULL / wrong-dim / zero-norm /
    // non-finite vector nulls out instead of throwing a raw ANSI
    // divide-by-zero from inside the first action, and the fail-fast
    // below then NAMES the offending ids — a malformed row must never
    // enter the store (it could not verify against anything, so it
    // would pollute `rows/` as a permanent false survivor).
    val nrm = Similarity.norm(col(vecCol))
    val coded = src.select(col(idCol).as("id"),
        when(col(vecCol).isNotNull && size(col(vecCol)) === dim &&
            nrm > 0.0 && !isnan(nrm) &&
            nrm < lit(Double.PositiveInfinity),
          Similarity.normalize(col(vecCol))).as("u"),
        graft.functions.LshBandCodes
          .lshBandCodes(col(vecCol), all, r).as("codes"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // every exit below (including the fail-fast guards) must release
    // the cache — the returned plan never references `coded`
    try {
    val batchN = coded.count()
    val badIds = coded.filter(col("u").isNull).select(col("id"))
      .limit(5).collect().map(_.get(0))
    require(badIds.isEmpty,
      s"batch rows cannot be cosine-normalized (NULL, wrong-dim, " +
        s"zero-norm, or non-finite $vecCol): ids " +
        s"${badIds.mkString(", ")} — filter or fix them before ingest")
    val dupIds = coded.groupBy(col("id")).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > 1).select(col("id")).limit(5)
      .collect().map(_.get(0))
    require(dupIds.isEmpty,
      s"duplicate ids within the batch: ${dupIds.mkString(", ")} — " +
        "the min-id survivor rule needs unique ids")
    val hasStore = priorN > 0
    lazy val storeRows = spark.read.parquet(s"$path/rows")
    if (checkIdCollision && !skipExistingIds && hasStore) {
      val clash = storeRows.select(col("id"))
        .join(coded.select(col("id")), Seq("id"), "left_semi")
        .limit(5).collect().map(_.get(0))
      require(clash.isEmpty,
        s"batch ids already ingested: ${clash.mkString(", ")} — " +
          "replaying a batch would double-count it; dedupe upstream " +
          "(or pass checkIdCollision = false only when the id space " +
          "guarantees uniqueness)")
    }
    def skinny(df: DataFrame): DataFrame =
      df.select(col("id"),
        posexplode(col("codes")).as(Seq("__band", "__code")))
    val newSkinny = skinny(coded)
    // the batch's vectors broadcast (bounded by batchN); the STORE's
    // vectors must never broadcast whole — per-increment cost would
    // then carry a corpus-sized broadcast build every ingest (the
    // first cut did exactly that: ~110 MB per ingest at 200k rows) —
    // so cross-batch verification fetches ONLY the store vectors that
    // actually matched a candidate, via a semi-join the candidate ids
    // drive. The store pays one column scan, never a corpus exchange.
    val uNewB =
      if (batchN <= broadcastVectorLimit)
        broadcast(coded.select(col("id"), col("u")))
      else coded.select(col("id"), col("u"))
    val vWithin = newSkinny.as("a").join(newSkinny.as("x"),
        col("a.__band") === col("x.__band") &&
          col("a.__code") === col("x.__code") &&
          col("a.id") < col("x.id"))
      .select(col("a.id").as("id_a"), col("x.id").as("id_b"))
      .distinct()
      .join(uNewB.select(col("id").as("id_a"), col("u").as("ua")),
        Seq("id_a"))
      .join(uNewB.select(col("id").as("id_b"), col("u").as("ub")),
        Seq("id_b"))
      .filter(Similarity.dot(col("ua"), col("ub")) >= minCosine)
      .select(col("id_a"), col("id_b"))
    val cross = if (!hasStore) None else {
      val nsk = if (batchN <= broadcastVectorLimit)
        broadcast(newSkinny) else newSkinny
      // skinny store-code scan (column-pruned) vs broadcast batch
      // codes; orientation (store id, batch id) is KEPT so each side's
      // vectors resolve from their own table — persisted because the
      // matched-id semi-join and the verify both read it
      Some(skinny(storeRows.select(col("id"), col("codes")))
        .as("o").join(nsk.as("n"),
          col("o.__band") === col("n.__band") &&
            col("o.__code") === col("n.__code"))
        .select(col("o.id").as("id_s"), col("n.id").as("id_n"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    }
    val verified = cross match {
      case None => vWithin
      case Some(cb) =>
        // only MATCHED store vectors leave the scan (near-dup hits are
        // sparse by assumption; AQE broadcasts this side when small)
        val uOld = storeRows.select(col("id"), col("u"))
          .join(cb.select(col("id_s").as("id")).distinct(),
            Seq("id"), "left_semi")
        val vCross = cb
          .join(uOld.select(col("id").as("id_s"), col("u").as("ua")),
            Seq("id_s"))
          .join(uNewB.select(col("id").as("id_n"), col("u").as("ub")),
            Seq("id_n"))
          .filter(Similarity.dot(col("ua"), col("ub")) >= minCosine)
          .select(least(col("id_s"), col("id_n")).as("id_a"),
            greatest(col("id_s"), col("id_n")).as("id_b"))
        vWithin.unionByName(vCross)
    }
    // materialize the new pairs BEFORE any append: their plan reads
    // rows/ (the store join), and appending to rows/ would recache
    // the path under a lazy reader (the StreamDedup.dedupBatch lesson)
    val newPairs = checkpointDir match {
      case Some(dir) =>
        spark.sparkContext.setCheckpointDir(dir)
        verified.checkpoint(true)
      case None => verified.localCheckpoint(true)
    }
    cross.foreach(_.unpersist())
    newPairs.write.mode("append").parquet(s"$path/pairs")
    coded.write.mode("append").parquet(s"$path/rows")
    Similarity.writeIndexManifest(spark, path,
      ((meta - "ingested_rows" - "id_type") +
        ("ingested_rows" -> (priorN + batchN).toString) +
        ("id_type" -> idType)).toSeq.sortBy(_._1))
    batchN
    } finally { coded.unpersist(); () }
  }

  /** The authoritative survivor ids over EVERYTHING ingested so far —
    * row-identical to full-recompute [[Similarity.semDedup]] over the
    * union at the committed family (the q215 oracle). One column,
    * named as the committed id column.
    */
  def survivors(
      spark: SparkSession, path: String,
      maxIter: Int = 20,
      checkpointDir: Option[String] = None): DataFrame = {
    val meta = Similarity.readIndexMeta(spark, path)
    require(meta.get("kind").contains("semdedup"),
      s"no semdedup store at $path — create one with initStore")
    require(meta("ingested_rows").toLong > 0,
      s"nothing ingested at $path yet")
    val idCol = meta("id_col")
    spark.read.parquet(s"$path/rows").select(col("id"))
      .join(currentLosers(spark, path, meta("id_type"), maxIter,
        checkpointDir), Seq("id"), "left_anti")
      .select(col("id").as(idCol))
  }

  final case class CompactResult(
      rowsFilesBefore: Int, rowsFilesAfter: Int,
      pairsFilesBefore: Int, pairsFilesAfter: Int)

  /** Compact the store's data directories: every ingest appends one
    * file set to `rows/` and `pairs/`, so a long-lived store grows in
    * FILES faster than in rows — the same small-files tax
    * [[graft.streaming.StreamDedup.compactStore]] answers for the
    * MinHash fingerprint store. Both directories rewrite into
    * size-targeted files under `_staged_*` and publish through the
    * retire-first multi-dir swap ([[Similarity.swapIndexDirs]] — every
    * crash window is a loud missing-dir failure with `_old_*`
    * rename-back recovery), then the manifest republishes so
    * [[Similarity.vacuumIndex]] keeps treating the live files as
    * committed. Content is already duplicate-free by construction
    * (a pair verifies exactly once, in the ingest of its later-
    * arriving side), so compaction is a pure rewrite — survivors are
    * unchanged (spec-pinned). Run between ingests, not concurrently
    * with one.
    */
  def compact(
      spark: SparkSession, path: String,
      targetBytes: Long = 64L << 20): CompactResult = {
    require(targetBytes > 0, "targetBytes must be positive")
    val meta = Similarity.readIndexMeta(spark, path)
    require(meta.get("kind").contains("semdedup"),
      s"no semdedup store at $path — create one with initStore")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def dataFiles(sub: String): Seq[org.apache.hadoop.fs.FileStatus] = {
      val p = new org.apache.hadoop.fs.Path(s"$path/$sub")
      if (!fs.exists(p)) Seq.empty
      else fs.listStatus(p).toSeq.filter { st =>
        val nm = st.getPath.getName
        st.isFile && !nm.startsWith("_") && !nm.startsWith(".")
      }
    }
    def rewrite(sub: String): (Int, Int) = {
      val before = dataFiles(sub)
      if (before.isEmpty) return (0, 0)
      val nOut = math.max(1L,
        (before.map(_.getLen).sum + targetBytes - 1) / targetBytes).toInt
      spark.read.parquet(s"$path/$sub").repartition(nOut)
        .write.mode("overwrite").parquet(s"$path/_staged_$sub")
      (before.length, nOut)
    }
    val (rb, _) = rewrite("rows")
    val (pb, _) = rewrite("pairs")
    val staged = Seq("rows" -> rb, "pairs" -> pb)
      .collect { case (s, b) if b > 0 => s }
    if (staged.nonEmpty) {
      Similarity.swapIndexDirs(spark, path, staged)
      Similarity.writeIndexManifest(spark, path, meta.toSeq.sortBy(_._1))
    }
    CompactResult(rb, dataFiles("rows").length, pb,
      dataFiles("pairs").length)
  }

  /** Ids demoted by the accumulated pair graph: every component
    * member except its min. Empty when no pair has ever verified.
    */
  private def currentLosers(
      spark: SparkSession, path: String, idType: String,
      maxIter: Int, checkpointDir: Option[String]): DataFrame =
    Graph.connectedComponents(loadPairs(spark, path, idType),
        "id_a", "id_b", maxIter, checkpointDir)
      .filter(col("id") =!= col("component"))
      .select(col("id"))

  /** The accumulated pair table — empty-safe: a store whose batches
    * verified no pair yet holds a `pairs/` directory with only
    * bookkeeping files (an empty append writes no parts), which
    * parquet cannot infer a schema from, so the empty frame builds
    * from the committed id type instead (the
    * [[graft.streaming.StreamDedup.loadBandStore]] discipline).
    */
  private def loadPairs(
      spark: SparkSession, path: String, idType: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(s"$path/pairs")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val hasData = fs.exists(p) && {
      val it = fs.listFiles(p, false)
      var found = false
      while (!found && it.hasNext) {
        val n = it.next().getPath.getName
        found = !n.startsWith("_") && !n.startsWith(".")
      }
      found
    }
    if (hasData) spark.read.parquet(s"$path/pairs")
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType
        .fromDDL(s"id_a $idType, id_b $idType"))
  }
}
