package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.{NearestCentroid, PqAdc, PqEncode, ResidualVec}

/** Product-quantization ANN (Jégou/Douze/Schmid TPAMI 2011 — the
  * IVF-PQ layout FAISS made the de-facto standard for billion-scale
  * search). Complements the engine's existing ANN family:
  *
  *   - [[Similarity.bruteForceTopK]]  — exact, one full scan
  *   - [[Similarity.lshTopK]]/multi-probe — bucket-pruned, exact rerank
  *   - [[Similarity.ivfTopK]]         — cluster-pruned, exact rerank
  *   - [[Similarity.quantizedTopK]]   — int8 scalar codes, full scan
  *   - here: `m`-byte PQ codes + ADC  — the MEMORY answer: a 64-dim
  *     float vector is 256 B; its PQ code is `m` small ints. At 100 TB
  *     of raw vectors the code table is ~1-2 % of that, so the scan
  *     side of ANN fits in cluster memory where raw vectors never
  *     could, and IVF-PQ composes the cluster pruning on top.
  *
  * Everything is cosine semantics: both sides L2-normalize first
  * ([[Similarity.normalize]]), so inner product == cosine and the ADC
  * decomposition for a residual-encoded vector is exact in
  * expectation: `dot(q, v̂) = dot(q, coarse_c) + Σ_j dot(q_j, cb_j)` —
  * a per-cluster scalar plus `m` GLOBAL table lookups (inner-product
  * ADC needs no per-cluster tables, unlike L2).
  *
  * Scale shape: codebook training shuffles only (dim, code) pairs
  * (the [[Similarity.ivfCentroids]] two-level-mean discipline); encode
  * and ADC scoring are map-only scan projections (codegen'd kernels,
  * codebooks ride the task binary — m·ksub·dsub doubles, e.g.
  * 8×256×8 = 128 KiB); top-k is TakeOrderedAndProject (per-partition
  * heaps, k rows per partition to the driver). Nothing here collects
  * data rows: driver-side state is the codebooks, the query vector,
  * and the m×ksub lookup table.
  *
  * Determinism contract (the oracle surface): anchors-by-id init
  * (`initByIdOrder = true`) + `iters = 0` makes the whole derivation —
  * normalize, anchor slicing, per-subspace argmin with first-minimum
  * tie-break, table build, j-ordered ADC sum — replayable in ANSI SQL
  * with bit-identical doubles (q204 replays it end-to-end). Production
  * init draws anchors by seeded hash order like the IVF build.
  */
object ProductQuantization {

  private lazy val log =
    org.slf4j.LoggerFactory.getLogger("graft.ml.ProductQuantization")

  /** Train per-subspace codebooks by k-means over subvectors.
    *
    * Init: the `ksub` rows first in seeded-hash order (or id order
    * under `initByIdOrder` — the SQL-replayable variant), their
    * subvectors sliced per subspace. Each Lloyd iteration is ONE
    * assignment projection (the [[graft.functions.PqEncode]] kernel —
    * all `m` argmins in one pass) plus ONE elementwise-mean
    * aggregation shuffling (dim, code) pairs, never whole vectors
    * twice; an empty cell keeps its centroid (the
    * [[Similarity.ivfCentroids]] rule). Driver state: m·ksub·dsub
    * doubles.
    *
    * The train projection is persisted for the duration of the build
    * (read `iters + 1` times) and released before returning — the
    * returned value is driver-side data, so no cache outlives the
    * call.
    *
    * @return `books(j)(c)` = centroid `c` of subspace `j` (dsub
    *         doubles); `books.length == m`,
    *         `books(j).length == min(ksub, train rows)`.
    */
  def pqCodebooks(
      train: DataFrame, idCol: String, vecCol: String,
      m: Int, ksub: Int, iters: Int = 2, seed: Long = 42L,
      initByIdOrder: Boolean = false,
      trainSampleCap: Long = -1L): Array[Array[Array[Double]]] = {
    require(m > 0, "m (subspace count) must be positive")
    require(ksub > 0, "ksub (centroids per subspace) must be positive")
    // the anchor draw collects min(ksub, n) rows driver-side: bounded
    // metadata at production ksub (≤ 256), but the exactness oracles
    // pass ksub ≥ n, which is an ORACLE-ONLY cost — surface a caller
    // doing that on a big corpus (r13 advice; the maxCollectQueries
    // discipline, soft because the oracle configs are legitimate)
    if (ksub > 65536)
      log.warn(s"pqCodebooks: ksub = $ksub collects up to that many " +
        "anchor vectors driver-side — exactness-oracle territory; " +
        "production codebooks want ksub <= 256")
    val src = train
      .select(col(idCol).as("__id"),
        transform(col(vecCol), x => x.cast("double")).as("__v"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val ordered =
      if (initByIdOrder) src.orderBy(col("__id"))
      else src.orderBy(xxhash64(col("__id"), lit(seed)), col("__id"))
    val anchors: Array[Array[Double]] = ordered.limit(ksub)
      .select(col("__v")).collect()
      .map(_.getSeq[Double](0).toArray)
    require(anchors.nonEmpty, "pqCodebooks: empty training set")
    val dim = anchors(0).length
    require(dim % m == 0,
      s"vector dim $dim not divisible by m = $m subspaces")
    val dsub = dim / m
    // Lloyd refinement trains on a bounded deterministic sample (the
    // FAISS discipline — centroids need ~tens of points each, not the
    // corpus): anchors always draw from the FULL ordered input, so
    // the iters = 0 oracle configurations are sample-independent.
    val lloydSrc =
      if (iters > 0)
        sampleForTraining(src, "__id",
          resolveCap(trainSampleCap, anchors.length.toLong), seed)
      else src
    var books: Array[Array[Array[Double]]] =
      Array.tabulate(m) { j =>
        anchors.map(a => a.slice(j * dsub, (j + 1) * dsub))
      }
    var it = 0
    while (it < iters) {
      // elementwise means per (subspace cell): explode dims once, the
      // code for dim d is the d/dsub-th entry of the row's code array
      val means = lloydSrc
        .select(PqEncode.pqEncode(col("__v"), books).as("__code"),
          col("__v"))
        .where(col("__code").isNotNull) // malformed rows never vote
        .select(col("__code"),
          posexplode(col("__v")).as(Seq("__d", "__x")))
        .withColumn("__c",
          element_at(col("__code"),
            (col("__d") / lit(dsub)).cast("int") + 1))
        .groupBy(col("__d"), col("__c"))
        .agg(avg(col("__x")).as("__mean"))
        .collect() // ≤ dim·ksub rows — bounded metadata
      val next = books.map(_.map(_.clone()))
      means.foreach { r =>
        val d = r.getInt(0); val c = r.getInt(1)
        next(d / dsub)(c)(d % dsub) = r.getDouble(2)
      }
      books = next
      it += 1
    }
    src.unpersist()
    books
  }

  /** Training-sample cap resolution: -1 = auto (max(16384, 256·k) —
    * centroids need hundreds of training points, not the corpus; the
    * 64·k draw measured a real recall cost at sf10 — IVF-PQ np8
    * 0.890 → 0.830 — while 256·k matched full-data training within
    * noise), 0 = off (train on everything), > 0 = explicit row cap.
    */
  private def resolveCap(cap: Long, k: Long): Long =
    if (cap == -1L) math.max(16384L, 256L * k) else cap

  /** Deterministic hash-mod sample of ~`cap` rows for k-means
    * refinement — identity when the cap is off or the input already
    * fits. At 100 TB this is what makes index BUILDS linear-ish:
    * Lloyd cost drops from O(n·k·dim·iters) to O(cap·k·dim·iters)
    * and only the single final assignment pass touches every row.
    * xxhash64 keyed off the id keeps the draw reproducible across
    * runs and engines (the edgeSampleKeep discipline), salted so it
    * is independent of the anchor-order hash.
    */
  private def sampleForTraining(
      df: DataFrame, idCol: String, cap: Long, seed: Long): DataFrame = {
    if (cap <= 0) return df
    val n = df.count()
    if (n <= cap) return df
    val denom = 1L << 20
    val keep = math.max(1L, denom * cap / n)
    df.where(pmod(xxhash64(col(idCol), lit(seed ^ 0x5a17edL)),
      lit(denom)) < lit(keep))
  }

  /** The query's ADC lookup table: `table(j)(c) = dot(q_j, books(j)(c))`
    * summed in element order (m·ksub·dsub driver-side multiplies).
    */
  def adcTable(
      q: Array[Double],
      books: Array[Array[Array[Double]]]): Array[Array[Double]] = {
    val m = books.length
    require(m > 0 && books(0).nonEmpty, "adcTable: empty codebooks")
    val dsub = books(0)(0).length
    require(q.length == m * dsub,
      s"query dim ${q.length} != m·dsub = ${m * dsub}")
    Array.tabulate(m) { j =>
      books(j).map { cen =>
        var s = 0.0
        var dd = 0
        while (dd < dsub) { s += q(j * dsub + dd) * cen(dd); dd += 1 }
        s
      }
    }
  }

  /** Flat-PQ top-k: train codebooks on the normalized corpus, encode
    * (map-only), ADC-score against the one driver-side query vector
    * (map-only), TakeOrdered top-k. `score` is the approximate cosine
    * (exact when every subvector is its own centroid — the ksub ≥ n
    * anchors-by-id configuration the specs pin against brute force).
    *
    * `rerankK > 0` switches to FAISS-style refine: ADC selects the
    * top `rerankK` candidates, the final k rerank by EXACT cosine on
    * the raw vectors — the same expression as
    * [[Similarity.bruteForceTopK]], so reranked scores replay on any
    * engine. Single-query API like the LSH probes (the query row is
    * bounded driver metadata by contract).
    */
  def pqTopK(
      embeddings: DataFrame, idCol: String, vecCol: String,
      query: DataFrame, queryVecCol: String,
      m: Int, ksub: Int, k: Int = 10, iters: Int = 2,
      seed: Long = 42L, initByIdOrder: Boolean = false,
      rerankK: Int = 0): DataFrame = {
    val corpus = embeddings.select(col(idCol), col(vecCol),
      Similarity.normalize(col(vecCol)).as("__nvec"))
    val books =
      pqCodebooks(corpus, idCol, "__nvec", m, ksub, iters, seed,
        initByIdOrder)
    val qn = queryVector(query, queryVecCol)
    val table = adcTable(qn, books)
    val scored = corpus.withColumn("score",
      PqAdc.pqAdc(PqEncode.pqEncode(col("__nvec"), books), table))
    finish(scored, idCol, vecCol, query, queryVecCol, k, rerankK)
  }

  /** IVF-PQ top-k: coarse k-means clusters prune the scan to `nprobe`
    * of `nlist` partitions ([[Similarity.ivfTopK]]'s pruning), PQ
    * codes of the COARSE RESIDUALS score the survivors by ADC (Jégou
    * §IV.B — residual spread is a fraction of the vector's, so the
    * same ksub buys more precision). On normalized vectors the
    * residual decomposition is two terms: a per-cluster scalar
    * `dot(q, coarse_c)` (a `nlist`-entry literal lookup) plus the
    * global ADC sum — no per-cluster tables.
    *
    * `nlist = 0` opts into [[Similarity.autoNlist]] sizing. Probe
    * selection is driver-side (the query is one vector): the `nprobe`
    * clusters nearest by squared L2, ascending, index tie-break —
    * the same order [[Similarity.ivfTopK]]'s probe assignment
    * produces. The cluster filter is an `IN` on the partition column,
    * so against the persisted layout it prunes directories.
    */
  def ivfPqTopK(
      embeddings: DataFrame, idCol: String, vecCol: String,
      query: DataFrame, queryVecCol: String,
      nlist: Int, nprobe: Int, m: Int, ksub: Int, k: Int = 10,
      coarseIters: Int = 3, pqIters: Int = 2, seed: Long = 42L,
      initByIdOrder: Boolean = false, rerankK: Int = 0,
      trainSampleCap: Long = -1L): DataFrame = {
    require(nprobe > 0, s"nprobe must be positive (got $nprobe) — an " +
      "empty probe set would silently return zero rows")
    val corpus = embeddings.select(col(idCol), col(vecCol),
        Similarity.normalize(col(vecCol)).as("__nvec"))
      .persist(StorageLevel.MEMORY_AND_DISK) // coarse + PQ + scan reads
    val sizedNlist =
      if (nlist == 0) Similarity.autoNlist(corpus.count()) else nlist
    val coarse: Array[Array[Double]] =
      Similarity.ivfCentroids(
        sampleForTraining(corpus, idCol,
          resolveCap(trainSampleCap, sizedNlist.toLong), seed),
        idCol, "__nvec", sizedNlist, coarseIters, seed)
        .map(_.toArray).toArray
    val assigned = corpus
      .withColumn("__cluster",
        NearestCentroid.nearestCentroid(col("__nvec"),
          coarse.map(_.toSeq).toSeq))
      .withColumn("__resid",
        ResidualVec.residualVec(col("__nvec"), col("__cluster"), coarse))
    val books = pqCodebooks(assigned.where(col("__resid").isNotNull),
      idCol, "__resid", m, ksub, pqIters, seed, initByIdOrder,
      trainSampleCap)
    val qn = queryVector(query, queryVecCol)
    val probes = probeOrder(qn, coarse).take(math.min(nprobe, sizedNlist))
    val table = adcTable(qn, books)
    val coarseDots: Seq[Double] = coarse.toSeq.map(c => dotArr(qn, c))
    val scored = assigned
      .where(col("__cluster").isin(probes.map(Int.box): _*))
      .withColumn("score",
        PqAdc.pqAdc(PqEncode.pqEncode(col("__resid"), books), table)
          + element_at(typedlit(coarseDots), col("__cluster") + 1))
    val out = finish(scored, idCol, vecCol, query, queryVecCol, k, rerankK)
    // the returned frame no longer references the persisted projection
    // after TakeOrdered materializes; release eagerly via checkpointed
    // result so no cache outlives the call
    val materialized = out.localCheckpoint(true)
    corpus.unpersist()
    materialized
  }

  /** Batched k-NN majority-vote eval over PQ codes — the scale answer
    * to [[Similarity.knnClassify]]'s by-contract linear scan (q169's
    * flagged row). Two independent levers, because measurement showed
    * which one matters:
    *
    *   - **Pair-volume pruning** (the one that matters): with
    *     `nlist != -1` the corpus coarse-clusters once and each query
    *     joins only its `nprobe` nearest cells — the (row, query)
    *     pair stream entering the top-k heap shrinks by
    *     ~nprobe/nlist. A flat ADC scan (`nlist = -1`) still pays the
    *     full n·Q pair generation, which dominates the eval (measured:
    *     flat ADC was SLOWER than brute at sf1 — cheap scoring does
    *     not pay for an extra encode pass when pair volume is the
    *     bottleneck).
    *   - **O(m) scoring**: per-query ADC tables precompute driver-side
    *     and one scan of the code table scores every surviving pair
    *     via [[graft.functions.PqAdcMulti]] lookups.
    *
    * Codes are NON-residual here (global codebooks over the
    * normalized vectors; FAISS's `by_residual = false`) so one table
    * per query is valid across every cell — the eval's throughput
    * shape. Candidates rerank by EXACT cosine when `rerankK > 0`
    * (the same expression as the brute eval), then vote with
    * [[Similarity.knnClassify]]'s exact tie-breaks (score desc,
    * corpus id asc; votes desc, label asc).
    *
    * Exactness configuration (the q207 oracle): `nlist = -1` or
    * `nprobe = nlist`, `ksub ≥ n` anchors by id, `iters = 0`,
    * `rerankK ≥ k` — provably equal to [[Similarity.knnClassify]].
    *
    * The query side COLLECTS (id, label, vector) — an eval set is
    * bounded by contract (the q169 pinning discipline), and
    * `maxCollectQueries` makes the contract explicit (it bounds the
    * per-executor table bytes, Q·m·ksub doubles).
    */
  def knnClassifyPq(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, labelCol: String,
      k: Int = 5, m: Int = 8, ksub: Int = 64, iters: Int = 2,
      seed: Long = 42L, initByIdOrder: Boolean = false,
      trainSampleCap: Long = -1L, rerankK: Int = 0,
      nlist: Int = -1, nprobe: Int = 8,
      coarseIters: Int = 2,
      maxCollectQueries: Int = 10000): DataFrame = {
    val spark = corpus.sparkSession
    val enc0 = corpus.select(col(idCol).as("__cid"),
        col(labelCol).as("__clabel"), col(vecCol).as("__cv"),
        Similarity.normalize(col(vecCol)).as("__nvec"))
      .persist(StorageLevel.MEMORY_AND_DISK) // train + encode reads
    val sizedNlist =
      if (nlist == 0) Similarity.autoNlist(enc0.count())
      else nlist // -1 = flat (no coarse stage)
    val coarse: Array[Array[Double]] =
      if (sizedNlist <= 0) Array.empty
      else Similarity.ivfCentroids(
        sampleForTraining(enc0, "__cid",
          resolveCap(trainSampleCap, sizedNlist.toLong), seed),
        "__cid", "__nvec", sizedNlist, coarseIters, seed)
        .map(_.toArray).toArray
    val books =
      pqCodebooks(enc0, "__cid", "__nvec", m, ksub, iters, seed,
        initByIdOrder, trainSampleCap)
    val qRows = queries
      .select(col(idCol), col(labelCol),
        Similarity.normalize(col(vecCol)))
      .limit(maxCollectQueries + 1).collect()
    require(qRows.length <= maxCollectQueries,
      s"eval set exceeds maxCollectQueries = $maxCollectQueries — " +
        "the batched ADC eval precomputes one m×ksub table per query " +
        "driver-side; shard the eval set or raise the guard knowingly")
    // fail fast on malformed QUERY vectors, naming the offender — the
    // corpus side's NULL-stays-NULL hygiene has no query analogue (a
    // null/odd-dim query would otherwise surface as an opaque
    // driver-side NPE inside adcTable; r13 advice)
    val qDim = books.length * books(0)(0).length
    qRows.foreach { r =>
      require(!r.isNullAt(2),
        s"knnClassifyPq: query id ${r.get(0)} has a NULL/malformed " +
          s"$vecCol — filter the eval set or fix the vector")
      val d = r.getSeq[Double](2).length
      require(d == qDim,
        s"knnClassifyPq: query id ${r.get(0)} vector dim $d != the " +
          s"corpus layout m·dsub = $qDim")
    }
    val tables: Array[Array[Array[Double]]] =
      qRows.map(r => adcTable(r.getSeq[Double](2).toArray, books))
    // the broadcast query-index frame must enumerate qRows in TABLE
    // order — built from the collected rows with the input's own
    // id/label types; under coarse pruning it carries each query's
    // probe cells, and the (qidx, cell) explode joins the corpus on
    // the cluster id, shrinking the pair stream by ~nprobe/nlist
    val baseFields = Seq(
      org.apache.spark.sql.types.StructField("__qidx",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      queries.schema(idCol).copy(name = "__qid"),
      queries.schema(labelCol).copy(name = "__qlabel"))
    val qSchema = org.apache.spark.sql.types.StructType(
      if (coarse.isEmpty) baseFields
      else baseFields :+ org.apache.spark.sql.types.StructField(
        "__probes", org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.IntegerType, containsNull = false),
        nullable = false))
    val qMeta = spark.createDataFrame(
      java.util.Arrays.asList(qRows.zipWithIndex.map { case (r, i) =>
        val base = Seq[Any](i, r.get(0), r.get(1))
        org.apache.spark.sql.Row.fromSeq(
          if (coarse.isEmpty) base
          else base :+ probeOrder(r.getSeq[Double](2).toArray, coarse)
            .take(math.min(nprobe, coarse.length)))
      }: _*), qSchema)
    // malformed corpus vectors (null/odd-dim) are NOT neighbors: the
    // pruned path drops them at the cell join anyway (null cell);
    // filter the flat path explicitly so a NULL ADC score never
    // enters the top-k heap with engine-defined null ordering
    val coded = enc0.select(col("__cid"), col("__clabel"),
      (if (coarse.isEmpty) lit(-1) else
        NearestCentroid.nearestCentroid(col("__nvec"),
          coarse.map(_.toSeq).toSeq)).as("__cell"),
      PqEncode.pqEncode(col("__nvec"), books).as("__code"))
      .where(col("__code").isNotNull)
    val paired =
      if (coarse.isEmpty) coded.crossJoin(broadcast(qMeta))
      else coded.join(
        broadcast(qMeta.select(col("__qidx"), col("__qid"),
          col("__qlabel"), explode(col("__probes")).as("__cell"))),
        "__cell")
    val scored = paired.select(col("__qidx"), col("__qid"),
      col("__qlabel"), col("__cid"), col("__clabel"),
      graft.functions.PqAdcMulti.pqAdcMulti(col("__code"),
        col("__qidx"), tables).as("__score"))
    val nn =
      if (rerankK <= 0)
        graft.operators.TopN.topNPerKey(scored, Seq("__qid"),
          Seq(col("__score") * -1, col("__cid")), k)
      else {
        val cand = graft.operators.TopN.topNPerKey(scored, Seq("__qid"),
          Seq(col("__score") * -1, col("__cid")),
          math.max(rerankK, k))
          .select(col("__qid"), col("__qlabel"), col("__cid"))
        val qVecs = queries.select(col(idCol).as("__qid"),
          col(vecCol).as("__qv"))
        val exact = cand // Q·rerankK rows — broadcastable by contract
          .join(enc0.select(col("__cid"), col("__clabel"), col("__cv")),
            "__cid")
          .join(broadcast(qVecs), "__qid")
          .withColumn("__score",
            Similarity.cosine(col("__cv"), col("__qv")))
        graft.operators.TopN.topNPerKey(exact, Seq("__qid"),
          Seq(col("__score") * -1, col("__cid")), k)
      }
    val votes = nn.groupBy(col("__qid"), col("__qlabel"),
        col("__clabel"))
      .agg(count(lit(1)).as("__n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__qid"))
      .orderBy(col("__n").desc, col("__clabel").asc)
    val out = votes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("__qid").as(idCol), col("__qlabel").as("true_label"),
        col("__clabel").as("predicted"),
        (col("__qlabel") === col("__clabel")).cast("int").as("correct"))
    val materialized = out.localCheckpoint(true)
    enc0.unpersist()
    materialized
  }

  /** PQ-code collision dedup: rows whose `m`-subspace codes ALL
    * coincide are near-duplicates at codebook resolution; keep each
    * code word's smallest id. The MEMORY-side semantic dedup — the
    * grouping key is the m-byte code, so at 100 TB the shuffle
    * carries ~m small ints per row where [[Similarity.semDedup]]'s
    * candidate join carries band codes and the verify touches
    * vectors. Resolution is the codebook's: coarser than a cosine
    * threshold (tune `m`/`ksub` — more subspaces/centroids = finer
    * cells = less aggressive dedup), with no pairwise verify at all —
    * the image-near-dup screen for multimodal corpora where 5 % of
    * raw bytes is the budget (q214 composes it over the media
    * modality; the `iters = 0` anchors-by-id configuration replays
    * end-to-end in SQL). Malformed vectors (NULL code) pass through
    * undeduped, the kernel hygiene contract.
    *
    * @return (idCol, n_dups) — one survivor per code word with its
    *         group size; NULL-code rows survive with n_dups = 1.
    */
  def pqCodeDedup(
      embeddings: DataFrame, idCol: String, vecCol: String,
      m: Int, ksub: Int, iters: Int = 2, seed: Long = 42L,
      initByIdOrder: Boolean = false,
      trainSampleCap: Long = -1L): DataFrame = {
    val corpus = embeddings.select(col(idCol),
      Similarity.normalize(col(vecCol)).as("__nvec"))
    val books = pqCodebooks(corpus, idCol, "__nvec", m, ksub, iters,
      seed, initByIdOrder, trainSampleCap)
    val coded = corpus.select(col(idCol),
      PqEncode.pqEncode(col("__nvec"), books).as("__code"))
    val surv = coded.where(col("__code").isNotNull)
      .groupBy(col("__code"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_dups"))
      .select(col(idCol), col("n_dups"))
    val nulls = coded.where(col("__code").isNull)
      .select(col(idCol), lit(1L).as("n_dups"))
    surv.unionByName(nulls)
  }

  /** Persist an IVF-PQ index: `(id, __pq_code)` rows written
    * partitioned by `__cluster` (`$path/vectors/__cluster=N/...`) plus
    * the coarse centroid matrix (`$path/centroids`), the per-subspace
    * codebooks (`$path/codebooks` — (subspace, code, centroid) rows),
    * and the `_manifest` with layout params + staleness counters (the
    * [[Similarity.writeIvfIndex]] discipline).
    *
    * THIS is where PQ pays at 100 TB: the persisted index holds `m`
    * small ints per vector instead of the raw floats (~1-3 % of the
    * corpus bytes), a probe reads `nprobe` partition DIRECTORIES of
    * that already-tiny table, and the raw vectors are only ever
    * touched again if the caller reranks against the source table.
    * Rows whose vector is malformed land in the `__cluster=null`
    * directory — visible, never misfiled (the
    * [[graft.functions.NearestCentroid]] hygiene contract).
    */
  def writeIvfPqIndex(
      embeddings: DataFrame, idCol: String, vecCol: String,
      path: String, nlist: Int, m: Int, ksub: Int,
      coarseIters: Int = 3, pqIters: Int = 2, seed: Long = 42L,
      initByIdOrder: Boolean = false,
      trainSampleCap: Long = -1L): Unit = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val projected = embeddings.select(col(idCol), col(vecCol))
    val corpus = projected
      .withColumn("__nvec", Similarity.normalize(col(vecCol)))
      .persist(StorageLevel.MEMORY_AND_DISK) // coarse + PQ + encode
    val sizedNlist =
      if (nlist == 0) Similarity.autoNlist(corpus.count()) else nlist
    val coarse: Array[Array[Double]] =
      Similarity.ivfCentroids(
        sampleForTraining(corpus, idCol,
          resolveCap(trainSampleCap, sizedNlist.toLong), seed),
        idCol, "__nvec", sizedNlist, coarseIters, seed)
        .map(_.toArray).toArray
    val assigned = corpus
      .withColumn("__cluster",
        NearestCentroid.nearestCentroid(col("__nvec"),
          coarse.map(_.toSeq).toSeq))
      .withColumn("__resid",
        ResidualVec.residualVec(col("__nvec"), col("__cluster"), coarse))
    val books = pqCodebooks(assigned.where(col("__resid").isNotNull),
      idCol, "__resid", m, ksub, pqIters, seed, initByIdOrder,
      trainSampleCap)
    val encoded = assigned
      .select(col(idCol),
        PqEncode.pqEncode(col("__resid"), books).as("__pq_code"),
        col("__cluster"))
      .persist() // one encode feeds the row counter AND the write
    val n = encoded.count()
    encoded.write.mode("overwrite").partitionBy("__cluster")
      .parquet(s"$path/vectors")
    encoded.unpersist()
    corpus.unpersist()
    coarse.zipWithIndex.toSeq
      .map { case (c, i) => (i, c.toSeq) }.toDF("cluster", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    books.zipWithIndex.toSeq.flatMap { case (cb, j) =>
      cb.zipWithIndex.map { case (cen, c) => (j, c, cen.toSeq) }
    }.toDF("subspace", "code", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/codebooks")
    Similarity.writeIndexManifest(spark, path, Seq(
      "kind" -> "ivfpq", "nlist" -> sizedNlist.toString,
      "m" -> m.toString, "ksub" -> books(0).length.toString,
      "coarse_iters" -> coarseIters.toString,
      "pq_iters" -> pqIters.toString, "seed" -> seed.toString,
      "columns" -> Similarity.columnsMeta(projected),
      "indexed_rows" -> n.toString, "appended_rows" -> "0"))
  }

  /** Probe a persisted IVF-PQ index: probe clusters picked driver-side
    * from the centroid metadata, the CODE scan filtered on the
    * partition column (directory pruning), ADC scoring with the
    * global table + per-cluster coarse dot. With `rerankK > 0` the
    * top-`rerankK` candidate ids join back (broadcast — a k-row side)
    * to the caller's raw-vector table for an exact-cosine FAISS-refine
    * (the index itself stores no raw vectors — that is the point).
    */
  def ivfPqTopKFromIndex(
      spark: org.apache.spark.sql.SparkSession, path: String,
      idCol: String, query: DataFrame, queryVecCol: String,
      nprobe: Int = 2, k: Int = 10,
      rerankK: Int = 0,
      rerankSource: Option[(DataFrame, String)] = None,
      maxStaleRatio: Double = Similarity.DefaultMaxStaleRatio,
      strictStaleness: Boolean = false): DataFrame = {
    Similarity.checkProbeStaleness(
      Similarity.readIndexMeta(spark, path), path,
      maxStaleRatio, strictStaleness)
    probeIvfPq(spark, path, idCol, query, queryVecCol, nprobe, k,
      rerankK, rerankSource, readCoarse(spark, path),
      readCodebooks(spark, path))
  }

  /** Append new vectors to a persisted IVF-PQ index WITHOUT a rebuild:
    * the COMMITTED coarse centroids and codebooks define the routing
    * and the codes, so arrivals encode map-only into the existing
    * `__cluster=` directories (dynamic-partition append) and probes
    * see them immediately through the same ADC scan. Layout params
    * are manifest-validated and the staleness counter bumps — recall
    * decays as appended mass rivals indexed mass (frozen centroids
    * AND frozen codebooks here), which [[Similarity.indexStaleness]]
    * and the probe-time warning surface.
    */
  def appendToIvfPqIndex(
      spark: org.apache.spark.sql.SparkSession, path: String,
      embeddings: DataFrame, idCol: String, vecCol: String): Long = {
    val meta = Similarity.readIndexMeta(spark, path)
    Similarity.requireMetaMatch(meta, "kind", "ivfpq", path)
    val src = meta.get("columns") match {
      case Some(cs) =>
        val buildCols = cs.split(",").toSeq
        require(buildCols.contains(idCol) && buildCols.contains(vecCol),
          s"index at $path was built over columns [$cs] — append " +
            s"called with idCol=$idCol vecCol=$vecCol")
        embeddings.select(buildCols.map(col): _*)
      case None => embeddings
    }
    val coarse = readCoarse(spark, path)
    val books = readCodebooks(spark, path)
    val encoded = src
      .withColumn("__nvec", Similarity.normalize(col(vecCol)))
      .withColumn("__cluster",
        NearestCentroid.nearestCentroid(col("__nvec"),
          coarse.map(_.toSeq).toSeq))
      .withColumn("__resid",
        ResidualVec.residualVec(col("__nvec"), col("__cluster"), coarse))
      .select(col(idCol),
        PqEncode.pqEncode(col("__resid"), books).as("__pq_code"),
        col("__cluster"))
      .persist() // one computation feeds the count AND the write
    val n = encoded.count()
    encoded.write.mode("append").partitionBy("__cluster")
      .parquet(s"$path/vectors")
    encoded.unpersist()
    Similarity.writeIndexManifest(spark, path,
      Similarity.bumpAppendCounter(meta, n))
    n
  }

  /** Rebuild a persisted IVF-PQ index from the CALLER'S raw-vector
    * table — the staleness remedy for the PQ layout (r13 verdict #3).
    * Unlike LSH/IVF rebuilds, this one cannot be self-contained: the
    * index stores m-byte CODES only (that is the point), so re-training
    * coarse centroids and codebooks needs the raw vectors back.
    * Layout params (nlist, m, ksub, iterations, seed) come from the
    * manifest — a rebuild refreshes TRAINING, not layout; pass
    * `nlist = 0` to re-derive [[Similarity.autoNlist]] from the
    * current corpus (the right call after heavy growth). Everything
    * else is [[writeIvfPqIndex]]: fresh coarse + codebooks + codes,
    * overwrite, manifest with reset counters. Returns the indexed
    * row count.
    */
  def rebuildIvfPqIndex(
      spark: org.apache.spark.sql.SparkSession, path: String,
      embeddings: DataFrame, idCol: String, vecCol: String,
      nlist: Int = -1,
      trainSampleCap: Long = -1L): Long = {
    val meta = Similarity.readIndexMeta(spark, path)
    require(meta.contains("kind"),
      s"no manifest metadata at $path — not a managed IVF-PQ index " +
        "(build it with writeIvfPqIndex)")
    Similarity.requireMetaMatch(meta, "kind", "ivfpq", path)
    val buildCols = meta("columns").split(",").toSeq
    require(buildCols.contains(idCol) && buildCols.contains(vecCol),
      s"index at $path was built over columns [${meta("columns")}] — " +
        s"rebuild called with idCol=$idCol vecCol=$vecCol")
    val src = embeddings.select(buildCols.map(col): _*)
    val sizedNlist = if (nlist < 0) meta("nlist").toInt else nlist
    writeIvfPqIndex(src, idCol, vecCol, path,
      nlist = sizedNlist, m = meta("m").toInt, ksub = meta("ksub").toInt,
      coarseIters = meta("coarse_iters").toInt,
      pqIters = meta("pq_iters").toInt, seed = meta("seed").toLong,
      trainSampleCap = trainSampleCap)
    Similarity.readIndexMeta(spark, path)("indexed_rows").toLong
  }

  /** An OPENED IVF-PQ index: coarse centroids, codebooks, and the
    * manifest loaded ONCE and reused across probes. The one-shot
    * [[ivfPqTopKFromIndex]] re-reads both metadata parquets per call,
    * which DOMINATES its latency (pq_recall_r13 measured ~0.5–1.1 s
    * mean probe vs ~0.05 s for the equivalent in-memory ADC scan) —
    * a query batch should pay it once. Staleness is checked at
    * [[open]] against the manifest counters of that moment; a
    * long-lived handle over an appending index should re-open to
    * refresh (the probe itself always reads the LIVE vectors
    * directory, so appended rows are visible immediately — only the
    * staleness judgment and the frozen centroids/codebooks are
    * open-time snapshots, and those are immutable between rebuilds
    * by construction).
    */
  final class IvfPqIndex private[ProductQuantization] (
      spark: org.apache.spark.sql.SparkSession,
      val path: String,
      coarse: Array[Array[Double]],
      books: Array[Array[Array[Double]]]) {

    /** [[ivfPqTopKFromIndex]] with the open-time metadata — probe
      * results are identical by construction (spec-pinned).
      */
    def topK(
        idCol: String, query: DataFrame, queryVecCol: String,
        nprobe: Int = 2, k: Int = 10,
        rerankK: Int = 0,
        rerankSource: Option[(DataFrame, String)] = None): DataFrame =
      probeIvfPq(spark, path, idCol, query, queryVecCol, nprobe, k,
        rerankK, rerankSource, coarse, books)

    /** Batched retrieval over the opened index — [[topK]] for a whole
      * query FRAME in one pruned scan (r13 verdict #2: per-probe cost
      * is fixed overhead a batch amortizes; this is
      * [[knnClassifyPq]]'s broadcast-query-index + per-cell join shape
      * exposed for plain retrieval). Per-query ADC tables precompute
      * driver-side (Q·m·ksub doubles, `maxCollectQueries`-guarded),
      * the code scan prunes to the UNION of the batch's probe
      * directories, [[graft.functions.PqAdcMulti]] scores every
      * surviving (row, query) pair at O(m) lookups, and per-query
      * heaps fold map-side. Batch-of-one is row-identical to [[topK]]
      * (spec-pinned).
      *
      * @return (query_id, idCol, score) — k rows per query.
      */
    def topKBatch(
        idCol: String, queries: DataFrame,
        queryIdCol: String, queryVecCol: String,
        nprobe: Int = 2, k: Int = 10,
        rerankK: Int = 0,
        rerankSource: Option[(DataFrame, String)] = None,
        maxCollectQueries: Int = 10000): DataFrame =
      probeIvfPqBatch(spark, path, idCol, queries, queryIdCol,
        queryVecCol, nprobe, k, rerankK, rerankSource, coarse, books,
        maxCollectQueries)
  }

  /** Open a persisted IVF-PQ index for repeated probing: one manifest
    * validation + staleness check + two bounded metadata reads, then
    * every [[IvfPqIndex.topK]] goes straight to the partition-pruned
    * code scan.
    */
  def openIvfPqIndex(
      spark: org.apache.spark.sql.SparkSession, path: String,
      maxStaleRatio: Double = Similarity.DefaultMaxStaleRatio,
      strictStaleness: Boolean = false): IvfPqIndex = {
    val meta = Similarity.readIndexMeta(spark, path)
    Similarity.requireMetaMatch(meta, "kind", "ivfpq", path)
    Similarity.checkProbeStaleness(meta, path, maxStaleRatio,
      strictStaleness)
    new IvfPqIndex(spark, path, readCoarse(spark, path),
      readCodebooks(spark, path))
  }

  /** One-shot batched probe of a persisted IVF-PQ index —
    * [[openIvfPqIndex]] + [[IvfPqIndex.topKBatch]] for callers
    * probing once (the handle amortizes metadata across REPEATED
    * batches; this amortizes it across the queries of one batch).
    */
  def ivfPqTopKBatchFromIndex(
      spark: org.apache.spark.sql.SparkSession, path: String,
      idCol: String, queries: DataFrame,
      queryIdCol: String, queryVecCol: String,
      nprobe: Int = 2, k: Int = 10,
      rerankK: Int = 0,
      rerankSource: Option[(DataFrame, String)] = None,
      maxStaleRatio: Double = Similarity.DefaultMaxStaleRatio,
      strictStaleness: Boolean = false,
      maxCollectQueries: Int = 10000): DataFrame =
    openIvfPqIndex(spark, path, maxStaleRatio, strictStaleness)
      .topKBatch(idCol, queries, queryIdCol, queryVecCol, nprobe, k,
        rerankK, rerankSource, maxCollectQueries)

  /** Batched probe tail: one (qidx, query_id, cell, coarse-dot) row
    * per probed cell broadcast against the pruned code scan,
    * [[graft.functions.PqAdcMulti]] ADC scoring, per-query heaps,
    * optional exact-cosine refine against the caller's raw-vector
    * table. Driver state: Q ADC tables + Q·nprobe probe rows —
    * bounded by `maxCollectQueries` (the [[knnClassifyPq]] contract).
    */
  private def probeIvfPqBatch(
      spark: org.apache.spark.sql.SparkSession, path: String,
      idCol: String, queries: DataFrame,
      queryIdCol: String, queryVecCol: String,
      nprobe: Int, k: Int, rerankK: Int,
      rerankSource: Option[(DataFrame, String)],
      coarse: Array[Array[Double]],
      books: Array[Array[Array[Double]]],
      maxCollectQueries: Int): DataFrame = {
    require(nprobe > 0, s"nprobe must be positive (got $nprobe) — an " +
      "empty probe set would silently return zero rows")
    val qRows = queries
      .select(col(queryIdCol), guardedNormalize(queryVecCol))
      .limit(maxCollectQueries + 1).collect()
    require(qRows.length <= maxCollectQueries,
      s"query batch exceeds maxCollectQueries = $maxCollectQueries — " +
        "the batched probe precomputes one m×ksub ADC table per query " +
        "driver-side; shard the batch or raise the guard knowingly")
    val qDim = books.length * books(0)(0).length
    qRows.foreach { r =>
      require(!r.isNullAt(1),
        s"topKBatch: query id ${r.get(0)} has a NULL, zero-norm, or " +
          s"non-finite $queryVecCol — it cannot be cosine-normalized; " +
          "filter the batch or fix the vector")
      require(r.getSeq[Double](1).length == qDim,
        s"topKBatch: query id ${r.get(0)} vector dim " +
          s"${r.getSeq[Double](1).length} != the index layout m·dsub " +
          s"= $qDim")
    }
    val dupIds = qRows.groupBy(_.get(0))
      .collect { case (id, rs) if rs.length > 1 => id }
    require(dupIds.isEmpty,
      s"duplicate query ids in the batch: ${dupIds.take(5).mkString(", ")}" +
        " — deduplicate the query frame (each id ranks once)")
    val tables: Array[Array[Array[Double]]] =
      qRows.map(r => adcTable(r.getSeq[Double](1).toArray, books))
    val np = math.min(nprobe, coarse.length)
    // one row per (query, probed cell), carrying THAT query's coarse
    // dot for the cell — never the full nlist dot table per query
    val probeRows = qRows.zipWithIndex.flatMap { case (r, i) =>
      val qv = r.getSeq[Double](1).toArray
      probeOrder(qv, coarse).take(np).map { c =>
        org.apache.spark.sql.Row(i, r.get(0), c, dotArr(qv, coarse(c)))
      }
    }
    val qSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("__qidx",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      queries.schema(queryIdCol).copy(name = "query_id"),
      org.apache.spark.sql.types.StructField("__cluster",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("__cdot",
        org.apache.spark.sql.types.DoubleType, nullable = false)))
    val qMeta = spark.createDataFrame(
      java.util.Arrays.asList(probeRows: _*), qSchema)
    val cells = probeRows.map(_.getInt(2)).distinct.toSeq
    val scored = spark.read.parquet(s"$path/vectors")
      .filter(col("__cluster").isin(cells.map(Int.box): _*)) // pruning
      .join(broadcast(qMeta), "__cluster")
      .select(col("query_id"), col(idCol),
        (graft.functions.PqAdcMulti.pqAdcMulti(col("__pq_code"),
          col("__qidx"), tables) + col("__cdot")).as("score"))
      // malformed codes (NULL) and non-finite scores (a zero-norm
      // query normalizes to NaN and passes the NULL/dim guards) never
      // rank — the Similarity.rankable predicate, so the heap-based
      // batch and the orderBy-based single probe stay row-identical
      // even on that input class (r14 advice)
      .where(col("score").isNotNull && !isnan(col("score")))
    if (rerankK <= 0)
      graft.operators.TopN.topNPerKey(scored, Seq("query_id"),
        Seq(col("score") * -1, col(idCol)), k)
    else {
      val (src, vecCol) = rerankSource.getOrElse(throw
        new IllegalArgumentException("rerankK > 0 needs rerankSource " +
          "— the index stores PQ codes only; pass the raw-vector " +
          "table as rerankSource = Some((frame, vecCol))"))
      val cand = graft.operators.TopN.topNPerKey(scored, Seq("query_id"),
          Seq(col("score") * -1, col(idCol)), math.max(rerankK, k))
        .select(col("query_id"), col(idCol))
      val qv = queries.select(col(queryIdCol).as("query_id"),
        col(queryVecCol).as("__qvec"))
      val exact = src // candidate side ≤ Q·rerankK rows — broadcast
        .join(broadcast(cand), idCol)
        .join(broadcast(qv), "query_id")
        .select(col("query_id"), col(idCol),
          Similarity.cosine(col(vecCol), col("__qvec")).as("score"))
      graft.operators.TopN.topNPerKey(exact, Seq("query_id"),
        Seq(col("score") * -1, col(idCol)), k)
    }
  }

  /** The shared probe tail: driver-side probe selection, ADC + coarse
    * dot scoring over the pruned partition scan, optional
    * FAISS-refine against a caller-provided raw-vector table.
    */
  private def probeIvfPq(
      spark: org.apache.spark.sql.SparkSession, path: String,
      idCol: String, query: DataFrame, queryVecCol: String,
      nprobe: Int, k: Int, rerankK: Int,
      rerankSource: Option[(DataFrame, String)],
      coarse: Array[Array[Double]],
      books: Array[Array[Array[Double]]]): DataFrame = {
    require(nprobe > 0, s"nprobe must be positive (got $nprobe) — an " +
      "empty probe set would silently return zero rows")
    val qn = queryVector(query, queryVecCol)
    val probes =
      probeOrder(qn, coarse).take(math.min(nprobe, coarse.length))
    val table = adcTable(qn, books)
    val coarseDots: Seq[Double] = coarse.toSeq.map(c => dotArr(qn, c))
    val scored = spark.read.parquet(s"$path/vectors")
      .filter(col("__cluster").isin(probes.map(Int.box): _*))
      .withColumn("score",
        PqAdc.pqAdc(col("__pq_code"), table)
          + element_at(typedlit(coarseDots), col("__cluster") + 1))
      // malformed codes (NULL score) and non-finite scores (zero-norm
      // query → NaN ADC table) never rank — the same rule the batched
      // probe applies, so batch-of-one stays row-identical even on
      // corrupt cells and NaN queries (r14 review + r14 advice)
      .where(col("score").isNotNull && !isnan(col("score")))
    if (rerankK <= 0)
      scored.orderBy(col("score").desc, col(idCol).asc).limit(k)
        .select(col(idCol), col("score"))
    else {
      val (src, vecCol) = rerankSource.getOrElse(throw
        new IllegalArgumentException("rerankK > 0 needs rerankSource " +
          "— the index stores PQ codes only; pass the raw-vector " +
          "table as rerankSource = Some((frame, vecCol))"))
      val cand = scored
        .orderBy(col("score").desc, col(idCol).asc)
        .limit(math.max(rerankK, k))
        .select(col(idCol))
      val q = query.select(col(queryVecCol).as("__qvec"))
      src.join(broadcast(cand), idCol) // candidate side: ≤ rerankK rows
        .crossJoin(broadcast(q))
        .withColumn("score", Similarity.cosine(col(vecCol), col("__qvec")))
        .orderBy(col("score").desc, col(idCol).asc)
        .limit(k)
        .select(col(idCol), col("score"))
    }
  }

  private def readCoarse(
      spark: org.apache.spark.sql.SparkSession,
      path: String): Array[Array[Double]] = {
    import spark.implicits._
    val rows = spark.read.parquet(s"$path/centroids")
      .as[(Int, Seq[Double])].collect().sortBy(_._1)
    require(rows.nonEmpty, s"no centroids at $path — not an IVF-PQ " +
      "index (build it with writeIvfPqIndex)")
    rows.map(_._2.toArray)
  }

  private def readCodebooks(
      spark: org.apache.spark.sql.SparkSession,
      path: String): Array[Array[Array[Double]]] = {
    import spark.implicits._
    val rows = spark.read.parquet(s"$path/codebooks")
      .as[(Int, Int, Seq[Double])].collect()
    require(rows.nonEmpty, s"no codebooks at $path — not an IVF-PQ " +
      "index (build it with writeIvfPqIndex)")
    rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (_, cb) =>
      cb.sortBy(_._2).map(_._3.toArray)
    }.toArray
  }

  /** Clusters by ascending squared L2 to the query, index tie-break —
    * [[Similarity.ivfTopK]]'s probe order, computed driver-side.
    */
  private[graft] def probeOrder(
      q: Array[Double], coarse: Array[Array[Double]]): Seq[Int] =
    coarse.zipWithIndex.map { case (c, i) =>
      var d = 0.0
      var dd = 0
      while (dd < c.length) {
        val diff = q(dd) - c(dd); d += diff * diff; dd += 1
      }
      (d, i)
    }.sortBy(identity).map(_._2).toSeq

  private def dotArr(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** The one normalized query vector, driver-side (single-query API —
    * bounded by contract, like the LSH probe entry points).
    */
  /** The collected, normalized query vector. A zero-norm (or
    * non-finite) query is rejected HERE with a named error (r14
    * advice): normalize would divide by zero — a raw ANSI error under
    * Spark's default, or NaN scores that rank engine-specifically
    * with ANSI off — so the guard wraps the normalize in a
    * norm-positivity predicate and fails fast on the NULL.
    */
  private def queryVector(
      query: DataFrame, queryVecCol: String): Array[Double] = {
    val row = query.select(guardedNormalize(queryVecCol)).head()
    require(!row.isNullAt(0),
      s"query $queryVecCol is NULL, zero-norm, or non-finite — it " +
        "cannot be cosine-normalized; fix the query vector")
    row.getSeq[Double](0).toArray
  }

  /** L2-normalize for the QUERY side, evaluating the division only
    * when the norm is finite and positive — zero-norm / non-finite
    * vectors come back NULL for the caller's fail-fast instead of an
    * ANSI divide-by-zero (or a NaN that poisons every ADC score).
    */
  private def guardedNormalize(vecCol: String) = {
    val n = Similarity.norm(col(vecCol))
    when(n > 0.0 && !isnan(n) && n < lit(Double.PositiveInfinity),
      Similarity.normalize(col(vecCol)))
  }

  /** Shared tail: plain ADC top-k, or FAISS-refine (ADC top-rerankK →
    * exact-cosine rerank of the raw vectors → top-k). The rerank
    * expression IS [[Similarity.bruteForceTopK]]'s scoring, so refined
    * results are engine-replayable and spec-comparable to brute.
    */
  private def finish(
      scored: DataFrame, idCol: String, vecCol: String,
      query: DataFrame, queryVecCol: String,
      k: Int, rerankK: Int): DataFrame =
    if (rerankK <= 0)
      scored.orderBy(col("score").desc, col(idCol).asc).limit(k)
        .select(col(idCol), col("score"))
    else {
      val cand = scored
        .orderBy(col("score").desc, col(idCol).asc)
        .limit(math.max(rerankK, k))
      val q = query.select(col(queryVecCol).as("__qvec"))
      cand.crossJoin(broadcast(q))
        .withColumn("score", Similarity.cosine(col(vecCol), col("__qvec")))
        .orderBy(col("score").desc, col(idCol).asc)
        .limit(k)
        .select(col(idCol), col("score"))
    }
}
