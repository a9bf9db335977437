package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Brute-force cosine top-k is the exact baseline (one scan, one
  * narrow top-k); the scale path is LSH bucketing via random
  * hyperplanes: sign-bit codes computed in a single projection, probe
  * only matching buckets, rerank exactly. Both paths compute in double
  * precision with a sequential left-fold (`aggregate`) so scores are
  * reproducible and engine-comparable.
  */
object Similarity {

  /** Dot product of two array<numeric> columns in double precision —
    * a native expression with the same sequential accumulation order
    * as the composed aggregate/zip_with form (bitwise-equal scores).
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.DotProduct.dotProduct(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** L2-normalize an embedding (into array<double>). */
  def normalize(a: Column): Column =
    // bind the norm ONCE via a 1-element transform: a non-lambda
    // subexpression inside a lambda body is otherwise re-evaluated per
    // element, turning the O(d) norm into O(d²) per row (see
    // functions/TextHashes.scala scaladoc for the general trap)
    element_at(transform(array(norm(a)), n =>
      transform(a, x => x.cast("double") / n)), 1)

  /** Exact brute-force cosine top-k against one query vector.
    *
    * The query row is cross-joined (1 row → broadcast by Catalyst);
    * top-k is an `orderBy(...).limit(k)` which Spark executes as
    * TakeOrderedAndProject — per-partition heaps + driver merge of k
    * rows, NOT a global sort: at 1B vectors only k rows per partition
    * move.
    */
  def bruteForceTopK(
      embeddings: DataFrame, idCol: String, vecCol: String,
      query: DataFrame, queryVecCol: String,
      k: Int = 10): DataFrame = {
    val q = query.select(col(queryVecCol).as("__qvec"))
    embeddings.crossJoin(broadcast(q))
      .withColumn("score", cosine(col(vecCol), col("__qvec")))
      .transform(rankable)
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), col("score"))
  }

  /** k-NN majority-vote classification: each query vector takes the
    * modal label of its k nearest corpus vectors by cosine — the
    * standard embedding-quality eval (a probe of whether the space
    * clusters by label at all). Returns (query id, true label,
    * predicted label, correct 0/1).
    *
    * Scale posture: eval QUERY sets are small by construction, so the
    * query side broadcasts and the corpus STREAMS — one scan however
    * large the corpus; per-(query, corpus) scores never materialize
    * beyond the bounded top-k heap
    * ([[graft.operators.TopN.topNPerKey]]). Ties break (score desc,
    * corpus id asc) for the neighbors and (votes desc, label asc)
    * for the winner, so the prediction is deterministic on any
    * engine. For corpus sizes where even one streaming scan per eval
    * is too slow, swap the scorer for the LSH/IVF index paths —
    * the vote logic is unchanged.
    */
  def knnClassify(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, labelCol: String,
      k: Int = 5): DataFrame = {
    val q = queries.select(col(idCol).as("__qid"),
      col(vecCol).as("__qv"), col(labelCol).as("__qlabel"))
    val scored = corpus
      .select(col(idCol).as("__cid"), col(vecCol).as("__cv"),
        col(labelCol).as("__clabel"))
      .crossJoin(broadcast(q))
      .select(col("__qid"), col("__qlabel"), col("__cid"),
        col("__clabel"), cosine(col("__cv"), col("__qv")).as("__score"))
    val nn = graft.operators.TopN.topNPerKey(scored, Seq("__qid"),
      Seq(col("__score") * -1, col("__cid")), k)
    val votes = nn.groupBy(col("__qid"), col("__qlabel"),
        col("__clabel"))
      .agg(count(lit(1)).as("__n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__qid"))
      .orderBy(col("__n").desc, col("__clabel").asc)
    votes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("__qid").as(idCol), col("__qlabel").as("true_label"),
        col("__clabel").as("predicted"),
        (col("__qlabel") === col("__clabel")).cast("int").as("correct"))
  }

  /** Int8 scalar quantization of an embedding: per-vector affine codes
    * `q_i = floor((x_i − min)/scale + 0.5)` ∈ [0, 255] with
    * `scale = (max − min)/255` → struct(codes array<int>, mn double,
    * scale double). 4× smaller than float32 at 100 TB, and quantized
    * scoring is integer arithmetic. Constant vectors (max = min) code
    * to all-zeros with scale 0. Every step is IEEE double with an
    * explicit floor (no banker's-rounding ambiguity), so codes are
    * bit-identical across engines; min/max/scale bind once via the
    * 1-element-transform trick (see [[normalize]]).
    */
  def scalarQuantize(vec: Column): Column =
    element_at(transform(array(struct(
        array_min(transform(vec, _.cast("double"))).as("mn"),
        array_max(transform(vec, _.cast("double"))).as("mx"))), s => {
      val mn    = s.getField("mn")
      val mx    = s.getField("mx")
      val scale = (mx - mn) / lit(255.0)
      struct(
        transform(vec, x => when(mx === mn, lit(0))
          .otherwise(floor((x.cast("double") - mn) / scale + lit(0.5))
            .cast("int"))).as("codes"),
        mn.as("mn"), scale.as("scale"))
    }), 1)

  /** Reconstruct approximate values from [[scalarQuantize]] output:
    * `x̂_i = codes_i · scale + mn` (max error scale/2).
    */
  def dequantize(quant: Column): Column =
    element_at(transform(array(quant), q =>
      transform(q.getField("codes"), c =>
        c.cast("double") * q.getField("scale") + q.getField("mn"))), 1)

  /** Top-k by integer dot product over quantized codes against the
    * vector with id `queryId`: the 1-row query side broadcasts, scores
    * are exact 64-bit integer sums (no float comparisons anywhere), and
    * the top-k runs as TakeOrderedAndProject — per-partition heaps,
    * only k rows per partition reach the driver.
    */
  def quantizedTopK(
      embeddings: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int = 10): DataFrame = {
    val quant = embeddings.select(col(idCol),
      scalarQuantize(col(vecCol)).getField("codes").as("codes"))
    val q = quant.filter(col(idCol) === queryId)
      .select(col("codes").as("__qc"))
    quant.filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .withColumn("score",
        aggregate(zip_with(col("codes"), col("__qc"),
          (x, y) => x.cast("long") * y.cast("long")), lit(0L), _ + _))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), col("score"))
  }

  /** Deterministic random hyperplanes: `planes` vectors of `dim`
    * components in [-1, 1), derived from `seed` — driver-side
    * constants, broadcast into codegen as literals.
    */
  def hyperplanes(dim: Int, planes: Int, seed: Long = 42L): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(planes)(Array.fill(dim)(rnd.nextDouble() * 2 - 1))
  }

  /** Hyperplane count sized from corpus cardinality (r9 verdict #2 —
    * the q53 degradation rule, automated): 2^planes buckets over `n`
    * vectors keeps the EXPECTED bucket near `targetBucketSize` at
    * planes = ceil(log₂(n / targetBucketSize)), so the bucketed
    * self-join's candidate volume stays ~n·targetBucketSize/2 instead
    * of drifting toward n²/2^planes as the corpus grows. Each added
    * plane halves candidate volume at a recall cost on near-threshold
    * pairs — the standard hyperplane-LSH trade; `targetBucketSize` is
    * therefore the recall/cost dial callers actually mean. Clamped to
    * [1, 62] (the bucket code is one long).
    */
  def autoPlanes(n: Long, targetBucketSize: Long = 128L): Int = {
    require(n >= 0 && targetBucketSize > 0,
      "autoPlanes needs n >= 0 and targetBucketSize > 0")
    if (n <= targetBucketSize) 1
    else math.min(62, math.ceil(
      math.log(n.toDouble / targetBucketSize) / math.log(2.0)).toInt)
  }

  /** IVF list count sized from corpus cardinality — the [[autoPlanes]]
    * analogue for [[ivfTopK]]/[[writeIvfIndex]]: nlist = ceil(√n)
    * (clamped to [1, 4096]) balances the two linear costs a probe
    * pays — nprobe·(n/nlist) candidate scans vs nlist centroid
    * distances — at ~√n each, the standard IVF sizing. A FIXED nlist
    * degrades toward a full scan as n grows (every list holds n/nlist
    * vectors); this is the r9 "next cliff" on q52, automated.
    */
  def autoNlist(n: Long): Int = {
    require(n >= 0, "autoNlist needs n >= 0")
    math.max(1, math.min(4096, math.ceil(math.sqrt(n.toDouble)).toInt))
  }

  /** Sign-bit LSH code for an embedding: bit p = sign(v · plane_p).
    * One projection, no shuffle; cardinality 2^planes buckets.
    *
    * The plane matrix is a single `typedlit` array-of-arrays literal —
    * expanding it to planes×dim individual literal nodes makes the
    * generated code quadratic in size (measured 19s → sub-second at
    * 2k vectors just from the codegen shrink).
    */
  def lshCode(vec: Column, planes: Seq[Array[Double]]): Column = {
    val mat     = typedlit(planes.map(_.toSeq))
    val weights = typedlit(planes.indices.map(i => 1L << i))
    aggregate(
      zip_with(mat, weights,
        (p, w) => when(dot(vec, p) >= 0, w).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** ANN top-k: probe only the query's LSH bucket, rerank exactly by
    * cosine. Recall < 1 by construction; raise `planes` for precision
    * of buckets, lower it (or multi-probe) for recall. At 100 TB the
    * bucketed table would be written partitioned by `__lsh_bucket` so
    * a probe is a partition-pruned scan, not a full pass.
    */
  def lshTopK(
      embeddings: DataFrame, idCol: String, vecCol: String,
      query: DataFrame, queryVecCol: String,
      dim: Int, k: Int = 10, planes: Int = 8, seed: Long = 42L): DataFrame = {
    val ps = hyperplanes(dim, planes, seed)
    val bucketed = embeddings.withColumn("__lsh_bucket",
      lshCode(col(vecCol), ps))
    val q = query.select(col(queryVecCol).as("__qvec"))
      .withColumn("__lsh_bucket", lshCode(col("__qvec"), ps))
    bucketed.join(broadcast(q), "__lsh_bucket")
      .withColumn("score", cosine(col(vecCol), col("__qvec")))
      .transform(rankable)
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), col("score"))
  }

  /** Multi-probe LSH top-k: probe the query's bucket PLUS every
    * Hamming-distance-1 neighbor (the `planes` single-bit flips) and
    * rerank the union exactly — the standard recall-recovery knob for
    * a FIXED plane count (Lv et al., "Multi-Probe LSH", VLDB'07 —
    * public algorithm). A single-bucket probe's recall decays as the
    * corpus outgrows its plane count: near-neighbors land one
    * sign-flip away ever more often, and REBUILDING at a larger
    * `planes` (the [[autoPlanes]] path) is the expensive answer.
    * Probing the 1 + planes neighbor buckets multiplies candidate
    * volume by ~(1 + planes)/1 while recovering exactly the neighbors
    * that one marginal hyperplane sign separated — the cheap answer,
    * and the one a read-mostly serving path wants.
    *
    * Plan shape: the probe set is planes+1 literal codes (derived
    * driver-side from the query vector — bounded metadata, like the
    * IVF probe list), so the scan filter is `__lsh_bucket IN (...)`.
    * Over [[writeLshIndex]]'s layout that is a partition-pruned read
    * of 1 + planes directories out of 2^planes — never a full pass;
    * in-memory it is one codegen'd IN filter. The exact rerank makes
    * the result identical to brute force WHENEVER the true top-k all
    * fall within Hamming ≤ 1 of the query's code.
    */
  def lshMultiProbeTopK(
      embeddings: DataFrame, idCol: String, vecCol: String,
      query: DataFrame, queryVecCol: String,
      dim: Int, k: Int = 10, planes: Int = 8, seed: Long = 42L): DataFrame = {
    val ps = hyperplanes(dim, planes, seed)
    val bucketed = embeddings.withColumn("__lsh_bucket",
      lshCode(col(vecCol), ps))
    // one row: the query's own code (query frames are one row by
    // contract, as in lshTopK/ivfTopKFromIndex)
    val q = query.select(col(queryVecCol).as("__qvec"))
      .withColumn("__b", lshCode(col("__qvec"), ps))
    val base = q.select(col("__b")).head().getLong(0)
    val probeSet = base +: (0 until planes).map(p => base ^ (1L << p))
    bucketed
      .filter(col("__lsh_bucket").isin(probeSet: _*)) // pruned scan
      .crossJoin(broadcast(q.select(col("__qvec"))))
      .withColumn("score", cosine(col(vecCol), col("__qvec")))
      .transform(rankable)
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), col("score"))
  }

  /** Query-directed probe sequence (Lv et al., "Multi-Probe LSH",
    * VLDB'07 §4 — public algorithm): the perturbation sets most likely
    * to hold missed neighbors are those flipping the hyperplanes the
    * query is CLOSEST to, so masks are ordered by the sum of squared
    * margins of their flipped planes (ascending) and taken up to a
    * probe budget. [[lshMultiProbeTopK]]'s fixed Hamming-≤1 sweep
    * probes all `planes` single-bit flips blindly; this sequence (a)
    * spends a small budget on the LIKELIEST flips instead of all of
    * them and (b) extends reach to Hamming-2 sets when the budget
    * allows — the knob between "1 bucket" and "every single-flip
    * bucket", and past it.
    *
    * `dots` are the query's SIGNED per-plane projections (the same
    * values whose signs form its bucket code — only the squares are
    * used, so sign handling stays in one place); returns up to
    * `budget - 1` XOR masks (the base bucket is probe #0 and costs no
    * mask). Ties break on the mask value, so the sequence is a pure
    * function of the projections. Masks are enumerated to Hamming ≤ 2
    * — planes·(planes+1)/2 candidates, trivially driver-enumerable at
    * any realistic plane count (≤ 62), and the regime past "every
    * 2-flip bucket probed" is a rebuild signal ([[autoPlanes]]), not a
    * deeper probe.
    */
  private[graft] def probeMasks(dots: Seq[Double], budget: Int): Seq[Long] = {
    val sq = dots.map(d => d * d)
    val p = sq.length
    val singles = (0 until p).map(i => (sq(i), 1L << i))
    val pairs = for { i <- 0 until p; j <- (i + 1) until p }
      yield (sq(i) + sq(j), (1L << i) | (1L << j))
    (singles ++ pairs).sortBy { case (s, m) => (s, m) }
      .take(math.max(0, budget - 1)).map { case (_, m) => m }
  }

  /** The query's signed per-plane projections (driver-side, one
    * 1-row job): computed with the SAME [[dot]] kernel and plane
    * literals as [[lshCode]], so the derived bucket code (sign bits)
    * and the probe ordering (squared margins) are bit-consistent with
    * the codes stored in the corpus/index.
    */
  private def queryProjections(
      query: DataFrame, queryVecCol: String,
      ps: Seq[Array[Double]]): Seq[Double] =
    query.select(array(ps.map(p =>
        dot(col(queryVecCol), typedlit(p.toSeq))): _*))
      .head().getSeq[Double](0)

  private def codeOf(dots: Seq[Double]): Long =
    dots.zipWithIndex.foldLeft(0L) { case (acc, (d, i)) =>
      if (d >= 0) acc | (1L << i) else acc
    }

  /** Query-directed multi-probe LSH top-k under a PROBE BUDGET: probe
    * the query's bucket plus the `probes - 1` perturbed buckets
    * likeliest to hold missed neighbors ([[probeMasks]] — margin-
    * ordered single and double sign flips), rerank the union exactly.
    * Unlike [[lshMultiProbeTopK]]'s fixed Hamming-≤1 sweep, the budget
    * dials candidate volume continuously (2 buckets, 5, 40, ...) and
    * reaches Hamming-2 buckets once the likely single flips are spent
    * — the recall knob for an index whose plane count the corpus has
    * badly outgrown. Plan shape is unchanged from q200: the probe set
    * is `probes` literal codes, so the scan filter is one codegen'd
    * `IN` (partition-pruned over a persisted index).
    */
  def lshMultiProbeTopKBudget(
      embeddings: DataFrame, idCol: String, vecCol: String,
      query: DataFrame, queryVecCol: String,
      dim: Int, k: Int = 10, planes: Int = 8, probes: Int = 8,
      seed: Long = 42L): DataFrame = {
    require(probes >= 1, s"probe budget must be >= 1 (got $probes)")
    val ps = hyperplanes(dim, planes, seed)
    val bucketed = embeddings.withColumn("__lsh_bucket",
      lshCode(col(vecCol), ps))
    val q = query.select(col(queryVecCol).as("__qvec"))
    val dots = queryProjections(q, "__qvec", ps)
    val base = codeOf(dots)
    val probeSet = base +: probeMasks(dots, probes).map(base ^ _)
    bucketed
      .filter(col("__lsh_bucket").isin(probeSet: _*)) // pruned scan
      .crossJoin(broadcast(q))
      .withColumn("score", cosine(col(vecCol), col("__qvec")))
      .transform(rankable)
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), col("score"))
  }

  /** [[lshMultiProbeTopKBudget]] over a persisted [[writeLshIndex]]
    * layout: the margin-ordered probe set as a partition-pruned read
    * of `probes` directories out of 2^planes. Layout parameters
    * default from the index manifest; stale indexes warn (or throw
    * under `strictStaleness`) — see [[checkProbeStaleness]].
    */
  def lshMultiProbeTopKBudgetFromIndex(
      spark: org.apache.spark.sql.SparkSession, path: String,
      idCol: String, vecCol: String,
      query: DataFrame, queryVecCol: String,
      dim: Int, k: Int = 10, planes: Int = 0, probes: Int = 8,
      seed: Long = 42L,
      maxStaleRatio: Double = DefaultMaxStaleRatio,
      strictStaleness: Boolean = false): DataFrame = {
    require(probes >= 1, s"probe budget must be >= 1 (got $probes)")
    val meta = readIndexMeta(spark, path)
    requireMetaMatch(meta, "kind", "lsh", path)
    requireMetaMatch(meta, "dim", dim.toString, path)
    requireMetaMatch(meta, "seed", seed.toString, path)
    val effPlanes =
      resolvePlanes(meta, planes, path, "lshMultiProbeTopKBudgetFromIndex")
    checkProbeStaleness(meta, path, maxStaleRatio, strictStaleness)
    val ps = hyperplanes(dim, effPlanes, seed)
    val q = query.select(col(queryVecCol).as("__qvec"))
    val dots = queryProjections(q, "__qvec", ps)
    val base = codeOf(dots)
    val probeSet = base +: probeMasks(dots, probes).map(base ^ _)
    spark.read.parquet(s"$path/vectors")
      .filter(col("__lsh_bucket").isin(probeSet: _*)) // partition pruning
      .crossJoin(broadcast(q))
      .withColumn("score", cosine(col(vecCol), col("__qvec")))
      .transform(rankable)
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), col("score"))
  }

  /** Persist the LSH layout: vectors written partitioned by bucket
    * code. The planes are derived from (dim, planes, seed), so a probe
    * needs no stored metadata — recompute the query's code and read one
    * partition directory.
    */
  def writeLshIndex(
      embeddings: DataFrame, idCol: String, vecCol: String,
      path: String, dim: Int, planes: Int = 8, seed: Long = 42L): Unit = {
    require(embeddings.columns.contains(idCol) &&
      embeddings.columns.contains(vecCol),
      s"writeLshIndex: input lacks $idCol/$vecCol")
    val coded = embeddings
      .withColumn("__lsh_bucket", lshCode(col(vecCol),
        hyperplanes(dim, planes, seed)))
      .persist() // one computation feeds the row counter AND the write
    val n = coded.count()
    coded.write.mode("overwrite").partitionBy("__lsh_bucket")
      .parquet(s"$path/vectors")
    coded.unpersist()
    writeIndexManifest(embeddings.sparkSession, path, Seq(
      "kind" -> "lsh", "dim" -> dim.toString,
      "planes" -> planes.toString, "seed" -> seed.toString,
      "columns" -> columnsMeta(embeddings),
      "indexed_rows" -> n.toString, "appended_rows" -> "0"))
  }

  /** Append new vectors to a persisted LSH index — the
    * [[appendToIvfIndex]] analogue, simpler because the layout is
    * derived, not trained: bucket codes come from (dim, planes, seed)
    * alone, so appended vectors bucket EXACTLY as a rebuild would and
    * probe recall does not drift (no centroids to go stale — the only
    * rebuild trigger is resizing `planes` as the corpus grows, see
    * [[autoPlanes]]). Dynamic-partition append + atomic manifest
    * re-publish, as in the IVF path. Returns the appended row count.
    *
    * Layout safety (r11 advice): (dim, planes, seed) are validated
    * against the values the build recorded in the manifest — a
    * mismatch (e.g. appending with the default 8 planes to an
    * autoPlanes-sized index) would bucket the appended vectors under
    * a DIFFERENT code family, so probes would permanently miss them
    * with no error. `planes = 0` derives the count from the manifest
    * instead of requiring the caller to know it. The append is also
    * projected onto the exact build-time column set (recorded in the
    * manifest), so a frame with missing columns fails at analysis
    * time and extra columns cannot commit a divergent parquet schema
    * into `vectors/`. Pre-metadata indexes (round ≤11) have nothing
    * recorded and fall back to trusting the caller.
    */
  def appendToLshIndex(
      spark: org.apache.spark.sql.SparkSession, path: String,
      embeddings: DataFrame, idCol: String, vecCol: String,
      dim: Int, planes: Int = 8, seed: Long = 42L): Long = {
    val meta = readIndexMeta(spark, path)
    requireMetaMatch(meta, "kind", "lsh", path)
    requireMetaMatch(meta, "dim", dim.toString, path)
    requireMetaMatch(meta, "seed", seed.toString, path)
    val effPlanes =
      resolvePlanes(meta, planes, path, "appendToLshIndex")
    val src = meta.get("columns") match {
      case Some(cs) =>
        val buildCols = cs.split(",").toSeq
        require(buildCols.contains(idCol) && buildCols.contains(vecCol),
          s"index at $path was built over columns [$cs] — append " +
            s"called with idCol=$idCol vecCol=$vecCol")
        embeddings.select(buildCols.map(col): _*)
      case None => embeddings // pre-metadata index: legacy behavior
    }
    val coded = src
      .withColumn("__lsh_bucket", lshCode(col(vecCol),
        hyperplanes(dim, effPlanes, seed)))
      .persist() // one computation feeds the count AND the write
    val n = coded.count()
    coded.write.mode("append").partitionBy("__lsh_bucket")
      .parquet(s"$path/vectors")
    coded.unpersist()
    writeIndexManifest(spark, path, bumpAppendCounter(meta, n))
    n
  }

  /** The re-published manifest meta after an append: layout keys kept
    * verbatim, `appended_rows` accumulated (the [[indexStaleness]]
    * counter). Empty for a pre-metadata index — nothing to carry.
    */
  private[ml] def bumpAppendCounter(
      meta: Map[String, String], n: Long): Seq[(String, String)] =
    if (meta.isEmpty) Nil
    else (meta + ("appended_rows" ->
      (meta.getOrElse("appended_rows", "0").toLong + n).toString))
      .toSeq.sortBy(_._1)

  /** [[lshMultiProbeTopK]] over a persisted [[writeLshIndex]] layout:
    * the Hamming ≤ 1 probe set as a partition-pruned read of
    * 1 + planes directories out of 2^planes (the IN filter lands on
    * the partition column, so the scan's PartitionFilters prune to
    * exactly the probe directories — spec-asserted), exact rerank.
    * The recall knob for a committed index whose plane count the
    * corpus has outgrown, WITHOUT the rebuild [[autoPlanes]] would
    * ask for; layout parameters default from the index manifest.
    */
  def lshMultiProbeTopKFromIndex(
      spark: org.apache.spark.sql.SparkSession, path: String,
      idCol: String, vecCol: String,
      query: DataFrame, queryVecCol: String,
      dim: Int, k: Int = 10, planes: Int = 0, seed: Long = 42L,
      maxStaleRatio: Double = DefaultMaxStaleRatio,
      strictStaleness: Boolean = false): DataFrame = {
    val meta = readIndexMeta(spark, path)
    requireMetaMatch(meta, "kind", "lsh", path)
    requireMetaMatch(meta, "dim", dim.toString, path)
    requireMetaMatch(meta, "seed", seed.toString, path)
    checkProbeStaleness(meta, path, maxStaleRatio, strictStaleness)
    val effPlanes =
      resolvePlanes(meta, planes, path, "lshMultiProbeTopKFromIndex")
    val ps = hyperplanes(dim, effPlanes, seed)
    val q = query.select(col(queryVecCol).as("__qvec"))
      .withColumn("__b", lshCode(col("__qvec"), ps))
    val base = q.select(col("__b")).head().getLong(0)
    val probeSet = base +: (0 until effPlanes).map(p => base ^ (1L << p))
    spark.read.parquet(s"$path/vectors")
      .filter(col("__lsh_bucket").isin(probeSet: _*)) // partition pruning
      .crossJoin(broadcast(q.select(col("__qvec"))))
      .withColumn("score", cosine(col(vecCol), col("__qvec")))
      .transform(rankable)
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), col("score"))
  }

  /** Probe a persisted LSH index: one partition-pruned scan of the
    * query's bucket directory, exact rerank.
    */
  def lshTopKFromIndex(
      spark: org.apache.spark.sql.SparkSession, path: String,
      idCol: String, vecCol: String,
      query: DataFrame, queryVecCol: String,
      dim: Int, k: Int = 10, planes: Int = 8, seed: Long = 42L,
      maxStaleRatio: Double = DefaultMaxStaleRatio,
      strictStaleness: Boolean = false): DataFrame = {
    val meta = readIndexMeta(spark, path)
    requireMetaMatch(meta, "kind", "lsh", path) // wrong-kind fails fast
    requireMetaMatch(meta, "dim", dim.toString, path)
    requireMetaMatch(meta, "seed", seed.toString, path)
    requireMetaMatch(meta, "planes", planes.toString, path)
    checkProbeStaleness(meta, path, maxStaleRatio, strictStaleness)
    val ps = hyperplanes(dim, planes, seed)
    val q = query.select(col(queryVecCol).as("__qvec"))
      .withColumn("__b", lshCode(col("__qvec"), ps))
    val bucket = q.select(col("__b")).head().getLong(0)
    spark.read.parquet(s"$path/vectors")
      .filter(col("__lsh_bucket") === bucket) // partition pruning
      .crossJoin(broadcast(q.select(col("__qvec"))))
      .withColumn("score", cosine(col(vecCol), col("__qvec")))
      .transform(rankable)
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), col("score"))
  }

  // -------------------------------------------------- batched probes

  /** Batched LSH top-k — the retrieval shape for EVALUATING an index
    * (r13 verdict #2: every probe API was single-query, and per-probe
    * cost is dominated by fixed per-query overhead a batch amortizes
    * to nothing). One distributed pass: both sides code in a
    * projection, the bucket join pairs each query with ITS bucket's
    * candidates only, and [[graft.operators.TopN.topNPerKey]] folds
    * per-query heaps map-side — no driver loop, no per-query jobs, no
    * collect of anything but the final Q·k rows. The query side
    * BROADCASTS (eval sets are small by contract — the
    * [[knnClassify]] discipline); the corpus streams once however
    * large. A single-query call is exactly batch-of-one (spec-pinned
    * against [[lshTopK]]). Query ids must be UNIQUE — a duplicated id
    * multiplies its pair stream and double-counts rows inside one
    * heap (the collect-based batches fail fast on it; the distributed
    * ones fail fast too — [[requireUniqueQueryIds]], one small job
    * over the query side, which is bounded by the broadcast contract
    * anyway; r14 advice).
    *
    * @return (query_id, idCol, score) — k rows per query, ties
    *         (score desc, id asc) like every probe in the family.
    */
  def lshTopKBatch(
      embeddings: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      dim: Int, k: Int = 10, planes: Int = 8, seed: Long = 42L): DataFrame = {
    requireUniqueQueryIds(queries, queryIdCol, "lshTopKBatch")
    val ps = hyperplanes(dim, planes, seed)
    // norms hoist into per-SIDE projections: a batch pairs each corpus
    // row with many queries, so per-pair cosine() would recompute both
    // norms per PAIR (the q50 lesson, batch edition — measured 54 s on
    // q211's sf10 shape before the hoist). dot/(n_a·n_b) is the same
    // expression cosine() expands to, so scores stay bit-equal.
    val bucketed = embeddings.select(col(idCol), col(vecCol))
      .withColumn("__lsh_bucket", lshCode(col(vecCol), ps))
      .withColumn("__norm", norm(col(vecCol)))
    val q = queries.select(col(queryIdCol).as("query_id"),
        col(queryVecCol).as("__qvec"))
      .withColumn("__lsh_bucket", lshCode(col("__qvec"), ps))
      .withColumn("__qnorm", norm(col("__qvec")))
    val scored = bucketed.join(broadcast(q), "__lsh_bucket")
      .select(col("query_id"), col(idCol),
        (dot(col(vecCol), col("__qvec")) /
          (col("__norm") * col("__qnorm"))).as("score"))
    graft.operators.TopN.topNPerKey(rankable(scored), Seq("query_id"),
      Seq(col("score") * -1, col(idCol)), k)
  }

  /** [[lshTopKBatch]] over a persisted [[writeLshIndex]] layout: the
    * scan is pruned to the UNION of the batch's bucket directories
    * (the distinct query codes — bounded driver metadata, ≤ one long
    * per query), then the bucket join fans candidates back out to
    * their queries. Probe cost is paid once per batch: one manifest
    * read, one staleness check, one pruned scan.
    */
  def lshTopKBatchFromIndex(
      spark: org.apache.spark.sql.SparkSession, path: String,
      idCol: String, vecCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      dim: Int, k: Int = 10, planes: Int = 0, seed: Long = 42L,
      maxStaleRatio: Double = DefaultMaxStaleRatio,
      strictStaleness: Boolean = false): DataFrame = {
    requireUniqueQueryIds(queries, queryIdCol, "lshTopKBatchFromIndex")
    val meta = readIndexMeta(spark, path)
    requireMetaMatch(meta, "kind", "lsh", path)
    requireMetaMatch(meta, "dim", dim.toString, path)
    requireMetaMatch(meta, "seed", seed.toString, path)
    checkProbeStaleness(meta, path, maxStaleRatio, strictStaleness)
    val effPlanes =
      resolvePlanes(meta, planes, path, "lshTopKBatchFromIndex")
    val ps = hyperplanes(dim, effPlanes, seed)
    val q = queries.select(col(queryIdCol).as("query_id"),
        col(queryVecCol).as("__qvec"))
      .withColumn("__lsh_bucket", lshCode(col("__qvec"), ps))
      .withColumn("__qnorm", norm(col("__qvec")))
    val buckets = q.select(col("__lsh_bucket")).distinct()
      .collect().map(_.getLong(0)).toSeq // ≤ one code per query
    val scored = spark.read.parquet(s"$path/vectors")
      .filter(col("__lsh_bucket").isin(buckets: _*)) // partition pruning
      .withColumn("__norm", norm(col(vecCol))) // once per ROW, not pair
      .join(broadcast(q), "__lsh_bucket")
      .select(col("query_id"), col(idCol),
        (dot(col(vecCol), col("__qvec")) /
          (col("__norm") * col("__qnorm"))).as("score"))
    graft.operators.TopN.topNPerKey(rankable(scored), Seq("query_id"),
      Seq(col("score") * -1, col(idCol)), k)
  }

  /** Batched query-directed budget probing over a persisted LSH index
    * — [[lshMultiProbeTopKBudgetFromIndex]] for a query FRAME: every
    * query's signed projections compute in ONE distributed pass and
    * collect (Q·planes doubles — bounded metadata), probe sets derive
    * driver-side ([[probeMasks]] margin ordering, identical to the
    * single-query path), the scan prunes to the UNION of all probe
    * buckets, and the (query, bucket) join fans candidates to their
    * queries for a per-query exact rerank. Batch-of-one is
    * row-identical to the single-query API (spec-pinned).
    */
  def lshMultiProbeTopKBudgetBatchFromIndex(
      spark: org.apache.spark.sql.SparkSession, path: String,
      idCol: String, vecCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      dim: Int, k: Int = 10, planes: Int = 0, probes: Int = 8,
      seed: Long = 42L,
      maxStaleRatio: Double = DefaultMaxStaleRatio,
      strictStaleness: Boolean = false,
      maxCollectQueries: Int = 10000): DataFrame = {
    require(probes >= 1, s"probe budget must be >= 1 (got $probes)")
    val meta = readIndexMeta(spark, path)
    requireMetaMatch(meta, "kind", "lsh", path)
    requireMetaMatch(meta, "dim", dim.toString, path)
    requireMetaMatch(meta, "seed", seed.toString, path)
    val effPlanes =
      resolvePlanes(meta, planes, path, "lshMultiProbeTopKBudgetBatchFromIndex")
    checkProbeStaleness(meta, path, maxStaleRatio, strictStaleness)
    val ps = hyperplanes(dim, effPlanes, seed)
    // one distributed pass computes every query's per-plane signed
    // projections; Q·planes doubles collect — the probe-planning
    // metadata, maxCollectQueries-guarded like the PQ batch
    val projRows = queries
      .select(col(queryIdCol).as("query_id"),
        array(ps.map(p =>
          dot(col(queryVecCol), typedlit(p.toSeq))): _*).as("__dots"))
      .limit(maxCollectQueries + 1).collect()
    require(projRows.length <= maxCollectQueries,
      s"query batch exceeds maxCollectQueries = $maxCollectQueries — " +
        "probe planning collects Q x planes projections driver-side; " +
        "shard the batch or raise the guard knowingly")
    // duplicate ids would multiply the scored join and stuff the same
    // corpus rows into one query's heap — fail fast, naming them
    val dupIds = projRows.groupBy(_.get(0))
      .collect { case (id, rs) if rs.length > 1 => id }
    require(dupIds.isEmpty,
      s"duplicate query ids in the batch: ${dupIds.take(5).mkString(", ")}" +
        " — deduplicate the query frame (each id ranks once)")
    val probePairs = projRows.flatMap { row =>
      val dots = row.getSeq[Double](1)
      val base = codeOf(dots)
      (base +: probeMasks(dots, probes).map(base ^ _))
        .map(code => (row.get(0), code))
    }
    val qSchema = org.apache.spark.sql.types.StructType(Seq(
      queries.schema(queryIdCol).copy(name = "query_id"),
      org.apache.spark.sql.types.StructField("__lsh_bucket",
        org.apache.spark.sql.types.LongType, nullable = false)))
    val qProbe = spark.createDataFrame(
      java.util.Arrays.asList(probePairs.map { case (id, c) =>
        org.apache.spark.sql.Row(id, c) }: _*), qSchema)
    val qVec = queries.select(col(queryIdCol).as("query_id"),
        col(queryVecCol).as("__qvec"))
      .withColumn("__qnorm", norm(col("__qvec")))
    val buckets = probePairs.map(_._2).distinct.toSeq
    val scored = spark.read.parquet(s"$path/vectors")
      .filter(col("__lsh_bucket").isin(buckets: _*)) // partition pruning
      .withColumn("__norm", norm(col(vecCol))) // once per ROW, not pair
      .join(broadcast(qProbe), "__lsh_bucket")
      .join(broadcast(qVec), "query_id")
      .select(col("query_id"), col(idCol),
        (dot(col(vecCol), col("__qvec")) /
          (col("__norm") * col("__qnorm"))).as("score"))
    graft.operators.TopN.topNPerKey(rankable(scored), Seq("query_id"),
      Seq(col("score") * -1, col(idCol)), k)
  }

  /** Batched IVF top-k: the corpus assigns once, each query joins only
    * its `nprobe` nearest cells (the probe explode is Q·nprobe rows,
    * broadcast), exact rerank per query via map-side heaps. The
    * batched analogue of [[ivfTopK]] — one corpus scan for the whole
    * batch instead of one per query.
    */
  def ivfTopKBatch(
      embeddings: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      nlist: Int, nprobe: Int = 2, k: Int = 10,
      iters: Int = 3, seed: Long = 42L): DataFrame = {
    require(nprobe > 0, s"nprobe must be positive (got $nprobe) — an " +
      "empty probe set would silently return zero rows")
    requireUniqueQueryIds(queries, queryIdCol, "ivfTopKBatch")
    val sizedNlist =
      if (nlist == 0) autoNlist(embeddings.count()) else nlist
    val centroids =
      ivfCentroids(embeddings, idCol, vecCol, sizedNlist, iters, seed)
    val assigned = assignClusters(embeddings, vecCol, centroids)
      .withColumn("__norm", norm(col(vecCol)))
    val q = queries.select(col(queryIdCol).as("query_id"),
      col(queryVecCol).as("__qvec"))
    val qProbes = assignClustersProbe(q, "__qvec", centroids,
        math.min(nprobe, centroids.length))
      .select(col("query_id"), col("__qvec"),
        norm(col("__qvec")).as("__qnorm"),
        explode(col("__probes")).as("__cluster"))
    val scored = assigned.join(broadcast(qProbes), "__cluster")
      .select(col("query_id"), col(idCol),
        (dot(col(vecCol), col("__qvec")) /
          (col("__norm") * col("__qnorm"))).as("score"))
    graft.operators.TopN.topNPerKey(rankable(scored), Seq("query_id"),
      Seq(col("score") * -1, col(idCol)), k)
  }

  /** [[ivfTopKBatch]] over a persisted [[writeIvfIndex]] layout: probe
    * cells derive from the stored centroid metadata in one distributed
    * projection, the vector scan prunes to the UNION of the batch's
    * probe directories, and the cell join fans candidates to their
    * queries. One manifest read + one pruned scan per batch.
    */
  def ivfTopKBatchFromIndex(
      spark: org.apache.spark.sql.SparkSession, path: String,
      idCol: String, vecCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      nprobe: Int = 2, k: Int = 10,
      maxStaleRatio: Double = DefaultMaxStaleRatio,
      strictStaleness: Boolean = false): DataFrame = {
    import spark.implicits._
    require(nprobe > 0, s"nprobe must be positive (got $nprobe) — an " +
      "empty probe set would silently return zero rows")
    requireUniqueQueryIds(queries, queryIdCol, "ivfTopKBatchFromIndex")
    val meta = readIndexMeta(spark, path)
    requireMetaMatch(meta, "kind", "ivf", path) // wrong-kind fails fast
    checkProbeStaleness(meta, path, maxStaleRatio, strictStaleness)
    val centroids: Seq[Seq[Double]] =
      spark.read.parquet(s"$path/centroids")
        .as[(Int, Seq[Double])].collect().sortBy(_._1).map(_._2).toSeq
    require(centroids.nonEmpty, s"no centroids at $path — not an IVF " +
      "index (build it with writeIvfIndex)")
    val q = queries.select(col(queryIdCol).as("query_id"),
      col(queryVecCol).as("__qvec"))
    val qProbes = assignClustersProbe(q, "__qvec", centroids,
        math.min(nprobe, centroids.length))
      .select(col("query_id"), col("__qvec"),
        norm(col("__qvec")).as("__qnorm"),
        explode(col("__probes")).as("__cluster"))
    val cells = qProbes.select(col("__cluster")).distinct()
      .collect().map(_.getInt(0)).toSeq // ≤ Q·nprobe ints
    val scored = spark.read.parquet(s"$path/vectors")
      .filter(col("__cluster").isin(cells: _*)) // partition pruning
      .withColumn("__norm", norm(col(vecCol))) // once per ROW, not pair
      .join(broadcast(qProbes), "__cluster")
      .select(col("query_id"), col(idCol),
        (dot(col(vecCol), col("__qvec")) /
          (col("__norm") * col("__qnorm"))).as("score"))
    graft.operators.TopN.topNPerKey(rankable(scored), Seq("query_id"),
      Seq(col("score") * -1, col(idCol)), k)
  }

  // ------------------------------------------------------------ IVF

  /** Deterministic IVF index: `nlist` centroids initialized from the
    * vectors with the smallest xxhash64(id, seed) (a deterministic
    * sample), refined with `iters` Lloyd rounds. Only the centroids —
    * nlist×dim doubles, index METADATA like AQE stats — ever reach the
    * driver; assignments stay distributed.
    */
  def ivfCentroids(
      embeddings: DataFrame, idCol: String, vecCol: String,
      nlist: Int, iters: Int = 3, seed: Long = 42L): Seq[Seq[Double]] = {
    require(nlist > 0, "nlist must be positive (0 = auto only at the " +
      "ivfTopK/writeIvfIndex entry points, which resolve it first)")
    // The build re-reads the vectors iters+1 times: persist the id+vec
    // projection for the duration of the build (the same caching
    // discipline as Spark MLlib's KMeans; MEMORY_AND_DISK spills at
    // 100 TB).
    val src = embeddings.select(col(idCol), col(vecCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var centroids: Seq[Seq[Double]] = src
      .orderBy(xxhash64(col(idCol), lit(seed)), col(idCol))
      .limit(nlist)
      .select(transform(col(vecCol), x => x.cast("double")).as("v"))
      .collect().map(_.getSeq[Double](0)).toSeq
    var it = 0
    while (it < iters) {
      val assigned = assignClusters(src, vecCol, centroids)
      // element-wise means per cluster: explode dims, two-level agg —
      // shuffles (cluster, dim) pairs only, never whole vectors twice
      val means = assigned
        .select(col("__cluster"), posexplode(col(vecCol)).as(Seq("__dim", "__x")))
        .groupBy(col("__cluster"), col("__dim"))
        .agg(avg(col("__x").cast("double")).as("__m"))
        .groupBy(col("__cluster"))
        .agg(map_from_arrays(collect_list(col("__dim")),
          collect_list(col("__m"))).as("__dims"))
        .collect()
        .map(r => r.getInt(0) -> r.getMap[Int, Double](1)).toMap
      centroids = centroids.indices.map { c =>
        means.get(c) match {
          case Some(m) => (0 until centroids(c).length).map(d => m(d))
          case None    => centroids(c) // empty cluster keeps its centroid
        }
      }
      it += 1
    }
    src.unpersist()
    centroids
  }

  /** Nearest-centroid assignment as one projection — the native
    * [[graft.functions.NearestCentroid]] argmin kernel (no shuffle,
    * no UDF, no literal matrix in the expression tree). Same
    * summation order and first-minimum tie-break as the former
    * `array_position(dists, array_min(dists))` lambda composition,
    * so assignments are bit-identical; the kernel removed a >15×
    * k-means build bottleneck at sf10 (see the kernel's scaladoc).
    */
  private def assignClusters(
      embeddings: DataFrame, vecCol: String,
      centroids: Seq[Seq[Double]]): DataFrame =
    embeddings.withColumn("__cluster",
      graft.functions.NearestCentroid
        .nearestCentroid(col(vecCol), centroids))

  /** IVF top-k: search only the `nprobe` clusters nearest to the query,
    * rerank candidates exactly by cosine. At 100 TB the assigned table
    * is written partitioned by `__cluster`, so a probe is a
    * partition-pruned scan of nprobe/nlist of the data.
    */
  def ivfTopK(
      embeddings: DataFrame, idCol: String, vecCol: String,
      query: DataFrame, queryVecCol: String,
      nlist: Int, nprobe: Int = 2, k: Int = 10,
      iters: Int = 3, seed: Long = 42L): DataFrame = {
    require(nprobe > 0, s"nprobe must be positive (got $nprobe) — an " +
      "empty probe set would silently return zero rows")
    // nlist = 0 opts into [[autoNlist]] sizing (ceil sqrt n) — the knob
    // the r9 verdict flagged as the next fixed-constant scale cliff
    val sizedNlist =
      if (nlist == 0) autoNlist(embeddings.count()) else nlist
    val centroids =
      ivfCentroids(embeddings, idCol, vecCol, sizedNlist, iters, seed)
    val assigned  = assignClusters(embeddings, vecCol, centroids)
    val q = query.select(col(queryVecCol).as("__qvec"))
    val qAssigned = assignClustersProbe(q, "__qvec", centroids, nprobe)
    assigned.join(broadcast(qAssigned),
        array_contains(col("__probes"), col("__cluster")))
      .withColumn("score", cosine(col(vecCol), col("__qvec")))
      .transform(rankable)
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), col("score"))
  }

  /** Persist an IVF index: the assigned vector table written
    * partitioned by cluster (`$path/vectors/__cluster=N/...`) plus the
    * centroid matrix (`$path/centroids`). This is the 100 TB layout the
    * in-memory [[ivfTopK]] models: once on disk, a probe reads only
    * `nprobe` partition directories — partition pruning, not a scan.
    */
  def writeIvfIndex(
      embeddings: DataFrame, idCol: String, vecCol: String,
      path: String, nlist: Int, iters: Int = 3, seed: Long = 42L): Unit = {
    // nlist = 0 → [[autoNlist]] sizing, as in [[ivfTopK]]
    val sizedNlist =
      if (nlist == 0) autoNlist(embeddings.count()) else nlist
    val centroids =
      ivfCentroids(embeddings, idCol, vecCol, sizedNlist, iters, seed)
    val assigned = assignClusters(embeddings, vecCol, centroids)
      .persist() // one assignment feeds the row counter AND the write
    val n = assigned.count()
    assigned.write.mode("overwrite").partitionBy("__cluster")
      .parquet(s"$path/vectors")
    assigned.unpersist()
    val spark = embeddings.sparkSession
    import spark.implicits._
    centroids.zipWithIndex
      .map { case (c, i) => (i, c) }.toDF("cluster", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    writeIndexManifest(spark, path, Seq(
      "kind" -> "ivf", "nlist" -> sizedNlist.toString,
      "iters" -> iters.toString, "seed" -> seed.toString,
      "columns" -> columnsMeta(embeddings),
      "indexed_rows" -> n.toString, "appended_rows" -> "0"))
  }

  /** Append new vectors to a persisted IVF index WITHOUT a rebuild —
    * the index-freshness path a continuously-ingesting corpus needs
    * (a 100 TB rebuild for each day's arrivals is not a plan). The
    * index's COMMITTED centroids define the assignment, so new
    * vectors route into the existing `__cluster=` directories via a
    * dynamic-partition append (only directories receiving rows are
    * touched); probes see the appended vectors immediately through
    * the same partition-pruned scan. Centroids are NOT refined — the
    * standard freshness/recall trade: as appended mass drifts from
    * the trained centroids, probe recall decays, so rebuild
    * ([[writeIvfIndex]]) when the appended volume rivals the indexed
    * volume or the source distribution shifts. The manifest
    * re-publishes atomically afterward, so [[vacuumIndex]] treats the
    * appended files as committed. `embeddings` must carry the same
    * columns the index was built from; malformed vectors land in the
    * NULL-cluster directory, exactly as at build time. Returns the
    * appended row count.
    */
  def appendToIvfIndex(
      spark: org.apache.spark.sql.SparkSession, path: String,
      embeddings: DataFrame, idCol: String, vecCol: String): Long = {
    import spark.implicits._
    val meta = readIndexMeta(spark, path)
    requireMetaMatch(meta, "kind", "ivf", path)
    // project onto the exact build-time columns (manifest-recorded):
    // a frame missing one fails at analysis time, extras cannot
    // commit a divergent parquet schema into vectors/ (r11 advice)
    val src = meta.get("columns") match {
      case Some(cs) =>
        val buildCols = cs.split(",").toSeq
        require(buildCols.contains(idCol) && buildCols.contains(vecCol),
          s"index at $path was built over columns [$cs] — append " +
            s"called with idCol=$idCol vecCol=$vecCol")
        embeddings.select(buildCols.map(col): _*)
      case None => embeddings // pre-metadata index: legacy behavior
    }
    val centroids: Seq[Seq[Double]] =
      spark.read.parquet(s"$path/centroids")
        .as[(Int, Seq[Double])].collect().sortBy(_._1).map(_._2).toSeq
    require(centroids.nonEmpty, s"no centroids at $path — not an IVF " +
      "index (build it with writeIvfIndex)")
    val assigned = assignClusters(src, vecCol, centroids)
      .persist() // one computation feeds the count AND the write
    val n = assigned.count()
    assigned.write.mode("append").partitionBy("__cluster")
      .parquet(s"$path/vectors")
    assigned.unpersist()
    writeIndexManifest(spark, path, bumpAppendCounter(meta, n))
    n
  }

  /** Probe a persisted IVF index: nearest `nprobe` centroids are
    * picked driver-side from the (nlist×dim) centroid metadata, the
    * vector scan is filtered on the PARTITION column `__cluster` (the
    * physical plan prunes to those directories), candidates rerank
    * exactly by cosine.
    */
  def ivfTopKFromIndex(
      spark: org.apache.spark.sql.SparkSession, path: String,
      idCol: String, vecCol: String,
      query: DataFrame, queryVecCol: String,
      nprobe: Int = 2, k: Int = 10,
      maxStaleRatio: Double = DefaultMaxStaleRatio,
      strictStaleness: Boolean = false): DataFrame = {
    import spark.implicits._
    require(nprobe > 0, s"nprobe must be positive (got $nprobe) — an " +
      "empty probe set would silently return zero rows")
    val meta = readIndexMeta(spark, path)
    requireMetaMatch(meta, "kind", "ivf", path) // wrong-kind fails fast
    checkProbeStaleness(meta, path, maxStaleRatio, strictStaleness)
    val centroids: Seq[(Int, Seq[Double])] =
      spark.read.parquet(s"$path/centroids")
        .as[(Int, Seq[Double])].collect().sortBy(_._1).toSeq
    val qVec = query.select(col(queryVecCol)).head()
      .getSeq[Any](0).map {
        case f: Float  => f.toDouble
        case d: Double => d
        case n: Number => n.doubleValue()
      }
    val probes = centroids
      .map { case (i, c) =>
        i -> c.zip(qVec).map { case (a, b) => (a - b) * (a - b) }.sum
      }
      .sortBy { case (i, d) => (d, i) }.take(nprobe).map(_._1)
    val q = query.select(col(queryVecCol).as("__qvec"))
    spark.read.parquet(s"$path/vectors")
      .filter(col("__cluster").isin(probes: _*)) // partition pruning
      .crossJoin(broadcast(q))
      .withColumn("score", cosine(col(vecCol), col("__qvec")))
      .transform(rankable)
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), col("score"))
  }

  /** The `nprobe` nearest centroids per row, as the native
    * [[graft.functions.TopNCentroids]] kernel (r15: the former
    * `slice(array_sort(zip_with(...)))` lambda carried an nlist×dim
    * literal matrix through codegen and sorted the full distance
    * array per row — fine for 1-row query frames, the LshBandCodes
    * blowup once [[nearDupPairsIvf]] multi-probes the whole corpus).
    * Same accumulation order and (distance, index) tie-break as the
    * lambda, so probe sets are bit-identical (spec-pinned).
    */
  private def assignClustersProbe(
      q: DataFrame, vecCol: String,
      centroids: Seq[Seq[Double]], nprobe: Int): DataFrame =
    q.withColumn("__probes",
      graft.functions.TopNCentroids
        .topNCentroids(col(vecCol), centroids, nprobe))

  /** Exact all-pairs cosine above a threshold (brute force — the
    * oracle-matchable baseline for embedding near-dup detection).
    * Vectors are L2-normalized once per side BEFORE the cross join, so
    * the O(n²) stage is a dot product only — `cosine()` per pair would
    * recompute both norms for every pair (measured 60s → 4s at 2k
    * vectors).
    *
    * QUADRATIC BY DEFINITION — n²/2 dot products is what "exact
    * all-pairs" means (the r9 sf1 sweep measured the expected ~100×
    * on a 10× corpus). This is the recall oracle for small corpora
    * and validation samples; at scale use [[nearDupPairs]] (LSH
    * buckets, with `planes` grown ~log₂(n) so bucket sizes stay flat)
    * or [[semDedup]].
    */
  def nearDupPairsExact(
      embeddings: DataFrame, idCol: String, vecCol: String,
      minCosine: Double): DataFrame = {
    val unit = embeddings.select(col(idCol).as("id"),
      normalize(col(vecCol)).as("u"))
    val a = unit.select(col("id").as("id_a"), col("u").as("ua"))
    val b = unit.select(col("id").as("id_b"), col("u").as("ub"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("score", dot(col("ua"), col("ub")))
      .filter(col("score") >= minCosine)
      .select(col("id_a"), col("id_b"), round(col("score"), 4).as("score"))
  }

  /** All-pairs cosine above a threshold via LSH buckets (embedding
    * near-dup detection). The DEFAULT (`bands = 0`) is the
    * OR-AMPLIFIED banded generator sized by [[autoBands]] — the r13
    * planted-pair measurement showed a single table missing 56–78 %
    * of true pairs at production thresholds, so recall-sized banding
    * is what a default caller gets; `bands = 1` keeps the legacy
    * single-table path (cheapest candidates, recall (1 − θ/π)^planes
    * — the inlined-plane oracles and candidates-only screens), and an
    * explicit `bands > 1` pins the band count (the q202 oracle).
    *
    * Single-table shape: pairs within the same bucket only — the
    * candidate join key is the bucket code, so the pair count is
    * Σ_bucket n_b², never the global n². Candidates ride a SKINNY
    * (id, bk) self-join (16-byte rows) and vectors come back by id
    * through the broadcast verify — the same exchange discipline as
    * the banded path, unified in r15 (vectors used to ride the bucket
    * self-join at ~8·dim bytes per candidate). Banded shape: see
    * [[nearDupPairsBanded]].
    *
    * `planes` (per band, when banded) must GROW with the corpus:
    * 2^planes buckets over n vectors means n²/2^planes candidate
    * pairs per table at uniform spread, so a fixed plane count
    * degrades toward quadratic as n grows (the r9 sf1 sweep measured
    * 12× on a 10× corpus at planes = 8). Pass `targetBucketSize` to
    * size it AUTOMATICALLY as [[autoPlanes]](count, target) — one
    * metadata-cheap count (skipped when `knownCount` supplies it),
    * then the plane count tracks the corpus.
    *
    * At 100 TB the coded table is written partitioned by `bk`; the
    * self-join is then partition-local with no shuffle.
    */
  def nearDupPairs(
      embeddings: DataFrame, idCol: String, vecCol: String,
      dim: Int, minCosine: Double, planes: Int = 8,
      seed: Long = 42L,
      targetBucketSize: Option[Long] = None,
      bands: Int = 0,
      targetRecall: Double = 0.95,
      maxBands: Int = MaxAutoBands,
      broadcastVectorLimit: Long = 2000000L,
      knownCount: Option[Long] = None,
      contractExactDups: Boolean = false,
      checkpointDir: Option[String] = None,
      maxBucketSize: Long = 0L,
      hubsPerBucket: Int = 3): DataFrame = {
    require(bands >= 0, s"bands must be >= 0 (0 = recall-sized auto; " +
      s"got $bands)")
    // auto sizing only holds for thresholds with a real collision
    // probability p = 1 − θ/π ∈ (0, 1) (r14 advice — bandsForRecall's
    // domain error never named the escape): at minCosine >= 1.0 the
    // surviving pairs are COLINEAR vectors, which code identically in
    // every band, so the single table is lossless there and banding
    // buys nothing; at minCosine <= -1.0 the threshold admits EVERY
    // pair and no LSH screen can help — that is exact-all-pairs work.
    require(bands > 0 || minCosine > -1.0,
      s"minCosine = $minCosine admits every pair — no LSH screen " +
        "helps; use nearDupPairsExact, or pass bands = 1 knowingly " +
        "for the single-table screen")
    lazy val n = knownCount.getOrElse(embeddings.count())
    val r = targetBucketSize.map(t => autoPlanes(n, t)).getOrElse(planes)
    val b =
      if (bands > 0) bands
      else if (minCosine >= 1.0) 1 // lossless at this threshold
      else if (r < 1) 1 // single-bucket degenerate — nothing to band
      else autoBands(minCosine, r, targetRecall, maxBands)
    // the exact-dup contraction is a banded-path concern (the single
    // table is already the cheap screen); exact by construction, see
    // [[nearDupPairsBandedContracted]]
    if (contractExactDups && b > 1)
      return nearDupPairsBandedContracted(embeddings, idCol, vecCol,
        dim, minCosine, bands = b, planesPerBand = r, seed = seed,
        broadcastVectorLimit = broadcastVectorLimit,
        checkpointDir = checkpointDir)
    if (b == 1) {
      // single-table candidates on the SAME skinny-join discipline as
      // the banded path (r14 review #1: the coded projection used to
      // carry the normalized vector through the bucket self-join, so
      // ~8·dim bytes rode per CANDIDATE — exactly the exchange shape
      // the banded path exists to avoid). Candidates join on
      // (id, bk) only; vectors come back by id through the broadcast
      // verify. Same pairs, same scores (dot of the same normalized
      // projections) — one more small join against one less wide
      // exchange. The broadcast decision forces `n` (pass
      // `knownCount` to skip the scan, as on the banded path).
      val ps = hyperplanes(dim, math.max(r, 0), seed)
      val skinny = embeddings.select(col(idCol).as("id"),
        lshCode(col(vecCol), ps).as("bk"))
      val cand = skinny.as("a").join(skinny.as("x"),
          col("a.bk") === col("x.bk") && col("a.id") < col("x.id"))
        .select(col("a.id").as("id_a"), col("x.id").as("id_b"))
      val un0 = embeddings.select(col(idCol).as("id"),
        normalize(col(vecCol)).as("u"))
      val un = if (n <= broadcastVectorLimit) broadcast(un0) else un0
      cand
        .join(un.select(col("id").as("id_a"), col("u").as("ua")),
          Seq("id_a"))
        .join(un.select(col("id").as("id_b"), col("u").as("ub")),
          Seq("id_b"))
        .withColumn("score", dot(col("ua"), col("ub")))
        .filter(col("score") >= minCosine)
        .select(col("id_a"), col("id_b"), col("score"))
    } else
      nearDupPairsBanded(embeddings, idCol, vecCol, dim, minCosine,
        bands = b, planesPerBand = r, seed = seed,
        broadcastVectorLimit = broadcastVectorLimit,
        knownCount = Some(n), maxBucketSize = maxBucketSize,
        hubsPerBucket = hubsPerBucket)
  }

  /** The band count that reaches `targetRecall` for a pair AT the
    * cosine threshold under banded sign-LSH (standard OR-amplification
    * math — Leskovec/Rajaraman/Ullman, MMDS ch. 3, public): a single
    * plane agrees on the pair with p = 1 − θ/π (Goemans–Williamson),
    * a band of `planesPerBand` planes collides with p^r, and B
    * independent bands catch the pair with 1 − (1 − p^r)^B ≥ target →
    * B = ⌈log(1 − target) / log(1 − p^r)⌉. Sized at the THRESHOLD —
    * pairs above it collide strictly more often, so the target is a
    * recall floor. `planesPerBand` stays the cost dial: candidate
    * volume per band is Σ_bucket n_b² ≈ n²/2^r at uniform spread, so
    * raise r for bigger corpora and pay the extra bands this helper
    * then asks for.
    */
  def bandsForRecall(
      minCosine: Double, planesPerBand: Int,
      targetRecall: Double = 0.95): Int = {
    require(minCosine > -1.0 && minCosine < 1.0,
      s"minCosine must be in (-1, 1), got $minCosine")
    require(planesPerBand >= 1, s"planesPerBand must be >= 1")
    require(targetRecall > 0.0 && targetRecall < 1.0,
      s"targetRecall must be in (0, 1), got $targetRecall")
    val p  = 1.0 - math.acos(minCosine) / math.Pi
    val pr = math.pow(p, planesPerBand)
    math.max(1, math.ceil(math.log1p(-targetRecall) /
      math.log1p(-pr)).toInt)
  }

  /** Analytic pair recall of a COMMITTED sign-LSH band family at a
    * cosine threshold: P(candidate) = 1 − (1 − p^r)^B with
    * p = 1 − acos(c)/π (the MMDS ch. 3 banding curve) — the number
    * the capped-banding warning logs, exposed so a committed family
    * can be AUDITED anywhere instead of the figure scrolling by once
    * in a log (r16 verdict #5: the semdedup store's manifest records
    * it at init/rebuild, [[IncrementalSemDedup.familyPairRecall]]
    * reads it back). This is the recall of the BANDED generator
    * alone: a hybrid store/operator's IVF leg adds data-dependent
    * recall on top (measure it — `hybrid_recall_r16`), and
    * verification never subtracts (precision stays 1).
    */
  def bandedPairRecall(
      minCosine: Double, planesPerBand: Int, bands: Int): Double = {
    require(planesPerBand >= 1,
      s"planesPerBand must be >= 1 (got $planesPerBand)")
    require(bands >= 1, s"bands must be >= 1 (got $bands)")
    val c = math.max(-1.0, math.min(1.0, minCosine))
    val p = 1.0 - math.acos(c) / math.Pi
    1.0 - math.pow(1.0 - math.pow(p, planesPerBand), bands)
  }

  /** The default-band cap: [[bandsForRecall]] grows ~1/p^r, which at
    * LOW thresholds is geometric in the plane count — at minCosine =
    * 0.35 and the plane count a 200k-row corpus wants, the 0.95 target
    * asks for hundreds of bands (the classic n^(1+ρ) LSH wall: sign-LSH
    * simply cannot deliver high recall at low thresholds
    * subquadratically). 64 bands bounds the default candidate volume;
    * a capped call logs the recall it actually bought.
    */
  val MaxAutoBands: Int = 64

  /** Recall-sized band count with the [[MaxAutoBands]] safety valve:
    * [[bandsForRecall]] when affordable, else the cap plus a logged
    * warning carrying the ACHIEVED recall floor 1 − (1 − p^r)^cap so
    * the degradation is visible, not silent. Callers out of the
    * default regime pick their own trade: raise `maxBands`, lower
    * `targetRecall`, lower the threshold's plane count (more
    * candidates per band), or contract exact dups first.
    */
  private[graft] def autoBands(
      minCosine: Double, planesPerBand: Int,
      targetRecall: Double = 0.95, maxBands: Int = MaxAutoBands): Int = {
    require(maxBands >= 1, s"maxBands must be >= 1 (got $maxBands)")
    val want = bandsForRecall(minCosine, planesPerBand, targetRecall)
    if (want <= maxBands) want
    else {
      val achieved = bandedPairRecall(minCosine, planesPerBand, maxBands)
      log.warn(f"recall-sized banding wants $want bands for " +
        f"recall $targetRecall%.2f at cosine >= $minCosine%.2f with " +
        f"$planesPerBand planes/band — capped at $maxBands (recall " +
        f"floor $achieved%.3f). Raise maxBands/lower targetRecall " +
        "knowingly, or lower the per-band plane count.")
      maxBands
    }
  }

  /** All-pairs cosine above a threshold via BANDED hyperplane LSH —
    * the OR-amplified candidate generator high thresholds need. A
    * SINGLE sign-LSH table's pair recall decays geometrically in its
    * plane count — P(same bucket) = (1 − θ/π)^planes ≈ 0.21 for a
    * cosine-0.85 pair at planes = 8, so [[nearDupPairs]] misses ~4 of
    * 5 true near-dup pairs at production thresholds (measured on
    * planted clusters: BENCH_sf1_spot.json `planted_pair_recall_r13`).
    * Banding is the same OR-amplification [[Dedup.lshBandKeys]] uses
    * over MinHash: `bands` INDEPENDENT plane families of
    * `planesPerBand` planes each; a pair is a candidate when it
    * collides in ANY band (P = 1 − (1 − p^r)^B — size B with
    * [[bandsForRecall]]); exact verification keeps precision at 1.
    *
    * Scale posture: candidates come from a skinny (id, band, code)
    * self-join — 24-byte rows, vectors never enter the candidate
    * exchange (they join back by id for the verify, the PPJoin
    * discipline) — and dedupe AFTER the broadcast verify (r16: a
    * pair colliding in several bands scores redundantly map-side,
    * which costs far less than hash-exchanging the multiplied
    * candidate stream the old distinct-first order paid — measured
    * 1.6–1.7× across both threshold regimes,
    * `banded_dedup_order_r16`; past `broadcastVectorLimit` the order
    * flips back, see [[verifyThenDedup]]). The verify joins
    * BROADCAST the normalized-vector
    * table up to `broadcastVectorLimit` rows (the
    * [[Graph.triangleCounts]] adjacency discipline): a shuffle-join
    * verify would ship one ~8·dim-byte vector per CANDIDATE — at
    * sf10's 240M candidates that is a ~120 GB exchange (measured: it
    * filled this host's disk), vs a ~107 MB one-time broadcast of the
    * 204k-row table the candidates stream against map-side. Candidate
    * volume itself is B·Σ_bucket n_b² with an irreducible
    * random-collision floor B·n²/2^(r+1) — r must grow ~2·log₂(n) to
    * hold it near-linear and [[bandsForRecall]] then asks for more
    * bands (the classic n^(1+ρ) LSH trade) — so past the corpus size
    * where that stays affordable, contract exact dups first
    * ([[Dedup]]'s discipline), shard the corpus, or take the IVF
    * route (cluster-local exact pairs). All band planes come from ONE
    * [[hyperplanes]] draw — band b uses rows [b·r, (b+1)·r) — so band
    * 0 of (bands = B, r) buckets EXACTLY like a single-table run at
    * `planes = r` (spec-pinned superset).
    */
  def nearDupPairsBanded(
      embeddings: DataFrame, idCol: String, vecCol: String,
      dim: Int, minCosine: Double,
      bands: Int = 6, planesPerBand: Int = 0,
      seed: Long = 42L, targetBucketSize: Long = 128L,
      broadcastVectorLimit: Long = 2000000L,
      knownCount: Option[Long] = None,
      maxBucketSize: Long = 0L,
      hubsPerBucket: Int = 3): DataFrame = {
    require(bands >= 1, s"bands must be >= 1 (got $bands)")
    // the count feeds only auto sizing + the broadcast-verify decision
    // — a caller that already knows n (or cached a count upstream)
    // passes it and saves a full input scan (r13 verdict #5)
    val n = knownCount.getOrElse(embeddings.count())
    val r = if (planesPerBand > 0) planesPerBand
      else autoPlanes(n, targetBucketSize)
    // dedup order (r16): under the broadcast verify the candidate
    // stream flows map-side, so the per-pair dedup moves AFTER the
    // threshold filter — distinct-first hash-exchanged every
    // colliding candidate (sub-threshold ones included) where
    // verify-then-distinct exchanges only the multiplied survivor
    // set. Measured on the banded candidates alone
    // (`banded_dedup_order_r16`): 102 → 59 s at the capped
    // 64-band/0.35 regime and 16.8 → 10.5 s at the recall-sized
    // 13×8/0.85 family, identical pair sets. Past
    // `broadcastVectorLimit` the helper flips to distinct-first,
    // exactly the old plan — there the verify joins themselves
    // exchange, so shrinking their input wins.
    verifyThenDedup(embeddings, idCol, vecCol,
      bandedCandidatesRaw(embeddings, idCol, vecCol, dim, bands, r,
        seed, maxBucketSize, hubsPerBucket),
      minCosine, n, broadcastVectorLimit)
  }

  /** The banded candidate stream, PRE-distinct (a pair colliding in
    * several bands surfaces once per band): skinny (id, band, code)
    * self-join, 24-byte rows, vectors never enter the exchange —
    * shared by [[nearDupPairsBanded]] (distinct-then-verify) and
    * [[nearDupPairsHybrid]] (union with the IVF stream, then the
    * shared verify-then-distinct).
    *
    * OPT-IN skew valve (r14 verdict #7): one giant NEAR-dup cluster
    * (boilerplate embeddings) lands whole in the same bucket of
    * EVERY band, and exact-dup contraction cannot touch it (the
    * vectors differ) — a 5k-member cluster is 12.5M verify pairs,
    * quadratic and irreducible as long as every pair must be emitted
    * (they ARE true pairs; `skew_cluster_r15`). Buckets past
    * `maxBucketSize` therefore switch to HUB candidates: every
    * member pairs with the bucket's `hubsPerBucket` SMALLEST ids —
    * linear volume per oversized bucket, and dedup CONNECTIVITY
    * survives because a genuine near-dup cluster verifies against
    * its own hubs (the first cut truncated oversized buckets to
    * their smallest ids instead, and measured semDedup then KEPT
    * 80 % of a planted 5k cluster — the same ids were kept in every
    * band, so tail members never paired with anything; the hub shape
    * is what the dedup caller needs). Hub candidates are a SUBSET of
    * the uncapped bucket's pairs, so precision is untouched;
    * pair-MINING recall inside oversized buckets deliberately drops
    * to the K-hub star. K > 1 matters because a bucket's min id can
    * be an LSH FALSE POSITIVE (r15 advice): a collider that fails
    * verification against the genuine cluster would, as the only
    * hub, leave that band contributing ZERO connectivity — with K
    * small hubs the cluster stays connected unless ALL K are
    * non-members, at linear extra cost. Logged census (one extra
    * aggregation over the skinny table — opt-in, the default path
    * pays nothing).
    */
  private[graft] def bandedCandidatesRaw(
      embeddings: DataFrame, idCol: String, vecCol: String,
      dim: Int, bands: Int, planesPerBand: Int, seed: Long,
      maxBucketSize: Long, hubsPerBucket: Int): DataFrame = {
    require(hubsPerBucket >= 1,
      s"hubsPerBucket must be >= 1 (got $hubsPerBucket)")
    val all = hyperplanes(dim, bands * planesPerBand, seed)
    // ALL band codes in one kernel pass (bit-equal to per-band
    // lshCode slices — see the kernel scaladoc; the per-band lambda
    // projection was the dominant term of the 64-band default at
    // sf10: 57k literal doubles in generated code)
    val skinny0 = embeddings
      .select(col(idCol).as("id"),
        graft.functions.LshBandCodes
          .lshBandCodes(col(vecCol), all, planesPerBand).as("__codes"))
      .select(col("id"),
        posexplode(col("__codes")).as(Seq("__band", "__code")))
    if (maxBucketSize > 0) {
      val oversized = skinny0
        .groupBy(col("__band"), col("__code"))
        .agg(count(lit(1)).as("__n")).filter(col("__n") > maxBucketSize)
        .count()
      if (oversized > 0)
        log.warn(s"nearDupPairsBanded: $oversized buckets exceed " +
          s"maxBucketSize = $maxBucketSize — emitting hub " +
          s"($hubsPerBucket smallest-id) candidates instead of all " +
          "pairs there; within-bucket pair-mining recall drops to " +
          "the star, dedup connectivity rides the hubs (the " +
          "documented skew-cap trade)")
      val wp = org.apache.spark.sql.expressions.Window
        .partitionBy(col("__band"), col("__code"))
      val wo = wp.orderBy(col("id"))
      val sized = skinny0
        .withColumn("__bn", count(lit(1)).over(wp))
        .withColumn("__rk", row_number().over(wo))
      val small = sized.filter(col("__bn") <= maxBucketSize)
        .select(col("id"), col("__band"), col("__code"))
      val smallPairs = small.as("a").join(small.as("x"),
          col("a.__band") === col("x.__band") &&
            col("a.__code") === col("x.__code") &&
            col("a.id") < col("x.id"))
        .select(col("a.id").as("id_a"), col("x.id").as("id_b"))
      val over = sized.filter(col("__bn") > maxBucketSize)
      val hubs = over.filter(col("__rk") <= hubsPerBucket)
        .select(col("id").as("__hub"), col("__band"), col("__code"))
      // every member pairs with each smaller-id hub (hub-hub pairs
      // included via the same inequality) — K·n_b rows per bucket
      val hubPairs = hubs.join(
          over.select(col("id"), col("__band"), col("__code")),
          Seq("__band", "__code"))
        .filter(col("__hub") < col("id"))
        .select(col("__hub").as("id_a"), col("id").as("id_b"))
      smallPairs.unionByName(hubPairs)
    } else
      skinny0.as("a").join(skinny0.as("x"),
          col("a.__band") === col("x.__band") &&
            col("a.__code") === col("x.__code") &&
            col("a.id") < col("x.id"))
        .select(col("a.id").as("id_a"), col("x.id").as("id_b"))
  }

  /** [[nearDupPairsBanded]] behind an EXACT-DUPLICATE contraction —
    * the first escape hatch the banded scaladoc names for corpora
    * past `broadcastVectorLimit`: web-scale crawls are full of
    * byte-identical embeddings (mirrored pages, boilerplate), every
    * one of which lands in the same bucket of EVERY band and inflates
    * the candidate volume quadratically per group. Contract them
    * first (group by the vector VALUE, keep the min id as
    * representative — [[Dedup.exactDedup]]'s discipline lifted to
    * vectors), run the banded generation on representatives only, and
    * expand membership after.
    *
    * The expansion is EXACT, not approximate: an identical vector has
    * identical band codes, so member pairs collide iff their rep pair
    * collides, and identical vectors normalize identically, so every
    * expanded pair's verified score equals what the uncontracted run
    * would compute — cross-group pairs inherit the rep pair's score,
    * within-group pairs score dot(u, u) of the shared vector
    * (spec-pinned and oracle-replayed equal to the uncontracted run
    * on planted exact dups). Auto sizing (`planesPerBand = 0`) sizes
    * off the REP count — the table the candidates actually join over.
    *
    * Scale shape: one shuffle of (vector → min id) to build the
    * membership, the banded generation over reps (the contraction is
    * exactly what shrinks its Σ n_b² candidate floor), and two skinny
    * (rep → member) joins for the expansion whose output is pair
    * rows the uncontracted run would have emitted anyway.
    */
  def nearDupPairsBandedContracted(
      embeddings: DataFrame, idCol: String, vecCol: String,
      dim: Int, minCosine: Double,
      bands: Int = 6, planesPerBand: Int = 0,
      seed: Long = 42L, targetBucketSize: Long = 128L,
      broadcastVectorLimit: Long = 2000000L,
      checkpointDir: Option[String] = None): DataFrame = {
    // the membership projection feeds SIX lineage branches (reps into
    // the banded generation + self-scores, members into both sides of
    // both expansions) — persist it for the call so the vector-keyed
    // window runs ONCE, and return an eagerly-materialized result so
    // no cache outlives the call (the ivfPqTopK discipline)
    val withRep = embeddings
      .select(col(idCol).as("id"), col(vecCol).as("__v"))
      .withColumn("rep", min(col("id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("__v"))))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val members = withRep.select(col("id"), col("rep"))
    val reps = withRep.filter(col("id") === col("rep"))
      .select(col("id").as(idCol), col("__v").as(vecCol))
    val repPairs = nearDupPairsBanded(reps, idCol, vecCol, dim,
      minCosine, bands, planesPerBand, seed, targetBucketSize,
      broadcastVectorLimit)
    // cross-group: every member pair inherits its rep pair's score
    val inter = repPairs
      .join(members.select(col("rep").as("id_a"), col("id").as("__ma")),
        "id_a")
      .join(members.select(col("rep").as("id_b"), col("id").as("__mb")),
        "id_b")
      .select(least(col("__ma"), col("__mb")).as("id_a"),
        greatest(col("__ma"), col("__mb")).as("id_b"), col("score"))
    // within-group: identical vectors always collide; the score the
    // uncontracted run computes for them is dot(u, u) of the shared
    // vector (≈ 1, exactly the normalized self-dot — same expression)
    val selfScore = reps.select(col(idCol).as("rep"),
      element_at(transform(array(normalize(col(vecCol))), u =>
        dot(u, u)), 1).as("score"))
    val intra = members.as("x")
      .join(members.as("y"),
        col("x.rep") === col("y.rep") && col("x.id") < col("y.id"))
      .join(selfScore, col("x.rep") === selfScore("rep"))
      .filter(col("score") >= minCosine)
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        col("score"))
    // materialize eagerly so the 6-branch lineage runs ONCE and the
    // persist can release. localCheckpoint lives in EXECUTOR storage —
    // fine single-node, but on a real cluster an executor loss after
    // return kills the truncated lineage, so callers there pass
    // `checkpointDir` for a reliable FS checkpoint (the
    // [[Graph.connectedComponents]] pattern; r14 review #2)
    val merged = inter.unionByName(intra)
    val out = checkpointDir match {
      case Some(dir) =>
        embeddings.sparkSession.sparkContext.setCheckpointDir(dir)
        merged.checkpoint(true)
      case None => merged.localCheckpoint(true)
    }
    withRep.unpersist()
    out
  }

  /** All-pairs cosine above a threshold via IVF cells — the THIRD
    * escape hatch the banded scaladoc names, now callable (r14
    * verdict #5): cluster-local exact pairs for the low-threshold
    * regime where banding hits the [[MaxAutoBands]] wall. At
    * minCosine ≈ 0.35 the 0.95 recall target wants hundreds of bands
    * (the n^(1+ρ) sign-LSH wall — [[autoBands]] warns a recall floor
    * it cannot fix), but low-threshold pairs are exactly the ones a
    * coarse k-means geometry catches: every vector is assigned to its
    * `nprobe` nearest cells (multi-probe replication, which is what
    * recovers pairs straddling a cell boundary), candidates are pairs
    * sharing ANY cell, verification is the same exact normalized dot
    * as every generator in the family.
    *
    * Exactness configuration: at `nprobe = nlist` every pair shares
    * every cell, so the operator degenerates to exact all-pairs — the
    * oracle-able config (q216), the same proof pattern as the IVF-PQ
    * q205. Recall at production configs is DATA-dependent (a pair is
    * found iff the probe sets intersect) — unlike banding there is no
    * threshold-only recall formula, so measure on planted pairs
    * (`ivf_pairs_r15` in BENCH_sf1_spot.json) rather than assume.
    *
    * Scale posture: the probe table is skinny (id, cell) — nprobe
    * rows of 12 bytes per vector; candidates come from its self-join,
    * so the volume is Σ_cell n_c² over nprobe-replicated assignments
    * (nlist sizes it: [[autoNlist]] at `nlist = 0` keeps E[n_c] ≈
    * √n·nprobe); vectors enter only through the broadcast verify
    * under `broadcastVectorLimit`, the banded discipline. At 100 TB
    * write the probed table partitioned by `__cell` and the self-join
    * is partition-local.
    */
  def nearDupPairsIvf(
      embeddings: DataFrame, idCol: String, vecCol: String,
      minCosine: Double, nlist: Int, nprobe: Int = 2,
      iters: Int = 3, seed: Long = 42L,
      broadcastVectorLimit: Long = 2000000L,
      knownCount: Option[Long] = None): DataFrame = {
    require(nprobe > 0, s"nprobe must be positive (got $nprobe) — an " +
      "empty probe set would find zero pairs")
    val n = knownCount.getOrElse(embeddings.count())
    val sizedNlist = if (nlist == 0) autoNlist(n) else nlist
    val centroids =
      ivfCentroids(embeddings, idCol, vecCol, sizedNlist, iters, seed)
    val cand = ivfCandidatesRaw(embeddings, idCol, vecCol, centroids,
      nprobe)
    verifyThenDedup(embeddings, idCol, vecCol, cand, minCosine, n,
      broadcastVectorLimit)
  }

  /** The IVF candidate stream, PRE-distinct (a pair sharing k probed
    * cells surfaces k times): every vector replicates to its nprobe
    * nearest cells — a skinny (id, cell) probe table, 12-byte rows —
    * and candidates are the cell-local self-join. Shared by
    * [[nearDupPairsIvf]], [[nearDupPairsIvfFromIndex]], and
    * [[nearDupPairsHybrid]].
    */
  private[graft] def ivfCandidatesRaw(
      embeddings: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[Seq[Double]], nprobe: Int): DataFrame = {
    val probed = assignClustersProbe(
        embeddings.select(col(idCol).as("id"), col(vecCol).as("__v")),
        "__v", centroids, math.min(nprobe, centroids.length))
      .select(col("id"), explode(col("__probes")).as("__cell"))
    probed.as("a").join(probed.as("x"),
        col("a.__cell") === col("x.__cell") && col("a.id") < col("x.id"))
      .select(col("a.id").as("id_a"), col("x.id").as("id_b"))
  }

  /** Exact verification of a MULTIPLIED candidate stream (a pair may
    * surface several times); where the dedup goes matters enormously.
    * Under the broadcast verify the candidate stream flows MAP-SIDE
    * through both vector joins and the threshold filter, so deduping
    * the tiny ≥-threshold survivor set is nearly free —
    * verify-then-distinct. Deduping FIRST would hash-exchange the
    * whole multiplied candidate stream (measured: a distinct-first
    * cut at the full-probe exactness config spent 729 s at sf1,
    * where the 207M-pair brute oracle runs in 29 s — the 828M-row
    * distinct WAS the query). The k-fold redundant dot products cost
    * far less than shuffling the rows they score. Past
    * `broadcastVectorLimit` the verify joins themselves exchange, so
    * there distinct-first shrinks what they ship.
    */
  private[graft] def verifyThenDedup(
      embeddings: DataFrame, idCol: String, vecCol: String,
      cand: DataFrame, minCosine: Double, n: Long,
      broadcastVectorLimit: Long,
      preNormalized: Boolean = false): DataFrame = {
    // `preNormalized` skips the normalize for callers whose vector
    // column already holds unit vectors (the semdedup store's `u`) —
    // re-normalizing would divide by sqrt(dot(u, u)), which is 1 only
    // up to rounding, so scores could drift an ulp from what the
    // original ingest verified (and from the u-coded oracle replay)
    val un0 = embeddings.select(col(idCol).as("id"),
      (if (preNormalized) col(vecCol)
       else normalize(col(vecCol))).as("u"))
    if (n <= broadcastVectorLimit) {
      val un = broadcast(un0)
      cand
        .join(un.select(col("id").as("id_a"), col("u").as("ua")),
          Seq("id_a"))
        .join(un.select(col("id").as("id_b"), col("u").as("ub")),
          Seq("id_b"))
        .withColumn("score", dot(col("ua"), col("ub")))
        .filter(col("score") >= minCosine)
        .select(col("id_a"), col("id_b"), col("score"))
        .distinct() // identical scores per pair — safe to dedupe last
    } else
      cand.distinct()
        .join(un0.select(col("id").as("id_a"), col("u").as("ua")),
          Seq("id_a"))
        .join(un0.select(col("id").as("id_b"), col("u").as("ub")),
          Seq("id_b"))
        .withColumn("score", dot(col("ua"), col("ub")))
        .filter(col("score") >= minCosine)
        .select(col("id_a"), col("id_b"), col("score"))
  }

  /** [[nearDupPairsIvf]] over a persisted [[writeIvfIndex]] layout —
    * repeated pair-mining runs skip the k-means build (r15 verdict
    * #6: the scaladoc's "persist the probed table" posture was prose,
    * not a callable): the COMMITTED centroids load from the index's
    * metadata table (nlist×dim doubles — driver-side metadata, the
    * ivfTopKFromIndex discipline), every indexed vector multi-probes
    * through the [[graft.functions.TopNCentroids]] kernel in one
    * distributed pass, and candidates/verification are the shared
    * [[nearDupPairsIvf]] plan. Row-identical to the in-memory
    * operator at the same (nlist, iters, seed) over the same corpus
    * (spec-pinned — [[ivfCentroids]] is deterministic). The row
    * count for the broadcast-verify decision comes from the
    * manifest's indexed/appended counters — no counting scan.
    * Appended vectors participate through the same staleness gate as
    * every FromIndex probe: centroids do NOT retrain on append, so
    * past `maxStaleRatio` rebuild first ([[rebuildIvfIndex]]).
    */
  def nearDupPairsIvfFromIndex(
      spark: org.apache.spark.sql.SparkSession, path: String,
      idCol: String, vecCol: String,
      minCosine: Double, nprobe: Int = 2,
      broadcastVectorLimit: Long = 2000000L,
      maxStaleRatio: Double = DefaultMaxStaleRatio,
      strictStaleness: Boolean = false): DataFrame = {
    import spark.implicits._
    require(nprobe > 0, s"nprobe must be positive (got $nprobe) — an " +
      "empty probe set would find zero pairs")
    val meta = readIndexMeta(spark, path)
    requireMetaMatch(meta, "kind", "ivf", path)
    checkProbeStaleness(meta, path, maxStaleRatio, strictStaleness)
    val centroids: Seq[Seq[Double]] =
      spark.read.parquet(s"$path/centroids")
        .as[(Int, Seq[Double])].collect().sortBy(_._1).map(_._2).toSeq
    require(centroids.nonEmpty, s"no centroids at $path — not an IVF " +
      "index (build it with writeIvfIndex)")
    val vecs = spark.read.parquet(s"$path/vectors")
    val n = (for {
      i <- meta.get("indexed_rows"); a <- meta.get("appended_rows")
    } yield i.toLong + a.toLong).getOrElse(vecs.count())
    val cand = ivfCandidatesRaw(vecs, idCol, vecCol, centroids, nprobe)
    verifyThenDedup(vecs, idCol, vecCol, cand, minCosine, n,
      broadcastVectorLimit)
  }

  /** UNION of the banded and IVF candidate generators in front of the
    * shared exact verify — the hybrid the r15 recall study motivates
    * (`ivf_pairs_r15`): in the low-threshold regime the two
    * generators miss DIFFERENT pairs (banding capped at
    * [[MaxAutoBands]] measured 0.779 total recall; IVF at production
    * probes 1.0 on cluster-shaped mass but 0.21 on diffuse mid-cosine
    * mass), so their union buys recall neither can reach alone at
    * production cost. Precision stays 1 — every candidate verifies
    * against the same normalized dot — and the output is EXACTLY the
    * union of the two parents' outputs at the same parameters
    * (spec-pinned), which also inherits the exactness oracle: at
    * `nprobe = nlist` the IVF side alone is provably exact all-pairs
    * (q217, the q216 proof pattern).
    *
    * Scale posture: both candidate streams are skinny self-joins
    * (24-byte banded rows, 12-byte probe rows) feeding ONE
    * verify-then-distinct under `broadcastVectorLimit` — the
    * multiplied union dedupes AFTER the map-side verify, never as a
    * pre-verify exchange. The corpus codes once per generator (one
    * LshBandCodes pass, one TopNCentroids pass) — still linear scans,
    * and the k-means build is the same [[ivfCentroids]] cost the IVF
    * parent pays.
    */
  def nearDupPairsHybrid(
      embeddings: DataFrame, idCol: String, vecCol: String,
      dim: Int, minCosine: Double,
      bands: Int = 0, planesPerBand: Int = 4,
      targetRecall: Double = 0.95, maxBands: Int = MaxAutoBands,
      nlist: Int = 0, nprobe: Int = 2, iters: Int = 3,
      seed: Long = 42L,
      broadcastVectorLimit: Long = 2000000L,
      knownCount: Option[Long] = None,
      maxBucketSize: Long = 0L,
      hubsPerBucket: Int = 3): DataFrame = {
    require(bands >= 0, s"bands must be >= 0 (0 = recall-sized auto; " +
      s"got $bands)")
    require(bands > 0 || minCosine > -1.0,
      s"minCosine = $minCosine admits every pair — no LSH screen " +
        "helps; use nearDupPairsExact")
    require(nprobe > 0, s"nprobe must be positive (got $nprobe) — an " +
      "empty probe set would find zero pairs")
    val n = knownCount.getOrElse(embeddings.count())
    val b =
      if (bands > 0) bands
      else if (minCosine >= 1.0) 1
      else autoBands(minCosine, planesPerBand, targetRecall, maxBands)
    val sizedNlist = if (nlist == 0) autoNlist(n) else nlist
    val centroids =
      ivfCentroids(embeddings, idCol, vecCol, sizedNlist, iters, seed)
    val cand = bandedCandidatesRaw(embeddings, idCol, vecCol, dim,
        b, planesPerBand, seed, maxBucketSize, hubsPerBucket)
      .unionByName(
        ivfCandidatesRaw(embeddings, idCol, vecCol, centroids, nprobe))
    verifyThenDedup(embeddings, idCol, vecCol, cand, minCosine, n,
      broadcastVectorLimit)
  }

  /** SemDeDup-style semantic dedup (Abbas et al., arXiv:2303.09540):
    * drop every embedding whose vector is near-duplicate — cosine ≥
    * `minCosine` — of a kept one, resolving chains transitively. The
    * pipeline is [[nearDupPairs]] (LSH-bucketed candidates, exact
    * cosine verify) → [[Graph.connectedComponents]] over the pair
    * graph → keep each cluster's smallest id plus every unpaired row.
    * Pairs alone under-delete: A~B and B~C must drop both B and C
    * even when A!~C directly — same reason [[Dedup.fuzzyDedup]]
    * closes over text pairs.
    *
    * The DEFAULT candidate generator (`bands = 0`) is recall-sized
    * OR-amplified banding — the r13 planted-pair measurement showed
    * the single-table default missing 56–78 % of true pairs at
    * production thresholds, i.e. a "dedup" that silently keeps most
    * duplicates. `bands = 1` keeps the legacy single-table generator
    * (cheapest, known-lossy); `bands > 1` pins the count. See
    * [[nearDupPairs]].
    *
    * Scale posture inherits from the parts: the candidate join is
    * Σ_bucket n_b² per band (never global n²), the closure shuffles
    * 16-byte (id, label) pairs only, and the final anti-join keys on
    * the id — embeddings themselves never move after the coded
    * projection. Pass `checkpointDir` on a real cluster (see
    * [[Graph.connectedComponents]]).
    */
  def semDedup(
      embeddings: DataFrame, idCol: String, vecCol: String,
      dim: Int, minCosine: Double, planes: Int = 8,
      seed: Long = 42L, maxIter: Int = 20,
      checkpointDir: Option[String] = None,
      targetBucketSize: Option[Long] = None,
      bands: Int = 0,
      contractExactDups: Boolean = false,
      targetRecall: Double = 0.95,
      maxBands: Int = MaxAutoBands,
      broadcastVectorLimit: Long = 2000000L,
      knownCount: Option[Long] = None,
      maxBucketSize: Long = 0L,
      hubsPerBucket: Int = 3): DataFrame = {
    // every banded knob passes through to the generator (r14 verdict
    // item: a default semDedup call paid the auto-size count() scan
    // that nearDupPairs(knownCount) exists to skip, and a caller in
    // the capped low-threshold regime had to drop an API level to
    // raise the band budget); defaults unchanged
    val pairs =
      nearDupPairs(embeddings, idCol, vecCol, dim, minCosine, planes,
        seed, targetBucketSize, bands,
        targetRecall = targetRecall, maxBands = maxBands,
        broadcastVectorLimit = broadcastVectorLimit,
        knownCount = knownCount,
        contractExactDups = contractExactDups,
        checkpointDir = checkpointDir,
        maxBucketSize = maxBucketSize,
        hubsPerBucket = hubsPerBucket)
        .select(col("id_a"), col("id_b"))
    val losers = Graph
      .connectedComponents(pairs, "id_a", "id_b", maxIter, checkpointDir)
      .filter(col("id") =!= col("component"))
      .select(col("id").as(idCol))
    embeddings.join(losers, Seq(idCol), "left_anti")
  }

  /** [[semDedup]] over the HYBRID candidate generator
    * ([[nearDupPairsHybrid]]) — the low-threshold semantic dedup the
    * r16 recall study motivates: at minCosine ≈ 0.35 the banded
    * default caps at [[MaxAutoBands]] with a 0.779 total pair recall
    * (`hybrid_recall_r16`), i.e. a "dedup" that keeps pairs the
    * union generator would have caught. Same survivor rule (closure
    * over the pair graph, keep each component's min id plus every
    * unpaired row), richer pair graph — so the result is a SUBSET of
    * plain `semDedup`'s survivors at the same banded family (extra
    * edges only merge components; spec-pinned), and at the
    * `nprobe = nlist` exactness config it equals the closure over
    * EXACT all-pairs (the q219 oracle — the strongest semantic-dedup
    * statement in the family: survivors of the TRUE near-dup graph,
    * no generator recall caveat at all).
    *
    * Scale posture inherits from the parts: two linear coding passes
    * (band codes + probe cells), skinny candidate self-joins, ONE
    * shared verify-then-distinct under `broadcastVectorLimit`, a
    * 16-byte-edge closure, and an id-keyed anti-join.
    */
  def semDedupHybrid(
      embeddings: DataFrame, idCol: String, vecCol: String,
      dim: Int, minCosine: Double,
      bands: Int = 0, planesPerBand: Int = 4,
      targetRecall: Double = 0.95, maxBands: Int = MaxAutoBands,
      nlist: Int = 0, nprobe: Int = 2, iters: Int = 3,
      seed: Long = 42L, maxIter: Int = 20,
      checkpointDir: Option[String] = None,
      broadcastVectorLimit: Long = 2000000L,
      knownCount: Option[Long] = None,
      maxBucketSize: Long = 0L,
      hubsPerBucket: Int = 3): DataFrame = {
    val pairs = nearDupPairsHybrid(embeddings, idCol, vecCol, dim,
        minCosine, bands, planesPerBand, targetRecall, maxBands,
        nlist, nprobe, iters, seed, broadcastVectorLimit, knownCount,
        maxBucketSize, hubsPerBucket)
      .select(col("id_a"), col("id_b"))
    val losers = Graph
      .connectedComponents(pairs, "id_a", "id_b", maxIter, checkpointDir)
      .filter(col("id") =!= col("component"))
      .select(col("id").as(idCol))
    embeddings.join(losers, Seq(idCol), "left_anti")
  }

  // ------------------------------------------- index maintenance

  /** Publish a rebuilt index subdirectory: the staged dir replaces the
    * live one via two renames (live → `_old_<sub>` → delete). Renames
    * are per-directory metadata ops, so the data never rewrites — but
    * there IS a brief no-live-dir window between them: rebuilds assume
    * no concurrent probe of the same index (a prober that loses the
    * race retries; the manifest republish after the swap is what
    * commits the rebuild for [[vacuumIndex]]). Staged/old names are
    * `_`-prefixed so [[writeIndexManifest]]'s file census never counts
    * them as data.
    */
  private[ml] def swapIndexDir(
      spark: org.apache.spark.sql.SparkSession, path: String,
      sub: String): Unit = swapIndexDirs(spark, path, Seq(sub))

  /** Publish SEVERAL rebuilt subdirectories as one swap, retiring
    * EVERY live dir before publishing ANY staged one (r14 advice: the
    * IVF rebuild's two independent swaps had a window where NEW
    * cluster assignments were live against OLD centroids — a probe in
    * that window, or a crash leaving it behind, silently mis-probed
    * with nothing to detect the mismatch). With retire-first ordering
    * every crash window leaves a MISSING subdir instead of a mixed
    * pair: probes fail loudly on the absent path, and recovery is
    * mechanical — restore the `_old_<sub>` dirs by renaming them back
    * (they persist until the final cleanup), or re-run the rebuild,
    * whose staged writes use mode(overwrite). The manifest republish
    * AFTER the swap is what commits the rebuild for [[vacuumIndex]];
    * its ghost-file guard refuses to sweep an index whose swap never
    * completed.
    */
  private[graft] def swapIndexDirs(
      spark: org.apache.spark.sql.SparkSession, path: String,
      subs: Seq[String]): Unit = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def live(sub: String)   = new Path(path, sub)
    def old(sub: String)    = new Path(path, s"_old_$sub")
    def staged(sub: String) = new Path(path, s"_staged_$sub")
    subs.foreach { s =>
      require(fs.exists(staged(s)), s"no staged rebuild at ${staged(s)}")
    }
    subs.foreach { s =>
      if (fs.exists(old(s))) fs.delete(old(s), true)
      if (fs.exists(live(s)))
        require(fs.rename(live(s), old(s)), s"could not retire ${live(s)}")
    }
    subs.foreach { s =>
      require(fs.rename(staged(s), live(s)),
        s"could not publish ${staged(s)} (pre-rebuild dirs preserved " +
          s"at _old_<sub> under $path — rename back to recover)")
    }
    subs.foreach(s => fs.delete(old(s), true))
  }

  /** Rebuild a persisted LSH index IN PLACE from its current contents
    * — the remedy the probe-time staleness warning points at (r13
    * verdict #3: append-only indexes had no path back to freshness
    * short of a manual export + rebuild). The vectors re-code under a
    * fresh plane count — `planes` explicit, or [[autoPlanes]] when
    * `targetBucketSize` is set (the reason LSH goes stale: the corpus
    * outgrew the directory fan-out), or the manifest's recorded count
    * — into a staged directory, then swap + manifest republish with
    * `indexed_rows` = everything now indexed and `appended_rows` = 0.
    * Codes are pure functions of (dim, planes, seed), so the rebuilt
    * index is ROW-IDENTICAL to a from-scratch [[writeLshIndex]] over
    * the same contents (spec-pinned). Returns the indexed row count.
    */
  def rebuildLshIndex(
      spark: org.apache.spark.sql.SparkSession, path: String,
      idCol: String, vecCol: String,
      planes: Int = 0,
      targetBucketSize: Option[Long] = None): Long = {
    val meta = readIndexMeta(spark, path)
    require(meta.contains("kind"),
      s"no manifest metadata at $path — pre-metadata index; rebuild " +
        "once with writeLshIndex to upgrade it")
    requireMetaMatch(meta, "kind", "lsh", path)
    val dim  = meta("dim").toInt
    val seed = meta("seed").toLong
    val buildCols = meta("columns").split(",").toSeq
    require(buildCols.contains(idCol) && buildCols.contains(vecCol),
      s"index at $path was built over columns [${meta("columns")}] — " +
        s"rebuild called with idCol=$idCol vecCol=$vecCol")
    val src = spark.read.parquet(s"$path/vectors")
      .select(buildCols.map(col): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = src.count()
    val newPlanes =
      if (planes > 0) planes
      else targetBucketSize.map(t => autoPlanes(n, t))
        .getOrElse(meta("planes").toInt)
    src.withColumn("__lsh_bucket",
        lshCode(col(vecCol), hyperplanes(dim, newPlanes, seed)))
      .write.mode("overwrite").partitionBy("__lsh_bucket")
      .parquet(s"$path/_staged_vectors")
    src.unpersist()
    swapIndexDir(spark, path, "vectors")
    writeIndexManifest(spark, path, Seq(
      "kind" -> "lsh", "dim" -> dim.toString,
      "planes" -> newPlanes.toString, "seed" -> seed.toString,
      "columns" -> meta("columns"),
      "indexed_rows" -> n.toString, "appended_rows" -> "0"))
    n
  }

  /** Rebuild a persisted IVF index IN PLACE from its current contents:
    * centroids RE-TRAIN over everything now in the index (the
    * staleness decay is exactly that appended mass routed through
    * frozen centroids — see [[appendToIvfIndex]]), vectors re-assign
    * into a staged layout, swap + manifest republish with reset
    * counters. `nlist` < 0 keeps the manifest's recorded count, 0
    * re-derives [[autoNlist]] from the CURRENT row count (the right
    * default after heavy growth), > 0 pins it. Training is the same
    * deterministic [[ivfCentroids]] the writer uses, so the rebuilt
    * index probes row-identically to a from-scratch [[writeIvfIndex]]
    * over the same contents (spec-pinned). Returns the indexed count.
    */
  def rebuildIvfIndex(
      spark: org.apache.spark.sql.SparkSession, path: String,
      idCol: String, vecCol: String,
      nlist: Int = -1): Long = {
    import spark.implicits._
    val meta = readIndexMeta(spark, path)
    require(meta.contains("kind"),
      s"no manifest metadata at $path — pre-metadata index; rebuild " +
        "once with writeIvfIndex to upgrade it")
    requireMetaMatch(meta, "kind", "ivf", path)
    val iters = meta("iters").toInt
    val seed  = meta("seed").toLong
    val buildCols = meta("columns").split(",").toSeq
    require(buildCols.contains(idCol) && buildCols.contains(vecCol),
      s"index at $path was built over columns [${meta("columns")}] — " +
        s"rebuild called with idCol=$idCol vecCol=$vecCol")
    val src = spark.read.parquet(s"$path/vectors")
      .select(buildCols.map(col): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = src.count()
    val sizedNlist =
      if (nlist > 0) nlist
      else if (nlist == 0) autoNlist(n)
      else meta("nlist").toInt
    val centroids = ivfCentroids(src, idCol, vecCol, sizedNlist,
      iters, seed)
    assignClusters(src, vecCol, centroids)
      .write.mode("overwrite").partitionBy("__cluster")
      .parquet(s"$path/_staged_vectors")
    centroids.zipWithIndex
      .map { case (c, i) => (i, c) }.toDF("cluster", "centroid")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$path/_staged_centroids")
    src.unpersist()
    // one retire-first swap over BOTH subdirs — never a live window
    // pairing new assignments with old centroids (r14 advice)
    swapIndexDirs(spark, path, Seq("vectors", "centroids"))
    writeIndexManifest(spark, path, Seq(
      "kind" -> "ivf", "nlist" -> sizedNlist.toString,
      "iters" -> iters.toString, "seed" -> seed.toString,
      "columns" -> meta("columns"),
      "indexed_rows" -> n.toString, "appended_rows" -> "0"))
    n
  }

  case class IndexVacuumResult(
      keptFiles: Long, droppedFiles: Long, droppedDirs: Long)

  /** The committed-build manifest: relative paths of every data file
    * the last [[writeLshIndex]]/[[writeIvfIndex]] produced, published
    * atomically (tmp + rename) at `$path/_manifest`. [[vacuumIndex]]
    * treats anything outside it as an orphan — leftovers from aborted
    * builds, a crashed dynamic-partition refresh, or a concurrent
    * writer that lost the overwrite race.
    *
    * `meta` rows are published as `#meta key=value` header lines ahead
    * of the file list (readers of the file list skip `#` lines): the
    * index LAYOUT parameters (kind, dim/planes/seed or nlist, the
    * build-time column list) so appends can fail fast on a mismatched
    * layout instead of silently writing vectors into wrong partitions
    * (r11 advice), plus indexed/appended row counters so staleness is
    * observable ([[indexStaleness]]).
    */
  private[ml] def writeIndexManifest(
      spark: org.apache.spark.sql.SparkSession, path: String,
      meta: Seq[(String, String)] = Nil): Unit = {
    import org.apache.hadoop.fs.Path
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val files = listIndexFiles(fs, root)
      .map { case (p, _) => relativize(root, p) }.sorted
    meta.foreach { case (k, v) =>
      require(!k.contains('=') && !k.contains('\n') && !v.contains('\n'),
        s"manifest meta key/value must be line-safe: $k=$v")
    }
    val header = meta.map { case (k, v) => s"#meta $k=$v" }
    val tmp = new Path(root, "_manifest.tmp")
    val out = fs.create(tmp, true)
    try out.write((header ++ files).mkString("\n").getBytes("UTF-8"))
    finally out.close()
    val dst = new Path(root, "_manifest")
    // rename WITH overwrite (FileContext — FileSystem.rename has no
    // overwrite flag): a delete-then-rename leaves a window with no
    // manifest at all, in which a concurrent vacuumIndex fails its
    // manifest-exists require
    org.apache.hadoop.fs.FileContext
      .getFileContext(root.toUri, spark.sessionState.newHadoopConf())
      .rename(tmp, dst, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** The manifest's `columns` value: the build-time column list,
    * comma-joined. The decoder is a bare `split(',')`, so a column
    * name containing a comma would corrupt the recorded list and make
    * later appends mis-project (r12 advice) — reject it at build time,
    * where the fix (rename the column) is obvious.
    */
  private[ml] def columnsMeta(df: DataFrame): String = {
    df.columns.foreach { c =>
      require(!c.contains(","),
        s"index column name '$c' contains a comma — the manifest's " +
          "columns list is comma-delimited; rename the column before " +
          "building a managed index over it")
    }
    df.columns.mkString(",")
  }

  /** The `#meta` header of a managed index's `_manifest` as a map —
    * empty for a pre-metadata index (round ≤11 layout) or a missing
    * manifest, so callers degrade to trusting their own parameters.
    */
  private[graft] def readIndexMeta(
      spark: org.apache.spark.sql.SparkSession,
      path: String): Map[String, String] = {
    import org.apache.hadoop.fs.Path
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val manifestPath = new Path(root, "_manifest")
    if (!fs.exists(manifestPath)) Map.empty
    else {
      val in = fs.open(manifestPath)
      try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().filter(_.startsWith("#meta "))
        .flatMap { line =>
          val kv = line.stripPrefix("#meta ")
          kv.indexOf('=') match {
            case -1 => None
            case i  => Some(kv.substring(0, i) -> kv.substring(i + 1))
          }
        }.toMap
      finally in.close()
    }
  }

  /** Require that a caller-supplied layout parameter matches the
    * committed index's manifest value when one is recorded — the
    * fail-fast that keeps an append from writing vectors into
    * partitions a probe computed under a DIFFERENT layout will never
    * read (r11 advice: a mismatched plane count loses the appended
    * vectors silently and permanently).
    */
  private[ml] def requireMetaMatch(
      meta: Map[String, String], key: String, actual: String,
      path: String): Unit =
    meta.get(key).foreach { recorded =>
      require(recorded == actual,
        s"index layout mismatch at $path: built with $key=$recorded, " +
          s"append called with $key=$actual — appended vectors would " +
          "land in partitions probes never read. Pass the build " +
          "parameters (or rebuild the index).")
    }

  /** The effective plane count of a manifest-backed LSH operation:
    * the explicit argument when nonzero, else the manifest's recorded
    * count, validated against the manifest either way — five probe /
    * append entry points carried this block verbatim (r14 review).
    */
  private[ml] def resolvePlanes(
      meta: Map[String, String], planes: Int, path: String,
      caller: String): Int = {
    val eff =
      if (planes != 0) planes
      else meta.getOrElse("planes", sys.error(
        s"$caller(planes = 0) derives the plane count from the " +
          s"manifest, but $path/_manifest records none (pre-metadata " +
          "index — rebuild, or pass planes explicitly)")).toInt
    requireMetaMatch(meta, "planes", eff.toString, path)
    eff
  }

  /** Fail fast on duplicated query ids in a DISTRIBUTED batch probe
    * (r14 advice): a duplicated id merges two different query vectors'
    * candidate streams into ONE top-k heap and silently returns a
    * wrong ranking. The collect-based batches (the budget-probe and
    * PQ planners) already fail fast from their collected metadata;
    * this is the same check run as one small aggregation job over the
    * QUERY side only — bounded by the batch-probe broadcast contract
    * (eval batches are small) and paid before the corpus ever scans.
    */
  private def requireUniqueQueryIds(
      queries: DataFrame, queryIdCol: String, caller: String): Unit = {
    val dups = queries.groupBy(col(queryIdCol))
      .agg(count(lit(1)).as("__n")).filter(col("__n") > 1)
      .select(col(queryIdCol)).limit(5).collect().map(_.get(0))
    require(dups.isEmpty,
      s"$caller: duplicate query ids in the batch: " +
        s"${dups.mkString(", ")} — deduplicate the query frame " +
        "(each id ranks once)")
  }

  /** Only FINITE, non-NULL scores rank. A malformed vector's NULL (or
    * a zero-norm vector's NaN) score would otherwise place by
    * engine-specific null/NaN ordering — and DIFFERENTLY between the
    * orderBy-based single-query probes (nulls last, NaN first) and
    * the heap-based batches (nulls first, NaN last) (r14 review).
    * Applied uniformly across the probe family, so batch-of-one is
    * row-identical by construction and malformed rows simply never
    * rank anywhere.
    */
  private def rankable(scored: DataFrame): DataFrame =
    scored.where(col("score").isNotNull && !isnan(col("score")))

  case class IndexStaleness(
      indexedRows: Long, appendedRows: Long, ratio: Double)

  /** Probe-time staleness threshold: appends ≥ the indexed volume is
    * the manifest's own rebuild signal (see [[indexStaleness]] — for
    * IVF the appended mass is assigned to FROZEN centroids, so recall
    * past this point is quietly degraded).
    */
  val DefaultMaxStaleRatio: Double = 1.0

  private lazy val log =
    org.slf4j.LoggerFactory.getLogger("graft.ml.Similarity")

  /** The warning a probe should surface for a stale index, or None
    * when the index is fresh enough (or pre-metadata — no counters to
    * judge by, the legacy degrade). Exposed so specs can assert the
    * warn/no-warn decision without capturing log output.
    */
  private[graft] def stalenessWarning(
      meta: Map[String, String], path: String,
      maxRatio: Double): Option[String] =
    meta.get("indexed_rows").flatMap { idx =>
      val appended = meta.getOrElse("appended_rows", "0").toLong
      val ratio = appended.toDouble / math.max(idx.toLong, 1L)
      if (ratio < maxRatio) None
      else Some(f"index at $path is stale: $appended rows appended " +
        f"onto ${idx.toLong} indexed (ratio $ratio%.2f >= $maxRatio%.2f) " +
        "— probe recall may be degraded; rebuild with " +
        "writeLshIndex/writeIvfIndex")
    }

  /** Surface staleness AT PROBE TIME (r12 verdict: `indexStaleness`
    * was a pull API only — nothing warned a prober reading an index at
    * ratio ≥ 1.0): log a warning past `maxRatio`, or throw when the
    * caller opted into `strict`. Pre-metadata indexes (no counters)
    * pass silently — there is nothing to judge by, the same legacy
    * degrade as every other manifest consumer.
    */
  private[ml] def checkProbeStaleness(
      meta: Map[String, String], path: String,
      maxRatio: Double, strict: Boolean): Unit =
    stalenessWarning(meta, path, maxRatio).foreach { msg =>
      if (strict) throw new IllegalStateException(
        msg + " (strictStaleness = true)")
      else log.warn(msg)
    }

  /** Staleness report for a managed index: rows appended since the
    * last full build vs rows that build indexed, from the manifest's
    * counters (accumulated across appends, untouched by
    * [[vacuumIndex]] — vacuum never rewrites the manifest). For IVF
    * the ratio is the rebuild signal — appended vectors are assigned
    * to FROZEN centroids, so recall decays as appended mass rivals
    * indexed mass (rebuild around ratio ≥ 1.0); for LSH the layout is
    * derived, not trained, so the ratio only signals when to re-run
    * [[autoPlanes]] sizing. Throws on a pre-metadata index (no
    * counters recorded — rebuild once to upgrade the manifest).
    */
  def indexStaleness(
      spark: org.apache.spark.sql.SparkSession,
      path: String): IndexStaleness = {
    val meta = readIndexMeta(spark, path)
    require(meta.contains("indexed_rows"),
      s"no staleness counters in $path/_manifest — index predates " +
        "manifest metadata; rebuild with writeLshIndex/writeIvfIndex")
    val indexed = meta("indexed_rows").toLong
    val appended = meta.getOrElse("appended_rows", "0").toLong
    IndexStaleness(indexed, appended,
      appended.toDouble / math.max(indexed, 1L))
  }

  /** Remove index files no committed build references: every data file
    * under `path` absent from `_manifest` and older than
    * `minAgeHours` (the grace period protects a build in flight and
    * readers of a snapshot taken before the last overwrite — same
    * 168h default as [[graft.sources.GovernedTable.vacuum]]). Empty
    * partition directories left behind are pruned under the SAME
    * grace period (a dir whose last file was just swept may be a
    * build in flight). `dryRun` reports both counts — files and
    * directories a real run would drop — without deleting.
    */
  def vacuumIndex(
      spark: org.apache.spark.sql.SparkSession, path: String,
      minAgeHours: Int = 168, dryRun: Boolean = false): IndexVacuumResult = {
    import org.apache.hadoop.fs.Path
    require(minAgeHours >= 0, "minAgeHours must be >= 0")
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val manifestPath = new Path(root, "_manifest")
    require(fs.exists(manifestPath),
      s"no _manifest at $path — not a managed index (write it with " +
        "writeLshIndex/writeIvfIndex)")
    val in = fs.open(manifestPath)
    val manifest =
      try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().filter(_.nonEmpty)
        .filterNot(_.startsWith("#")) // `#meta` header lines
        .toSet
      finally in.close()
    val cutoff = System.currentTimeMillis() - minAgeHours * 3600000L
    // listIndexFiles already carries each file's modification time —
    // re-statting every path would cost one metadata RPC per file on
    // an object store and race against concurrent deletes
    val all = listIndexFiles(fs, root)
    // SAFETY NET (r14 review): a rebuild that crashed between its
    // directory swap and the manifest republish leaves a manifest
    // listing files that no longer exist while every LIVE file is
    // manifest-absent — a vacuum would then delete the whole working
    // index. A manifest referencing missing files is exactly that
    // signature; refuse to sweep until the manifest is republished
    // (re-run the rebuild, or writeIndexManifest via a fresh build).
    val present = all.map { case (p, _) => relativize(root, p) }.toSet
    val ghosts = manifest.diff(present)
    require(ghosts.isEmpty,
      s"manifest at $path references ${ghosts.size} missing file(s) " +
        s"(e.g. ${ghosts.take(3).mkString(", ")}) — an interrupted " +
        "rebuild/overwrite; republish the manifest (re-run the " +
        "rebuild) before vacuuming, or every live file would be " +
        "treated as an orphan")
    val (kept, orphans) = all.partition { case (p, mtime) =>
      manifest.contains(relativize(root, p)) || mtime >= cutoff
    }
    // snapshot directory mtimes BEFORE deleting anything: deleting a
    // child bumps the parent's mtime on most filesystems, which would
    // otherwise shield a just-emptied directory from its own sweep
    val dirMtime = scala.collection.mutable.Map.empty[String, Long]
    def snapshot(dir: org.apache.hadoop.fs.Path): Unit =
      fs.listStatus(dir).foreach { st =>
        if (st.isDirectory) {
          dirMtime(st.getPath.toUri.getPath) = st.getModificationTime
          snapshot(st.getPath)
        }
      }
    if (fs.exists(root)) snapshot(root)
    if (!dryRun) orphans.foreach { case (p, _) => fs.delete(p, false) }
    // prune stale _temporary trees from aborted jobs — committers
    // create them under the WRITE TARGET (e.g. $path/vectors/
    // _temporary), so scan every directory level, not just root —
    // and directories the orphan sweep emptied. dryRun COUNTS what a
    // real run would drop (orphan deletion is simulated against the
    // orphan set), and the grace cutoff applies to emptied-dir pruning
    // too: a dir whose last file was just orphan-swept may still be a
    // build in flight about to write its next part.
    var droppedDirs = 0L
    val orphanPaths = orphans.map { case (p, _) => p.toUri.getPath }.toSet
    // a real run recursively deletes stale _temporary trees BEFORE
    // the parent's emptied-dir check, so their contents must not
    // count as live during dryRun either — otherwise a directory
    // whose ONLY content is a stale _temporary tree is reported kept
    // by dryRun but dropped by the real run (ADVICE r10: _temporary
    // files are bookkeeping, never in orphanPaths, so the orphan-set
    // simulation alone cannot see them go)
    val staleTempPrefixes = dirMtime.collect {
      case (p, m) if p.endsWith("/_temporary") && m < cutoff => p
    }.toSeq
    def underStaleTemp(path: String): Boolean =
      staleTempPrefixes.exists(pre => path.startsWith(pre + "/"))
    // live = would survive BOTH sweeps (under dryRun the files are
    // still on disk, so "directory now empty" must be simulated
    // against the orphan set AND the stale-_temporary set)
    def hasLiveFile(dir: org.apache.hadoop.fs.Path): Boolean = {
      val it = fs.listFiles(dir, true)
      while (it.hasNext) {
        val p = it.next().getPath.toUri.getPath
        if (!orphanPaths.contains(p) && !underStaleTemp(p))
          return true
      }
      false
    }
    def sweepDirs(dir: org.apache.hadoop.fs.Path): Unit =
      fs.listStatus(dir).foreach { st =>
        if (st.isDirectory) {
          val mtime = dirMtime.getOrElse(
            st.getPath.toUri.getPath, st.getModificationTime)
          if (st.getPath.getName == "_temporary") {
            if (mtime < cutoff) {
              if (!dryRun) fs.delete(st.getPath, true)
              droppedDirs += 1
            }
          } else {
            sweepDirs(st.getPath)
            if (mtime < cutoff && !hasLiveFile(st.getPath)) {
              if (!dryRun) fs.delete(st.getPath, true)
              droppedDirs += 1
            }
          }
        }
      }
    if (fs.exists(root)) sweepDirs(root)
    IndexVacuumResult(kept.length.toLong, orphans.length.toLong,
      droppedDirs)
  }

  /** Every data file under an index root as (path, mtime): parquet
    * parts under any depth, excluding `_`/`.`-prefixed bookkeeping
    * (manifest, SUCCESS markers, in-flight temporaries).
    */
  private def listIndexFiles(
      fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path):
      Seq[(org.apache.hadoop.fs.Path, Long)] = {
    if (!fs.exists(root)) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(org.apache.hadoop.fs.Path, Long)]
    val it = fs.listFiles(root, true)
    // a segment containing "=" is a partition directory (Spark's
    // `__lsh_bucket=N` / `__cluster=N` start with underscores but are
    // DATA, not bookkeeping); everything else "_"/"."-prefixed is
    // (manifest, _SUCCESS, _temporary, hidden files)
    def bookkeeping(seg: String): Boolean =
      !seg.contains("=") && (seg.startsWith("_") || seg.startsWith("."))
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && !relativize(root, st.getPath)
          .split('/').exists(bookkeeping))
        out += ((st.getPath, st.getModificationTime))
    }
    out.toSeq
  }

  private def relativize(
      root: org.apache.hadoop.fs.Path,
      p: org.apache.hadoop.fs.Path): String = {
    val rootStr = root.toUri.getPath.stripSuffix("/")
    val pStr = p.toUri.getPath
    pStr.stripPrefix(rootStr).stripPrefix("/")
  }
}
