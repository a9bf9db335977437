package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators: source-level controls a training-data
  * pipeline applies before any content-level dedup — the C4 /
  * RefinedWeb "cap documents per domain" step that stops one crawl
  * whale (a forum mirror, a link farm) from dominating the corpus.
  */
object Curation {

  /** Host part of a URL column (the capping key; subdomain-inclusive,
    * as RefinedWeb caps). Null for unparseable URLs.
    */
  def hostOf(url: Column): Column = try_parse_url(url, lit("HOST"))

  /** Keep at most `maxPerDomain` documents per URL host, chosen
    * deterministically as the smallest `idCol` values (stable across
    * runs and retries — no sampling state).
    *
    * Scale posture (100 TB): per-group top-k via the size-capped heap
    * aggregate [[graft.functions.TopK]], not a window. A window
    * (`row_number` over the domain partition) sorts and shuffles
    * every row and puts each hot domain in ONE task — exactly the
    * skew this operator exists to correct. TopK's map-side partial
    * state is a TRUE ≤k heap per (domain, partition) — the former
    * `collect_list`+`slice` two-level formulation buffered the whole
    * group in the aggregation buffer before slicing, so a hot
    * domain's full membership still crossed the first exchange. Only
    * (domain, id) pairs feed the aggregate; the survivor set joins
    * back left_semi on the id.
    */
  def domainCap(
      df: DataFrame, urlCol: String, idCol: String,
      maxPerDomain: Int): DataFrame = {
    require(maxPerDomain >= 1, s"maxPerDomain must be >= 1")
    val winners = df
      .select(hostOf(col(urlCol)).as("__dom"), col(idCol))
      .filter(col("__dom").isNotNull)
      .groupBy(col("__dom"))
      .agg(graft.functions.TopK.topK(col(idCol), maxPerDomain)
        .as("__ids"))
      .select(explode(col("__ids")).as(idCol))
    df.join(winners, Seq(idCol), "left_semi")
  }

  /** Topic-balanced corpus sampling WITHOUT a topic model: documents
    * bucket by the sign pattern of their embedding against `planes`
    * fixed random hyperplanes (the q44/q53 LSH code — semantically
    * close documents share buckets), and each bucket keeps at most
    * `capPerBucket` documents chosen by a deterministic mix64
    * priority of the id (pseudo-random but stable under task retry,
    * and replayable by the DuckDB oracle — no RNG state). This is
    * the semantic analogue of [[domainCap]]: where domain caps
    * de-bias by SOURCE, this de-biases by CONTENT — boilerplate
    * clusters (error pages, templates, near-identical product blurbs)
    * land in the same bucket and get capped as a group, the standard
    * corpus-mixture rebalancing move.
    *
    * Scale posture (100 TB): the bucket code is one stateless
    * projection (no shuffle); the per-bucket cap is ONE groupBy with
    * the size-capped heap aggregate [[graft.functions.TopK]] — map
    * side partial state is a true ≤ `capPerBucket` heap per (bucket,
    * partition), the exchange carries ≤ k·partitions survivors per
    * bucket, and a boilerplate mega-bucket never sorts or ships its
    * full membership (`collect_list`+`slice` would buffer the whole
    * group BEFORE slicing — the exact skew blowup this operator
    * exists to correct). Only (priority, id) pairs ride the shuffle;
    * embeddings never move.
    *
    * `planes = 0` derives the plane count from the corpus cardinality
    * ([[Similarity.autoPlanes]] at `targetBucketSize`): a FIXED plane
    * count caps the kept set at 2^planes·capPerBucket rows forever —
    * at 100 TB that is a near-empty sample, the same fixed-constant
    * cliff the auto-sized LSH join (q188) closed. With auto sizing
    * the bucket count grows ~n/targetBucketSize, so the sample stays
    * a constant FRACTION of a balanced corpus.
    *
    * Returns (idCol, bucket) for the kept documents.
    */
  def semanticBalancedSample(
      embeddings: DataFrame, idCol: String, vecCol: String,
      dim: Int, planes: Int = 0, capPerBucket: Int,
      planeSeed: Long = 42L, sampleSeed: Int = 17,
      targetBucketSize: Long = 128L): DataFrame = {
    require(capPerBucket >= 1, "capPerBucket must be >= 1")
    val sizedPlanes =
      if (planes == 0) Similarity.autoPlanes(embeddings.count(),
        targetBucketSize)
      else planes
    val ps = Similarity.hyperplanes(dim, sizedPlanes, planeSeed)
    val coded = embeddings.select(
      Similarity.lshCode(col(vecCol), ps).as("bucket"),
      graft.functions.Mix64
        .mix64(col(idCol).cast("long"), sampleSeed).as("__pri"),
      col(idCol).as("__id"))
    coded.groupBy(col("bucket"))
      .agg(graft.functions.TopK.topK(
        struct(col("__pri"), col("__id")), capPerBucket).as("__w"))
      .select(col("bucket"), explode(col("__w")).as("__s"))
      .select(col("__s.__id").as(idCol), col("bucket"))
  }

  /** Semantic decontamination: find training documents whose
    * EMBEDDING is near an evaluation-set embedding — the semantic
    * analogue of the n-gram contamination check (q70) and the
    * standard modern complement to it (paraphrased or re-formatted
    * benchmark leaks share no n-grams but sit next to the eval point
    * in embedding space). Returns the contaminated PAIRS
    * (train id, eval id, score) above `minCosine`; compose with a
    * `left_anti` on the train ids to drop them
    * ([[semanticDecontaminate]]).
    *
    * Scale shape: both corpora code into the SAME hyperplane buckets
    * (one stateless projection each), the candidate join is
    * bucket-local — never train×eval — and the eval side of each
    * bucket is small by nature (benchmarks are thousands of rows, the
    * corpus is billions), so AQE broadcasts it. Candidate RECALL is
    * bucket-limited exactly as in [[Similarity.nearDupPairs]] (the
    * documented LSH trade; `planes = 0` auto-sizes from the TRAIN
    * cardinality so bucket volume stays flat as the corpus grows).
    */
  def semanticContaminationPairs(
      train: DataFrame, eval0: DataFrame, idCol: String, vecCol: String,
      dim: Int, minCosine: Double, planes: Int = 0,
      targetBucketSize: Long = 128L, planeSeed: Long = 42L): DataFrame = {
    val sizedPlanes =
      if (planes == 0) Similarity.autoPlanes(train.count(), targetBucketSize)
      else planes
    val ps = Similarity.hyperplanes(dim, sizedPlanes, planeSeed)
    def coded(df: DataFrame) = df.select(
      col(idCol).as("id"),
      Similarity.normalize(col(vecCol)).as("u"),
      Similarity.lshCode(col(vecCol), ps).as("bk"))
    coded(train).as("t").join(coded(eval0).as("e"), Seq("bk"))
      .withColumn("score",
        round(Similarity.dot(col("t.u"), col("e.u")), 4))
      .filter(col("score") >= minCosine)
      .select(col("t.id").as("train_id"), col("e.id").as("eval_id"),
        col("score"))
  }

  /** The filter step over [[semanticContaminationPairs]]: the train
    * frame minus every row whose embedding contaminates against the
    * eval set. One anti-join on the id — at 100 TB only the
    * contaminated-id set (benchmark-sized) crosses the wire.
    */
  def semanticDecontaminate(
      train: DataFrame, eval0: DataFrame, idCol: String, vecCol: String,
      dim: Int, minCosine: Double, planes: Int = 0,
      targetBucketSize: Long = 128L, planeSeed: Long = 42L): DataFrame = {
    val bad = semanticContaminationPairs(train, eval0, idCol, vecCol,
      dim, minCosine, planes, targetBucketSize, planeSeed)
      .select(col("train_id").as(idCol)).distinct()
    train.join(bad, Seq(idCol), "left_anti")
  }

  /** Leak-free deterministic train/valid/test split: the assignment
    * is a pure function of the document KEY (mix64 bucket in [0,
    * 1024)), so a document can never migrate between splits across
    * runs, retries, corpus re-shuffles, or snapshot releases — the
    * property that matters, because a test document that drifts into
    * a later training release silently contaminates every eval on it.
    * Rows land in `valid` on buckets [0, valid1024), `test` on
    * [valid1024, valid1024+test1024), `train` otherwise.
    *
    * Scale posture: a stateless projection — no shuffle, no RNG
    * state, no sampling pass; composes with partition pruning when
    * the split column is used as a write partition.
    */
  def datasetSplit(
      df: DataFrame, keyCol: String,
      valid1024: Int, test1024: Int, seed: Int = 11): DataFrame = {
    require(valid1024 >= 0 && test1024 >= 0 &&
      valid1024 + test1024 <= 1024,
      s"split fractions must fit 1024ths, got valid=$valid1024 test=$test1024")
    val bucket = graft.functions.Mix64
      .mix64(col(keyCol).cast("long"), seed).bitwiseAND(lit(1023L))
    df.withColumn("split",
      when(bucket < valid1024, lit("valid"))
        .when(bucket < valid1024 + test1024, lit("test"))
        .otherwise(lit("train")))
  }

  /** Leakage-free split at NEAR-DUP-CLUSTER granularity: the split
    * key is the document's near-dup component representative
    * ([[Dedup.clusters]] — min id per connected component of the
    * Jaccard pair graph), so two near-duplicate documents can NEVER
    * straddle train/valid/test. [[datasetSplit]] alone is leak-free
    * only against EXACT re-keying — a boilerplate-tail re-crawl of a
    * test document lands in train with probability train-share and
    * silently contaminates every eval on it; splitting by cluster is
    * the standard decontamination posture for LLM corpora.
    *
    * Documents in no cluster (pairless singletons, shingle-less
    * texts) fall back to their own id — bucket assignment for them is
    * IDENTICAL to [[datasetSplit]]'s, so adopting the cluster-aware
    * split re-shuffles only documents that have near-duplicates.
    * Output carries `component` (nullable — the cluster label, for
    * audit) and `split`.
    *
    * Scale posture: everything rides the [[Dedup.clusters]] kernel
    * (LSH-free exact PPJoin with the frequency-capped candidate
    * generation by default, contraction on exact duplicates,
    * accumulator-fold connected components) plus one key join; the
    * split assignment itself stays a stateless projection.
    */
  def clusterAwareSplit(
      df: DataFrame, textCol: String, idCol: String,
      valid1024: Int, test1024: Int, seed: Int = 11,
      shingleSize: Int = 3, numer: Int = 1, denom: Int = 2,
      maxShingleFreq: Option[Long] = Dedup.DefaultMaxShingleFreq): DataFrame = {
    val comps = Dedup.clusters(df, textCol, idCol, shingleSize,
        numer, denom, maxShingleFreq = maxShingleFreq)
      .withColumnRenamed("id", "__ca_id")
    val keyed = df
      .join(comps, col(idCol) === col("__ca_id"), "left")
      .drop("__ca_id")
      .withColumn("__ca_key",
        coalesce(col("component"), col(idCol).cast("long")))
    datasetSplit(keyed, "__ca_key", valid1024, test1024, seed)
      .drop("__ca_key")
  }

  /** Split leakage audit — the REPORT companion of
    * [[clusterAwareSplit]]: given an already-split corpus, find every
    * near-dup pair that straddles two splits and aggregate to one row
    * per (split, split) combination with the pair count and the
    * number of distinct documents involved. A non-empty result on a
    * train/test corpus is exactly the contamination
    * [[clusterAwareSplit]] prevents; run this before trusting any
    * eval on a split you didn't produce cluster-aware.
    *
    * Scale posture: the pair kernel is [[Dedup.jaccardPairs]] (capped
    * candidate generation by default); everything after it touches
    * only the fixed-width pair table — two 8-byte-key joins to attach
    * split labels and two small aggregations.
    */
  def splitLeakageAudit(
      df: DataFrame, textCol: String, idCol: String, splitCol: String,
      shingleSize: Int = 3, numer: Int = 1, denom: Int = 2,
      maxShingleFreq: Option[Long] = Dedup.DefaultMaxShingleFreq): DataFrame = {
    val pairs = Dedup.jaccardPairs(df, textCol, idCol, shingleSize,
        numer, denom, prefixFilter = true, maxShingleFreq)
      .select(col("id_a"), col("id_b"))
    val labels = df.select(col(idCol), col(splitCol))
    val cross = pairs
      .join(labels.select(col(idCol).as("id_a"),
        col(splitCol).as("__sa")), Seq("id_a"))
      .join(labels.select(col(idCol).as("id_b"),
        col(splitCol).as("__sb")), Seq("id_b"))
      .filter(col("__sa") =!= col("__sb"))
      .select(least(col("__sa"), col("__sb")).as("split_a"),
        greatest(col("__sa"), col("__sb")).as("split_b"),
        col("id_a"), col("id_b"))
    // ONE aggregation over the exploded endpoints serves both counts
    // (r17: the straddling-pair table was computed twice — once for
    // the pair count, once for the distinct-doc count — and the two
    // aggregates then re-joined): each pair contributes exactly two
    // endpoint rows with its own (split_a, split_b), so the pair
    // count is the even row count halved, exactly.
    cross
      .select(col("split_a"), col("split_b"),
        explode(array(col("id_a"), col("id_b"))).as("__id"))
      .groupBy(col("split_a"), col("split_b"))
      .agg(expr("count(1) div 2").as("n_pairs"),
        countDistinct(col("__id")).as("n_docs"))
  }

  /** Canonical URL for dedup keying: crawls reach the same page as
    * `HTTP://WWW.Site.COM:80/a/?utm_source=x` and
    * `http://www.site.com/a` — URL-level dedup is worthless without
    * normalization. Rules (the conservative, semantics-preserving
    * set): scheme and host lowercase, userinfo and default ports
    * (http:80, https:443) dropped, trailing path slashes stripped,
    * fragment dropped, tracking params (`utm_*`, `gclid`, `fbclid`)
    * removed, surviving query params sorted. Path and param case is
    * PRESERVED (paths are case-sensitive). Null for rows with no
    * `scheme://host`.
    *
    * Deliberately regex-only — the same ASCII regex family as
    * [[TextAnalysis.redactPii]] — so any engine replays it exactly
    * (`try_parse_url`'s java.net semantics have no DuckDB twin); a
    * single codegen'd projection, no shuffle, no UDF.
    */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val auth   = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    val host   = lower(regexp_extract(auth, "^(?:[^@]*@)?([^:]*)", 1))
    val port   = regexp_extract(auth, ":([0-9]+)$", 1)
    val path   = regexp_replace(
      regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1),
      "/+$", "")
    val query  = regexp_extract(url, "\\?([^#]*)", 1)
    val kept = array_join(array_sort(filter(split(query, "&"), p =>
      length(p) > 0 &&
        !p.rlike("^(utm_[^=&]*|gclid|fbclid)(=[^&]*)?$"))), "&")
    val portPart = when(port === "" ||
        (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"), lit(""))
      .otherwise(concat(lit(":"), port))
    when(scheme === "" || host === "", lit(null).cast("string"))
      .otherwise(concat(scheme, lit("://"), host, portPart, path,
        when(kept === "", lit("")).otherwise(concat(lit("?"), kept))))
  }

  /** Token-window document chunking (the RAG / context-packing step):
    * each document's whitespace tokens are windowed into chunks of
    * `chunkTokens` tokens overlapping by `overlapTokens` (stride =
    * chunk − overlap). Returns one row per chunk: (idCol, chunk_idx,
    * n_tokens, chunk_text). A trailing window that would only repeat
    * tokens the previous chunk already covered is suppressed
    * (`start + overlap ≥ n`), so chunk sets carry no fully-redundant
    * tail; documents with zero tokens produce no rows.
    *
    * Scale posture (100 TB): a stateless generate-and-project — no
    * shuffle, no state, no UDF; the only expansion is the output
    * itself (≈ n/stride chunks per document). Chunk identity
    * (idCol, chunk_idx) is deterministic, so downstream dedup and
    * incremental re-chunking see stable keys across runs.
    */
  def chunkDocuments(
      df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, overlapTokens: Int = 0): DataFrame = {
    require(chunkTokens >= 1, s"chunkTokens must be >= 1 (got $chunkTokens)")
    require(overlapTokens >= 0 && overlapTokens < chunkTokens,
      s"overlapTokens must be in [0, chunkTokens), got $overlapTokens")
    val stride = chunkTokens - overlapTokens
    val toks = filter(split(col(textCol), "\\s+"), x => x =!= "")
    df.select(col(idCol), toks.as("__toks"))
      .withColumn("__n", size(col("__toks")))
      .filter(col("__n") > 0)
      .select(col(idCol), col("__toks"), col("__n"),
        posexplode(sequence(lit(0), col("__n") - 1, lit(stride)))
          .as(Seq("chunk_idx", "__start")))
      .filter(col("__start") === 0 ||
        col("__start") + overlapTokens < col("__n"))
      .select(col(idCol), col("chunk_idx"),
        size(slice(col("__toks"), col("__start") + 1, lit(chunkTokens)))
          .as("n_tokens"),
        array_join(slice(col("__toks"), col("__start") + 1, lit(chunkTokens)),
          " ").as("chunk_text"))
  }

  /** Filter-funnel audit: the per-stage survivor counts of a filter
    * cascade — the number every curation run must publish ("started
    * with 4.1B pages, language filter kept 2.3B, quality kept 1.1B,
    * …") and the first thing checked when a pipeline change shifts
    * output volume. Stage i reports rows entering (survivors of
    * stages 1..i−1), kept (survivors of 1..i), and dropped.
    *
    * Scale posture (100 TB): ONE scan and ONE map-side-combined
    * aggregation — every cumulative predicate is a conditional sum in
    * the same projection, so the cost is a single pass regardless of
    * stage count (running each filter separately would scan the
    * corpus once per stage). The aggregate is a single row; the
    * per-stage explode is trivial. A null predicate result counts as
    * not-kept (SQL CASE semantics).
    */
  def filterFunnel(
      df: DataFrame, stages: Seq[(String, Column)]): DataFrame = {
    require(stages.nonEmpty, "filterFunnel needs at least one stage")
    val cums = stages.scanLeft(lit(true))((acc, s) => acc && s._2).tail
    val counts =
      count(lit(1)).as("__n0") +: cums.zipWithIndex.map { case (c, i) =>
        sum(when(c, 1L).otherwise(0L)).as(s"__n${i + 1}")
      }
    val perStage = stages.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(i + 1).as("stage_idx"), lit(name).as("stage"),
        col(s"__n$i").as("rows_in"), col(s"__n${i + 1}").as("rows_kept"))
    }
    df.agg(counts.head, counts.tail: _*)
      .select(explode(array(perStage: _*)).as("r"))
      .select(col("r.stage_idx").as("stage_idx"), col("r.stage").as("stage"),
        col("r.rows_in").as("rows_in"), col("r.rows_kept").as("rows_kept"),
        (col("r.rows_in") - col("r.rows_kept")).as("rows_dropped"))
  }

  /** Snapshot diff: per-key change status between two corpus
    * snapshots — `added` / `removed` / `changed` / `unchanged` — the
    * release-note census every dataset version bump publishes, and
    * the input to incremental downstream recompute (only `added` +
    * `changed` keys need re-processing). Keys must be unique within
    * each snapshot (pre-dedup otherwise).
    *
    * Scale posture (100 TB): each side reduces to (key, 16-byte MD5
    * of the compared columns) IN THE SCAN PROJECTION, so document
    * payloads never shuffle — the full-outer join moves fixed-width
    * rows only. MD5 (not xxhash64) so any engine replays the
    * fingerprint byte-for-byte; columns are joined with a U+0001
    * separator and nulls mapped to U+0000, making the fingerprint
    * injective on the separator-free case and engine-portable.
    */
  def snapshotDiff(
      oldDf: DataFrame, newDf: DataFrame,
      keyCol: String, compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "snapshotDiff needs compare columns")
    def fp: Column = md5(concat_ws("\u0001",
      compareCols.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*))
    val o = oldDf.select(col(keyCol), fp.as("__fp_old"), lit(1).as("__in_old"))
    val n = newDf.select(col(keyCol), fp.as("__fp_new"), lit(1).as("__in_new"))
    o.join(n, Seq(keyCol), "full_outer")
      .select(col(keyCol),
        when(col("__in_old").isNull, lit("added"))
          .when(col("__in_new").isNull, lit("removed"))
          .when(col("__fp_old") === col("__fp_new"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** Deterministic epoch shuffle: the reproducible global training
    * order. Each document gets a `(shard, pos)` — shard by the
    * epoch-keyed [[graft.functions.Mix64]] of its id, position by the
    * rank of that key within the shard — so every epoch is a fresh
    * pseudo-random permutation that any retry, resumed job, or
    * downstream reader reproduces exactly (no sampling state, no RNG).
    *
    * Scale posture (100 TB): one hash shuffle on the 8-byte key;
    * ranking runs per shard, so `numShards` must be sized like output
    * files — small enough that one shard's (id, key) pairs sort in
    * one task (~1M docs/shard is comfortable; the sort never touches
    * document text). The alternative — a global total order — is the
    * single-task plan this operator exists to avoid.
    */
  def epochShuffle(
      df: DataFrame, idCol: String, epoch: Int,
      numShards: Int): DataFrame = {
    require(numShards >= 1, s"numShards must be >= 1 (got $numShards)")
    import org.apache.spark.sql.expressions.Window
    val key = graft.functions.Mix64.mix64(col(idCol).cast("long"), epoch)
    df.withColumn("__key", key)
      .withColumn("shard",
        pmod(col("__key"), lit(numShards.toLong)).cast("int"))
      .withColumn("pos", (row_number().over(
        Window.partitionBy(col("shard"))
          .orderBy(col("__key"), col(idCol))) - 1).cast("long"))
      .drop("__key")
  }

  /** Token-budget selection: greedily take documents in descending
    * score order until `budgetTokens` is filled — the "fill 1B
    * training tokens with the best-scoring data" cut every curation
    * pipeline ends with. A document is selected when the tokens of
    * all BETTER-scored documents fit strictly under the budget, so
    * the last selected document may overflow it (greedy-fill
    * convention — a budget boundary never splits a document).
    * Returns (idCol, scoreCol, n_tokens, offset) for selected rows;
    * `offset` = tokens consumed before this document.
    *
    * The running total over the score-ranked corpus is the
    * DISTRIBUTED prefix sum (range-repartition by (score desc, id),
    * per-partition running sums, partition-count-sized offsets
    * broadcast back) — same shape as the packing manifest; a global
    * `Window.orderBy` would funnel the corpus through one task.
    */
  def selectToBudget(
      df: DataFrame, idCol: String, tokensCol: String, scoreCol: String,
      budgetTokens: Long, partitions: Int = 0): DataFrame = {
    require(budgetTokens >= 1, "budgetTokens must be positive")
    val p = if (partitions > 0) partitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val order = Seq(col(scoreCol).desc, col(idCol).asc)
    // cached before the range exchange: boundary sampling re-runs
    // the caller's scoring lineage otherwise (packingManifestFrom
    // lesson); three narrow columns, released in the epilogue
    val src = df
      .select(col(idCol), col(scoreCol),
        col(tokensCol).cast("long").as("n_tokens"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val local = src
      .repartitionByRange(p, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("__pid", spark_partition_id())
      // exclusive running sum via the stateful prefix-sum kernel — a
      // window over __pid would re-shuffle the corpus a second time
      // (the packingManifestFrom plan-audit lesson)
      .withColumn("__local",
        graft.functions.PartitionPrefixSum
          .partitionPrefixSum(col("n_tokens")))
      .persist()
    val prefixes = local.groupBy(col("__pid"))
      .agg(sum(col("n_tokens")).as("__t"))
      .withColumn("__prefix",
        coalesce(sum(col("__t")).over(
          Window.partitionBy(pmod(col("__pid"), lit(1)))
            .orderBy(col("__pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__prefix"))
    val out = local.join(broadcast(prefixes), Seq("__pid"))
      .withColumn("offset", col("__local") + col("__prefix"))
      .filter(col("offset") < budgetTokens)
      .select(col(idCol), col(scoreCol), col("n_tokens"), col("offset"))
    // session-cache hygiene (the jaccardPairs contract): materialize
    // the selected subset, release the CacheManager-registered ranked
    // table before returning
    val materialized = out.localCheckpoint()
    local.unpersist()
    src.unpersist()
    materialized
  }

  /** Fixed-point natural log for DSIR weights: `round(ln(k)·10⁶)` for
    * an integer k ≥ 1 — the q115/q179 integer-replay discipline.
    * Once each bucket's log maps to ONE integer, every downstream
    * weight is an exact BIGINT sum: no float addition order, no
    * cross-engine rounding, hash-equal oracles. (The only cross-engine
    * surface left is ln() itself on small-integer inputs, where a
    * 1-ulp divergence would have to land within ~2e-9 of a rounding
    * boundary to matter.)
    */
  private[ml] def ilogPpm(k: Long): Long = {
    require(k >= 1, s"ilogPpm needs k >= 1, got $k")
    math.round(math.log(k.toDouble) * 1e6)
  }

  /** DSIR importance weights (Xie et al., "Data Selection for
    * Language Models via Importance Resampling", NeurIPS 2023): score
    * every raw document by how much more likely its hashed n-gram
    * bag is under the TARGET distribution than under the RAW
    * distribution. Features are the engine's FNV word 1-grams +
    * 2-grams ([[graft.functions.ShingleHashes]] — one kernel pass per
    * row) masked into `buckets` (a power of two); each side fits a
    * Laplace-smoothed (α = 1) unigram model over buckets, and
    *
    *   weight(d) = Σ_{g∈d} [ilog(ct_b(g)+1) − ilog(cr_b(g)+1)]
    *             + |d|·[ilog(Tr+B) − ilog(Tt+B)]
    *
    * in integer MILLIONTHS of a nat ([[ilogPpm]]) — an exact BIGINT
    * sum, so the whole derivation hash-replays in SQL.
    *
    * Scale shape: two aggregations whose shuffles are bounded by
    * `buckets` rows per map partition (partial counts combine
    * map-side), a `buckets`-entry ppm table riding the scoring
    * projection as ONE literal (≤ 64 KiB at the 8192 default), and a
    * second map-only scan of `raw` for the per-document sum. The
    * feature projection is deliberately NOT cached between the two
    * raw scans: recomputing FNV hashes on a rescan is cheaper than
    * materializing a feature column the size of the corpus at 100 TB.
    *
    * @return (idCol, n_feats INT, weight_ppm BIGINT)
    */
  def dsirWeights(
      raw: DataFrame, target: DataFrame,
      idCol: String, textCol: String,
      buckets: Int = 8192): DataFrame = {
    require(buckets > 0 && (buckets & (buckets - 1)) == 0,
      s"buckets must be a power of two (bitmask bucketing), got $buckets")
    val mask = (buckets - 1).toLong
    def feats(df: DataFrame): DataFrame = df.select(col(idCol),
      concat(
        graft.functions.ShingleHashes.shingleHashes(col(textCol), 1),
        graft.functions.ShingleHashes.shingleHashes(col(textCol), 2))
        .as("__g"))
    def bucketCounts(df: DataFrame): Array[Long] = {
      val rows = feats(df)
        .select(explode(col("__g")).as("__h"))
        .groupBy(col("__h").bitwiseAND(lit(mask)).as("__b"))
        .agg(count(lit(1)).as("__c"))
        .collect() // ≤ buckets rows — bounded metadata
      val cnt = new Array[Long](buckets)
      rows.foreach(r => cnt(r.getLong(0).toInt) = r.getLong(1))
      cnt
    }
    val cr = bucketCounts(raw)
    val ct = bucketCounts(target)
    val totalR = cr.sum
    val totalT = ct.sum
    val ratioPpm: Seq[Long] =
      (0 until buckets).map(b => ilogPpm(ct(b) + 1) - ilogPpm(cr(b) + 1))
    val constPpm =
      ilogPpm(totalR + buckets) - ilogPpm(totalT + buckets)
    val table = typedlit(ratioPpm)
    feats(raw).select(col(idCol),
      size(col("__g")).as("n_feats"),
      (aggregate(
        transform(col("__g"), g =>
          element_at(table, g.bitwiseAND(lit(mask)).cast("int") + 1)),
        lit(0L), (acc, x) => acc + x)
        + size(col("__g")).cast("long") * lit(constPpm)).as("weight_ppm"))
  }

  /** The `n` most target-like raw documents by DSIR weight — the
    * deterministic "take the head of the importance ranking" mode
    * (ties break on the id). TakeOrderedAndProject: per-partition
    * heaps, n rows to the driver per partition.
    */
  def dsirTopK(
      raw: DataFrame, target: DataFrame,
      idCol: String, textCol: String, n: Int,
      buckets: Int = 8192): DataFrame =
    dsirWeights(raw, target, idCol, textCol, buckets)
      .orderBy(col("weight_ppm").desc, col(idCol).asc)
      .limit(n)
      .select(col(idCol), col("weight_ppm"))

  /** Gumbel-top-k importance RESAMPLING (the paper's actual sampling
    * mode): add an independent Gumbel(0, 1) key to each document's
    * weight and take the top `n` — equivalent to sampling n documents
    * without replacement with probability ∝ exp(weight). The Gumbel
    * draw is deterministic from the document id ([[graft.functions
    * .Mix64]] → uniform in (0,1) → −ln(−ln(u)), in the same ppm fixed
    * point), so a retry selects the SAME set — sampling state lives
    * in arithmetic, not in RNG objects (the datasetSplit discipline).
    */
  def dsirResample(
      raw: DataFrame, target: DataFrame,
      idCol: String, textCol: String, n: Int,
      buckets: Int = 8192, seed: Int = 42): DataFrame = {
    // the Gumbel key derives from the id CAST TO LONG — an id whose
    // VALUES don't cast (uuids, timestamps rendered as text) would
    // cast to NULL, making every __key NULL and silently degenerating
    // the "resample" into an id-ordered head (r13 advice). Numeric
    // ids cast non-NULL and deterministically; STRING ids with
    // numeric content ("123") do too, so they pass the schema check
    // and any non-numeric VALUE raises in-plan at runtime instead of
    // degenerating (r14 advice: the blanket non-numeric rejection
    // broke previously-working numeric-content string callers).
    val idType = raw.schema(idCol).dataType
    require(idType.isInstanceOf[org.apache.spark.sql.types.NumericType]
        || idType == org.apache.spark.sql.types.StringType,
      s"dsirResample derives its deterministic Gumbel key from " +
        s"$idCol cast to long, but $idCol is ${idType.simpleString} — " +
        "the cast is NULL/undefined there and the resample silently " +
        "degenerates. Pre-derive a numeric key (e.g. " +
        s"withColumn(\"__rid\", xxhash64(col(\"$idCol\"))) ) and pass " +
        "that as idCol.")
    // strings go through try_cast: under ANSI (the Spark 4 default) a
    // plain cast raises the generic CAST_INVALID_INPUT before this
    // operator's own diagnosis can
    val idLong =
      if (idType == org.apache.spark.sql.types.StringType) {
        val idCast = col(idCol).try_cast("long")
        when(col(idCol).isNotNull && idCast.isNull,
          raise_error(concat(
            lit(s"dsirResample: $idCol value '"), col(idCol),
            lit("' is not numeric — the Gumbel key would be NULL and " +
              "the resample silently degenerates; pre-derive a " +
              "numeric key (e.g. xxhash64) and pass that as idCol"))))
          .otherwise(idCast)
      } else col(idCol).cast("long")
    // signed mix64 / 2^64 + 0.5 ∈ [0, 1); clamp away from BOTH ends —
    // u → 0 or the double rounding u → 1.0 would make the Gumbel key
    // ±Inf and the long cast undefined
    val u0 = graft.functions.Mix64
      .mix64(idLong, seed)
      .cast("double") / lit(2.0) / lit(Long.MaxValue.toDouble) + lit(0.5)
    val u = least(greatest(u0, lit(1e-12)), lit(1.0 - 1e-12))
    val gumbelPpm = round(-log(-log(u)) * lit(1e6)).cast("long")
    dsirWeights(raw, target, idCol, textCol, buckets)
      .withColumn("__key", col("weight_ppm") + gumbelPpm)
      .orderBy(col("__key").desc, col(idCol).asc)
      .limit(n)
      .select(col(idCol), col("weight_ppm"))
  }
}
