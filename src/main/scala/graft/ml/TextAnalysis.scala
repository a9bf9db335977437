package graft.ml

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, token counting, quality scoring, language ID, and
  * document fingerprinting.
  *
  * Everything here is built-in Column compositions (codegen'd, no UDFs)
  * so a 100 TB documents scan stays a single whole-stage-codegen pass:
  * no shuffle, no python workers, filters still push down around it.
  */
object TextAnalysis {

  /** Whitespace tokenization (lowercased, trimmed). */
  def tokens(text: Column): Column =
    split(trim(lower(text)), "\\s+")

  /** BPE-ish subword-boundary tokenization: splits on whitespace AND
    * letter/digit/punct boundaries, the usual pre-tokenizer shape
    * (e.g. "don't stop2" → don, ', t, stop, 2).
    */
  def bpeishTokens(text: Column): Column =
    filter(
      split(lower(text), "(?<=[^\\p{L}])(?=[\\p{L}])|(?<=[\\p{L}])(?=[^\\p{L}])|\\s+"),
      t => length(trim(t)) > 0)

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** Approximate LLM token count: ~chars/4 heuristic upper-bounded by
    * subword token count; cheap proxy when no tokenizer is available.
    */
  def approxBpeTokenCount(text: Column): Column = size(bpeishTokens(text))

  /** Quality metrics (all integer-valued or ratio-free so results are
    * engine-exact): character count, token count, alphabetic and
    * punctuation character counts, mean word length ×100 (integer),
    * and a keep/drop flag from the usual C4-style heuristics
    * (non-trivial length, words not too long, mostly alphabetic).
    */
  def qualityMetrics(df: DataFrame, textCol: String): DataFrame = {
    // explicit ASCII classes (not \p{...}) so the same regex means the
    // same thing in Java regex and RE2-based engines
    val text    = col(textCol)
    val nChars  = length(text)
    val nTokens = tokenCount(text)
    val nAlpha  = length(regexp_replace(text, "[^A-Za-z]", ""))
    val nPunct  = length(regexp_replace(text, "[A-Za-z0-9 \\t\\n\\r]", ""))
    val nSpace  = length(regexp_replace(text, "[^ \\t\\n\\r]", ""))
    df.withColumn("n_chars", nChars)
      .withColumn("n_tokens", nTokens)
      .withColumn("n_alpha", nAlpha)
      .withColumn("n_punct", nPunct)
      .withColumn("mean_word_len_x100",
        ((nChars - nSpace) * 100 / greatest(nTokens, lit(1))).cast("int"))
      .withColumn("quality_keep",
        nTokens >= 5 && nTokens <= 100000 &&
        (nChars - nSpace) <= nTokens * 15 && // mean word len ≤ 15
        nAlpha * 2 >= nChars)                // ≥50% alphabetic
  }

  /** Default early-stop floor for [[bpeTrain]]/[[bpeTrainBatched]]:
    * a merge whose pair count has fallen to 1 carries no corpus
    * statistics (it would memorize one word). Exposed as a constant
    * so the q191 oracle interpolates the SAME stop condition instead
    * of duplicating a literal (ADVICE r10).
    */
  val DefaultMinPairCount: Long = 2L

  /** One round-loop state materialization with RDD-level lineage
    * truncation (the Graph CC/PageRank/k-core loop discipline):
    * `Dataset.localCheckpoint` persists at the RDD level where
    * `Dataset.unpersist` CANNOT reach (nothing registers with the
    * CacheManager), so a loop that only holds Dataset handles leaks
    * every superseded round's blocks until driver GC — harmless at 8
    * rounds, a storage pile-up at the ~500 rounds a 32k-merge batched
    * training runs. Returns the re-wrapped frame plus the RDD handle
    * the NEXT round must `unpersist` once superseded.
    */
  private def truncateState(df: DataFrame): (DataFrame, RDD[InternalRow]) = {
    val schema = df.schema
    val rdd = df.queryExecution.toRdd.map(_.copy())
    rdd.localCheckpoint()
    rdd.count()
    (GraftBridge.internalCreateDataFrame(df.sparkSession, rdd, schema), rdd)
  }

  /** Stopword tables for the n-gram/stopword language heuristic. */
  val Stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "that", "it", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "una", "los", "por"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "den", "ein", "zu"),
    "fr" -> Seq("le", "la", "les", "de", "et", "est", "un", "une", "dans", "que"))

  /** Per-language stopword-hit score: how many distinct stopwords of
    * `lang` occur as whole tokens. One tokenizer pass; see [[langId]]
    * for the multi-language single-pass form.
    */
  def stopwordHits(text: Column, lang: String): Column = {
    val words = Stopwords(lang)
    size(array_distinct(filter(tokens(text), t =>
      words.map(w => t === w).reduce(_ || _))))
  }

  /** Language-ID heuristic: the language with the most distinct
    * stopword hits wins; below `minHits` → "und" (undetermined).
    * Deterministic tie-break: language code order.
    *
    * Single pass by construction: the 40 (language, stopword) pairs map
    * to bits of one long mask accumulated in ONE `aggregate` over ONE
    * `tokens(text)` reference — the naive per-word `array_contains`
    * composition re-evaluates the tokenizer regex once per word×language
    * (Catalyst inlines staged columns into every consumer; measured
    * ~6× slower on the documents bench). The winner is then decided
    * from the mask inside a transform lambda, so the aggregate itself
    * also appears exactly once in the expression tree.
    */
  def langId(text: Column, minHits: Int = 2): Column = {
    val langs = Stopwords.keys.toSeq.sorted
    // bit i*10+j = language i's j-th stopword; a shared word (e.g. "de"
    // in es and fr) sets every language's bit it belongs to
    val bitOf: Map[(String, String), Int] = (for {
      (l, i) <- langs.zipWithIndex
      (w, j) <- Stopwords(l).zipWithIndex
    } yield (l, w) -> (i * 10 + j)).toMap
    val wordMask: Seq[(String, Long)] = bitOf.keys.map(_._2).toSeq.distinct
      .sorted.map { w =>
        w -> langs.flatMap(l => bitOf.get((l, w)))
          .map(b => 1L << b).reduce(_ | _)
      }
    val langMask: Map[String, Long] = langs.map { l =>
      l -> Stopwords(l).map(w => 1L << bitOf((l, w))).reduce(_ | _)
    }.toMap
    val mask = aggregate(tokens(text), lit(0L), (acc, t) =>
      acc.bitwiseOR(wordMask.foldLeft(lit(0L)) { case (e, (w, m)) =>
        when(t === w, lit(m)).otherwise(e)
      }))
    // decide from the mask inside a lambda: the lambda variable binds
    // the aggregate's value once, however many times it is referenced
    element_at(transform(array(mask), m => {
      val scored = langs.map(l =>
        (l, bit_count(m.bitwiseAND(lit(langMask(l)))).cast("int")))
      val best = scored.map(_._2).reduceLeft((a, b) => greatest(a, b))
      // foldRight so the FIRST language in declaration order is the
      // outermost when (same tie-break as the old acc=="und" fold,
      // without building the trivially-true lit=="und" predicate that
      // Spark warns about on every analysis)
      scored.foldRight(lit("und")) { case ((l, c), acc) =>
        when(c === best && best >= minHits, lit(l)).otherwise(acc)
      }
    }), 1)
  }

  /** TF-IDF top-k keywords per document — the canonical distributed
    * two-aggregation shape. The (doc, token) term frequencies and the
    * corpus document frequencies are map-side-combined groupBys (the
    * DF table derives from the TF table, so AQE's ReuseExchange runs
    * the tokenize+TF shuffle once); the token-keyed join moves only
    * (doc, token, tf) triples — the text never shuffles — and the
    * corpus size joins in as a broadcast scalar, not a driver-side
    * collect. Per-doc top-k is a window over doc-sized groups (bounded
    * by tokens-per-doc, so no skew at corpus scale).
    *
    * Scores are rounded to 4 dp BEFORE ranking and tie-broken by
    * token so rankings are reproducible across engines.
    */
  def tfidfTopK(
      df: DataFrame, textCol: String, idCol: String,
      k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = df.select(col(idCol).as(idCol),
      explode(tokens(col(textCol))).as("token"))
    // The TF table feeds the join probe AND the DF aggregation. A
    // DataFrame referenced from multiple plan positions re-executes
    // its whole subtree per reference (AQE does NOT reuse these
    // exchanges — verified on the executed plan), which would scan and
    // tokenize the corpus once per consumer — so persist the
    // (doc, token, tf) triples once; they are a fraction of the text
    // they summarize. The corpus size deliberately counts the RAW
    // input instead: a column-pruned count-only scan (no text decode,
    // no tokenize) is cheaper than another pass over tf, and every doc
    // yields ≥1 token so the counts agree.
    val tf = tok.groupBy(idCol, "token")
      .agg(count(lit(1)).cast("int").as("tf"))
      .persist()
    val dfT = tf.groupBy("token")
      .agg(count(lit(1)).cast("int").as("df_t"))
    val n = df.agg(count(lit(1)).cast("double").as("n_docs"))
    val w = Window.partitionBy(idCol)
      .orderBy(col("score").desc, col("token"))
    tf.join(dfT, "token")
      .crossJoin(broadcast(n))
      .withColumn("score",
        round(col("tf") * log(col("n_docs") / col("df_t")), 4))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col(idCol), col("token"), col("tf"), col("df_t"),
        col("score"), col("rk"))
  }

  /** PII redaction: emails then long digit runs (7+) replaced by typed
    * placeholder tags. Patterns are plain ASCII classes with no
    * lookarounds or \p classes, so the same regex means the same thing
    * in Java regex and RE2-based engines; two codegen'd regexp passes,
    * no shuffle.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text,
        "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+", "<EMAIL>"),
      "[0-9]{7,}", "<NUM>")

  /** Content fingerprint: stable 128-bit hex via MD5 (engine-portable)
    * — the exact-dup key for [[Dedup.exact]].
    */
  def fingerprint(text: Column): Column = md5(text.cast("binary"))

  /** 64-bit rolling/content hash (xxhash64) — cheaper than MD5 when
    * portability to other engines doesn't matter.
    */
  def fingerprint64(text: Column): Column = xxhash64(text)

  /** Repetition metrics (Gopher-style repetition signals, all
    * integer-valued so results are engine-exact): token count, distinct
    * token count, and the occurrence count of the most frequent token
    * bigram. A high duplicate-token ratio or a dominant bigram flags
    * boilerplate/generated spam for training-data filtering.
    *
    * One tokenizer pass: every metric reads one bound reference of the
    * token array (lambda variables bind once — see [[langId]]); the
    * bigram mode is a run-length maximum over the SORTED bigram list,
    * a single `aggregate` pass with a struct accumulator instead of a
    * per-doc groupBy (no shuffle — stays inside the scan's codegen
    * stage at 100 TB).
    */
  def repetitionMetrics(text: Column): Column =
    element_at(transform(array(tokens(text)), t => {
      val n = size(t)
      val bigrams = sort_array(transform(
        when(n >= 2, sequence(lit(1), n - 1))
          .otherwise(array().cast("array<int>")),
        i => concat_ws(" ", element_at(t, i), element_at(t, i + 1))))
      val top = aggregate(bigrams,
        struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
        (acc, x) => {
          val run = when(x === acc.getField("prev"),
            acc.getField("run") + 1).otherwise(lit(1))
          struct(x.as("prev"), run.as("run"),
            greatest(acc.getField("best"), run).as("best"))
        },
        acc => acc.getField("best"))
      struct(n.as("n_tokens"),
        size(array_distinct(t)).as("n_distinct"),
        top.as("top_bigram"))
    }), 1)

  /** Per-document token Shannon entropy (bits): a low-entropy document
    * is repetitive boilerplate, a training-data quality signal
    * complementing [[repetitionMetrics]] (entropy catches diffuse
    * repetition the dominant-bigram count misses). Computed as
    * H = log2(n) − (Σ c·log2 c)/n over per-doc token counts — one
    * explode + two map-side-combined aggregations, text never
    * shuffles (only (doc, token-hashable) count triples move).
    * Rounded to 4 dp: the count arithmetic is integer-exact, the two
    * log2 reductions are double, and 4 dp absorbs cross-engine /
    * cross-partition summation-order ulps (same policy as the ANN
    * score oracles).
    */
  def tokenEntropy(
      df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val tc = df.select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("c"))
    tc.groupBy(col(idCol))
      .agg(sum(col("c")).as("n"),
        sum(col("c").cast("double") * log2(col("c"))).as("s"))
      .select(col(idCol), col("n").cast("int").as("n_tokens"),
        round(log2(col("n").cast("double")) - col("s") / col("n"), 4)
          .as("entropy"))
  }

  /** Winnowing fingerprint (Schleimer/Wilkerson/Aiken, SIGMOD 2003):
    * rolling FNV-1a hashes over token `shingleSize`-grams, then the
    * minimum of every `window` consecutive hashes — any shared token
    * run of length ≥ window+shingleSize−1 between two documents
    * guarantees a shared fingerprint hash, at ~2/(window+1) the
    * density of the full shingle set. Both stages are native
    * codegen'd expressions: one pass per row, no shuffle.
    */
  def winnowFingerprint(
      text: Column, shingleSize: Int = 3, window: Int = 4): Column =
    graft.functions.Winnow.winnow(
      graft.functions.ShingleHashes.shingleHashes(text, shingleSize), window)

  /** Sequence-packing manifest: lay the corpus's token stream out in
    * `idCol` order and assign every document its global token offset
    * and the range of fixed-`seqLen` training sequences it lands in —
    * the plan a packing writer needs to emit pretraining batches
    * without ever materializing the concatenated stream.
    *
    * Returns (idCol, n_tokens, offset, seq_first, seq_last).
    *
    * The global running sum is a DISTRIBUTED prefix sum, not a global
    * window (`Window.orderBy` with no partition collapses all data
    * into one task — the classic scale-killer): range-repartition by
    * id, per-partition running sums in parallel, then one
    * partition-count-sized total table broadcast back to lift local
    * offsets to global ones. The counted table is persisted because
    * the totals and the join both consume it — and because
    * `repartitionByRange` samples its boundaries, so recomputing it
    * per consumer could assign different partition ids to each branch.
    */
  def packingManifest(
      df: DataFrame, idCol: String, textCol: String,
      seqLen: Int, partitions: Int = 0): DataFrame =
    packingManifestFrom(
      df.select(col(idCol), tokenCount(col(textCol)).as("n_tokens")),
      idCol, "n_tokens", seqLen, partitions)
      .select(col(idCol), col("n_tokens"), col("offset"),
        col("seq_first"), col("seq_last"))

  /** [[packingManifest]] over a frame that ALREADY carries its token
    * count — appends (offset, seq_first, seq_last) while KEEPING every
    * input column. This is the fused shape a chunk→encode→pack
    * pipeline wants: computing offsets in-lineage on the encoded frame
    * (whose `n_tokens` the encode already produced) removes both the
    * second tokenization pass and the pack-side rejoin — the encoded
    * payload (token_ids arrays) crosses exactly ONE exchange, the
    * range repartition here, instead of a regroup plus a join shuffle
    * (q104's sf10 profile). Same distributed prefix-sum: range-
    * partition on id, per-partition running sums, per-partition totals
    * (≤ `partitions` rows) broadcast back as offsets.
    *
    * CACHE OWNERSHIP: this operator persists two frames (the input,
    * ahead of the boundary-sampling range exchange, and the
    * prefix-summed partitions, which the totals and the join both
    * consume) that must outlive the returned LAZY frame's first
    * materialization — so it cannot release them itself. The CALLER
    * owns release: materialize the result (write/collect/count), then
    * [[graft.operators.PhysicalOps.releaseCaches]] (or unpersist via
    * `spark.sparkContext.getPersistentRDDs`). A long-lived JVM that
    * skips this accumulates session-lifetime dead blocks (r12 advice).
    */
  def packingManifestFrom(
      df: DataFrame, idCol: String, nTokensCol: String,
      seqLen: Int, partitions: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val p = if (partitions > 0) partitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    // Cache the input BEFORE the range exchange: RangePartitioner
    // first runs a SAMPLING job over the child to pick boundaries,
    // and with an expensive upstream (a whole encode stage) that job
    // re-executes the full lineage — measured as ~2x the encode cost
    // at sf10. The sampling pass touches every partition, so it
    // populates this cache in one pass and the real exchange reads
    // memory. (The q104 sf10 profile, r11 verdict #3.)
    val src = df.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // __local via the stateful PartitionPrefixSum kernel, NOT a window
    // over __pid: Catalyst cannot prove the post-exchange data is
    // clustered by physical partition, so the window form inserts a
    // SECOND full shuffle (hashpartitioning(__pid)) that re-ships
    // every payload column — the q104 plan audit caught the pack
    // stage moving its token_ids arrays over the wire twice
    val local = src
      .repartitionByRange(p, col(idCol))
      .sortWithinPartitions(col(idCol))
      .withColumn("__pid", spark_partition_id())
      .withColumn("__local",
        graft.functions.PartitionPrefixSum
          .partitionPrefixSum(col(nTokensCol)))
      .persist()
    // one row per partition id — ≤ `p` rows by construction, so the
    // single-task window is safe; the constant partition key only
    // keeps WindowExec from warning about a data-sized global window
    val prefixes = local.groupBy(col("__pid"))
      .agg(sum(col(nTokensCol)).as("__t"))
      .withColumn("__prefix",
        coalesce(sum(col("__t")).over(
          Window.partitionBy(pmod(col("__pid"), lit(1))).orderBy(col("__pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__prefix"))
    local.join(broadcast(prefixes), Seq("__pid"))
      .withColumn("offset", col("__local") + col("__prefix"))
      .withColumn("seq_first",
        floor(col("offset") / seqLen).cast("long"))
      .withColumn("seq_last",
        floor((col("offset") + col(nTokensCol) - 1) / seqLen).cast("long"))
      .drop("__pid", "__local", "__prefix")
  }

  /** Corpus n-gram LM familiarity scoring (the CCNet/KenLM-shaped
    * quality signal, integer-exact): train word-`n`-gram occurrence
    * counts over the corpus itself, prune the Zipf tail below
    * `minCount`, then score every document by how familiar its
    * n-grams are to the trained table. Documents full of n-grams the
    * corpus has never seen twice are boilerplate-free but also
    * gibberish-prone; documents whose every n-gram is corpus-common
    * are template spam — both ends of the score distribution are
    * filter candidates.
    *
    * Returns (idCol, n_ngrams, n_rare, bits_score):
    *  - `n_ngrams`    — n-gram occurrences in the doc (multiset);
    *  - `n_rare`      — occurrences whose n-gram fell below `minCount`
    *                    corpus-wide (unknown to the "model");
    *  - `bits_score`  — Σ floor(log2(corpusCount)) over known
    *                    occurrences: an integer log-likelihood proxy
    *                    (floor(log2) computed as `length(bin(c)) - 1`,
    *                    exact string arithmetic — no floating-point
    *                    log whose last bit could differ across
    *                    engines). Normalize by `n_ngrams` caller-side
    *                    for a per-token score.
    *
    * Scale posture (100 TB): the count table groups 8-byte shingle
    * hashes (map-side combine collapses hot n-grams before the
    * exchange) and the `minCount` prune drops the Zipf tail — the
    * singleton mass that dominates raw n-gram tables — before the
    * table is ever joined. The scoring join is a 1:1 enrich on a long
    * key (no row blowup on hot n-grams: the count side is unique per
    * hash), and the final per-doc aggregation ships (id, partial sums)
    * only. Document text never shuffles; both passes read the corpus
    * scan, shuffling only hashes and counts.
    */
  /** Distributed inverted index: term → sorted posting list of doc
    * ids, with document frequency. Terms outside `[minDf, maxDf]` are
    * dropped — `minDf` prunes the hapax tail, and `maxDf` is the
    * SCALE bound, not a tuning nicety: it excludes stopword-class
    * terms BEFORE posting assembly, so no `collect_list` ever gathers
    * more than `maxDf` ids in one key's task (the unbounded hot-term
    * posting list is the classic index-build OOM). A real index
    * doesn't want those terms anyway — a posting list matching half
    * the corpus filters nothing.
    *
    * Plan shape: tokens are deduped per document in the scan
    * projection (array_distinct — no shuffle), the DF census is one
    * map-side-combined groupBy over (term) pairs, the band of
    * surviving terms broadcasts back as a semi-join filter, and only
    * then do (term, id) pairs shuffle for assembly — text never
    * moves, and every shuffled pair belongs to a bounded posting.
    *
    * Returns (term, df, postings array<id> ascending).
    */
  def invertedIndex(
      df: DataFrame, textCol: String, idCol: String,
      minDf: Long = 2, maxDf: Long = 10000): DataFrame = {
    require(minDf >= 1 && maxDf >= minDf,
      s"need 1 <= minDf <= maxDf, got [$minDf, $maxDf]")
    val toks = df.select(col(idCol).as("id"),
      explode(array_distinct(filter(tokens(col(textCol)),
        t => length(t) > 0))).as("term"))
    val dfs = toks.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf && col("df") <= maxDf)
    toks.join(dfs, Seq("term"))
      .groupBy(col("term"), col("df"))
      .agg(sort_array(collect_list(col("id"))).as("postings"))
  }

  /** Token co-occurrence counts (collocation mining): for every pair
    * of df-banded terms appearing in the same document, how many
    * documents contain both — the integer sufficient statistics for
    * PMI / log-likelihood collocation scores ((n_ab, df_a, df_b) plus
    * the corpus size are all those formulas need; the log itself is
    * left to the caller so results stay engine-exact).
    *
    * The df band `[minDf, maxDf]` is the scale bound twice over: it
    * drops hapax terms (pairs with a singleton can't reach
    * `minPairCount`) AND stopword-class terms, so the per-document
    * pair blowup is C(k, 2) with k bounded by the banded vocabulary a
    * doc can contain — never raw document length. The pair join is
    * keyed on the document id (co-partitioned self-join, no
    * cross-document traffic) and the final count map-side combines.
    * For corpora where banded k is still large, tighten the band —
    * collocation mining over stopwords is noise anyway.
    *
    * Returns (term_a, term_b, df_a, df_b, n_ab), term_a < term_b.
    */
  def cooccurrence(
      df: DataFrame, textCol: String, idCol: String,
      minDf: Long = 2, maxDf: Long = 10000,
      minPairCount: Long = 2): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      explode(array_distinct(filter(tokens(col(textCol)),
        t => length(t) > 0))).as("term"))
    val dfs = toks.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf && col("df") <= maxDf)
    val banded = toks.join(dfs, Seq("term"))
    banded.as("a").join(banded.as("b"),
        col("a.id") === col("b.id") && col("a.term") < col("b.term"))
      .groupBy(col("a.term").as("term_a"), col("b.term").as("term_b"),
        col("a.df").as("df_a"), col("b.df").as("df_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairCount)
  }

  def ngramLmScore(
      df: DataFrame, textCol: String, idCol: String,
      n: Int = 3, minCount: Long = 2): DataFrame = {
    val grams = df.select(col(idCol).as("id"),
      explode(Dedup.shingleHashes(col(textCol), n)).as("g"))
    val model = grams.groupBy(col("g"))
      .agg(count(lit(1)).as("__c"))
      .filter(col("__c") >= minCount)
    grams.join(model, Seq("g"), "left")
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_ngrams"),
        count(when(col("__c").isNull, 1)).as("n_rare"),
        coalesce(sum(length(bin(col("__c"))) - 1), lit(0L))
          .cast("long").as("bits_score"))
      .select(col("id").as(idCol), col("n_ngrams"), col("n_rare"),
        col("bits_score"))
  }

  /** Dedup-key normalization (the C4/CCNet pre-hash step): exact and
    * MinHash dedup both miss near-identical pages that differ only in
    * case, punctuation, serial numbers, or whitespace layout — so
    * production pipelines hash a NORMALIZED view of the text and keep
    * the original. Rules, in order: lowercase; ASCII punctuation
    * stripped; digits classed to `0` (so "page 117" ≡ "page 4");
    * ASCII control characters to spaces; whitespace runs collapsed;
    * trimmed. Non-ASCII letters pass through untouched.
    *
    * Deliberately regex-only with explicit ASCII classes (the
    * [[redactPii]] discipline) so Java regex and RE2-based engines
    * produce byte-identical output; a single codegen'd projection, no
    * shuffle. Compose: `Dedup.exact(df.withColumn("key",
    * normalizeForDedup(col("text"))), "key", id)`.
    */
  def normalizeForDedup(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(lower(text), "[!-/:-@\\[-`{-~]", ""),
          "[0-9]", "0"),
        "[\\x00-\\x1f]", " "),
      "[ ]+", " "))

  /** Tokenizer application (the encode step after [[buildVocab]]):
    * map every document to its ordered token-id array under a trained
    * vocabulary, with out-of-vocabulary tokens classed to `oovId`.
    * Returns (idCol, n_tokens, n_oov, token_ids) — the shape a
    * packing/sharding stage consumes; documents with zero tokens
    * produce no rows.
    *
    * Scale posture (100 TB): the vocabulary is bounded metadata by
    * construction (minCount pruning keeps it MBs for TB corpora), so
    * the encode is a MAP-ONLY pass — the vocab collects to a hash map
    * riding inside a native [[graft.functions.VocabEncode]] kernel
    * (the IVF-centroid pattern: bounded state ships once per executor
    * with the task binary) and every document encodes in its own scan
    * partition; NOTHING shuffles. The previous declarative plan
    * (posexplode → broadcast join → groupBy collect_list → sort_array)
    * shipped one row per TOKEN through a reassembly exchange whose
    * payload was the output itself — the whole cost of the stage at
    * the second decade (q102's 8.1x sf10 step). Past
    * `collectVocabLimit` word types the kernel path is refused and the
    * join/regroup plan runs instead — same results, spec-pinned.
    *
    * The default limit is a BYTE budget, not a guess (r12 verdict #6):
    * the map Java-serializes at a measured ~39.5 B/entry flat across
    * 250k–4M identifier-shaped entries (BENCH_sf1_spot.json
    * `vocab_bytes_r13`; 4M entries = 150.6 MiB), and it rides the
    * task binary via `addReferenceObj` — broadcast once per executor,
    * but still resident per live stage. 1.6M entries ≈ 64 MiB keeps
    * the binary in comfortable broadcast territory; vocabularies past
    * it take the join plan unless the caller raises the limit
    * knowingly.
    */
  def encodeDocuments(
      df: DataFrame, textCol: String, idCol: String,
      vocab: DataFrame, oovId: Long = -1L,
      collectVocabLimit: Int = 1600000): DataFrame = {
    val probe = vocab.select(col("token"), col("token_id"))
      .limit(collectVocabLimit + 1).collect()
    if (probe.length <= collectVocabLimit) {
      val map = graft.functions.VocabEncode.buildMap(
        probe.map(r => (r.getString(0), r.getLong(1))))
      val toks = filter(tokens(col(textCol)), t => length(t) > 0)
      // zero-token guard on the RAW TEXT (a doc tokenizes to zero
      // tokens iff it has no non-whitespace char), never on a field
      // of the kernel struct: predicate pushdown would inline the
      // whole encode into the Filter and evaluate it twice per row
      // (the documented lambda-trap shape)
      df.filter(col(textCol).rlike("\\S"))
        .select(col(idCol),
          graft.functions.VocabEncode.vocabEncode(toks, map, oovId)
            .as("__e"))
        .select(col(idCol), col("__e.n_tokens").as("n_tokens"),
          col("__e.n_oov").as("n_oov"),
          col("__e.token_ids").as("token_ids"))
    } else encodeDocumentsJoined(df, textCol, idCol, vocab, oovId)
  }

  /** The shuffle-based encode for vocabularies too large to collect:
    * broadcast-join the token stream, reassemble per document. Kept as
    * [[encodeDocuments]]'s guarded fallback and directly testable.
    */
  private[graft] def encodeDocumentsJoined(
      df: DataFrame, textCol: String, idCol: String,
      vocab: DataFrame, oovId: Long = -1L): DataFrame = {
    val tok = df.select(col(idCol).as("id"),
      posexplode(filter(tokens(col(textCol)), t => length(t) > 0))
        .as(Seq("pos", "token")))
    tok.join(broadcast(vocab.select(col("token"), col("token_id"))),
        Seq("token"), "left")
      .select(col("id"), col("pos"),
        coalesce(col("token_id"), lit(oovId)).as("tid"))
      .groupBy(col("id"))
      .agg(sort_array(collect_list(struct(col("pos"), col("tid"))))
        .as("__ps"))
      .select(col("id").as(idCol),
        size(col("__ps")).as("n_tokens"),
        size(filter(col("__ps"), p => p.getField("tid") === oovId))
          .as("n_oov"),
        transform(col("__ps"), p => p.getField("tid")).as("token_ids"))
  }

  /** Vocabulary build (the tokenizer-training census): corpus token
    * occurrence counts, Zipf tail pruned below `minCount`, and a
    * CONTIGUOUS frequency-ranked id per surviving token (rank 0 = most
    * frequent; ties break on the token text, so ids are a pure
    * function of the corpus). Returns (token, n, token_id).
    *
    * Scale posture (100 TB): the corpus-sized work is one map-side-
    * combined occurrence count (hot tokens collapse before the
    * exchange). Rank assignment never global-sorts in one task — the
    * pruned vocabulary is range-partitioned on (n desc, token),
    * ranked WITHIN partitions, and partition offsets (one count per
    * partition) broadcast back: the same distributed prefix-sum shape
    * as [[packingManifest]]. The only single-task step is the
    * offsets window over ≤ `partitions` rows.
    *
    * CACHE OWNERSHIP: persists the pruned census and the ranked
    * partitions for the lifetime of the returned LAZY frame — caller
    * releases after materialization
    * ([[graft.operators.PhysicalOps.releaseCaches]]); see
    * [[packingManifestFrom]]'s contract note.
    */
  def buildVocab(
      df: DataFrame, textCol: String,
      minCount: Long = 2, partitions: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(minCount >= 1, s"minCount must be >= 1 (got $minCount)")
    val p = if (partitions > 0) partitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val counts = df
      .select(explode(filter(tokens(col(textCol)),
        t => length(t) > 0)).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
      // cached before the range exchange: RangePartitioner's boundary
      // sampling otherwise re-runs the full-corpus token census (the
      // packingManifestFrom lesson — sampling cost ≈ the aggregate)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // per-partition rank via the stateful prefix-sum kernel (a
    // row_number window over __pid re-shuffles the data a second
    // time — the packingManifestFrom plan-audit lesson); the explicit
    // sortWithinPartitions replaces the window's own ordering
    val local = counts
      .repartitionByRange(p, col("n").desc, col("token"))
      .sortWithinPartitions(col("n").desc, col("token"))
      .withColumn("__pid", spark_partition_id())
      .withColumn("__local",
        graft.functions.PartitionPrefixSum.partitionPrefixSum(lit(1L)))
      .persist()
    // ≤ `p` rows by construction (one per partition id); constant
    // partition key silences the global-window warning
    val offsets = local.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__off",
        coalesce(sum(col("__c")).over(
          Window.partitionBy(pmod(col("__pid"), lit(1))).orderBy(col("__pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__off"))
    local.join(broadcast(offsets), Seq("__pid"))
      .select(col("token"), col("n"),
        (col("__local") + col("__off")).cast("long").as("token_id"))
  }

  /** BM25 scored retrieval for a fixed query-term set — the ranking
    * layer over the inverted-index story ([[invertedIndex]] finds the
    * postings; this scores them). Okapi BM25 with the +1 IDF variant
    * (always positive).
    *
    * Plan: the query-term IN filter lands right on the token stream
    * (only matching (doc, term) rows survive into any exchange), term
    * document-frequencies broadcast (|query| rows), document lengths
    * join on the id key, and corpus stats (N, avgdl) attach as a
    * broadcast one-row frame — the corpus-sized shuffles are the dl
    * aggregate and the tf aggregate, both map-side combined.
    *
    * Determinism: per-term contributions round to 6dp and sum as
    * DECIMAL — float addition order across a doc's matched terms
    * would otherwise differ between engines; the final score rounds
    * to 4dp. Output: (idCol, bm25, n_terms) for docs matching ≥ 1
    * query term.
    */
  def bm25Scores(
      df: DataFrame, textCol: String, idCol: String,
      queryTerms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "need at least one query term")
    val tok = df.select(col(idCol),
      explode(tokens(col(textCol))).as("token"))
    // dl feeds both the stats row and the per-doc join — persist the
    // tiny (id, dl) table rather than re-tokenizing the corpus per
    // consumer (the q57 lesson: AQE does not reuse these exchanges)
    val dl = tok.groupBy(col(idCol)).agg(count(lit(1)).as("dl")).persist()
    val stats = dl.agg(
      count(lit(1)).cast("double").as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val qtf = tok.filter(col("token").isin(queryTerms: _*))
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).cast("long").as("tf"))
    val qdf = qtf.groupBy(col("token"))
      .agg(count(lit(1)).cast("long").as("df_t"))
    val contrib = qtf
      .join(broadcast(qdf), "token")
      .join(dl, Seq(idCol))
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log((col("n_docs") - col("df_t") + lit(0.5)) /
          (col("df_t") + lit(0.5)) + lit(1.0)))
      .withColumn("c",
        round(col("idf") * ((col("tf") * (lit(k1) + lit(1.0))) /
          (col("tf") + lit(k1) * (lit(1.0) - lit(b) +
            (lit(b) * col("dl")) / col("avgdl")))), 6))
    val out = contrib.groupBy(col(idCol))
      .agg(
        round(sum(col("c").cast("decimal(18,6)")).cast("double"), 4)
          .as("bm25"),
        count(lit(1)).cast("int").as("n_terms"))
    val materialized = out.localCheckpoint(true)
    dl.unpersist()
    materialized
  }

  /** One greedy left-to-right BPE merge applied to a token array: every
    * non-overlapping (left, right) adjacency becomes the merged token,
    * scanning from the left (so in `a a a` with pair (a,a) the FIRST
    * two merge and the third survives). Expressed as an array fold —
    * append the incoming token unless it completes the pair with the
    * accumulator's tail, in which case the tail is replaced by the
    * merged token. The fold cannot double-merge: the merged token is
    * strictly longer than `left`, so it never re-matches as a tail.
    */
  private def applyMerge(
      toks: Column, left: String, right: String): Column = {
    val merged = left + right
    aggregate(toks, typedlit(Seq.empty[String]), (acc, t) =>
      when(size(acc) > 0 && element_at(acc, -1) === left && t === right,
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(merged))))
        .otherwise(concat(acc, array(t))))
  }

  /** Distributed BPE tokenizer training (Sennrich, Haddow & Birch,
    * "Neural Machine Translation of Rare Words with Subword Units",
    * ACL 2016) — the merge-learning step [[buildVocab]] (frequency
    * vocab) and [[encodeDocuments]] (id assignment) do not cover.
    *
    * Standard word-weighted formulation: the corpus collapses to WORD
    * TYPES with counts in one map-side-combined shuffle, and every
    * round thereafter runs on that types table (absolute size:
    * vocabulary of the corpus — MBs at 100 TB, never the corpus), so
    * `merges` rounds cost `merges` small aggregates, not `merges`
    * corpus scans. Each round:
    *
    *  1. pair census: adjacent-token pairs per word type, weighted by
    *     the word count — map-side combined (hot pairs collapse
    *     before the exchange);
    *  2. argmax with the deterministic tie-break
    *     (count desc, left asc, right asc) — ONE row to the driver
    *     (bounded metadata, like a centroid);
    *  3. the merge applies to every word state via [[applyMerge]]
    *     (greedy non-overlapping left-to-right, the reference BPE
    *     semantics), and the state localCheckpoints so round r+1's
    *     plan does not replay rounds 1..r (the Graph loop discipline).
    *
    * Stops early when the best pair's count drops below
    * `minPairCount` (default [[DefaultMinPairCount]] — the q191
    * oracle interpolates the SAME constant into its per-round argmax,
    * so the stop condition is shared by construction). Returns the
    * learned merge table (merge_rank, left, right, merged,
    * pair_count) — rank 1 first. Initial states are single characters
    * (no end-of-word marker; the whole-word boundary is already
    * carried by the types table).
    */
  def bpeTrain(
      df: DataFrame, textCol: String,
      merges: Int, minPairCount: Long = DefaultMinPairCount): DataFrame = {
    val spark = df.sparkSession
    require(merges >= 1, s"merges must be >= 1 (got $merges)")
    var (state, stateRdd) = truncateState(df
      .select(explode(filter(tokens(col(textCol)),
        t => length(t) > 0)).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .select(col("cnt"),
        transform(sequence(lit(1), length(col("word"))),
          i => col("word").substr(i, lit(1))).as("toks")))
    val learned =
      scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var r = 0
    var done = false
    while (r < merges && !done) {
      val best = state
        .filter(size(col("toks")) >= 2)
        .select(col("cnt"), explode(
          transform(sequence(lit(1), size(col("toks")) - 1), i =>
            struct(element_at(col("toks"), i).as("l"),
              element_at(col("toks"), i + 1).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("c"))
        .orderBy(col("c").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (best.isEmpty || best(0).getLong(2) < minPairCount) done = true
      else {
        val (l, rt, c) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        learned += ((r + 1, l, rt, l + rt, c))
        val (next, nextRdd) = truncateState(state
          .select(col("cnt"), applyMerge(col("toks"), l, rt).as("toks")))
        stateRdd.unpersist(blocking = false) // free superseded blocks
        state = next
        stateRdd = nextRdd
        r += 1
      }
    }
    stateRdd.unpersist(blocking = false)
    import spark.implicits._
    learned.toSeq
      .toDF("merge_rank", "left", "right", "merged", "pair_count")
  }

  /** Key separator for [[applyMergesOnePass]]'s pair-lookup map. A
    * single space is collision-free BY CONSTRUCTION: word types come
    * from whitespace splitting ([[tokens]]), so no token — and no
    * concatenation of tokens — can contain one, hence
    * `left + sep + right` is injective over pairs. The selection loop
    * still skips any candidate containing the separator as a
    * defensive invariant check.
    */
  private val PairKeySep = " "

  /** One greedy left-to-right pass applying a SET of pairwise
    * non-interacting merges — the batch counterpart of [[applyMerge]].
    * `pairs` must be symbol-disjoint (no token appears in two pairs,
    * and no pair's merged string is another pair's token — the
    * invariant [[bpeTrainBatched]]'s greedy selection guarantees);
    * under that invariant occurrences of different pairs can never
    * overlap or be created/destroyed by each other, so one pass
    * applying whichever pair matches at each position is EXACTLY the
    * sequential application of each merge in any order. The lookup is
    * a literal map keyed on `left + sep + right` (one probe per position,
    * independent of batch size — M chained [[applyMerge]] folds would
    * cost M array rebuilds per word instead).
    */
  private def applyMergesOnePass(
      toks: Column, pairs: Seq[(String, String)]): Column = {
    val m = typedlit(pairs.map { case (l, r) =>
      (l + PairKeySep + r) -> (l + r)
    }.toMap)
    aggregate(toks, typedlit(Seq.empty[String]), (acc, t) => {
      val hit = try_element_at(
        m, concat(element_at(acc, -1), lit(PairKeySep), t))
      when(size(acc) > 0 && hit.isNotNull,
        concat(slice(acc, lit(1), size(acc) - 1), array(hit)))
        .otherwise(concat(acc, array(t)))
    })
  }

  /** Batched BPE merge learning — [[bpeTrain]] at production merge
    * counts. A 32k-merge tokenizer through the sequential trainer
    * costs 32k driver round-trips (census + argmax + re-merge each);
    * the standard distributed fix is to learn up to `batch` merges
    * from ONE census per round, restricted to pairs that provably do
    * not interact (the top-M non-overlapping batching used by
    * parallel BPE trainers; selection is greedy over the census in
    * the sequential tie-break order `count desc, left, right`, and a
    * candidate is kept only when its left, right, AND merged string
    * are all unseen among already-kept pairs' symbols).
    *
    * Under that disjointness invariant the batch applies in one
    * left-to-right pass ([[applyMergesOnePass]]) with results
    * IDENTICAL to applying the kept merges sequentially. What batching
    * changes vs [[bpeTrain]] is only the SELECTION schedule: a later
    * kept pair's census count is the pre-batch count, so when top
    * pairs interact with skipped higher-ranked ones the learned order
    * can differ from the strictly-sequential trainer's (skipped pairs
    * re-compete next round at refreshed counts). On a corpus whose
    * top-`batch` pairs are symbol-disjoint the two trainers are
    * exactly equal (MlSpec pins this).
    *
    * Scale shape: rounds cost `merges / ~batch` censuses instead of
    * `merges` — each census the same map-side-combined aggregate over
    * the word-type table as [[bpeTrain]], each application one fold
    * with a constant-size lookup map, per-round localCheckpoint
    * keeping the plan flat. Driver state is the collected top-`batch`
    * census rows per round — bounded metadata.
    *
    * Early-stops when no census pair reaches `minPairCount`. Returns
    * the same (merge_rank, left, right, merged, pair_count) table as
    * [[bpeTrain]]; `pair_count` is the count in the census the pair
    * was selected from.
    */
  def bpeTrainBatched(
      df: DataFrame, textCol: String,
      merges: Int, batch: Int = 64,
      minPairCount: Long = DefaultMinPairCount): DataFrame = {
    val spark = df.sparkSession
    require(merges >= 1, s"merges must be >= 1 (got $merges)")
    require(batch >= 1, s"batch must be >= 1 (got $batch)")
    var (state, stateRdd) = truncateState(df
      .select(explode(filter(tokens(col(textCol)),
        t => length(t) > 0)).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .select(col("cnt"),
        transform(sequence(lit(1), length(col("word"))),
          i => col("word").substr(i, lit(1))).as("toks")))
    val learned =
      scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var done = false
    while (learned.size < merges && !done) {
      val want = math.min(batch, merges - learned.size)
      val top = state
        .filter(size(col("toks")) >= 2)
        .select(col("cnt"), explode(
          transform(sequence(lit(1), size(col("toks")) - 1), i =>
            struct(element_at(col("toks"), i).as("l"),
              element_at(col("toks"), i + 1).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("c"))
        .filter(col("c") >= minPairCount)
        .orderBy(col("c").desc, col("l").asc, col("r").asc)
        .limit(batch).collect()
      if (top.isEmpty) done = true
      else {
        val used = scala.collection.mutable.Set.empty[String]
        val kept =
          scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
        val it = top.iterator
        while (it.hasNext && kept.size < want) {
          val row = it.next()
          val (l, r, c) =
            (row.getString(0), row.getString(1), row.getLong(2))
          if (!used(l) && !used(r) && !used(l + r) &&
              !l.contains(PairKeySep) && !r.contains(PairKeySep)) {
            kept += ((l, r, c))
            used ++= Seq(l, r, l + r)
          }
        }
        kept.foreach { case (l, r, c) =>
          learned += ((learned.size + 1, l, r, l + r, c))
        }
        val (next, nextRdd) = truncateState(state
          .select(col("cnt"),
            applyMergesOnePass(col("toks"),
              kept.map(p => (p._1, p._2)).toSeq).as("toks")))
        stateRdd.unpersist(blocking = false) // free superseded blocks
        state = next
        stateRdd = nextRdd
      }
    }
    stateRdd.unpersist(blocking = false)
    import spark.implicits._
    learned.toSeq
      .toDF("merge_rank", "left", "right", "merged", "pair_count")
  }

  /** Whether the segmentation table may carry a broadcast hint in
    * [[bpeEncode]]: true only when the measured word-type cardinality
    * is at or under the caller's limit. Factored out so the guard's
    * boundary is unit-testable without driving a corpus through it.
    */
  private[graft] def segBroadcastable(nWords: Long, limit: Long): Boolean =
    nWords <= limit

  /** Apply a learned merge list to a corpus — the [[bpeTrain]]
    * counterpart of [[encodeDocuments]]: each document's words segment
    * into the subword tokens the merges produce, flattened to one
    * space-joined string (ARRAY outputs die in the driver's
    * comparator; the q27/q88 flattening discipline).
    *
    * Scale shape: merges fold over the DISTINCT-words table (word
    * types again, never the corpus), the segmented table joins the
    * corpus token stream on `word`, and only (id, pos, subwords)
    * rows cross the reassembly exchange — the [[encodeDocuments]]
    * plan with the merge fold in place of the id lookup. Documents
    * with no words survive with an empty segmentation.
    *
    * BROADCAST GUARD (r10 verdict #1): unlike [[encodeDocuments]]'
    * vocab, which is pruned by construction, the segmentation table
    * covers EVERY distinct word — web-scale corpora have 10⁸-10⁹ word
    * types (URLs, numbers, typos), far past what a forced
    * `broadcast()` hint (which bypasses
    * autoBroadcastJoinThreshold) can ship to executors. The hint is
    * therefore applied only when the word-type cardinality — measured
    * by the same distinct aggregate that feeds the merge fold — is at
    * or under `broadcastWordLimit`; past it the join runs as a
    * regular shuffle join on `word` (hash-partitioned 8-byte-ish
    * keys; AQE may still locally convert it if the built side turns
    * out small). Results are identical on either path.
    */
  def bpeEncode(
      df: DataFrame, textCol: String, idCol: String,
      merges: Seq[(String, String)],
      broadcastWordLimit: Long = 4000000L): DataFrame = {
    val words = df
      .select(explode(filter(tokens(col(textCol)),
        t => length(t) > 0)).as("word"))
      .distinct()
      .persist()
    // ONE extra aggregate over word types (not the corpus — the
    // distinct is persisted and shared with the fold below) buys the
    // broadcast decision a measured cardinality instead of a guess.
    val nWords = words.count()
    // fold the merge list; checkpoint every few rounds so the plan
    // stays flat when the list is hundreds of merges long
    var seg = words.select(col("word"),
      transform(sequence(lit(1), length(col("word"))),
        i => col("word").substr(i, lit(1))).as("toks"))
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      seg = seg.select(col("word"), applyMerge(col("toks"), l, r).as("toks"))
      if ((i + 1) % 16 == 0) seg = seg.localCheckpoint()
    }
    // materialize the folded segmentation, then release the shared
    // distinct — the returned plan must not depend on `words` staying
    // persisted
    seg = seg.localCheckpoint(true)
    words.unpersist()
    val tok = df.select(col(idCol).as("id"),
      posexplode(filter(tokens(col(textCol)), t => length(t) > 0))
        .as(Seq("pos", "word")))
    val segSide =
      if (segBroadcastable(nWords, broadcastWordLimit)) broadcast(seg)
      else seg
    val perDoc = tok
      .join(segSide, Seq("word"))
      .groupBy(col("id"))
      .agg(sort_array(collect_list(struct(col("pos"), col("toks"))))
        .as("__ps"))
      .select(col("id"),
        flatten(transform(col("__ps"), p => p.getField("toks")))
          .as("__flat"))
    df.select(col(idCol).as("id")).distinct()
      .join(perDoc, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(concat_ws(" ", col("__flat")), lit("")).as("bpe_tokens"),
        coalesce(size(col("__flat")), lit(0)).cast("int").as("n_subwords"))
  }
}
