package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact,
  * MinHash+LSH, SimHash, and n-gram Jaccard.
  *
  * Scale posture (100 TB documents):
  * - exact dedup is one hash-shuffle on a 16-byte key (hash the text
  *   BEFORE the shuffle so full documents never move);
  * - MinHash/LSH shuffles (band, bandHash) pairs — b×n rows of a few
  *   bytes — never document contents, and resolves winners with one
  *   aggregation instead of pairwise comparison (no quadratic step);
  * - SimHash is a single codegen'd projection; bucketing by prefix
  *   gives Hamming-neighbor candidates;
  * - Jaccard pair generation joins on shared shingle hashes (candidate
  *   pruning) then verifies exactly — the join key is a long, and the
  *   candidate set is bounded by shingle-frequency capping upstream in
  *   real corpora.
  */
object Dedup {

  /** Default candidate-generation cap for the exact pair kernel
    * ([[jaccardPairs]] / [[clusters]]): shingles shared by more than
    * this many DISTINCT texts are excluded from candidate generation
    * (verification always uses full shingle sets). The uncapped
    * configuration's candidate volume grows with Σf² of prefix-shingle
    * document frequency, so a 100× denser corpus can go quadratic —
    * the cap bounds per-shingle candidates at f², making total cost
    * linear in corpus size. 256 is far above any discriminative
    * shingle's frequency (a trigram shared by >256 distinct documents
    * carries no near-dup signal — it's boilerplate), so recall loss is
    * confined to pairs whose EVERY shared prefix shingle is boilerplate
    * (MlSpec pins the semantics; q109 oracle-gates a binding cap).
    * Pass `maxShingleFreq = None` to opt in to the exact uncapped
    * kernel on corpora known to be frequency-bounded.
    *
    * SEMANTIC FLAG (ADVICE r9): because this default is approximate,
    * a caller migrating from an uncapped build can audit exactly what
    * the cap binds on THEIR corpus with [[shingleCapStats]] — it
    * reports the distinct shingles over the cap and the share of
    * candidate volume the cap removes, before any pairs are dropped.
    */
  val DefaultMaxShingleFreq: Option[Long] = Some(256L)

  /** Audit of what [[DefaultMaxShingleFreq]] (or an explicit `cap`)
    * binds on a corpus — the visibility companion to the capped
    * default of [[jaccardPairs]]/[[clusters]]: one row over the
    * corpus' distinct texts (the kernel caps on document frequency
    * over the CONTRACTED reps, so the audit counts the same way) —
    *
    *  - `n_shingles`: distinct shingles in the corpus;
    *  - `n_capped`: shingles with DF > cap (excluded from candidate
    *    generation; verification always uses full shingle sets);
    *  - `candidate_pairs`: Σ df·(df−1)/2 — the uncapped kernel's
    *    candidate-join volume;
    *  - `capped_pairs`: the part of that volume the cap removes (the
    *    quadratic mass concentrated in boilerplate shingles).
    *
    * A corpus where `n_capped` is 0 loses nothing to the default; a
    * corpus where `capped_pairs` dominates `candidate_pairs` is
    * exactly the one the cap exists for. Runs in one shuffle on
    * 8-byte shingle hashes — no text moves after the distinct.
    */
  def shingleCapStats(
      df: DataFrame, textCol: String,
      shingleSize: Int = 3,
      cap: Long = DefaultMaxShingleFreq.get): DataFrame = {
    val perShingle = df.select(col(textCol)).distinct()
      .select(explode(array_distinct(
        shingleHashes(col(textCol), shingleSize))).as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("df"))
    val pairs = expr("df * (df - 1) DIV 2")
    perShingle.agg(
      count(lit(1)).as("n_shingles"),
      coalesce(sum(when(col("df") > cap, 1L).otherwise(0L)), lit(0L))
        .as("n_capped"),
      coalesce(sum(pairs), lit(0L)).as("candidate_pairs"),
      coalesce(sum(when(col("df") > cap, pairs).otherwise(0L)), lit(0L))
        .as("capped_pairs"))
  }

  /** Exact dedup: keep the smallest `idCol` per identical `textCol`.
    * The group key is the MD5 fingerprint, not the text, so the shuffle
    * payload is (16-byte key, id) — the winning rows are then recovered
    * with a semi-join on (fingerprint, id), which AQE turns into a
    * broadcast when the survivor set is small.
    */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val fp = TextAnalysis.fingerprint(col(textCol)).as("__fp")
    val winners = df.select(fp, col(idCol))
      .groupBy(col("__fp")).agg(min(col(idCol)).as(idCol))
    df.withColumn("__fp", TextAnalysis.fingerprint(col(textCol)))
      .join(winners, Seq("__fp", idCol), "left_semi")
      .drop("__fp")
  }

  /** Word-level shingles (n-grams) as 64-bit hashes: the unit set for
    * MinHash and Jaccard — a native expression
    * ([[graft.functions.ShingleHashes]]): one pass per row. The
    * equivalent higher-order-function composition re-evaluates the
    * tokenizer once per window (lambda bodies are evaluated per
    * element), going quadratic in document length.
    */
  def shingleHashes(text: Column, n: Int = 3): Column =
    graft.functions.ShingleHashes.shingleHashes(text, n)

  /** MinHash signature: `numHashes` simulated permutations, minima kept
    * in one pass ([[graft.functions.MinHashSignature]]).
    */
  def minhashSignature(shingles: Column, numHashes: Int = 64): Column =
    graft.functions.MinHashSignature.minhashSignature(shingles, numHashes)

  /** LSH band keys: split the signature into `bands` bands of
    * `rows = numHashes/bands` and hash each band. Docs sharing any band
    * key are near-dup candidates.
    *
    * The signature is bound ONCE PER ROW via a 1-element transform
    * (the [[graft.ml.Similarity.normalize]] idiom): `bands` separate
    * slice expressions would make Catalyst inline the whole minhash
    * pipeline per band at projection collapse, and even a single
    * occurrence INSIDE the band lambda is re-evaluated per element —
    * higher-order functions evaluate non-lambda subexpressions on
    * every lambda invocation (see functions/TextHashes.scala docs).
    * Measured on the sf1 twin corpus (50k distinct texts): the
    * unbound form re-ran the 64-finalizer kernel 16× per row — 10.6s
    * for the band table vs ~1.5s bound.
    */
  def lshBandKeys(signature: Column, bands: Int, rows: Int): Column =
    element_at(transform(array(signature), sig =>
      transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(b, slice(sig, b * lit(rows) + lit(1), lit(rows))))), 1)

  /** The (id, band key) table behind every MinHash/LSH operator: one
    * row per (document, band). Staged projections ensure each
    * expensive array is computed once per row (a fused expression
    * would re-inline shingles into every consumer); the signature
    * kernel is CPU-dense (numHashes finalizers per shingle) so a
    * small scan is re-split across all slots first.
    *
    * This is also the PERSISTABLE index shape for recurring
    * incremental runs: write it out once per corpus snapshot and feed
    * it to [[incrementalMinhash]] as `corpusBands` instead of
    * re-signing 100 TB per arriving batch.
    */
  def minhashBandTable(
      df: DataFrame, textCol: String, idCol: String,
      numHashes: Int = 64, bands: Int = 16,
      shingleSize: Int = 3): DataFrame = {
    val rows = numHashes / bands
    graft.operators.PhysicalOps.ensureParallelism(df)
      .select(col(idCol), shingleHashes(col(textCol), shingleSize).as("__sh"))
      .select(col(idCol), minhashSignature(col("__sh"), numHashes).as("__sig"))
      .select(col(idCol), lshBandKeys(col("__sig"), bands, rows).as("__bands"))
      .select(col(idCol), explode(col("__bands")).as("band"))
  }

  /** MinHash+LSH near-dup removal: a document is dropped when some
    * band bucket contains a smaller id (cheap transitive-ish policy:
    * deterministic, one shuffle on band keys, no pairwise join).
    * Returns survivors.
    */
  def minhashDedup(
      df: DataFrame, textCol: String, idCol: String,
      numHashes: Int = 64, bands: Int = 16,
      shingleSize: Int = 3): DataFrame = {
    val rows = numHashes / bands
    // Exact contraction (the [[clusters]] quotient): copies of a text
    // share every band key, so a non-minimal copy always sees its
    // group's minimum in every bucket and can never survive — the
    // survivor set over representatives IS the survivor set over the
    // full corpus. The signature kernel (numHashes finalizers per
    // shingle — the CPU cost here) runs once per DISTINCT text.
    val reps = df.join(
      df.select(col(idCol), TextAnalysis.fingerprint(col(textCol)).as("__fp"))
        .groupBy(col("__fp")).agg(min(col(idCol)).as(idCol)),
      Seq(idCol), "left_semi")
    // staged projections: each expensive array is computed once per row
    // (a fused expression would re-inline shingles into every consumer);
    // the signature kernel is CPU-dense (numHashes finalizers per
    // shingle) so a small scan is re-split across all slots first
    val withBands = graft.operators.PhysicalOps.ensureParallelism(reps)
      .select(col(idCol), shingleHashes(col(textCol), shingleSize).as("__sh"))
      .select(col(idCol), minhashSignature(col("__sh"), numHashes).as("__sig"))
      .select(col(idCol), lshBandKeys(col("__sig"), bands, rows).as("__bands"))
    // (id, band) pairs are ~16 bytes/row — persist so the minhash
    // pipeline runs once even though the resolution references the
    // exploded table twice
    val exploded = withBands.select(col(idCol),
      explode(col("__bands")).as("__band"))
      .persist()
    // bucket minima via groupBy (map-side combine collapses hot bands
    // BEFORE the shuffle — a window over the band partition would sort
    // and shuffle every exploded row and skew on hot buckets), joined
    // back (bucket-min table is tiny → broadcast; AQE falls back to a
    // shuffle join when band cardinality grows at scale), then per doc
    // keep only those that never saw a smaller competitor
    val bucketMin = exploded.groupBy(col("__band"))
      .agg(min(col(idCol)).as("__bucket_min"))
    val docMin = exploded.join(bucketMin, "__band")
      .groupBy(col(idCol))
      .agg(min(col("__bucket_min")).as("__doc_min"))
      .filter(col("__doc_min") === col(idCol))
      .select(col(idCol))
    df.join(docMin, Seq(idCol), "left_semi")
  }

  /** 64-bit SimHash fingerprint — a native Catalyst expression with
    * codegen (see [[graft.functions.SimHash64]]); per-bit shifts with
    * Column-typed amounts aren't expressible with built-ins.
    */
  def simhash64(text: Column): Column =
    graft.functions.SimHash64.simhash64(text)

  /** SimHash bucket key: top `prefixBits` bits — near-dups (small
    * Hamming distance) usually share the prefix; use multiple rotated
    * tables for recall at scale.
    */
  def simhashBucket(sim: Column, prefixBits: Int = 16): Column =
    shiftright(sim, 64 - prefixBits)

  /** SimHash near-dup removal, end to end: `tables` rotated prefix
    * buckets (rotation t·(64/tables) bits, top `prefixBits` bits as the
    * key) generate candidates; candidates verify with the exact Hamming
    * distance; a doc is dropped when a SMALLER id within `maxHamming`
    * shares any bucket (same deterministic min-winner policy as
    * [[minhashDedup]]). Returns survivors.
    *
    * Scale: the only shuffles are (table, bucket) candidate keys and
    * the id-keyed drop set — signatures are 8 bytes, documents never
    * move; bucket sizes bound the pairwise verification. That bound is
    * only real with `maxBucketSize` set: boilerplate-heavy corpora
    * concentrate on hot prefixes, and one over-full bucket makes the
    * self-join quadratic. The cap excludes over-full buckets from
    * CANDIDATE GENERATION only (the same recall-for-skew trade as
    * [[jaccardPairs]]' `maxShingleFreq`): a true near-dup is missed
    * only if EVERY table buckets it hot. Unset = exact, for oracle
    * parity.
    */
  def simhashDedup(
      df: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 3, prefixBits: Int = 16,
      tables: Int = 4, maxBucketSize: Option[Long] = None): DataFrame = {
    val rot = 64 / tables
    // persisted: the signature kernel (tokenize + 64-lane hash per
    // text) feeds BOTH the group aggregation and the member join —
    // unpersisted it would run twice over the corpus
    val sigs = df.select(col(idCol).as("id"), simhash64(col(textCol)).as("sig"))
      .persist()
    // SIGNATURE contraction (the r9 twin of jaccardPairs' exact-text
    // contraction, exact here too): equal signatures are Hamming-0
    // near-dups sharing every bucket, so (a) every non-minimal member
    // of a signature group is dropped by its own representative, and
    // (b) a representative r is dropped iff some smaller-id doc with
    // Hamming ≤ k shares a bucket — and that doc's OWN representative
    // (its group min, ≤ its id) has the same signature/buckets, so
    // pairing representatives only loses nothing. The bucket
    // self-join — the quadratic stage — runs once per DISTINCT
    // signature: a doubled re-crawl corpus costs 4× fewer candidate
    // pairs, and vocabulary-concentrated corpora (many texts, few
    // distinct token multisets) collapse the same way. Measured on
    // the sf1 twin corpus: 9.8s → ~3s for the full dedup.
    val groups = sigs.groupBy(col("sig")).agg(min(col("id")).as("__rep"))
    val members = sigs.join(groups, Seq("sig"))
      .persist()
    val s = members.filter(col("id") === col("__rep"))
      .select(col("id"), col("sig"))
    // one row per (rep, table) with the rotated prefix bucket; the
    // per-table rotations are static, cheap long ops over the
    // signature
    val bucketCols = (0 until tables).map { t =>
      val k = t * rot
      val rotated =
        if (k == 0) col("sig")
        else shiftleft(col("sig"), k)
          .bitwiseOR(shiftrightunsigned(col("sig"), 64 - k))
      struct(lit(t).as("t"),
        shiftrightunsigned(rotated, 64 - prefixBits).as("b"))
    }
    val all = s.select(col("id"), col("sig"),
      explode(array(bucketCols: _*)).as("bk"))
    // semi-join against the under-cap bucket list; map-side combine
    // collapses the size count before its shuffle, so the cap costs
    // one (bk, count) aggregation — never a widened row. The cap now
    // counts DISTINCT-signature members, which duplication can no
    // longer inflate (same property as jaccardPairs' cap).
    val bucketed = maxBucketSize match {
      case Some(cap) =>
        val small = all.groupBy(col("bk")).agg(count(lit(1)).as("__n"))
          .filter(col("__n") <= cap).select(col("bk"))
        all.join(small, Seq("bk"), "left_semi")
      case None => all
    }
    val droppedReps = bucketed.as("a").join(bucketed.as("x"),
        col("a.bk") === col("x.bk") && col("a.id") < col("x.id"))
      .filter(bit_count(col("a.sig").bitwiseXOR(col("x.sig"))) <= maxHamming)
      .select(col("x.id").as("__rep"))
      .distinct()
    // expansion: non-minimal group members always drop (their rep is
    // a smaller-id Hamming-0 partner); members of a dropped rep's
    // group drop with it. Only the DROPPED-ID LIST materializes
    // (8 bytes/row — never the survivor rows with their text) so the
    // member cache can release; the final anti-join stays lazy.
    val dropped = members.filter(col("id") =!= col("__rep")).select(col("id"))
      .unionByName(members.join(droppedReps, Seq("__rep"))
        .select(col("id")))
      .distinct()
      .localCheckpoint()
    members.unpersist()
    sigs.unpersist()
    df.join(dropped.withColumnRenamed("id", idCol), Seq(idCol), "left_anti")
  }

  /** Near-duplicate CLUSTERS over the exact-Jaccard pair graph, with
    * exact-duplicate CONTRACTION before the expensive kernel: equal
    * texts have identical shingle sets, so (a) every exact copy of A
    * pairs with every exact copy of B whenever A~B, and (b) copies of
    * the same text always pair with each other (J = 1 ≥ τ). The
    * quotient graph over one representative per distinct text (the
    * group's min id) therefore has EXACTLY the original's components,
    * and because each representative is its group's minimum, the
    * quotient's min-labels are the original's min-labels. Returns
    * (id, component) for precisely the ids that appear in the
    * uncontracted pair graph — the same frame
    * `connectedComponents(jaccardPairs(df))` produces, at a fraction
    * of the cost.
    *
    * Scale posture: web-scale corpora are 30-50% verbatim re-crawls,
    * and the candidate join's cost is quadratic in per-shingle doc
    * multiplicity — contraction removes that multiplicity for free
    * (one 16-byte-key groupBy, the [[exact]] shuffle). The expansion
    * back to member ids is a broadcast-sized join on the group table.
    */
  def clusters(
      df: DataFrame, textCol: String, idCol: String,
      shingleSize: Int = 3, numer: Int = 1, denom: Int = 2,
      maxIter: Int = 20,
      checkpointDir: Option[String] = None,
      maxShingleFreq: Option[Long] = DefaultMaxShingleFreq): DataFrame = {
    val fp = df.select(col(idCol).as("id"),
      TextAnalysis.fingerprint(col(textCol)).as("__fp"))
    val groups = fp.groupBy(col("__fp"))
      .agg(min(col("id")).as("__rep"), count(lit(1)).as("__cnt"))
    val members = fp.join(groups, Seq("__fp"))
      .select(col("id"), col("__rep"), col("__cnt"))
    val reps = df.join(
      members.filter(col("id") === col("__rep")).select(col("id").as(idCol)),
      Seq(idCol), "left_semi")
    // straight to the kernel: reps are already one-per-distinct-text,
    // so [[jaccardPairs]]'s own contraction+expansion would be a no-op
    // costing a fingerprint pass and three joins
    val cached = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    val repSh = graft.operators.PhysicalOps.ensureParallelism(reps)
      .select(col(idCol).as("id"),
        sort_array(array_distinct(shingleHashes(col(textCol), shingleSize)))
          .as("sh"))
      .filter(size(col("sh")) > 0)
      .persist()
    cached += repSh
    val pairs = repPairKernel(repSh, numer, denom,
        prefixFilter = true, maxShingleFreq, cached)
      .select(col("id_a"), col("id_b"))
    val labels = Graph
      .connectedComponents(pairs, "id_a", "id_b", maxIter, checkpointDir)
      .withColumnRenamed("id", "__rep")
    // expand: a member's component is its representative's label; a
    // ≥2-member group whose representative paired with nothing is
    // still a cluster on its own (its copies pair with each other at
    // J = 1), component = the group min = the representative — but
    // ONLY if τ ≤ 1 admits identical-text pairs (a τ > 1 threshold
    // admits no pairs at all) AND the text has shingles: shingle-less
    // docs never pair in the uncontracted graph, copies or not.
    // Pairless singletons are not nodes and drop out.
    val shingled = repSh.select(col("id").as("__rep"),
      lit(denom >= numer).as("__has_sh"))
    val out = members.join(labels, Seq("__rep"), "left")
      .join(shingled, Seq("__rep"), "left")
      .withColumn("component", coalesce(col("component"),
        when(col("__cnt") >= 2 && col("__has_sh"), col("__rep"))))
      .filter(col("component").isNotNull)
      .select(col("id"), col("component"))
    // materialize the (id, component) table — two fixed-width columns,
    // ContextCleaner-managed — then free the session-cached
    // intermediates (repSh + the kernel's prefix table); long-lived
    // sessions running many corpora no longer accumulate cache
    val materialized = out.localCheckpoint()
    cached.foreach(_.unpersist())
    materialized
  }

  /** End-to-end fuzzy dedup: [[jaccardPairs]] candidates+verification
    * over exact-contracted representatives ([[clusters]]), transitive
    * closure, keep each cluster's smallest id plus every unpaired
    * document. This is the full MinHash-paper pipeline a corpus pass
    * actually runs — pairs alone under-delete (A~B, B~C must drop
    * BOTH B and C even when A!~C directly).
    *
    * Scale posture inherits from the parts: exact contraction first
    * (one 16-byte-key shuffle), prefix-filtered pair generation on
    * distinct texts only, the closure shuffles (id,label) pairs only,
    * and the final anti-join is keyed on the id. Pass `checkpointDir`
    * on a real cluster (see [[Graph.connectedComponents]]).
    */
  def fuzzyDedup(
      df: DataFrame, textCol: String, idCol: String,
      shingleSize: Int = 3, numer: Int = 1, denom: Int = 2,
      maxIter: Int = 20,
      checkpointDir: Option[String] = None): DataFrame = {
    val losers = clusters(df, textCol, idCol,
        shingleSize, numer, denom, maxIter, checkpointDir)
      .filter(col("id") =!= col("component"))
      .select(col("id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** Incremental exact dedup: drop every new-batch document whose text
    * already exists in the base corpus — the per-snapshot ingestion
    * step (each crawl deduped against the accumulated store). Keyed on
    * the 16-byte fingerprint, so in production the base side is the
    * stored fingerprint column, not the corpus text. Within-batch
    * duplicates are NOT collapsed here — compose with [[exact]] when
    * the batch needs internal dedup too.
    *
    * Scale posture: anti-join on a 16-byte key; neither side's text
    * shuffles (fingerprints are computed before the exchange), and a
    * small batch against a huge base stays a broadcast of the BATCH
    * side under AQE (left_anti preserves the streamed base scan).
    */
  def incrementalExact(
      newDf: DataFrame, baseDf: DataFrame, textCol: String): DataFrame = {
    val baseFp = baseDf
      .select(TextAnalysis.fingerprint(col(textCol)).as("__fp"))
      .distinct()
    newDf.withColumn("__fp", TextAnalysis.fingerprint(col(textCol)))
      .join(baseFp, Seq("__fp"), "left_anti")
      .drop("__fp")
  }

  /** Fuzzy incremental ingestion dedup — the near-dup twin of
    * [[incrementalExact]]: a batch document is dropped when ANY of its
    * LSH band keys collides with a band key of the existing corpus, so
    * re-crawls that differ by a boilerplate tail (which defeat the
    * fingerprint anti-join) still dedup away. Batch-internal dups are
    * NOT collapsed — compose with [[minhashDedup]] for that.
    *
    * `corpusBands` accepts either the corpus documents themselves or a
    * pre-computed [[minhashBandTable]] snapshot (pass
    * `corpusIsBandTable = true`): at 100 TB the corpus is signed ONCE
    * per snapshot, written out as (id, band) — a few hundred bytes per
    * document — and every arriving batch anti-joins against that index
    * instead of re-hashing the lake.
    *
    * Scale posture: the corpus side reduces to DISTINCT 8-byte band
    * keys before the join (map-side combine — hot bands collapse
    * pre-exchange); the anti-join ships batch (id, band) pairs only;
    * batch text never shuffles and a small batch against a huge index
    * broadcasts the batch side under AQE.
    */
  def incrementalMinhash(
      newDf: DataFrame, corpus: DataFrame,
      textCol: String, idCol: String,
      numHashes: Int = 64, bands: Int = 16,
      shingleSize: Int = 3,
      corpusIsBandTable: Boolean = false): DataFrame = {
    val corpusKeys = (if (corpusIsBandTable) corpus.select(col("band"))
      else {
        // exact contraction: copies of a text contribute identical
        // band keys, so the distinct-band set over one representative
        // per distinct text IS the corpus's — the signature kernel
        // (the CPU cost) runs once per distinct text
        val reps = corpus.join(
          corpus.select(col(idCol),
              TextAnalysis.fingerprint(col(textCol)).as("__fp"))
            .groupBy(col("__fp")).agg(min(col(idCol)).as(idCol)),
          Seq(idCol), "left_semi")
        minhashBandTable(reps, textCol, idCol,
          numHashes, bands, shingleSize).select(col("band"))
      })
      .distinct()
    val batchBands =
      minhashBandTable(newDf, textCol, idCol, numHashes, bands, shingleSize)
    val dropped = batchBands
      .join(corpusKeys, Seq("band"), "left_semi")
      .select(col(idCol)).distinct()
    newDf.join(dropped, Seq(idCol), "left_anti")
  }

  /** Corpus-level MinHash signature: one (seed, min-hash) row per
    * permutation — the min over the UNION of every document's shingle
    * set, which equals the element-wise min of per-document
    * signatures. This is the mergeable sketch for whole-corpus
    * comparisons: signatures of shards/snapshots combine by the same
    * element-wise min, so a 100 TB corpus is summarized shard-by-shard
    * with no global pass.
    *
    * Scale posture: signatures are computed in the scan projection;
    * after map-side combine, at most `numHashes` (seed, min) pairs
    * leave each partition — the shuffle is bounded by the sketch size,
    * not the corpus (the [[Sketches]] discipline).
    */
  def corpusSignature(
      df: DataFrame, textCol: String,
      numHashes: Int = 64, shingleSize: Int = 3): DataFrame =
    graft.operators.PhysicalOps.ensureParallelism(df)
      .select(minhashSignature(
        shingleHashes(col(textCol), shingleSize), numHashes).as("__sig"))
      .select(posexplode(col("__sig")).as(Seq("seed", "v")))
      .groupBy(col("seed")).agg(min(col("v")).as("v"))

  /** Estimated Jaccard overlap between two corpora's shingle sets —
    * the "how much of B have we already got in A" census question
    * (crawl-snapshot overlap, benchmark-vs-corpus contamination rate,
    * dataset-vendor dedup diligence) answered WITHOUT a join between
    * the corpora: each side reduces to its `numHashes`-row
    * [[corpusSignature]] and the estimate is the fraction of seeds
    * whose corpus-minima agree (the classic MinHash estimator,
    * Broder '97).
    *
    * Returns one row: (n_seeds, n_equal, jaccard_est = n_equal /
    * n_seeds). Standard error ≈ 1/sqrt(numHashes).
    */
  def corpusOverlap(
      a: DataFrame, b: DataFrame, textCol: String,
      numHashes: Int = 64, shingleSize: Int = 3): DataFrame = {
    val sa = corpusSignature(a, textCol, numHashes, shingleSize)
    val sb = corpusSignature(b, textCol, numHashes, shingleSize)
      .withColumnRenamed("v", "vb")
    sa.join(sb, Seq("seed"))
      .agg(count(lit(1)).as("n_seeds"),
        count(when(col("v") === col("vb"), 1)).as("n_equal"))
      .select(col("n_seeds"), col("n_equal"),
        (col("n_equal").cast("double") / col("n_seeds")).as("jaccard_est"))
  }

  /** Corpus-wide line-level exact dedup (the C4 preprocessing step):
    * every line (split on `sep`) is kept only at its FIRST occurrence
    * in the corpus — ordered by (doc id, line index) — and each
    * document is reassembled from its surviving lines.
    *
    * Returns (idCol, n_kept, textCol): documents whose every line was
    * first seen elsewhere produce no output row.
    *
    * Scale posture (100 TB): two shuffles, no join, no persist.
    * Shuffle 1 partitions by the 8-byte line fingerprint with a
    * map-side `min(struct(id, idx, line))` partial aggregate, so each
    * distinct line's text crosses the wire at most once per input
    * partition (duplicates collapse BEFORE the exchange — exactly
    * where boilerplate lines are legion). Shuffle 2 regroups winners
    * by document for reassembly; its payload is the deduped corpus,
    * which is the output itself.
    */
  def dedupLines(
      df: DataFrame, textCol: String, idCol: String,
      sep: String = "\n"): DataFrame = {
    val lines = df.select(col(idCol).as("id"),
      posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
        .as(Seq("idx", "line")))
    // (id, idx) is globally unique, so the struct min is decided before
    // the line field ever compares — the text rides along as payload.
    val winners = lines
      .groupBy(xxhash64(col("line")).as("__fp"))
      .agg(min(struct(col("id"), col("idx"), col("line"))).as("w"))
      .select(col("w.id").as("id"), col("w.idx").as("idx"),
        col("w.line").as("line"))
    winners.groupBy(col("id"))
      .agg(sort_array(collect_list(struct(col("idx"), col("line"))))
        .as("__ls"))
      .select(col("id").as(idCol),
        size(col("__ls")).as("n_kept"),
        array_join(transform(col("__ls"), x => x.getField("line")), sep)
          .as(textCol))
  }

  /** Benchmark-contamination counts (the GPT-3/PaLM decontamination
    * check): for each corpus document, how many of its distinct word
    * `shingleSize`-grams appear anywhere in the reference (eval) set.
    *
    * Returns (idCol, n_sh, n_hit) — documents with fewer than
    * `shingleSize` tokens have no shingles and produce no row.
    *
    * Scale posture: the eval set is benchmarks (MBs), so its distinct
    * shingle hashes broadcast; corpus text never shuffles — the only
    * exchange is the (id, count) partial-aggregate rows. The join is a
    * marker left-join (not left_semi) so zero-hit documents — the ones
    * you get to keep — still appear in the output.
    */
  def ngramContamination(
      corpus: DataFrame, ref: DataFrame,
      textCol: String, idCol: String,
      shingleSize: Int = 3): DataFrame = {
    val docSh = corpus.select(col(idCol).as("id"),
        array_distinct(shingleHashes(col(textCol), shingleSize)).as("sh"))
      .select(col("id"), size(col("sh")).as("n_sh"),
        explode(col("sh")).as("s"))
    val refSh = ref.select(
        explode(array_distinct(shingleHashes(col(textCol), shingleSize)))
          .as("s"))
      .distinct()
      .withColumn("__hit", lit(1))
    docSh.join(broadcast(refSh), Seq("s"), "left")
      .groupBy(col("id").as(idCol), col("n_sh"))
      .agg(sum(coalesce(col("__hit"), lit(0))).cast("int").as("n_hit"))
      .select(col(idCol), col("n_sh"), col("n_hit"))
  }

  /** LSH band-tuning curve: for every (threshold, bands, rows) grid
    * point, the probability that a pair with Jaccard similarity `s`
    * collides in at least one band — `1 − (1 − s^r)^b` — the standard
    * S-curve used to pick a MinHash banding for a target similarity
    * threshold (Leskovec/Rajaraman/Ullman, "Mining of Massive
    * Datasets" ch. 3, public formulation).
    *
    * ALL math is integer millionths (ppm) with a floor after every
    * multiply — the fold is `a ← ⌊a·x / 10⁶⌋` over r copies of s, then
    * over b copies of the miss probability — so the curve is
    * engine-exact (a float `pow` differs by ULPs between libm
    * implementations and could never be oracle-gated). Error vs the
    * real-valued curve is < b·r ppm — invisible at tuning granularity.
    *
    * Returns (s_ppm, bands, rws, p_ppm), one row per grid point,
    * computed in-plan from a range cross join (no driver loop, no
    * data scan — the output IS the report).
    */
  def lshTuningCurve(
      spark: org.apache.spark.sql.SparkSession,
      thresholdsPpm: Seq[Long] = (1 to 19).map(_ * 50000L),
      grid: Seq[(Int, Int)] = Seq((4, 4), (8, 4), (16, 4), (32, 4),
        (8, 8), (16, 8), (8, 16), (4, 32))): DataFrame = {
    import spark.implicits._
    val t = thresholdsPpm.toDF("s_ppm")
    val g = grid.toDF("bands", "rws")
    // ppm-scaled power by left fold: products stay < 10¹² (safe in
    // long arithmetic); the long/long divide runs in double — exact
    // below 2⁵³ — and floors back to long
    def powPpm(base: Column, n: Column): Column =
      aggregate(array_repeat(base, (n - lit(1)).cast("int")), base,
        (acc, x) => floor(acc * x / lit(1000000L)).cast("long"))
    t.crossJoin(g)
      .withColumn("__miss",
        lit(1000000L) - powPpm(col("s_ppm"), col("rws")))
      .select(col("s_ppm"), col("bands"), col("rws"),
        (lit(1000000L) - powPpm(col("__miss"), col("bands")))
          .as("p_ppm"))
  }

  /** N-gram Jaccard near-dup pairs: candidate pairs share at least one
    * shingle hash (a long-keyed self-join — no text moves), then the
    * exact Jaccard over distinct shingle sets is verified with integer
    * cross-multiplication (`2·|∩| ≥ |∪|` for τ=0.5 etc), so the result
    * is engine-exact.
    *
    * Returns (idA, idB, intersection, union) with idA < idB and
    * intersection/union over distinct shingles, filtered to
    * jaccard ≥ numer/denom.
    *
    * Exact-duplicate contraction (the [[clusters]] quotient applied to
    * PAIRS): equal texts have identical shingle sets, so every pair
    * statistic between two texts holds for every (copy, copy)
    * combination, and copies of one text pair with each other at
    * J = 1. The expensive kernel therefore runs on ONE representative
    * per distinct text; member pairs expand afterwards from the group
    * table. Candidate-generation cost drops with the SQUARE of text
    * duplication — on verbatim-heavy corpora (web crawls: 30-50%
    * re-crawls) that is the difference between a bounded join and an
    * exploding one. The output is row-identical to the uncontracted
    * kernel (MlSpec asserts it).
    *
    * Resource note: the member/shingle/prefix tables persist for the
    * plan's multiple references, the OUTPUT is eagerly materialized
    * (localCheckpoint — it is the fixed-width pair table, far smaller
    * than the corpus), and the intermediates are unpersisted before
    * returning. Repeated calls over different corpora in one long-
    * lived session therefore do not accumulate cached tables; the
    * checkpointed result itself is ContextCleaner-managed (freed when
    * the returned frame is garbage-collected), not a CacheManager
    * strong reference.
    */
  def jaccardPairs(
      df: DataFrame, textCol: String, idCol: String,
      shingleSize: Int = 3,
      numer: Int = 1, denom: Int = 2,
      prefixFilter: Boolean = true,
      maxShingleFreq: Option[Long] = DefaultMaxShingleFreq): DataFrame = {
    import org.apache.spark.sql.expressions.Window

    // persisted intermediates, unpersisted after the output
    // materializes — see the resource note above
    val cached = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

    // contraction prologue: (id → representative) via the 16-byte
    // fingerprint; persisted — the table rides five plan references
    val fpt = df.select(col(idCol).as("id"),
      TextAnalysis.fingerprint(col(textCol)).as("__fp"))
    val groups = fpt.groupBy(col("__fp")).agg(min(col("id")).as("__rep"))
    val members = fpt.join(groups, Seq("__fp"))
      .select(col("id"), col("__rep"))
      .persist()
    cached += members
    val reps = df.join(
      members.filter(col("id") === col("__rep")).select(col("id").as(idCol)),
      Seq(idCol), "left_semi")

    // The shingle table feeds candidate generation AND both sides of
    // the verification join — persist it so the text→shingle kernel
    // runs once, not once per plan reference (the signature table is
    // ~tens of bytes/doc, far smaller than the corpus). Arrays are kept
    // sorted so verification can use the zero-allocation merge-scan
    // intersect ([[graft.functions.SortedIntersectCount]]).
    val sh = graft.operators.PhysicalOps.ensureParallelism(reps)
      .select(col(idCol).as("id"),
        sort_array(array_distinct(shingleHashes(col(textCol), shingleSize)))
          .as("sh"))
      .filter(size(col("sh")) > 0)
      .persist()
    cached += sh
    val repPairs = repPairKernel(sh, numer, denom, prefixFilter,
      maxShingleFreq, cached)

    // expansion back to member ids: cross-group pairs inherit the
    // representative pair's stats verbatim; ≥2-member groups add their
    // internal J=1 pairs (|∩| = |∪| = the text's shingle count) — only
    // when τ ≤ 1 admits them, and only for texts that HAVE shingles
    // (empty-shingle docs never pair, contracted or not).
    val cross = repPairs
      .join(members.select(col("__rep").as("id_a"), col("id").as("__a")),
        Seq("id_a"))
      .join(members.select(col("__rep").as("id_b"), col("id").as("__b")),
        Seq("id_b"))
      .select(least(col("__a"), col("__b")).as("id_a"),
        greatest(col("__a"), col("__b")).as("id_b"),
        col("intersection"), col("union"))
    val out =
      if (denom < numer) cross // τ > 1: identical pairs excluded
      else {
        val within = members.as("x").join(members.as("y"),
            col("x.__rep") === col("y.__rep") && col("x.id") < col("y.id"))
          .select(col("x.__rep").as("__rep"),
            col("x.id").as("id_a"), col("y.id").as("id_b"))
          .join(sh.select(col("id").as("__rep"),
            size(col("sh")).as("__n")), Seq("__rep"))
          .select(col("id_a"), col("id_b"),
            col("__n").as("intersection"), col("__n").as("union"))
        cross.unionByName(within)
      }
    // materialize, then free the session-cached intermediates
    val materialized = out.localCheckpoint()
    cached.foreach(_.unpersist())
    materialized
  }

  /** The pair kernel proper, over a deduplicated (id, sorted distinct
    * shingle array) table.
    */
  private def repPairKernel(
      sh: DataFrame, numer: Int, denom: Int,
      prefixFilter: Boolean,
      maxShingleFreq: Option[Long],
      cached: scala.collection.mutable.Buffer[DataFrame]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ex = sh.select(col("id"), size(col("sh")).as("n"),
      explode(col("sh")).as("s"))

    if (!prefixFilter) {
      // direct variant: |∩| falls out of the shared-shingle join count;
      // right when shingle frequencies are near-uniform (no hot keys)
      val sizes = sh.select(col("id"), size(col("sh")).as("n"))
      val inter = ex.as("a").join(ex.as("b"),
          col("a.s") === col("b.s") && col("a.id") < col("b.id"))
        .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .agg(count(lit(1)).cast("int").as("intersection"))
      return inter
        .join(sizes.withColumnRenamed("n", "n_a"),
          col("id_a") === col("id")).drop("id")
        .join(sizes.withColumnRenamed("n", "n_b"),
          col("id_b") === col("id")).drop("id")
        .withColumn("union", col("n_a") + col("n_b") - col("intersection"))
        .filter(col("intersection") * denom >= col("union") * numer)
        .select(col("id_a"), col("id_b"), col("intersection"), col("union"))
    }

    // Prefix filtering (PPJoin-style, exact): order each doc's shingles
    // by global rarity; if J(A,B) ≥ τ = numer/denom then A and B must
    // share a shingle within their (n − ⌈τ·n⌉ + 1)-prefixes. Joining
    // only prefixes collapses the candidate blowup on frequent shingles
    // while losing no true pair.
    val freq = ex.groupBy(col("s")).agg(count(lit(1)).as("f"))
    val ranked = ex.join(freq, "s")
      .withColumn("r", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("f"), col("s"))))
    val prefixLen = col("n") - ceil(col("n") * numer / denom) + 1
    // Optional recall knob for adversarial corpora: exclude shingles
    // whose DISTINCT-TEXT frequency exceeds the cap from CANDIDATE
    // GENERATION only (verification still uses full shingle sets).
    // With the cap unset the join is exact; with it set, a true
    // cross-text pair is missed only if every prefix shingle it shares
    // is hotter than the cap — at 100 TB that trades bounded skew for
    // bounded recall loss. Identical-text pairs come from the
    // contraction expansion, need no candidates, and are immune to
    // the cap (and duplication can no longer make a shingle "hot").
    // prefix is self-joined — persist so the freq-join + window run
    // once, not once per join side; (n, r) ride along for the
    // positional filter
    val prefix = ranked.filter(col("r") <= prefixLen &&
        maxShingleFreq.map(cap => col("f") <= cap).getOrElse(lit(true)))
      .select(col("id"), col("s"), col("n"), col("r"))
      .persist()
    cached += prefix

    // Positional filter (PPJoin): for a shared prefix shingle at ranks
    // (r_a, r_b), |∩| ≤ 1 + min(n_a−r_a, n_b−r_b); J ≥ numer/denom
    // ⇔ |∩|·(numer+denom) ≥ numer·(n_a+n_b). Safe under OR-semantics:
    // a true pair's FIRST shared shingle in the global (freq, s) order
    // has no common element before it, so its bound row always passes.
    val posBound = (lit(1) +
      least(col("a.n") - col("a.r"), col("b.n") - col("b.r"))) *
      (numer + denom) >= (col("a.n") + col("b.n")) * numer
    val candidates = prefix.as("a").join(prefix.as("b"),
        col("a.s") === col("b.s") && col("a.id") < col("b.id") && posBound)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()

    // exact verification on the (small) candidate set only; merge-scan
    // intersect over the sorted arrays, one evaluation per pair
    candidates
      .join(sh.select(col("id"), col("sh").as("sh_a")),
        col("id_a") === col("id")).drop("id")
      .join(sh.select(col("id"), col("sh").as("sh_b")),
        col("id_b") === col("id")).drop("id")
      .select(col("id_a"), col("id_b"),
        graft.functions.SortedIntersectCount
          .sortedIntersectCount(col("sh_a"), col("sh_b")).as("intersection"),
        size(col("sh_a")).as("n_a"), size(col("sh_b")).as("n_b"))
      .withColumn("union", col("n_a") + col("n_b") - col("intersection"))
      .filter(col("intersection") * denom >= col("union") * numer)
      .select(col("id_a"), col("id_b"), col("intersection"), col("union"))
  }
}
