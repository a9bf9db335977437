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
    * MinHash and Jaccard. Hashing at shingle-creation keeps every
    * downstream structure fixed-width.
    */
  def shingleHashes(text: Column, n: Int = 3): Column = {
    val toks = TextAnalysis.tokens(text)
    // sliding window: positions 0 .. size-n, hash the joined n-gram
    transform(
      sequence(lit(0), greatest(size(toks) - n, lit(0))),
      i => xxhash64(concat_ws(" ",
        slice(toks, i + lit(1), lit(n)))))
  }

  /** MinHash signature: `numHashes` permutations simulated as
    * xxhash64(seed ++ shingle) minima — one array column, computed in a
    * single projection.
    */
  def minhashSignature(shingles: Column, numHashes: Int = 64): Column =
    array((0 until numHashes).map(seed =>
      array_min(transform(shingles, s => xxhash64(lit(seed), s)))): _*)

  /** LSH band keys: split the signature into `bands` bands of
    * `rows = numHashes/bands` and hash each band. Docs sharing any band
    * key are near-dup candidates.
    */
  def lshBandKeys(signature: Column, bands: Int, rows: Int): Column =
    array((0 until bands).map(b =>
      xxhash64(lit(b), concat_ws(",",
        slice(signature, b * rows + 1, rows)))): _*)

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
    val withBands = df.select(
      col(idCol),
      lshBandKeys(
        minhashSignature(shingleHashes(col(textCol), shingleSize), numHashes),
        bands, rows).as("__bands"))
    val exploded = withBands.select(col(idCol),
      explode(col("__bands")).as("__band"))
    // min id per bucket, then per doc: the smallest competitor seen
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

  /** N-gram Jaccard near-dup pairs: candidate pairs share at least one
    * shingle hash (a long-keyed self-join — no text moves), then the
    * exact Jaccard over distinct shingle sets is verified with integer
    * cross-multiplication (`2·|∩| ≥ |∪|` for τ=0.5 etc), so the result
    * is engine-exact.
    *
    * Returns (idA, idB, intersection, union) with idA < idB and
    * intersection/union over distinct shingles, filtered to
    * jaccard ≥ numer/denom.
    */
  def jaccardPairs(
      df: DataFrame, textCol: String, idCol: String,
      shingleSize: Int = 3,
      numer: Int = 1, denom: Int = 2): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
      array_distinct(shingleHashes(col(textCol), shingleSize)).as("sh"))
      .filter(size(col("sh")) > 0)
    val ex = sh.select(col("id"), explode(col("sh")).as("s"))
    val candidates = ex.as("a").join(ex.as("b"),
        col("a.s") === col("b.s") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    val withSets = candidates
      .join(sh.withColumnRenamed("sh", "sh_a"), col("id_a") === col("id"))
      .drop("id")
      .join(sh.withColumnRenamed("sh", "sh_b"), col("id_b") === col("id"))
      .drop("id")
    withSets
      .withColumn("intersection",
        size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("union",
        size(col("sh_a")) + size(col("sh_b")) - col("intersection"))
      .filter(col("intersection") * denom >= col("union") * numer)
      .select(col("id_a"), col("id_b"), col("intersection"), col("union"))
  }
}
