package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Substring-level duplication: find the maximal token spans of each
  * document whose `width`-gram content also appears in at least
  * `minDocs` distinct documents ("Deduplicating Training Data Makes
  * Language Models Better", Lee et al. 2022 — the suffix-array
  * use-case, re-expressed relationally so it distributes).
  *
  * Document-level dedup (exact/MinHash/SimHash in [[Dedup]]) misses
  * the dominant real-world case of long boilerplate blocks embedded in
  * otherwise-unique pages; span-level detection finds the blocks
  * themselves so a curation pass can excise rather than drop.
  *
  * Plan shape, in scale order:
  *  1. positional gram hashes — the [[graft.functions.ShingleHashes]]
  *     codegen kernel (one fused pass per row, no tokenize-then-gram
  *     intermediate arrays), exploded to (id, pos, hash64);
  *  2. gram document-frequency on the 8-byte hash (one fixed-width
  *     shuffle; map-side partial counts absorb hot boilerplate grams);
  *  3. semi-join grams against the ≥minDocs hash set (second
  *     fixed-width shuffle; AQE broadcasts the dup-hash side when the
  *     duplicated vocabulary is small, the common case);
  *  4. adjacent duplicated positions coalesce into maximal spans with
  *     the islands trick (pos - row_number is constant within a run)
  *     — a per-document window over only the DUPLICATED positions,
  *     which is the post-filter minority of the corpus.
  *
  * Nothing document-sized crosses an exchange after step 1, and step
  * 1's payload is (id, pos, hash) triplets — ~20 bytes per token at
  * any corpus size. Driver holds nothing.
  */
object SpanDedup {

  /** One row per maximal duplicated span: (idCol, span_start,
    * span_end, n_grams) — token positions, 0-based inclusive;
    * span_end = last gram's start + width - 1. Documents with no
    * duplicated grams emit nothing.
    */
  def duplicateSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      width: Int = 3,
      minDocs: Int = 2): DataFrame = {
    require(width >= 1, "width must be >= 1")
    require(minDocs >= 2, "minDocs must be >= 2 (a span duplicates across docs)")
    val grams = docs.select(
      col(idCol),
      posexplode(Dedup.shingleHashes(col(textCol), width)).as(Seq("pos", "h")))

    val dupHashes = grams.groupBy(col("h"))
      .agg(countDistinct(col(idCol)).as("__nd"))
      .filter(col("__nd") >= minDocs)
      .select("h")

    val hits = grams.join(dupHashes, Seq("h"), "left_semi")

    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    hits
      .withColumn("__grp", col("pos") - row_number().over(w))
      .groupBy(col(idCol), col("__grp"))
      .agg(
        min(col("pos")).cast("long").as("span_start"),
        (max(col("pos")) + lit(width - 1)).cast("long").as("span_end"),
        count(lit(1)).as("n_grams"))
      .drop("__grp")
  }
}
