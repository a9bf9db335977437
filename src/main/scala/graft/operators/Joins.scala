package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join surface of the reference, Spark-first.
  *
  * The reference's joins (SURVEY §2.4): the DynamicFrame equi-join
  * (awsglue/transforms/field_transforms.py:384-428), the pipeline's
  * incremental "insert-only-new-rows" idiom — left join + null-filter +
  * drop (pipeline.py:125-127 and five more dims; composite-key fact
  * variant pipeline.py:975-989) — and the upsert-style
  * mergeDynamicFrame (dynamicframe.py:436-461).
  *
  * Scale posture: we emit `left_anti` directly instead of the
  * reference's join+filter+drop, which halves the shuffled payload (no
  * probe columns materialized) and lets Catalyst/AQE pick
  * broadcast-anti when the existing-keys side is small. Dimension
  * probes should be passed through [[autoBroadcast]].
  */
object Joins {

  /** DynamicFrame equi-join (field_transforms.py:384-428): multi-key
    * equality inner join, both sides' columns kept.
    */
  def equiJoin(
      left: DataFrame, leftKeys: Seq[String],
      right: DataFrame, rightKeys: Seq[String]): DataFrame = {
    require(leftKeys.nonEmpty && leftKeys.length == rightKeys.length,
      "join requires same number of keys on both sides")
    val cond = leftKeys.zip(rightKeys)
      .map { case (a, b) => left(a) === right(b) }
      .reduce(_ && _)
    left.join(right, cond, "inner")
  }

  /** Broadcast the frame if it is known-small (dimension tables in the
    * reference are ≤504 rows — SURVEY §2.4 J5). Catalyst auto-broadcasts
    * below the threshold, but an explicit hint survives missing stats.
    */
  def autoBroadcast(dim: DataFrame): DataFrame = broadcast(dim)

  /** Incremental load anti-join (J3): keep rows of `incoming` whose key
    * does not exist in `existing`. Equivalent to the reference's
    * left-join + "key is null" filter + drop (pipeline.py:125-127), but
    * shuffles only the keys of `existing` and materializes no probe
    * columns.
    */
  def insertOnlyNew(
      incoming: DataFrame,
      existing: DataFrame,
      keys: Seq[String]): DataFrame =
    incoming.join(existing.select(keys.map(col): _*), keys, "left_anti")

  /** Composite-key fact variant (J4, pipeline.py:975-989). Semantics
    * note preserved from the reference: SQL anti-join never matches
    * null-valued keys, so facts with any null key are always
    * re-inserted — reproduced here by construction.
    */
  def insertOnlyNewComposite(
      incoming: DataFrame,
      existing: DataFrame,
      keys: Seq[String]): DataFrame = insertOnlyNew(incoming, existing, keys)

  /** mergeDynamicFrame (dynamicframe.py:436-461): upsert-style merge of
    * `staging` into `source` by primary keys — unmatched source rows
    * kept, matched rows replaced by staging rows (staging duplicates are
    * NOT deduplicated, matching the reference contract).
    */
  def mergeFrames(
      source: DataFrame,
      staging: DataFrame,
      keys: Seq[String]): DataFrame =
    source.join(staging.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(staging, allowMissingColumns = false)

  /** Build a multi-key equality condition between two frames by name. */
  def keyCondition(l: DataFrame, r: DataFrame, keys: Seq[(String, String)]): Column =
    keys.map { case (a, b) => l(a) === r(b) }.reduce(_ && _)

  /** Salted inner equi-join for skewed keys: the left (skewed) side
    * gets a deterministic row-hash salt in [0, salts); the right side
    * replicates each row once per salt value; the join key becomes
    * (key, salt), so one hot key's rows spread over `salts` tasks
    * instead of one straggler. Result-identical to [[equiJoin]] (every
    * left row still meets every matching right row exactly once).
    *
    * AQE's skew-join split already handles sort-merge skew at runtime;
    * reach for explicit salting when AQE can't split — bucketed
    * inputs, skewed aggregation upstream, or a hot key inside a single
    * post-shuffle partition. Cost: right side × salts, so size
    * `salts` to the hot key's excess, not to parallelism.
    */
  def saltedJoin(
      left: DataFrame, leftKeys: Seq[String],
      right: DataFrame, rightKeys: Seq[String],
      salts: Int): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val sl = left.withColumn("__salt",
      pmod(xxhash64(left.columns.map(col).toSeq: _*), lit(salts.toLong))
        .cast("int"))
    val sr = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    val cond = (leftKeys.zip(rightKeys)
      .map { case (a, b) => sl(a) === sr(b) } :+
      (sl("__salt") === sr("__salt"))).reduce(_ && _)
    sl.join(sr, cond, "inner")
      .select(left.columns.map(sl(_)).toSeq ++
        right.columns.map(sr(_)).toSeq: _*)
  }

  /** Bloom-filter-accelerated semi-join: build a deterministic Bloom
    * filter over `right`'s keys, pre-filter `left` with it (a
    * stateless codegen'd projection — no shuffle), then finish with
    * the exact semi-join on the survivors. Result-identical to the
    * plain semi-join (the Bloom pass only admits false POSITIVES, and
    * the exact join removes them); the win is that the big probe side
    * sheds non-matching rows BEFORE the shuffle — the manual form of
    * Spark's runtime bloom-filter pushdown, usable when the optimizer
    * can't inject one (disk-materialized intermediates, non-equi
    * pre-stages, or a build side behind a barrier).
    *
    * The filter is an `Array[Long]` bitset built on the driver —
    * numBits/8 bytes (default 8 KiB) regardless of build-side row
    * count; only DISTINCT bit positions are collected (≤ numBits
    * rows), so a 100 TB probe side meets a fixed-size broadcast, and
    * the build side is assumed dimension-sized (the same assumption
    * the optimizer's own runtime filter makes). Hashing is the
    * engine-portable [[graft.functions.Mix64]] family, so the
    * pre-filter is deterministic across retries and engines.
    */
  def bloomSemiJoin(
      left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String,
      numBits: Int = 1 << 16, numHashes: Int = 3): DataFrame = {
    require(numBits >= 64 && (numBits & (numBits - 1)) == 0,
      s"numBits must be a power of two >= 64, got $numBits")
    require(numHashes >= 1 && numHashes <= 8,
      s"numHashes must be in [1,8], got $numHashes")
    import graft.functions.Mix64
    val mask = numBits.toLong - 1

    def positions(key: Column): Seq[Column] =
      (0 until numHashes).map(s =>
        Mix64.mix64(key.cast("long"), 50 + s).bitwiseAND(lit(mask)))

    val posRows = right
      .select(explode(array(positions(col(rightKey)): _*)).as("p"))
      .distinct()
      .collect()
    val words = new Array[Long](numBits / 64)
    posRows.foreach { r =>
      val p = r.getLong(0).toInt
      words(p >> 6) |= (1L << (p & 63))
    }
    val wordsCol = typedLit(words.toSeq)

    val bitChecks = positions(col(leftKey)).map { p =>
      val word = element_at(wordsCol,
        shiftrightunsigned(p, 6).cast("int") + lit(1))
      // column-typed shift amount: the SQL-layer function accepts an
      // expression where the Scala API only takes a literal Int
      call_function("shiftrightunsigned", word, p.bitwiseAND(lit(63L)))
        .bitwiseAND(lit(1L)) === lit(1L)
    }
    left.filter(bitChecks.reduce(_ && _))
      .join(right.select(col(rightKey)),
        col(leftKey) === col(rightKey), "left_semi")
  }

  /** As-of join (point-in-time lookup): for every left row, attach the
    * right row with the greatest `rightTime` ≤ `leftTime` within the
    * same key group (backward, inclusive — ANSI/DuckDB `ASOF LEFT
    * JOIN ON l.k = r.k AND l.t >= r.t` semantics); left rows before the
    * first right row get nulls.
    *
    * Implemented as the union-sort pattern, not a join: both sides
    * shuffle ONCE on the key, the per-key running `last(..,
    * ignoreNulls)` window carries the most recent right payload
    * forward (right rows sort before left rows at equal timestamps),
    * and left rows are filtered back out. No join blow-up, no range
    * cross-product — cost is a sort per key group, the same shape
    * Flink/pandas `merge_asof` uses, so it survives corpus-scale
    * event tables. Ties inside `right` on (key, time) are resolved by
    * whichever sorts last — pre-deduplicate `right` to one row per
    * (key, time) for deterministic output.
    *
    * Right's non-key, non-time columns are attached with their own
    * names; the caller renames collisions beforehand.
    */
  def asOfJoin(
      left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTime: String, rightTime: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(keys.nonEmpty, "asOfJoin requires at least one key")
    val payloadCols = right.columns.toSeq
      .filterNot(c => keys.contains(c) || c == rightTime)
    require(payloadCols.nonEmpty, "right side has no payload columns")
    val payload = struct(payloadCols.map(col): _*)
    val payloadType = right.select(payload).schema.head.dataType

    val lPayload = struct(left.columns.map(col).toSeq: _*)
    val lPayloadType = left.select(lPayload).schema.head.dataType

    val rSide = right.select(
      keys.map(col) ++ Seq(
        col(rightTime).as("__t"), lit(0).as("__side"),
        payload.as("__rv"), lit(null).cast(lPayloadType).as("__lv")): _*)
    val lSide = left.select(
      keys.map(col) ++ Seq(
        col(leftTime).as("__t"), lit(1).as("__side"),
        lit(null).cast(payloadType).as("__rv"), lPayload.as("__lv")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rSide.unionByName(lSide)
      .withColumn("__match", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(left.columns.toSeq.map(c =>
        col("__lv").getField(c).as(c)) ++
        payloadCols.map(c => col("__match").getField(c).as(c)): _*)
  }

  /** Range (interval) join: every (point, interval) pair with
    * `lo ≤ point ≤ hi` — the IP-to-geo / value-to-band / time-in-window
    * lookup shape. Spark plans a bare range predicate as a broadcast
    * nested loop (or a cartesian product when neither side fits) —
    * O(|points|·|intervals|) comparisons however the data distributes.
    *
    * This is the bucketized rewrite: intervals explode to the
    * fixed-width buckets they overlap (`floor(lo/w) .. floor(hi/w)`),
    * points map to exactly one bucket, and the match becomes an
    * EQUI-join on the bucket id plus a residual `BETWEEN` filter. Each
    * true pair survives exactly once (a point lives in one bucket),
    * so no distinct pass is needed.
    *
    * Scale posture (100 TB): the shuffle is hash-partitioned on the
    * bucket id — both sides distribute, no broadcast-size cliff, no
    * nested loop. The explode factor is `len/w + 1` per interval, so
    * pick `bucketWidth` near the TYPICAL interval length: the
    * replication stays O(1) per interval while each bucket pairs only
    * co-located rows. Degenerate inputs (one interval spanning
    * everything) belong in a broadcast pre-filter, not here. Intervals
    * with `hi < lo` are dropped (Spark's `sequence` would otherwise
    * step BACKWARD and fabricate buckets).
    *
    * Both sides' columns are returned; the caller disambiguates
    * colliding names beforehand.
    */
  def rangeJoin(
      points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be >= 1 (got $bucketWidth)")
    val w = lit(bucketWidth)
    val pb = points.withColumn("__bucket",
      floor(col(pointCol) / w).cast("long"))
    val ib = intervals
      .filter(col(hiCol) >= col(loCol))
      .withColumn("__bucket",
        explode(sequence(floor(col(loCol) / w).cast("long"),
          floor(col(hiCol) / w).cast("long"))))
    pb.join(ib, Seq("__bucket"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bucket")
  }

  /** Hierarchical fallback lookup: resolve a value for each fact row
    * by trying progressively coarser dimension tables — exact match
    * first, fall back level by level, default last. The standard
    * "override table" enrichment (per-customer price rule, else
    * per-region rule, else list default) that otherwise gets written
    * as N self-UNIONs rescanning the fact table N times.
    *
    * `levels` are (dim, factKey→dimKey pairs, dim value column) in
    * priority order. Each level contributes one LEFT join; the
    * emitted `outCol` is the first non-null level value, else
    * `default`. A fact row matching several rows in one dim fans out
    * (same contract as any join) — dims are expected key-unique.
    *
    * Scale posture: the fact table streams through N broadcast hash
    * joins in a single stage — lookup dims are override/config-sized
    * by nature, so every level is `broadcast()` and the fact is
    * scanned ONCE with zero shuffles. For a genuinely large level,
    * drop to a plain join upstream instead of using this helper.
    */
  def coalesceLookup(
      fact: DataFrame,
      levels: Seq[(DataFrame, Seq[(String, String)], String)],
      outCol: String,
      default: Column = lit(null)): DataFrame = {
    require(levels.nonEmpty, "coalesceLookup needs at least one level")
    val joined = levels.zipWithIndex.foldLeft(fact) {
      case (acc, ((dim, keys, valCol), i)) =>
        val slim = dim.select(
          (keys.map { case (_, dk) => col(dk) } :+
            col(valCol).as(s"__lv$i")): _*)
        val cond = keys.map { case (fk, dk) => acc(fk) === slim(dk) }
          .reduce(_ && _)
        keys.foldLeft(acc.join(broadcast(slim), cond, "left")) {
          case (d, (_, dk)) => d.drop(slim(dk))
        }
    }
    val firstHit = coalesce(
      levels.indices.map(i => col(s"__lv$i")) :+ default: _*)
    joined.withColumn(outCol, firstHit)
      .drop(levels.indices.map(i => s"__lv$i"): _*)
  }
}
