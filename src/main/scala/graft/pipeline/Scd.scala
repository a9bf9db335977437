package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension maintenance for the star-schema loads the
  * reference pipeline performs (pipeline.py's Dim* loads are Type-1
  * overwrites; this adds the Type-2 history-keeping variant every
  * production warehouse eventually needs for those same dimensions).
  *
  * Scale posture: one shuffle join on the natural key between the OPEN
  * slice of the dimension and the update batch; CLOSED history rows —
  * the bulk of a years-old 100 TB dimension — never enter the join,
  * they pass through as a union leg with no exchange. A daily update
  * batch is typically orders of magnitude smaller than the dimension,
  * so AQE will broadcast it; callers can force `broadcast(updates)`
  * when they know the batch is small. Tracked-attribute comparison is
  * null-safe (`<=>`), so NULL→value and value→NULL transitions version
  * the row like any other change.
  */
object Scd {

  /** Apply one update batch to an SCD Type-2 dimension.
    *
    * `current` must carry `keys ++ tracked ++ (effCol, endCol, curCol)`;
    * `updates` carries `keys ++ tracked` (the new attribute values).
    * Returns the full post-batch dimension state:
    *
    *  - closed rows (`curCol` false) pass through untouched;
    *  - an open row whose tracked attributes all match its update (or
    *    that has no update) passes through untouched;
    *  - an open row with a differing update is CLOSED (`endCol` :=
    *    `batchDate`, `curCol` := false) and a new open version is
    *    emitted (`effCol` := `batchDate`, `endCol` := NULL);
    *  - an update whose key has no open row inserts a new open row.
    *
    * NULL natural keys: a null-keyed OPEN row never matches any update
    * (the equi-join is null-rejecting) and passes through untouched —
    * it is never silently dropped. A null-keyed UPDATE row fails the
    * `validateBatch` guard (bad upstream data until proven otherwise);
    * with `validateBatch=false` it inserts as a new open row.
    *
    * `batchDate` must be a literal/deterministic column — the caller
    * owns the batch's effective date; this function never reads the
    * wall clock (a retry must produce byte-identical output).
    */
  def scd2Apply(
      current: DataFrame,
      updates: DataFrame,
      keys: Seq[String],
      tracked: Seq[String],
      batchDate: Column,
      effCol: String = "eff_from",
      endCol: String = "eff_to",
      curCol: String = "is_current",
      validateBatch: Boolean = true): DataFrame = {
    require(keys.nonEmpty, "scd2Apply needs at least one key column")
    val outCols = keys ++ tracked ++ Seq(effCol, endCol, curCol)

    val closed = current.filter(!col(curCol)).select(outCols.map(col): _*)
    val open   = current.filter(col(curCol))

    // One update row per key — a duplicate-keyed batch fans the join
    // out and CORRUPTS the dimension (two open versions per key), so
    // the default is to fail fast. The check is one aggregate job over
    // the BATCH (the small side by construction); opt out with
    // validateBatch=false when the upstream already guarantees
    // key-uniqueness and the extra job matters.
    val upd = updates.select((keys ++ tracked).map(col): _*)
    if (validateBatch) {
      val dup = upd.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("__n")).filter(col("__n") > 1)
        .limit(1).count()
      require(dup == 0L,
        s"scd2Apply: update batch has duplicate keys on (${keys.mkString(", ")})" +
          " — deduplicate upstream (e.g. latest-timestamp-wins) or pass validateBatch=false")
      // A null-keyed update row can never match an open row (the
      // equi-join is null-rejecting), so it would always insert a
      // null-keyed open version — almost certainly bad upstream data;
      // fail fast under the same flag as the duplicate guard.
      val nullKeyed = upd
        .filter(keys.map(k => col(k).isNull).reduce(_ || _))
        .limit(1).count()
      require(nullKeyed == 0L,
        s"scd2Apply: update batch has NULL keys on (${keys.mkString(", ")})" +
          " — clean upstream or pass validateBatch=false to insert them as-is")
    }

    // Side-presence MARKERS, not key-nullability: the full-outer join
    // never matches NULL keys, so inferring presence from
    // `key.isNotNull` silently DELETED any null-keyed open row (both
    // legs evaluated to null). With markers, a null-keyed open row is
    // hasOpen=true / hasUpdate=false — it passes through untouched like
    // any update-less row — and a null-keyed update (validateBatch
    // off) inserts, per the "no open row" contract.
    val u = upd.columns.foldLeft(upd)((d, c) => d.withColumnRenamed(c, s"__u_$c"))
      .withColumn("__u_present", lit(true))
    val joined = open.withColumn("__o_present", lit(true)).join(
      u, keys.map(k => col(k) === col(s"__u_$k")).reduce(_ && _), "full_outer")

    val hasOpen   = coalesce(col("__o_present"), lit(false))
    val hasUpdate = coalesce(col("__u_present"), lit(false))
    val changed   = tracked.map(c => !(col(c) <=> col(s"__u_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))

    // Both output rows of a joined key come out of ONE pass over the
    // join: a per-row struct array (surviving open version and/or the
    // new open version), compacted and exploded. Expressing the two
    // legs as separate select+union branches instead makes Catalyst
    // duplicate the join — one specialized copy per leg — and a 100 TB
    // dimension would be scanned and shuffled twice.
    val openLeg = when(hasOpen, struct(
      keys.map(k => col(k).as(k)) ++ tracked.map(c => col(c).as(c)) ++ Seq(
        col(effCol).as(effCol),
        when(hasUpdate && changed, batchDate).otherwise(col(endCol)).as(endCol),
        (!(hasUpdate && changed)).as(curCol)): _*))
    val freshLeg = when(hasUpdate && (!hasOpen || changed), struct(
      keys.map(k => col(s"__u_$k").as(k)) ++
        tracked.map(c => col(s"__u_$c").as(c)) ++ Seq(
          batchDate.as(effCol),
          lit(null).cast(open.schema(endCol).dataType).as(endCol),
          lit(true).as(curCol)): _*))
    val merged = joined
      .select(explode(array_compact(array(openLeg, freshLeg))).as("__r"))
      .select(col("__r.*"))

    closed.unionByName(merged)
  }

  /** Temporal dimension lookup — the fact-side companion of
    * [[scd2Apply]]: join each fact row to the dimension VERSION that
    * was valid at the fact's date (`eff_from <= date < eff_to`, open
    * versions have NULL `eff_to`). `keys` maps fact key column →
    * dimension key column.
    *
    * Plan: an equi-join on the keys with the validity range as a join
    * residual — Catalyst keeps the hash/sort-merge strategy (never a
    * nested-loop: the equality conjunct drives dispatch) and
    * evaluates the range on the few versions sharing a key. Dimension
    * key columns are prefixed away so the output carries exactly one
    * copy of each join key.
    *
    * With a correctly-maintained SCD2 dimension, validity intervals
    * per key are disjoint, so each fact row matches at most one
    * version; `joinType="left"` keeps facts whose date precedes every
    * version (nulls in the dim columns) — the standard late-arriving
    * dimension posture.
    */
  def dimLookup(
      fact: DataFrame,
      dim: DataFrame,
      keys: Seq[(String, String)],
      factDateCol: String,
      effCol: String = "eff_from",
      endCol: String = "eff_to",
      joinType: String = "left"): DataFrame = {
    require(keys.nonEmpty, "dimLookup needs at least one key pair")
    val d = keys.foldLeft(dim) { case (df, (_, dk)) =>
      df.withColumnRenamed(dk, s"__d_$dk")
    }
    val cond = keys.map { case (fk, dk) => col(fk) === col(s"__d_$dk") }
      .reduce(_ && _) &&
      col(factDateCol) >= col(effCol) &&
      (col(endCol).isNull || col(factDateCol) < col(endCol))
    fact.join(d, cond, joinType)
      .drop(keys.map { case (_, dk) => s"__d_$dk" }: _*)
  }

  /** SCD Type-1 (overwrite in place, no history): the update batch's
    * attribute values replace the open row's; new keys insert. This is
    * the contract pipeline.py's Dim* loads implement by full rewrite —
    * expressed here as a key-join so only the touched partition of a
    * large dimension rewrites. Delegates to
    * [[graft.operators.Joins.mergeFrames]] semantics with key-unique
    * staging.
    */
  def scd1Apply(
      current: DataFrame,
      updates: DataFrame,
      keys: Seq[String]): DataFrame =
    graft.operators.Joins.mergeFrames(current, updates, keys)

  /** Validity-chain audit for an SCD Type-2 dimension: per key, order
    * the versions by `effCol` and compare each version's `endCol`
    * against its successor's `effCol`. Returns one row per FLAWED
    * version — `status` is `overlap` (successor starts before this
    * version ends — two versions simultaneously valid, the corruption
    * [[scd2Apply]]'s duplicate-batch guard exists to prevent),
    * `gap` (successor starts after this version ends — dates in the
    * hole resolve to NO version), or `open_not_last` (an open-ended
    * version that has a successor). A clean dimension returns an
    * empty frame.
    *
    * One lead() window per key over the version sort — the dimension
    * streams through a single key shuffle; nothing joins.
    */
  def validityAudit(
      dim: DataFrame, keys: Seq[String],
      effCol: String = "eff_from",
      endCol: String = "eff_to"): DataFrame = {
    require(keys.nonEmpty, "validityAudit needs at least one key column")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(effCol).asc)
    val nextFrom = lead(col(effCol), 1).over(w)
    val status = when(nextFrom.isNull, lit(null).cast("string"))
      .when(col(endCol).isNull, lit("open_not_last"))
      .otherwise(when(nextFrom < col(endCol), lit("overlap"))
        .when(nextFrom > col(endCol), lit("gap")))
    dim.withColumn("next_from", nextFrom)
      .withColumn("status", status)
      .filter(col("status").isNotNull)
  }
}
