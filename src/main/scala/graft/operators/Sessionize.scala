package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based batch sessionization over event streams at rest: group a
  * key's events into sessions split wherever the inter-event gap
  * exceeds a threshold — the batch twin of the streaming session
  * windows in [[graft.streaming.EventTime]].
  *
  * Shape: ONE shuffle on the session key, then two window passes over
  * the same (key, ts) sort order (Spark executes both in a single
  * Sort + Window chain — the second window reuses the first's
  * ordering, no re-shuffle, no re-sort). No self-join, no range
  * blow-up: cost is sort-per-key-group, which survives a 100 TB event
  * table the same way any keyed window does. Skewed whale users are
  * the usual caveat — cap per-key history upstream or pre-split by
  * day before sessionizing.
  */
object Sessionize {

  /** Tag every event with its per-key session index (1-based, in time
    * order). `tsCol` must be numeric (epoch nanos/micros/seconds —
    * whatever unit, `gap` is in the same unit); a new session starts
    * when the gap since the key's previous event exceeds `gap`.
    * Ordering ties on (key, ts) are stable for session ASSIGNMENT
    * (equal timestamps never exceed the gap, so ties land in the same
    * session and the index is deterministic).
    */
  def sessionize(
      df: DataFrame, keyCol: String, tsCol: String, gap: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
    val boundary = when(
      lag(col(tsCol), 1).over(w).isNull ||
        col(tsCol) - lag(col(tsCol), 1).over(w) > gap, 1).otherwise(0)
    df.withColumn("session_seq",
      sum(boundary).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Collapse to one row per session: key, session index, start/end
    * timestamps, event count. Built on [[sessionize]] plus one
    * aggregation keyed on (key, session_seq) — map-side combine
    * collapses each partition's share of a session before the shuffle.
    */
  def sessions(
      df: DataFrame, keyCol: String, tsCol: String, gap: Long): DataFrame =
    sessionize(df, keyCol, tsCol, gap)
      .groupBy(col(keyCol), col("session_seq"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"))

  /** Ordered funnel pattern match: for each user, the earliest chain
    * of `steps` completed strictly in time order — t(step i) is the
    * first event of that type AFTER t(step i-1). Output: one row per
    * user with a `t_<step>` timestamp per step (null = never reached)
    * and `depth` (number of steps completed).
    *
    * Plan: ONE shuffle — the per-user event list is collected sorted
    * and the step chain is a single `aggregate` fold over it (k
    * `when`s per event, codegen'd); k separate "min ts after previous
    * step" aggregations would cost k shuffles and k joins. Memory is
    * bounded by one user's event count (the per-key history cap
    * upstream is the whale-user guard, as with [[sessionize]]).
    * Greedy-first on the sorted list ≡ the chained-min definition:
    * the first type-matching event after the previous step IS the
    * minimum.
    */
  def funnelMatch(
      df: DataFrame, userCol: String, tsCol: String, typeCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty && steps.distinct.size == steps.size,
      "steps must be non-empty and distinct")
    val k = steps.size
    val tsType = df.schema(tsCol).dataType
    val evs = df
      .select(col(userCol),
        struct(col(tsCol).as("ts"), col(typeCol).as("tp")).as("e"))
      .groupBy(col(userCol))
      .agg(sort_array(collect_list(col("e"))).as("evs"))
    val init = struct(
      (0 until k).map(i => lit(null).cast(tsType).as(s"t$i")): _*)
    val folded = aggregate(col("evs"), init, (st, e) => {
      val fields = (0 until k).map { i =>
        val cur = st.getField(s"t$i")
        val prevOk =
          if (i == 0) lit(true)
          else st.getField(s"t${i - 1}").isNotNull &&
            e.getField("ts") > st.getField(s"t${i - 1}")
        when(cur.isNull && e.getField("tp") === steps(i) && prevOk,
          e.getField("ts")).otherwise(cur).as(s"t$i")
      }
      struct(fields: _*)
    })
    evs.select(col(userCol), folded.as("__f"))
      .select(col(userCol) +:
        (0 until k).map(i => col(s"__f.t$i").as(s"t_${steps(i)}")) :+
        (0 until k).map(i => col(s"__f.t$i").isNotNull.cast("int"))
          .reduce(_ + _).as("depth"): _*)
  }

  /** Cohort retention: users bucketed by first-seen week (Monday
    * truncation), counted distinct per (cohort week, whole weeks
    * since) activity cell. Two key shuffles (first-seen per user,
    * then the cell aggregate); week arithmetic is integer-exact.
    */
  def cohortRetention(
      df: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val firstSeen = df.groupBy(col(userCol))
      .agg(date_trunc("week", min(col(tsCol))).cast("date").as("cohort"))
    val activity = df.select(col(userCol),
      date_trunc("week", col(tsCol)).cast("date").as("wk")).distinct()
    activity.join(firstSeen, Seq(userCol))
      .withColumn("weeks_since",
        expr("datediff(wk, cohort) div 7").cast("int"))
      .groupBy(col("cohort"), col("weeks_since"))
      .agg(countDistinct(col(userCol)).as("n_users"))
  }

  /** First-order Markov transition matrix over per-key event
    * sequences: count every (state → next state) step, with the
    * row-normalized probability. Returns
    * (from_type, to_type, n, p) — p rounded to 6dp for cross-engine
    * stability; each key's last event has no successor and drops.
    *
    * `tieCols` breaks equal-timestamp ordering deterministically
    * (pass the event's unique id) — without a total order the lead()
    * pairing, and therefore the counts, would be partition-dependent.
    *
    * Scale: one key shuffle for the lead window (sort within key),
    * then a transition-pair aggregate whose cardinality is
    * |states|² — driver-small however large the input; row totals
    * broadcast back for the normalization.
    */
  def transitionMatrix(
      df: DataFrame, keyCol: String, tsCol: String, stateCol: String,
      tieCols: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy((col(tsCol) +: tieCols.map(col)).map(_.asc): _*)
    val steps = df.select(col(stateCol).as("from_type"),
        lead(col(stateCol), 1).over(w).as("to_type"))
      .filter(col("to_type").isNotNull)
    val counts = steps.groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy(col("from_type"))
      .agg(sum(col("n")).as("__tn"))
    counts.join(broadcast(totals), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        round(try_divide(col("n"), col("__tn")), 6).as("p"))
  }

  /** Dwell time by state: how long a key sits in each state before
    * its next event. Gap to the successor event (same lead() window
    * discipline as [[transitionMatrix]] — `tieCols` for a total
    * order), summed per state in exact MICROSECONDS (integer — float
    * seconds would make the sum partition-order-dependent). Each
    * key's last event has no successor and drops. Returns
    * (state, n, total_us, avg_us) with avg 6dp-rounded.
    */
  def dwellByState(
      df: DataFrame, keyCol: String, tsCol: String, stateCol: String,
      tieCols: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy((col(tsCol) +: tieCols.map(col)).map(_.asc): _*)
    // TIMESTAMP_NTZ inputs (parquet micros) cast to instants for
    // unix_micros; sessions here pin UTC, so the cast is exact.
    val asTs = (c: Column) => c.cast("timestamp")
    df.select(col(stateCol).as("state"),
        (unix_micros(asTs(lead(col(tsCol), 1).over(w))) -
          unix_micros(asTs(col(tsCol)))).as("__gap"))
      .filter(col("__gap").isNotNull)
      .groupBy(col("state"))
      .agg(count(lit(1)).as("n"), sum(col("__gap")).as("total_us"),
        round(sum(col("__gap")).cast("double") / count(lit(1)), 6)
          .as("avg_us"))
  }

  /** Last-touch attribution: credit each conversion event to the most
    * recent PRECEDING non-conversion event of the same key (its
    * "channel"), then summarize conversions and value per channel.
    * Conversions with no preceding touch credit `(direct)`. Returns
    * (channel, n_conversions, total_value) with the value
    * decimal-summed and surfaced as double.
    *
    * One lead-style window per key carries the running last touch
    * (`last(..., ignoreNulls)` over unbounded-preceding-to-previous
    * — an O(1) running carry, not a per-row rescan), then one small
    * channel aggregate. Same tie-break discipline as
    * [[transitionMatrix]].
    */
  def lastTouchAttribution(
      df: DataFrame, keyCol: String, tsCol: String, typeCol: String,
      conversionType: String, valueCol: String,
      tieCols: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy((col(tsCol) +: tieCols.map(col)).map(_.asc): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = last(
      when(col(typeCol) =!= conversionType, col(typeCol)),
      ignoreNulls = true).over(w)
    df.withColumn("__channel", touch)
      .filter(col(typeCol) === conversionType)
      .groupBy(coalesce(col("__channel"), lit("(direct)")).as("channel"))
      .agg(count(lit(1)).as("n_conversions"),
        sum(col(valueCol).cast("decimal(18,4)")).cast("double")
          .as("total_value"))
  }

  /** Top event paths: each key's full ordered state sequence joined
    * into a `a>b>c` path string, counted across keys, top-k by
    * frequency — the "what do users actually do" readout.
    *
    * One aggregation per key (collect + sort inside the aggregation
    * buffer — `sort_array` over (ts, tie, state) structs makes the
    * order total and partition-independent), one path count, one
    * TakeOrdered top-k (never a global sort). The per-key collect
    * holds ONE key's events in one buffer — same whale-key caveat as
    * [[sessionize]]: cap per-key history upstream for keys with
    * unbounded event counts.
    */
  def topPaths(
      df: DataFrame, keyCol: String, tsCol: String, stateCol: String,
      tieCols: Seq[String] = Nil, k: Int = 20,
      maxSteps: Int = 5): DataFrame = {
    require(maxSteps >= 1, "maxSteps must be >= 1")
    val item = struct(
      (col(tsCol) +: tieCols.map(col) :+ col(stateCol)): _*)
    df.groupBy(col(keyCol))
      .agg(sort_array(collect_list(item)).as("__seq"))
      .select(array_join(
        transform(slice(col("__seq"), 1, maxSteps),
          x => x.getField(stateCol)), ">")
        .as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_keys"))
      .orderBy(col("n_keys").desc, col("path").asc)
      .limit(k)
  }

  /** Daily audience growth: per first-seen day, the number of new
    * keys and the running total audience — two tiny aggregations
    * (per-key min, then per-day count) and a running sum over the
    * DAY table (calendar-sized — hundreds of rows — so the
    * single-task window is safe; the constant partition key keeps
    * WindowExec from warning about a data-sized global window).
    */
  def userGrowth(
      df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val firstDay = df.groupBy(col(keyCol))
      .agg(min(col(tsCol).cast("date")).as("day"))
    val daily = firstDay.groupBy(col("day"))
      .agg(count(lit(1)).as("n_new"))
    val w = Window.partitionBy(pmod(dayofmonth(col("day")), lit(1)))
      .orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.withColumn("cum_users", sum(col("n_new")).over(w))
  }

  /** Rolling active users: for every day, the distinct keys active in
    * the trailing `windowDays`-day window (WAU for 7), the keys
    * active that day (DAU), and the stickiness ratio DAU/WAU — the
    * standard engagement panel, computed EXACTLY at scale.
    *
    * Distinct-over-sliding-window is the trap here: a windowed
    * `count(DISTINCT)` doesn't exist, and per-day self-joins go
    * quadratic in the window. Instead each (key, active day) pair —
    * already collapsed to one row — is exploded to the `windowDays`
    * window-end days it contributes to, re-collapsed to distinct
    * (key, window), and counted: strictly linear in activity ×
    * window size, three map-side-combinable distinct/count
    * aggregations, no join wider than a broadcast of the calendar
    * bounds. Windows are clipped to days with any activity.
    */
  def rollingActiveUsers(
      df: DataFrame, keyCol: String, tsCol: String,
      windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, "windowDays must be >= 1")
    val ud = df.select(col(keyCol).as("k"),
      col(tsCol).cast("date").as("day")).distinct()
    val bounds = ud.agg(min(col("day")).as("__d0"),
      max(col("day")).as("__d1"))
    val contrib = ud.select(col("k"),
        explode(sequence(col("day"),
          date_add(col("day"), windowDays - 1))).as("day"))
      .distinct()
    val wau = contrib.groupBy(col("day"))
      .agg(count(lit(1)).as("wau"))
    val dau = ud.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    wau.join(dau, Seq("day"), "left")
      .crossJoin(broadcast(bounds))
      .filter(col("day") <= col("__d1"))
      .select(col("day"), coalesce(col("dau"), lit(0L)).as("dau"),
        col("wau"),
        // raw double: identical integer ratio on every engine; a 6dp
        // round would reintroduce half-up-vs-half-even tie skew
        try_divide(coalesce(col("dau"), lit(0L)), col("wau"))
          .as("stickiness"))
  }

  /** Growth accounting (the standard revenue-bridge decomposition):
    * day-over-day revenue change per key classified as new /
    * resurrected / expansion / contraction / churned, aggregated per
    * day. Returns one row per day with the five decimal-exact
    * buckets as doubles; the identity
    * `Σ buckets = total(d) − total(d−1)` holds by construction.
    *
    * Shape: one (key, day) revenue aggregate, a self full-outer join
    * keyed on (key, day)/(key, day+1) — hash-partitioned on the key,
    * no range machinery — a first-seen-day join for the
    * new-vs-resurrected split, and one per-day aggregate.
    */
  def growthAccounting(
      df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val ud = df.groupBy(col(keyCol).as("k"),
        col(tsCol).cast("date").as("day"))
      .agg(sum(col(valueCol).cast("decimal(18,4)")).as("rev"))
    val firstDay = ud.groupBy(col("k")).agg(min(col("day")).as("__fd"))
    val cur = ud.select(col("k"), col("day"), col("rev"))
    val prev = ud.select(col("k"), date_add(col("day"), 1).as("day"),
      col("rev").as("__prev_rev"))
    val joined = cur.join(prev, Seq("k", "day"), "full_outer")
      .join(firstDay, Seq("k"))
    val z = lit(BigDecimal(0)).cast("decimal(18,4)")
    val curRev = coalesce(col("rev"), z)
    val prevRev = coalesce(col("__prev_rev"), z)
    joined.groupBy(col("day"))
      .agg(
        sum(when(col("__prev_rev").isNull && col("day") === col("__fd"),
          curRev).otherwise(z)).cast("double").as("new_rev"),
        sum(when(col("__prev_rev").isNull && col("day") > col("__fd"),
          curRev).otherwise(z)).cast("double").as("resurrected_rev"),
        sum(when(col("rev").isNotNull && col("__prev_rev").isNotNull &&
            curRev > prevRev, curRev - prevRev).otherwise(z))
          .cast("double").as("expansion"),
        sum(when(col("rev").isNotNull && col("__prev_rev").isNotNull &&
            curRev < prevRev, curRev - prevRev).otherwise(z))
          .cast("double").as("contraction"),
        sum(when(col("rev").isNull, -prevRev).otherwise(z))
          .cast("double").as("churned_rev"))
  }
}
