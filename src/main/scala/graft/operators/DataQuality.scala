package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rule-based data-quality evaluation — the library-side counterpart
  * of the `EvaluateDataQuality` surface the reference's GlueContext
  * imports but never exercises (awsglue/context.py:45-46); the rule
  * vocabulary follows the published DQDL names (RowCount, IsComplete,
  * IsUnique, ColumnValues, Mean, Completeness).
  *
  * Scale posture: ALL rules evaluate in ONE aggregation pass over the
  * frame — each rule contributes its aggregate expressions to a single
  * `agg(...)`, and the per-rule verdict rows are exploded from that
  * one-row result with `inline`, so a 100-rule set over 100 TB costs
  * exactly one scan + one partial/final aggregate exchange, never one
  * job per rule. Exact distinct counts (IsUnique) expand the aggregate
  * but stay single-pass; swap in approx_count_distinct for corpora
  * where a 2% error beats the expand cost.
  */
object DataQuality {

  sealed trait Rule {
    /** Stable display name — the output's `rule` column. */
    def name: String
    /** Aggregates this rule needs, pre-aliased uniquely. */
    private[DataQuality] def aggs(idx: Int): Seq[Column]
    /** (metric, passed) over the aggregated one-row frame. */
    private[DataQuality] def verdict(idx: Int): (Column, Column)
    protected def m(idx: Int, slot: Int): Column = col(s"__dq_${idx}_$slot")
  }

  /** Table cardinality within [lo, hi]. Metric = row count. */
  final case class RowCountBetween(lo: Long, hi: Long) extends Rule {
    val name = s"RowCountBetween($lo,$hi)"
    private[DataQuality] def aggs(idx: Int) =
      Seq(count(lit(1)).as(s"__dq_${idx}_0"))
    private[DataQuality] def verdict(idx: Int) =
      (m(idx, 0).cast("double"), m(idx, 0).between(lo, hi))
  }

  /** Fraction of non-null values ≥ minRatio. Metric = the fraction. */
  final case class IsComplete(colName: String, minRatio: Double = 1.0)
      extends Rule {
    val name = if (minRatio == 1.0) s"IsComplete($colName)"
      else s"IsComplete($colName >= $minRatio)"
    private[DataQuality] def aggs(idx: Int) = Seq(
      count(col(colName)).as(s"__dq_${idx}_0"),
      count(lit(1)).as(s"__dq_${idx}_1"))
    private[DataQuality] def verdict(idx: Int) = {
      val ratio = round(try_divide(m(idx, 0), m(idx, 1)), 6)
      (ratio, ratio >= minRatio)
    }
  }

  /** Non-null values all distinct. Metric = distinct/non-null ratio. */
  final case class IsUnique(colName: String) extends Rule {
    val name = s"IsUnique($colName)"
    private[DataQuality] def aggs(idx: Int) = Seq(
      countDistinct(col(colName)).as(s"__dq_${idx}_0"),
      count(col(colName)).as(s"__dq_${idx}_1"))
    private[DataQuality] def verdict(idx: Int) = {
      val ratio = round(try_divide(m(idx, 0), m(idx, 1)), 6)
      (ratio, m(idx, 0) === m(idx, 1))
    }
  }

  /** Fraction of non-null values inside [lo, hi] ≥ minRatio. */
  final case class ValuesBetween(colName: String, lo: Double, hi: Double,
      minRatio: Double = 1.0) extends Rule {
    val name = if (minRatio == 1.0) s"ColumnValues($colName between $lo $hi)"
      else s"ColumnValues($colName between $lo $hi >= $minRatio)"
    private[DataQuality] def aggs(idx: Int) = Seq(
      count(when(col(colName).between(lo, hi), 1)).as(s"__dq_${idx}_0"),
      count(col(colName)).as(s"__dq_${idx}_1"))
    private[DataQuality] def verdict(idx: Int) = {
      val ratio = round(try_divide(m(idx, 0), m(idx, 1)), 6)
      (ratio, ratio >= minRatio)
    }
  }

  /** Fraction of non-null values in the allowed set ≥ minRatio. */
  final case class ValuesIn(colName: String, allowed: Seq[String],
      minRatio: Double = 1.0) extends Rule {
    val name = (if (minRatio == 1.0) s"ColumnValues($colName in ${allowed.mkString("|")})"
      else s"ColumnValues($colName in ${allowed.mkString("|")} >= $minRatio)")
    private[DataQuality] def aggs(idx: Int) = Seq(
      count(when(col(colName).isin(allowed: _*), 1)).as(s"__dq_${idx}_0"),
      count(col(colName)).as(s"__dq_${idx}_1"))
    private[DataQuality] def verdict(idx: Int) = {
      val ratio = round(try_divide(m(idx, 0), m(idx, 1)), 6)
      (ratio, ratio >= minRatio)
    }
  }

  /** Column mean within [lo, hi]. Sums route through DECIMAL so the
    * metric is addition-order-independent (engine-exact, per the
    * repo-wide oracle numeric policy); metric rounds to 4dp.
    */
  final case class MeanBetween(colName: String, lo: Double, hi: Double)
      extends Rule {
    val name = s"Mean($colName between $lo $hi)"
    private[DataQuality] def aggs(idx: Int) = Seq(
      sum(col(colName).cast("decimal(28,4)")).as(s"__dq_${idx}_0"),
      count(col(colName)).as(s"__dq_${idx}_1"))
    private[DataQuality] def verdict(idx: Int) = {
      val mean = round(try_divide(m(idx, 0).cast("double"), m(idx, 1)), 4)
      (mean, mean.between(lo, hi))
    }
  }

  /** Evaluate `rules` against `df` in one aggregation pass. Output:
    * one row per rule — (rule STRING, outcome 'Passed'|'Failed',
    * metric DOUBLE), in rule-list order via an `ord` column the
    * caller may drop.
    */
  def evaluate(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "evaluate needs at least one rule")
    require(rules.map(_.name).distinct.size == rules.size,
      s"duplicate rule names: ${rules.map(_.name).diff(rules.map(_.name).distinct).mkString(", ")}")
    val aggExprs = rules.zipWithIndex.flatMap { case (r, i) => r.aggs(i) }
    val one = df.agg(aggExprs.head, aggExprs.tail: _*)
    val rows = rules.zipWithIndex.map { case (r, i) =>
      val (metric, passed) = r.verdict(i)
      struct(
        lit(i).as("ord"),
        lit(r.name).as("rule"),
        when(passed, "Passed").otherwise("Failed").as("outcome"),
        metric.cast("double").as("metric"))
    }
    one.select(inline(array(rows: _*)))
  }

  /** Attach the ruleset as OBSERVED metrics: the aggregates ride the
    * frame's next action via Spark's CollectMetrics operator, so a
    * pipeline gets its DQ verdicts for FREE with the write it was
    * doing anyway — zero extra scans, the difference that matters
    * when the frame is 100 TB and [[evaluate]]'s dedicated pass costs
    * a full read. After any action on the returned frame, feed the
    * observation to [[observedResults]].
    *
    * [[IsUnique]] is rejected up front: observed metrics disallow
    * distinct aggregates (Spark's CollectMetrics contract) — use
    * [[evaluate]] for uniqueness, or an HLL sketch column upstream.
    */
  def observe(df: DataFrame, rules: Seq[Rule],
      name: String = "dq"): (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = new org.apache.spark.sql.Observation(name)
    require(rules.nonEmpty, "observe needs at least one rule")
    require(!rules.exists(_.isInstanceOf[IsUnique]),
      "IsUnique needs a distinct aggregate; observed metrics disallow it — use evaluate()")
    val aggExprs = rules.zipWithIndex.flatMap { case (r, i) => r.aggs(i) }
    (df.observe(obs, aggExprs.head, aggExprs.tail: _*), obs)
  }

  /** Turn a completed observation back into the same (ord, rule,
    * outcome, metric) frame [[evaluate]] produces — the verdict
    * Columns are REUSED over a one-row local frame built from the
    * observed values, so the two paths cannot drift.
    */
  def observedResults(spark: org.apache.spark.sql.SparkSession,
      rules: Seq[Rule],
      obs: org.apache.spark.sql.Observation): DataFrame = {
    val metrics = obs.get
    val one = spark.range(1).select(metrics.toSeq.map { case (k, v) =>
      lit(v).as(k)
    }: _*)
    val rows = rules.zipWithIndex.map { case (r, i) =>
      val (metric, passed) = r.verdict(i)
      struct(
        lit(i).as("ord"),
        lit(r.name).as("rule"),
        when(passed, "Passed").otherwise("Failed").as("outcome"),
        metric.cast("double").as("metric"))
    }
    one.select(inline(array(rows: _*)))
  }

  /** Referential-integrity audit: child keys with no matching parent
    * row, one output row per ORPHANED KEY with its child-row count —
    * the FK check a warehouse load runs before trusting a fact feed
    * (a star-schema fact row whose dimension key resolves to nothing
    * silently drops from every inner-joined report).
    *
    * The child aggregates to per-key counts FIRST (map-side combine
    * collapses the fact table to its key cardinality), then one
    * anti-join against the parent's distinct keys — the data-sized
    * table crosses the wire once as (key, count) pairs, and a clean
    * feed returns an empty frame at the cost of the aggregate alone.
    */
  def referentialCheck(
      child: DataFrame, parent: DataFrame,
      keys: Seq[(String, String)]): DataFrame = {
    require(keys.nonEmpty, "referentialCheck needs at least one key pair")
    // SQL FK semantics: a NULL key is "no reference", not a violation
    // (and an anti-join would misreport every null-keyed row).
    val childCnt = child
      .filter(keys.map { case (c, _) => col(c).isNotNull }.reduce(_ && _))
      .groupBy(keys.map { case (c, _) => col(c) }: _*)
      .agg(count(lit(1)).as("n_orphan_rows"))
    val parentKeys = parent
      .select(keys.map { case (c, p) => col(p).as(c) }: _*)
      .distinct()
    childCnt.join(parentKeys, keys.map(_._1), "left_anti")
  }
}
