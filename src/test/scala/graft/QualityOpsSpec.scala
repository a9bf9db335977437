package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{DataQuality, Drift, Profile}

/** Specs for the feed-health / drift / reporting operators:
  * referential integrity, completeness, PSI, Pareto shares.
  */
class QualityOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  test("referentialCheck reports orphan keys with row counts") {
    val child = Seq((1L, "a"), (1L, "b"), (2L, "c"), (3L, "d"),
      (3L, "e"), (3L, "f")).toDF("fk", "payload")
    val parent = Seq(1L, 2L).toDF("pk")
    val got = DataQuality.referentialCheck(child, parent,
        Seq("fk" -> "pk"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(3L -> 3L))
  }

  test("referentialCheck: null FK is no-reference, not a violation") {
    val child = Seq(Some(1L), None, None).map(k => (k, "x"))
      .toDF("fk", "payload")
    val parent = Seq(1L).toDF("pk")
    assert(DataQuality.referentialCheck(child, parent,
      Seq("fk" -> "pk")).count() == 0)
  }

  test("feedCompleteness flags days under half the median") {
    val rows = Seq.tabulate(5) { d => (d, 100) } :+ ((5, 30)) // thin day
    val ev = rows.flatMap { case (d, n) =>
      Seq.fill(n)(java.sql.Timestamp.valueOf(s"2024-01-0${d + 1} 12:00:00"))
    }.toDF("ts")
    val got = Drift.feedCompleteness(ev, "ts")
      .select(col("day").cast("string"), col("n"), col("is_low"))
      .as[(String, Long, Int)].collect().sortBy(_._1)
    assert(got.count(_._3 == 1) == 1)
    assert(got.find(_._3 == 1).get._1 == "2024-01-06")
    assert(got.forall { case (_, n, low) => (n < 50) == (low == 1) })
  }

  test("psi: identical samples score zero; a shifted sample doesn't") {
    val ref = (1 to 400).map(_.toDouble).toDF("v")
    val same = Drift.psi(ref, ref, "v", nb = 4)
      .select("psi_term").as[Double].collect()
    assert(same.forall(_ == 0.0))
    val shifted = (301 to 700).map(_.toDouble).toDF("v")
    val terms = Drift.psi(ref, shifted, "v", nb = 4)
      .select("bucket", "psi_term").as[(Int, Double)].collect().toMap
    // buckets 0/1 emptied (q floored), buckets 2/3 gained mass: every
    // term positive, total far above the 0.2 alert line
    assert(terms.values.forall(_ > 0.0))
    assert(terms.values.sum > 0.2)
  }

  test("psi emits every bucket even when the current sample misses some") {
    val ref = (1 to 100).map(_.toDouble).toDF("v")
    val cur = Seq(1.0, 2.0).toDF("v") // all in bucket 0
    val got = Drift.psi(ref, cur, "v", nb = 4)
      .select("bucket").as[Int].collect().sorted
    assert(got.toSeq == Seq(0, 1, 2, 3))
  }

  test("groupTrend recovers exact slopes per group") {
    val d = (0 to 10).flatMap(x => Seq(
      ("up", x, 2.0 * x + 5.0),     // slope 2, intercept 5
      ("down", x, -1.5 * x + 30.0), // slope -1.5, intercept 30
      ("flat", x, 7.0)))            // slope 0
      .toDF("g", "x", "y")
    val got = graft.ml.Sketches.groupTrend(d, Seq("g"), "x", "y")
      .select("g", "slope", "intercept")
      .as[(String, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got("up") == ((2.0, 5.0)))
    assert(got("down") == ((-1.5, 30.0)))
    assert(got("flat") == ((0.0, 7.0)))
  }

  test("groupTrend: constant-x group yields null slope, not a crash") {
    val d = Seq(("g", 3, 1.0), ("g", 3, 2.0)).toDF("g", "x", "y")
    val row = graft.ml.Sketches.groupTrend(d, Seq("g"), "x", "y")
      .select("slope").collect().head
    assert(row.isNullAt(0))
  }

  test("rollingAnomaly: spike flagged against its preceding baseline") {
    import graft.operators.Resample
    val days = (1 to 10).map(d => f"2024-01-$d%02d")
    val vals = Seq(10.0, 14.0, 6.0, 10.0, 12.0, 8.0, 10.0, 50.0, 10.0,
      10.0)
    val grid = days.zip(vals).map { case (d, v) => (1L, d, v) }
      .toDF("k", "day_s", "v")
      .select(col("k"), col("day_s").cast("date").as("day"), col("v"))
    val got = Resample.rollingAnomaly(grid, "k", "day", "v",
        baselineRows = 7, k = 2.0, minBaseline = 3)
      .select(col("day").cast("string"), col("is_anomaly"))
      .as[(String, Int)].collect().toMap
    assert(got("2024-01-08") == 1)   // the spike
    assert(got("2024-01-01") == 0)   // no baseline yet
    assert(got("2024-01-03") == 0)   // under minBaseline
    // day 9: the spike is IN the baseline now, inflating sigma — a
    // normal value must not flag
    assert(got("2024-01-09") == 0)
    assert(got.values.sum == 1)
  }

  test("lastTouchAttribution credits the latest prior touch, else direct") {
    val ev = Seq(
      (1L, 1L, "view", 0.0), (1L, 2L, "click", 0.0),
      (1L, 3L, "purchase", 10.0), // credited to click
      (2L, 4L, "purchase", 5.0),  // no touch -> (direct)
      (2L, 5L, "view", 0.0), (2L, 6L, "purchase", 7.0)) // view
      .map { case (u, s, t, v) =>
        (u, s, new java.sql.Timestamp(s * 60000), t, v) }
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    val got = graft.operators.Sessionize.lastTouchAttribution(
        ev, "user_id", "ts", "event_type", "purchase", "value",
        tieCols = Seq("event_id"))
      .select("channel", "n_conversions", "total_value")
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == Map("click" -> ((1L, 10.0)), "(direct)" -> ((1L, 5.0)),
      "view" -> ((1L, 7.0))))
  }

  test("validityAudit: overlap, gap, open-not-last; clean chain silent") {
    import graft.pipeline.Scd
    def d(s: String) = java.sql.Date.valueOf(s)
    val dim = Seq(
      // key 1: clean chain
      (1L, d("2020-01-01"), d("2021-01-01")),
      (1L, d("2021-01-01"), null.asInstanceOf[java.sql.Date]),
      // key 2: overlap
      (2L, d("2020-01-01"), d("2021-01-01")),
      (2L, d("2020-06-01"), null.asInstanceOf[java.sql.Date]),
      // key 3: gap
      (3L, d("2020-01-01"), d("2021-01-01")),
      (3L, d("2022-01-01"), null.asInstanceOf[java.sql.Date]),
      // key 4: open version with a successor
      (4L, d("2020-01-01"), null.asInstanceOf[java.sql.Date]),
      (4L, d("2021-01-01"), null.asInstanceOf[java.sql.Date]))
      .toDF("k", "eff_from", "eff_to")
    val got = Scd.validityAudit(dim, Seq("k"))
      .select("k", "status").as[(Long, String)].collect().toMap
    assert(got == Map(2L -> "overlap", 3L -> "gap",
      4L -> "open_not_last"))
  }

  test("selectToBudget: greedy fill by score, last doc may overflow") {
    import graft.ml.Curation
    val d = Seq((1L, 10L, 100), (2L, 10L, 90), (3L, 10L, 80),
      (4L, 10L, 70)).toDF("id", "tok", "score")
    // budget 25: scores 100 (offset 0), 90 (offset 10), 80 (offset 20
    // < 25, overflows to 30), 70 (offset 30 -> out)
    val got = Curation.selectToBudget(d, "id", "tok", "score", 25L,
        partitions = 3)
      .select("id", "offset").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 10L, 3L -> 20L))
  }

  test("topPaths orders steps by (ts, tie) and truncates at maxSteps") {
    import graft.operators.Sessionize
    val ts0 = 1700000000000L
    val ev = Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "c"),
      (2L, 1L, "a"), (2L, 2L, "b"), (2L, 3L, "c"),
      (3L, 1L, "x"), (3L, 2L, "y"))
      .map { case (u, s, t) =>
        (u, s, new java.sql.Timestamp(ts0 + s * 1000), t) }
      .toDF("user_id", "event_id", "ts", "event_type")
    val got = Sessionize.topPaths(ev, "user_id", "ts", "event_type",
        tieCols = Seq("event_id"), k = 10, maxSteps = 2)
      .as[(String, Long)].collect().toSeq
    // truncation at 2 steps folds both a>b>c users into "a>b"
    assert(got == Seq(("a>b", 2L), ("x>y", 1L)))
  }

  test("userGrowth: new keys per day and a running audience total") {
    import graft.operators.Sessionize
    val ev = Seq((1L, "2024-01-01"), (1L, "2024-01-03"),
      (2L, "2024-01-01"), (3L, "2024-01-03"))
      .toDF("user_id", "d")
      .select(col("user_id"), col("d").cast("timestamp").as("ts"))
    val got = Sessionize.userGrowth(ev, "user_id", "ts")
      .select(col("day").cast("string"), col("n_new"), col("cum_users"))
      .as[(String, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(("2024-01-01", 2L, 2L),
      ("2024-01-03", 1L, 3L)))
  }

  test("growthAccounting buckets sum to the day-over-day delta") {
    import graft.operators.Sessionize
    // u1: 10 on d1, 15 on d2 (expansion 5)
    // u2: 10 on d1 only (churned -10 on d2)
    // u3: new 7 on d2
    // u4: 5 on d1, returns 4 on d3 (resurrected, not d2-churn... d2
    //     churn -5, d3 resurrect 4)
    val ev = Seq(
      (1L, "2024-01-01", 10.0), (1L, "2024-01-02", 15.0),
      (2L, "2024-01-01", 10.0),
      (3L, "2024-01-02", 7.0),
      (4L, "2024-01-01", 5.0), (4L, "2024-01-03", 4.0))
      .toDF("user_id", "d", "value")
      .select(col("user_id"), col("d").cast("timestamp").as("ts"),
        col("value"))
    val got = Sessionize.growthAccounting(ev, "user_id", "ts", "value")
      .select(col("day").cast("string"), col("new_rev"),
        col("resurrected_rev"), col("expansion"), col("contraction"),
        col("churned_rev"))
      .as[(String, Double, Double, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(got("2024-01-02") ==
      (("2024-01-02", 7.0, 0.0, 5.0, 0.0, -15.0)))
    assert(got("2024-01-03") == (("2024-01-03", 0.0, 4.0, 0.0, 0.0,
      -22.0)))
    // identity: buckets sum to total(d) - total(d-1) for day 2:
    // total(d2)=22, total(d1)=25 -> delta -3 == 7+0+5+0-15
    val d2 = got("2024-01-02")
    assert(d2._2 + d2._3 + d2._4 + d2._5 + d2._6 == -3.0)
  }

  test("ewma: binary weights, head renormalization, recency bias") {
    import graft.operators.Resample
    val grid = Seq((1L, "2024-01-01", 10.0), (1L, "2024-01-02", 20.0),
      (1L, "2024-01-03", 40.0))
      .toDF("k", "day_s", "v")
      .select(col("k"), col("day_s").cast("date").as("day"), col("v"))
    val got = Resample.ewma(grid, "k", "day", "v", windowRows = 3)
      .select(col("day").cast("string"), col("ewma"))
      .as[(String, Double)].collect().toMap
    // day1: only itself -> 10; day2: (4*20 + 2*10)/6 = 16.666667
    // day3: (4*40 + 2*20 + 1*10)/7 = 30
    assert(got("2024-01-01") == 10.0)
    assert(got("2024-01-02") == 16.666667)
    assert(got("2024-01-03") == 30.0)
  }

  test("rollingActiveUsers: exact trailing-window distinct counts") {
    import graft.operators.Sessionize
    val ev = Seq((1L, "2024-01-01"), (1L, "2024-01-02"), // u1: d1, d2
      (2L, "2024-01-01"),                                // u2: d1
      (3L, "2024-01-05"))                                // u3: d5
      .toDF("user_id", "d")
      .select(col("user_id"), col("d").cast("timestamp").as("ts"))
    val got = Sessionize.rollingActiveUsers(ev, "user_id", "ts",
        windowDays = 3)
      .select(col("day").cast("string"), col("dau"), col("wau"))
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    // window [d-2, d]: d1 {1,2}; d2 {1,2}; d3 {1,2}; d4 {1}; d5 {3}
    assert(got == Seq(("2024-01-01", 2L, 2L), ("2024-01-02", 1L, 2L),
      ("2024-01-03", 0L, 2L), ("2024-01-04", 0L, 1L),
      ("2024-01-05", 1L, 1L)))
  }

  test("groupCorrelation: perfect, inverse, and zero-variance groups") {
    import graft.ml.Sketches
    val d = Seq(
      ("pos", 1.0, 2.0), ("pos", 2.0, 4.0), ("pos", 3.0, 6.0),
      ("neg", 1.0, 9.0), ("neg", 2.0, 6.0), ("neg", 3.0, 3.0),
      ("flat", 1.0, 5.0), ("flat", 2.0, 5.0))
      .toDF("g", "x", "y")
    val got = Sketches.groupCorrelation(d, Seq("g"), "x", "y")
      .select("g", "r").collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(got("pos").contains(1.0))
    assert(got("neg").contains(-1.0))
    assert(got("flat").isEmpty) // zero variance in y -> null
  }

  test("knnClassify votes the planted cluster's label; ties break low") {
    import graft.ml.Similarity
    // two tight clusters in 3d: label "a" around (1,0,0), "b" around
    // (0,1,0); queries sit inside each cluster
    def v(x: Double, y: Double, z: Double) = Array(x.toFloat, y.toFloat,
      z.toFloat)
    val corpus = Seq(
      (1L, v(1, 0, 0), "a"), (2L, v(0.9, 0.1, 0), "a"),
      (3L, v(0.95, 0, 0.05), "a"),
      (4L, v(0, 1, 0), "b"), (5L, v(0.1, 0.9, 0), "b"),
      (6L, v(0, 0.95, 0.05), "b")).toDF("id", "vec", "label")
    val queries = Seq((10L, v(0.97, 0.03, 0), "a"),
      (11L, v(0.02, 0.98, 0), "b"), (12L, v(0.03, 0.97, 0), "a"))
      .toDF("id", "vec", "label") // q12's true label is wrong on purpose
    val got = Similarity.knnClassify(corpus, queries,
        "id", "vec", "label", k = 3)
      .select("id", "predicted", "correct")
      .as[(Long, String, Int)].collect().map(r => r._1 -> r).toMap
    assert(got(10L) == ((10L, "a", 1)))
    assert(got(11L) == ((11L, "b", 1)))
    assert(got(12L) == ((12L, "b", 0))) // nearest cluster wins anyway
  }

  test("paretoShare matches the single-window reference ordering") {
    val rnd = new scala.util.Random(99)
    val d = (1 to 500).map(i => (i.toLong, rnd.nextInt(1000) / 10.0))
      .toDF("k", "v")
    val got = Profile.paretoShare(d, Seq("k"), "v", partitions = 8)
      .select("k", "revenue", "cum_share")
      .as[(Long, Double, Double)].collect()
    // reference: plain global-window cumulative share
    val byKey = d.groupBy("k")
      .agg(sum(col("v").cast("decimal(18,2)")).as("w"))
      .as[(Long, java.math.BigDecimal)].collect()
    val total = byKey.map(r => BigDecimal(r._2)).sum
    val ordered = byKey.sortBy(r => (-BigDecimal(r._2), r._1))
    var run = BigDecimal(0)
    val want = ordered.map { case (k, w) =>
      run += BigDecimal(w)
      k -> (math.round((run / total).toDouble * 1e6) / 1e6)
    }.toMap
    assert(got.length == want.size)
    got.foreach { case (k, _, cs) =>
      assert(cs == want(k), s"key $k")
    }
    // last key's cumulative share closes at 1
    assert(got.map(_._3).max == 1.0)
  }

  test("dsirWeights: target == raw zeroes every weight; target-like " +
      "docs outrank target-unlike; empty docs carry weight 0") {
    import graft.ml.Curation
    val raw = Seq(
      (1L, "alpha beta alpha beta"),
      (2L, "gamma delta gamma delta"),
      (3L, "alpha beta gamma delta"),
      (4L, "")).toDF("doc_id", "text")
    // identical distributions: every ratio term and the totals
    // constant cancel, so all weights are exactly 0
    val same = Curation.dsirWeights(raw, raw, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(same.values.forall(_ == 0L), s"nonzero weight under " +
      s"target == raw: $same")
    // target enriched in alpha/beta: doc 1 must outrank doc 2, doc 3
    // sits between, the empty doc scores 0 features
    val target = Seq((9L, "alpha beta alpha beta alpha beta"))
      .toDF("doc_id", "text")
    val w = Curation.dsirWeights(raw, target, "doc_id", "text")
      .collect().map(r =>
        r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(w(1L)._2 > w(3L)._2 && w(3L)._2 > w(2L)._2,
      s"importance order broken: $w")
    assert(w(4L) == ((0, 0L)), s"empty doc must be (0 feats, 0 ppm): " +
      s"${w(4L)}")
    // topK: correct size, ordered by (weight desc, id). Note the
    // empty doc ranks SECOND: it is weight-neutral (0), while docs
    // carrying target-absent n-grams (gamma/delta) score negative —
    // the likelihood-ratio semantics, not a bug
    val top = Curation.dsirTopK(raw, target, "doc_id", "text", n = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(top.map(_._1) == Seq(1L, 4L),
      s"topK must lead with the most target-like docs: $top")
    assert(w(3L)._2 < 0 && w(2L)._2 < 0,
      "target-absent n-grams must push weights negative")
  }

  test("dsirResample is deterministic per seed, returns n rows from " +
      "raw, and reacts to the seed") {
    import graft.ml.Curation
    val raw = spark.read
      .parquet(s"${SparkFixture.sfDir}/documents.parquet")
      .select(col("doc_id"), col("text"))
    val target = raw.filter(col("doc_id") % 5 === 0)
    def run(seed: Int): Seq[Long] =
      Curation.dsirResample(raw, target, "doc_id", "text", n = 50,
        seed = seed).collect().map(_.getLong(0)).toSeq
    val a = run(1)
    val b = run(1)
    val c = run(2)
    assert(a == b, "same seed must reproduce the same sample")
    assert(a.length == 50 && a.distinct.length == 50)
    assert(a.toSet != c.toSet || a != c,
      "different seeds should perturb the Gumbel keys")
    val rawIds = raw.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a.forall(rawIds.contains))
  }
}
