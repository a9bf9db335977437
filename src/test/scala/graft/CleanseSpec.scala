package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Mix64
import graft.ml.Sketches
import graft.operators.{Cleanse, DataQuality}
import graft.operators.DataQuality._

class CleanseSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  // ------------------------------------------------------- impute

  private def frame = Seq(
    (1L, Some(10.0), Some("A")),
    (2L, None, Some("B")),
    (3L, Some(20.0), None),
    (4L, Some(30.0), Some("A")),
    (5L, None, Some("B")))
    .toDF("id", "bal", "seg")

  test("mean imputation fills with the 4dp decimal mean") {
    val r = Cleanse.imputeNulls(frame, meanCols = Seq("bal"))
      .select("id", "bal").as[(Long, Double)].collect().toMap
    assert(r(2L) == 20.0 && r(5L) == 20.0) // (10+20+30)/3
    assert(r(1L) == 10.0 && r(3L) == 20.0) // non-nulls untouched
  }

  test("mode imputation fills the most frequent value, smallest on tie") {
    val r = Cleanse.imputeNulls(frame, meanCols = Nil, modeCols = Seq("seg"))
      .select("id", "seg").as[(Long, String)].collect().toMap
    assert(r(3L) == "A") // A and B both twice; tie breaks to smallest
    val r2 = Cleanse.imputeNulls(
      frame.filter(col("id") =!= 4), Nil, modeCols = Seq("seg"))
      .select("id", "seg").as[(Long, String)].collect().toMap
    assert(r2(3L) == "B") // B now strictly more frequent
  }

  test("fillConstants is the na.fill surface") {
    val r = Cleanse.fillConstants(frame, Map("bal" -> -1.0, "seg" -> "?"))
      .as[(Long, Double, String)].collect().toSet
    assert(r.contains((2L, -1.0, "B")) && r.contains((3L, 20.0, "?")))
  }

  // ----------------------------------------------------- outliers

  test("flagOutliers marks exactly the far point; nulls flag 0") {
    val d = (Seq.fill(20)(10.0) :+ 1000.0).zipWithIndex
      .map { case (v, i) => (i.toLong, Some(v)) }
      .toDF("id", "v")
      .union(Seq((99L, Option.empty[Double])).toDF("id", "v"))
    val flagged = Cleanse.flagOutliers(d, "v", k = 3.0)
      .filter(col("is_outlier") === 1).select("id").as[Long].collect()
    assert(flagged.toSeq == Seq(20L))
    val nullRow = Cleanse.flagOutliers(d, "v", k = 3.0)
      .filter(col("id") === 99).select("is_outlier").as[Int].head()
    assert(nullRow == 0)
  }

  test("flagOutliers on a constant column flags nothing (sigma 0)") {
    val d = (0L until 10L).map(i => (i, 5.0)).toDF("id", "v")
    assert(Cleanse.flagOutliers(d, "v").filter(col("is_outlier") === 1)
      .count() == 0)
  }

  // ----------------------------------------------- temperature mix

  test("temperatureMix: integer weight math and √-share sampling") {
    // strata: a=100 rows, b=400 rows → isq 10/20, tot 30, target 300
    // → w(a) = 1024*300*10 div (30*100)  = 1024  (every row, once)
    // → w(b) = 1024*300*20 div (30*400)  = 512   (bucket < 512)
    val d = ((0L until 100L).map(i => (i, "a")) ++
      (1000L until 1400L).map(i => (i, "b"))).toDF("id", "src")
    val out = Sketches.temperatureMix(d, "id", "src", targetRows = 300)
    val byStratum = out.groupBy("src").count().as[(String, Long)]
      .collect().toMap
    assert(byStratum("a") == 100L)
    // stratum b must match the mix64 bucket rule exactly
    val expectedB = d.filter(col("src") === "b")
      .filter(Mix64.mix64(col("id"), 7).bitwiseAND(lit(1023L)) < 512)
      .count()
    assert(byStratum("b") == expectedB)
    assert(out.filter(col("src") === "a").agg(max("epoch")).head().getInt(0) == 0)
  }

  test("temperatureMix up-samples a tiny stratum with multi-epochs") {
    // a=4 rows, b=400 → isq 2/20, tot 22, target 440
    // w(a) = 1024*440*2 div (22*4) = 10240 → 10 copies each
    val d = ((0L until 4L).map(i => (i, "a")) ++
      (1000L until 1400L).map(i => (i, "b"))).toDF("id", "src")
    val a = Sketches.temperatureMix(d, "id", "src", targetRows = 440)
      .filter(col("src") === "a")
    assert(a.count() == 40)
    assert(a.groupBy("id").count().as[(Long, Long)].collect()
      .forall(_._2 == 10))
  }

  test("weightedMixFrame drops strata absent from the weight frame") {
    val d = Seq((1L, "x"), (2L, "y")).toDF("id", "src")
    val w = Seq(("x", 2048L)).toDF("src", "w1024")
    val out = Sketches.weightedMixFrame(d, "id", "src", w)
    assert(out.select("src").distinct().as[String].collect().toSeq == Seq("x"))
    assert(out.count() == 2) // 2048 → exactly two epochs of row 1
  }

  // ----------------------------------------------- observed DQ

  test("observe: metrics ride the action; results match evaluate()") {
    val rules = Seq[Rule](
      RowCountBetween(1, 100),
      IsComplete("bal"),
      ValuesBetween("bal", 0, 25, minRatio = 0.5),
      MeanBetween("bal", 0, 100))
    val (observed, obs) = DataQuality.observe(frame, rules)
    observed.write.mode("overwrite")
      .parquet(s"${System.getProperty("java.io.tmpdir")}/graft_obs_dq")
    val viaObs = DataQuality.observedResults(spark, rules, obs)
      .as[(Int, String, String, Double)].collect().toSet
    val viaEval = DataQuality.evaluate(frame, rules)
      .as[(Int, String, String, Double)].collect().toSet
    assert(viaObs == viaEval)
    assert(viaObs.exists(_._2 == "IsComplete(bal)"))
  }

  test("observe rejects IsUnique (distinct aggregates disallowed)") {
    intercept[IllegalArgumentException] {
      DataQuality.observe(frame, Seq(IsUnique("id")))
    }
  }

  test("winsorize clamps into the nearest-rank quantile range") {
    val d = (1L to 100L).map(i => (i, i.toDouble)).toDF("id", "v")
    val r = Cleanse.winsorize(d, "v", loQ = 0.05, hiQ = 0.95)
      .select("id", "v").as[(Long, Double)].collect().toMap
    // nearest-rank: k_lo = floor(0.05*99)+1 = 5 -> 5.0;
    //               k_hi = floor(0.95*99)+1 = 95 -> 95.0
    assert(r(1L) == 5.0 && r(3L) == 5.0 && r(5L) == 5.0)
    assert(r(100L) == 95.0 && r(97L) == 95.0)
    assert(r(50L) == 50.0) // interior untouched
  }

  test("bm25 ranks heavier query-term usage higher; deterministic") {
    import graft.ml.TextAnalysis
    val docs = Seq(
      (1L, "spark join join join fast"),
      (2L, "spark join slow"),
      (3L, "nothing relevant here")).toDF("doc_id", "text")
    val r = TextAnalysis.bm25Scores(docs, "text", "doc_id", Seq("join"))
      .as[(Long, Double, Int)].collect().map(t => t._1 -> t._2).toMap
    assert(r.keySet == Set(1L, 2L)) // doc 3 matches nothing
    assert(r(1L) > r(2L))           // tf 3 beats tf 1
    val r13 = TextAnalysis.bm25Scores(docs.repartition(13), "text",
      "doc_id", Seq("join")).as[(Long, Double, Int)].collect()
      .map(t => t._1 -> t._2).toMap
    assert(r13 == r)
  }

  test("skewReport: counts, shares, salt factors, tie-break by key") {
    import graft.operators.Profile
    // one hot key (80 rows) + 20 singleton keys: nkeys=21, nrows=100
    val d = (Seq.fill(80)(0L) ++ (1L to 20L)).toDF("k")
    val r = Profile.skewReport(d, Seq("k"), k = 3)
      .as[(Long, Long, Double, Int)].collect()
    assert(r.head == ((0L, 80L, 0.8, 17))) // ceil(80*21/100) = 17
    assert(r(1) == ((1L, 1L, 0.01, 1)))    // ties break by key asc
    assert(r(2)._1 == 2L)
    assert(r.length == 3)
  }

  test("skewReport caps the salt suggestion") {
    import graft.operators.Profile
    val d = (Seq.fill(1000)(0L) ++ (1L to 1000L)).toDF("k")
    val top = Profile.skewReport(d, Seq("k"), k = 1, maxSalts = 8)
      .as[(Long, Long, Double, Int)].head()
    assert(top._1 == 0L && top._4 == 8)
  }

  test("incremental rollup merge equals full re-aggregation") {
    import graft.operators.IncrementalAgg
    val d = (1L to 500L).map(i =>
      (i, s"g${i % 7}", (i % 13).toDouble)).toDF("id", "g", "v")
    val keys = Seq("g")
    val sums = Seq("s" -> col("v").cast("decimal(18,2)"))
    val base  = IncrementalAgg.atGrain(d.filter(col("id") % 3 =!= 0),
      keys, sums, minCols = Seq("v"), maxCols = Seq("v"))
    val delta = IncrementalAgg.atGrain(d.filter(col("id") % 3 === 0),
      keys, sums, minCols = Seq("v"), maxCols = Seq("v"))
    val merged = IncrementalAgg.merge(base, delta, keys, Seq("s"),
      minCols = Seq("v"), maxCols = Seq("v"))
      .withColumn("s", col("s").cast("double"))
    val full = IncrementalAgg.atGrain(d, keys, sums,
      minCols = Seq("v"), maxCols = Seq("v"))
      .withColumn("s", col("s").cast("double"))
    assert(merged.collect().map(_.toSeq).toSet ==
      full.collect().map(_.toSeq).toSet)
  }

  // --------------------------------------------------- MAD outliers

  test("flagOutliersMad survives the masking case z-score misses") {
    // 10 points around 10 plus FIVE heavy outliers: the outliers drag
    // μ to 340 and σ to ~467, so z-score(k=2) flags nothing (masking);
    // median stays 10 and MAD stays 1, so the robust rule flags all 5.
    val base = Seq(8.0, 9.0, 10.0, 10.0, 10.0, 10.0, 10.0, 10.0,
      11.0, 12.0)
    val d = (base ++ Seq.fill(5)(1000.0)).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val madFlagged = Cleanse.flagOutliersMad(d, "v", k = 3.0)
      .filter(col("is_outlier") === 1).select("id").as[Long]
      .collect().toSet
    assert(madFlagged == (10L to 14L).toSet)
    val zFlagged = Cleanse.flagOutliers(d, "v", k = 2.0)
      .filter(col("is_outlier") === 1).count()
    assert(zFlagged == 0) // masked — the robust rule's reason to exist
  }

  test("flagOutliersMad: constant column flags nothing; nulls flag 0") {
    val d = ((0L until 8L).map(i => (i, Some(5.0))) :+
      (99L, Option.empty[Double])).toDF("id", "v")
    val out = Cleanse.flagOutliersMad(d, "v")
    assert(out.filter(col("is_outlier") === 1).count() == 0)
    assert(out.filter(col("id") === 99)
      .select("is_outlier").as[Int].head() == 0)
  }

  // ------------------------------------------------------ histogram

  test("histogram: equi-width buckets, empties surfaced, max in top") {
    val d = Seq(0.0, 0.5, 1.0, 9.5, 10.0).toDF("v") // range [0,10], 5 buckets
    val got = graft.operators.Profile.histogram(d, "v", nb = 5)
      .select("bucket", "lo", "hi", "n")
      .as[(Int, Double, Double, Long)].collect().sortBy(_._1)
    assert(got.map(r => (r._1, r._4)).toSeq ==
      Seq((0, 3L), (1, 0L), (2, 0L), (3, 0L), (4, 2L)))
    assert(got.head._2 == 0.0 && got.last._3 == 10.0)
  }

  test("histogram: constant column lands everything in bucket 0") {
    val d = Seq.fill(6)(7.7).toDF("v")
    val got = graft.operators.Profile.histogram(d, "v", nb = 4)
      .select("bucket", "n").as[(Int, Long)].collect().toMap
    assert(got == Map(0 -> 6L, 1 -> 0L, 2 -> 0L, 3 -> 0L))
  }

  // ---------------------------------------------------- transitions

  test("transitionMatrix counts steps and row-normalizes") {
    val ev = Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a"), (1L, 4L, "b"),
      (2L, 1L, "a"), (2L, 2L, "a"))
      .map { case (u, s, t) => (u, s, new java.sql.Timestamp(s * 1000), t) }
      .toDF("user_id", "event_id", "ts", "event_type")
    val got = graft.operators.Sessionize.transitionMatrix(
        ev, "user_id", "ts", "event_type", tieCols = Seq("event_id"))
      .select("from_type", "to_type", "n", "p")
      .as[(String, String, Long, Double)].collect().toSet
    // user1: a→b, b→a, a→b; user2: a→a. From a: {a:1, b:2}; from b: {a:1}.
    assert(got == Set(("a", "b", 2L, 0.666667), ("a", "a", 1L, 0.333333),
      ("b", "a", 1L, 1.0)))
  }

  test("abReport: assignment is unit-stable, lift is mean minus control") {
    import graft.operators.Experiment
    // two rows per unit: both must land in the unit's variant, so
    // per-variant n is even
    val d = (1L to 100L).flatMap(u => Seq((u, 10.0), (u, 20.0)))
      .toDF("unit", "m")
    val rep = Experiment.abReport(d, "unit", "m", variants = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(rep.keySet == Set(0L, 1L))
    assert(rep.values.forall(_._1 % 2 == 0)) // unit-stable assignment
    assert(rep(0L)._3 == 0.0)                // control lift is zero
    val lift = rep(1L)._2 - rep(0L)._2
    assert(math.abs(rep(1L)._3 - math.round(lift * 1e6) / 1e6) < 1e-9)
  }

  test("abReport rejects a non-power-of-two variant count") {
    import graft.operators.Experiment
    val d = Seq((1L, 1.0)).toDF("unit", "m")
    intercept[IllegalArgumentException] {
      Experiment.abReport(d, "unit", "m", variants = 3)
    }
  }

  test("dwellByState sums successor gaps in exact microseconds") {
    val ev = Seq(
      (1L, 1L, 1000000L, "a"), (1L, 2L, 3500000L, "b"),
      (1L, 3L, 4000000L, "a"),
      (2L, 4L, 0L, "a"), (2L, 5L, 2000000L, "a"))
      .toDF("user_id", "event_id", "us", "ts_ignore")
      .select(col("user_id"), col("event_id"),
        timestamp_micros(col("us")).as("ts"),
        col("ts_ignore").as("event_type"))
    // state a: gaps 2500000 (u1 e1->e2), 2000000 (u2); state b: 500000
    val byState = graft.operators.Sessionize.dwellByState(
        ev, "user_id", "ts", "event_type", tieCols = Seq("event_id"))
      .select("state", "total_us").as[(String, Long)].collect().toMap
    assert(byState == Map("a" -> 4500000L, "b" -> 500000L))
  }

  test("minMaxScale: per-group bounds; constant group scales to 0") {
    val d = Seq(("g1", 0.0), ("g1", 5.0), ("g1", 10.0),
      ("g2", 7.0), ("g2", 7.0)).toDF("g", "v")
    val got = graft.operators.Cleanse.minMaxScale(d, Seq("g"), "v")
      .select("g", "v", "scaled").as[(String, Double, Double)]
      .collect().toSet
    assert(got == Set(("g1", 0.0, 0.0), ("g1", 5.0, 0.5),
      ("g1", 10.0, 1.0), ("g2", 7.0, 0.0)))
  }

  test("weightedPrioritySample: n per stratum, heavier weight shrinks priority") {
    import graft.ml.Sketches
    val d = (1L to 200L).map(i => (i, if (i <= 100) "hot" else "cold"))
      .toDF("id", "src")
    val got = Sketches.weightedPrioritySample(d, "id", "src",
      weights = Map("hot" -> 8L, "cold" -> 1L), n = 10)
    val bySrc = got.select("src").as[String].collect()
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(bySrc == Map("hot" -> 10, "cold" -> 10))
    // determinism: identical call yields identical ids
    val ids1 = got.select("id").as[Long].collect().sorted.toSeq
    val ids2 = Sketches.weightedPrioritySample(d, "id", "src",
        weights = Map("hot" -> 8L, "cold" -> 1L), n = 10)
      .select("id").as[Long].collect().sorted.toSeq
    assert(ids1 == ids2)
    // a stratum absent from the weight map contributes nothing
    val got2 = Sketches.weightedPrioritySample(d, "id", "src",
      weights = Map("hot" -> 8L), n = 10)
    assert(got2.select("src").as[String].collect().toSet == Set("hot"))
  }

  test("equiDepthBins: quartiles split a uniform column evenly") {
    val d = (1 to 100).map(_.toDouble).toDF("v")
    val buckets = graft.operators.Profile.equiDepthBins(d, "v", nb = 4)
      .groupBy("bucket").count()
      .as[(Int, Long)].collect().toMap
    // nearest-rank edges at ranks 25/50/75 -> values 25,50,75; ties
    // go low, so buckets are 25/25/25/25
    assert(buckets == Map(0 -> 25L, 1 -> 25L, 2 -> 25L, 3 -> 25L))
    // skewed data still splits by population, not by range
    val skew = (Seq.fill(90)(1.0) ++ (1 to 10).map(_ * 1000.0)).toDF("v")
    val top = graft.operators.Profile.equiDepthBins(skew, "v", nb = 4)
      .filter(col("bucket") === 3).count()
    assert(top == 10) // the whole heavy tail isolates in the top bin
  }

  test("pairRules: counts, confidence and lift on a known basket set") {
    // baskets: {x,y} x3, {x,z}, {y,z} -> pair xy supp 3, xz 1, yz 1
    val d = Seq((1L, "x"), (1L, "y"), (2L, "x"), (2L, "y"),
      (3L, "x"), (3L, "y"), (4L, "x"), (4L, "z"), (5L, "y"), (5L, "z"))
      .toDF("b", "i")
    val rules = graft.ml.Association.pairRules(d, "b", "i",
        minSupport = 2L)
      .select("ante", "cons", "supp_pair", "conf", "lift")
      .as[(String, String, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(rules.keySet == Set(("x", "y"), ("y", "x"))) // only xy >= 2
    val (_, _, sp, conf, lift) = rules(("x", "y"))
    assert(sp == 3L && conf == 0.75) // x in 4 baskets, xy in 3
    assert(lift == 0.9375) // 3*5/(4*4)
  }

  test("pairRules: a basket past the in-row cap takes the chunked " +
      "expansion and counts identically (r18 memory-cliff fix)") {
    // one 1500-item basket (> inRowCap = 1024) routes the WHOLE pair
    // stream through the chunked posexplode+suffix path; a second
    // basket repeats one pair so minSupport = 2 isolates it. The old
    // one-shot expansion would have built a ~1.1M-struct array inside
    // a single row for the big basket.
    val big = (0 until 1500).map(i => (1L, f"t$i%05d"))
    val rep = Seq((2L, "t00000"), (2L, "t00001"))
    val rules = graft.ml.Association.pairRules(
        (big ++ rep).toDF("b", "i"), "b", "i", minSupport = 2L)
      .select("ante", "cons", "supp_pair", "supp_ante", "supp_cons",
        "conf", "lift")
      .as[(String, String, Long, Long, Long, Double, Double)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    assert(rules.keySet == Set(("t00000", "t00001"), ("t00001", "t00000")))
    val (_, _, sp, sa, sc, conf, lift) = rules(("t00000", "t00001"))
    // pair in both baskets; each item in both baskets; N = 2
    assert(sp == 2L && sa == 2L && sc == 2L)
    assert(conf == 1.0 && lift == 1.0) // 2*2/(2*2)
  }

  test("pairRules drops oversized baskets loudly, keeps the rest") {
    val big = (1 to 50).map(i => (99L, s"i$i"))
    val small = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"))
    val rules = graft.ml.Association.pairRules(
        (big ++ small).toDF("b", "i"), "b", "i",
        minSupport = 2L, maxBasketSize = Some(10))
      .select("ante", "cons").as[(String, String)].collect().toSet
    assert(rules == Set(("a", "b"), ("b", "a")))
  }

  test("joinFanout: exact output cardinality without running the join") {
    val left = Seq(("k1", 1), ("k1", 2), ("k2", 3)).toDF("k", "x")
    val right = Seq(("k1", 10), ("k1", 20), ("k1", 30), ("k3", 40))
      .toDF("j", "y")
    val got = graft.operators.Profile.joinFanout(left, right,
        Seq("k" -> "j"))
      .select("k", "n_left", "n_right", "out_rows")
      .as[(String, Long, Long, Long)].collect()
    assert(got.toSeq == Seq(("k1", 2L, 3L, 6L))) // k2/k3 never match
    val actual = left.join(right, left("k") === right("j")).count()
    assert(actual == got.map(_._4).sum)
  }

  test("transitionMatrix tie-break makes equal timestamps deterministic") {
    val ts = new java.sql.Timestamp(1000)
    val ev = Seq((1L, 1L, ts, "x"), (1L, 2L, ts, "y"), (1L, 3L, ts, "z"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val got = graft.operators.Sessionize.transitionMatrix(
        ev, "user_id", "ts", "event_type", tieCols = Seq("event_id"))
      .select("from_type", "to_type").as[(String, String)]
      .collect().toSet
    assert(got == Set(("x", "y"), ("y", "z")))
  }
}
