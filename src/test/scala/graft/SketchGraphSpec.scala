package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{HllRho, Mix64}
import graft.ml.{Graph, Sketches}
import graft.operators.{Joins, Sessionize}

/** Specs for the round-5 additions: sketches (HLL, CMS, deterministic
  * sampling), connected components, sessionization, and the
  * Bloom-prefiltered semi-join.
  */
class SketchGraphSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  // ------------------------------------------------------------ kernels

  test("mix64 matches the splitmix64 reference values") {
    // reference: seed chain used by MinHashSignature with seed index 0
    def ref(x: Long, seed: Int): Long = {
      var z = x + (seed + 1) * 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val rows = Seq(0L, 1L, -1L, Long.MaxValue, Long.MinValue, 42L)
      .toDF("x")
      .select(col("x"), Mix64.mix64(col("x"), 7).as("z"))
      .as[(Long, Long)].collect()
    rows.foreach { case (x, z) => assert(z == ref(x, 7), s"x=$x") }
  }

  test("hll_rho is trailing zeros + 1 of the post-register bits") {
    val p = 10
    val cases = Seq(
      (1L << p, 1),            // lowest post-register bit set
      (1L << (p + 5), 6),      // five post-register trailing zeros
      (0L, 64 - p + 1),        // all-zero remainder saturates
      (-1L, 1))                // all ones
    val got = cases.map(_._1).toDF("z")
      .select(HllRho.hllRho(col("z"), p)).as[Int].collect().toSeq
    assert(got == cases.map(_._2))
  }

  // ---------------------------------------------------------------- HLL

  test("hll estimate is within 5% of the true distinct count") {
    val n = 20000
    val df = (1 to n).map(i => i.toLong * 2654435761L).toDF("k")
    val regs = Sketches.hllRegisters(df, "k", p = 12)
    val est = Sketches.hllEstimate(regs, p = 12)
      .as[Double].head()
    assert(math.abs(est - n) / n < 0.05, s"estimate $est for $n distinct")
  }

  test("hll registers merge by max — sharded build equals global build") {
    val all = (1 to 5000).map(_.toLong).toDF("k")
    val a = Sketches.hllRegisters(all.filter($"k" <= 2500), "k", p = 8)
    val b = Sketches.hllRegisters(all.filter($"k" > 2500), "k", p = 8)
    val merged = a.unionByName(b).groupBy("register")
      .agg(max("rho").as("rho"))
    val global = Sketches.hllRegisters(all, "k", p = 8)
    assert(merged.collect().toSet == global.collect().toSet)
  }

  // ---------------------------------------------------------------- CMS

  test("cms estimate upper-bounds the exact count and is exact for hot keys") {
    val tok = (Seq.fill(500)("alpha") ++ Seq.fill(100)("beta") ++
      (1 to 400).map(i => s"tail$i")).toDF("token")
    val exact = tok.groupBy("token").agg(count(lit(1)).as("cnt"))
    val counters = Sketches.cmsCounters(tok, "token", depth = 4, width = 1024)
    val est = Sketches.cmsEstimate(counters, exact, "token")
      .select("token", "cnt", "cms_est")
      .as[(String, Long, Long)].collect()
    est.foreach { case (t, c, e) => assert(e >= c, s"$t: est $e < exact $c") }
    val hot = est.find(_._1 == "alpha").get
    // 1000 tokens over 4×1024 counters: collisions may inflate the tail
    // but the hot key estimate stays near-exact with 4 rows
    assert(hot._3 - hot._2 <= 10)
  }

  test("heavy hitters returns exact top-k in frequency order") {
    val tok = (Seq.fill(9)("a") ++ Seq.fill(5)("b") ++ Seq.fill(2)("c") ++
      Seq("d")).toDF("token")
    val hh = Sketches.heavyHitters(tok, "token", k = 3)
      .select("token", "cnt").as[(String, Long)].collect().toSeq
    assert(hh == Seq(("a", 9L), ("b", 5L), ("c", 2L)))
  }

  test("exactQuantiles matches hand-computed lower-interpolation ranks") {
    // 1..100 shuffled: rank k = floor(p*99)+1 → p=0 →1, .5 →50, 1 →100
    val df = scala.util.Random.shuffle((1 to 100).toList)
      .map(_.toDouble).toDF("x")
    val qs = Sketches.exactQuantiles(df, "x", Seq(0.0, 0.5, 0.9, 1.0))
      .as[(Double, Double)].collect().toSeq
    assert(qs == Seq((0.0, 1.0), (0.5, 50.0), (0.9, 90.0), (1.0, 100.0)))
    // duplicate mass: [1,1,1,2] → p=0.5 hits rank 2, still value 1
    val dup = Seq(1.0, 1.0, 1.0, 2.0).toDF("x")
    val m = Sketches.exactQuantiles(dup, "x", Seq(0.5, 1.0))
      .as[(Double, Double)].collect().toSeq
    assert(m == Seq((0.5, 1.0), (1.0, 2.0)))
  }

  test("exactQuantileValues: frame-identical values in ps order, empty-safe, caches released (r17)") {
    val df = scala.util.Random.shuffle((1 to 100).toList)
      .map(_.toDouble).toDF("x")
    // unsorted ps: values must come back in PS order, not value order
    val ps = Seq(0.9, 0.0, 0.5)
    val byP = Sketches.exactQuantiles(df, "x", ps)
      .as[(Double, Double)].collect().toMap
    val before = spark.sparkContext.getPersistentRDDs.size
    val got = Sketches.exactQuantileValues(df, "x", ps)
    assert(got == ps.map(byP))
    // the internal histogram persists release with the call — only
    // pre-existing caches (if any) survive
    assert(spark.sparkContext.getPersistentRDDs.size <= before)
    // empty input: one null per requested fraction
    assert(Sketches.exactQuantileValues(
      Seq.empty[Double].toDF("x"), "x", Seq(0.25, 0.5)) == Seq(null, null))
  }

  test("exactQuantiles equals the sorted-sequence reference (seeded)") {
    val rnd = new scala.util.Random(13)
    // coarse grid → plenty of duplicate mass
    val xs = Seq.fill(5000)(math.floor(rnd.nextDouble() * 1000) / 10)
    val ps = Seq(0.0, 0.1, 0.33, 0.5, 0.77, 0.9, 1.0)
    val sorted = xs.sorted
    val expect = ps.map(p =>
      (p, sorted(math.floor(p * (xs.size - 1)).toInt)))
    val got = Sketches.exactQuantiles(xs.toDF("x"), "x", ps)
      .as[(Double, Double)].collect().toSeq
    assert(got == expect)
  }

  test("exactQuantiles: no data-sized window at all (kernel prefix sum)") {
    val df = (1 to 1000).map(_.toDouble).toDF("x")
    val q = Sketches.exactQuantiles(df, "x", Seq(0.5))
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    val specs = "windowspecdefinition\\([^)]*\\)".r
      .findAllIn(plan).toList
    // r12: the histogram running sum is the stateful
    // PartitionPrefixSum kernel — no window touches the value column
    // (the old __pid-window form re-shuffled the histogram); the only
    // window left is the global-order lift over the
    // partition-count-sized totals table (no v# reference)
    assert(specs.forall(s => !s.contains("v#")),
      s"a window still references the value column: $specs")
    assert(plan.contains("partition_prefix_sum"),
      "histogram running sum no longer uses the kernel")
  }

  // ----------------------------------------------------------- sampling

  test("stratified sample is deterministic and respects per-stratum rates") {
    val df = (1 to 20000).map(i => (i.toLong, if (i % 2 == 0) "en" else "de"))
      .toDF("id", "lang")
    val rates = Map("en" -> 128, "de" -> 512) // 12.5% / 50%
    val s1 = Sketches.stratifiedSample(df, "id", "lang", rates)
    val s2 = Sketches.stratifiedSample(df, "id", "lang", rates)
    assert(s1.collect().toSet == s2.collect().toSet) // no RNG state
    val byLang = s1.groupBy("lang").count().as[(String, Long)]
      .collect().toMap
    assert(math.abs(byLang("en") / 10000.0 - 0.125) < 0.02)
    assert(math.abs(byLang("de") / 10000.0 - 0.5) < 0.02)
    // a stratum absent from the rate map is dropped entirely
    val s3 = Sketches.stratifiedSample(df, "id", "lang", Map("en" -> 512))
    assert(s3.filter($"lang" === "de").count() == 0)
  }

  // --------------------------------------------------- connected comps

  test("connected components labels each node with its component minimum") {
    // two chains and an isolated edge: {1-2-3-4}, {10-11}, {20-21-22}
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L),
      (21L, 20L), (21L, 22L)).toDF("a", "b")
    val cc = Graph.connectedComponents(edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("connected components converges on a long path within maxIter") {
    // path 1-2-3-...-12: diameter 11, min-label propagation needs
    // ~diameter rounds; default maxIter=20 must reach the fixpoint
    val edges = (1L until 12L).map(i => (i, i + 1)).toDF("a", "b")
    val cc = Graph.connectedComponents(edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(cc.values.toSet == Set(1L))
    assert(cc.keySet == (1L to 12L).toSet)
  }

  test("connected components handles diameter far beyond maxIter") {
    // path 1-...-101: diameter 100 > default maxIter=20 — the
    // path-halving shortcut must reach the fixpoint in ~log2 rounds,
    // where plain per-round propagation would stall at distance 20
    val edges = (1L until 101L).map(i => (i, i + 1)).toDF("a", "b")
    val cc = Graph.connectedComponents(edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(cc.keySet == (1L to 101L).toSet)
    assert(cc.values.toSet == Set(1L))
  }

  test("connected components: multi-partition declared-leaf loop is " +
      "label-identical and restores the session shuffle width (r18)") {
    // rowsPerPartition = 50 forces nPartCc > 1 on a small graph, so
    // the loop runs the declared hash(id, nPartCc) label leaf and the
    // pinned round republish across several partitions — the exact
    // code path the 100 TB posture uses. Two components, one of them
    // a diameter-60 chain (halving active past round 2).
    val widthBefore = spark.conf.get("spark.sql.shuffle.partitions")
    val edges = ((1L until 61L).map(i => (i, i + 1)) ++
      Seq((200L, 201L), (201L, 202L))).toDF("a", "b")
    val cc = Graph.connectedComponents(edges, "a", "b",
        rowsPerPartition = 50L)
      .as[(Long, Long)].collect().toMap
    assert(cc.keySet == (1L to 61L).toSet ++ Set(200L, 201L, 202L))
    assert((1L to 61L).forall(cc(_) == 1L))
    assert(Seq(200L, 201L, 202L).forall(cc(_) == 200L))
    assert(spark.conf.get("spark.sql.shuffle.partitions") == widthBefore)
  }

  test("connected components rejects maxIter < 1") {
    val edges = Seq((1L, 2L)).toDF("a", "b")
    intercept[IllegalArgumentException] {
      Graph.connectedComponents(edges, "a", "b", maxIter = 0)
    }
  }

  test("connected components with a reliable checkpoint dir") {
    // cluster-durable mode: label tables checkpoint to files instead
    // of executor-local blocks; result must be identical
    val dir = java.nio.file.Files
      .createTempDirectory("graft-cc-ckpt").toString
    val edges = Seq((2L, 1L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val cc = Graph.connectedComponents(edges, "a", "b",
        checkpointDir = Some(dir))
      .as[(Long, Long)].collect().toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L,
      11L -> 10L))
  }

  // ------------------------------------------------------ sessionization

  test("sessionize splits on gaps and numbers sessions per key") {
    val events = Seq(
      (1L, 1000L), (1L, 1500L), (1L, 5000L), (1L, 5100L), (1L, 9000L),
      (2L, 100L)).toDF("user", "ts")
    val s = Sessionize.sessions(events, "user", "ts", gap = 1000L)
      .orderBy("user", "session_seq")
      .select("user", "session_seq", "session_start", "session_end",
        "n_events")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(s == Seq(
      (1L, 1L, 1000L, 1500L, 2L),
      (1L, 2L, 5000L, 5100L, 2L),
      (1L, 3L, 9000L, 9000L, 1L),
      (2L, 1L, 100L, 100L, 1L)))
  }

  test("sessionize assigns equal timestamps to the same session") {
    val events = Seq((1L, 100L), (1L, 100L), (1L, 100L)).toDF("user", "ts")
    val seqs = Sessionize.sessionize(events, "user", "ts", gap = 10L)
      .select("session_seq").as[Long].collect().toSeq
    assert(seqs == Seq(1L, 1L, 1L))
  }

  // ------------------------------------------------------- bloom join

  test("bloom semi-join equals the exact semi-join and prunes pre-shuffle") {
    val left = (1L to 10000L).map(i => (i, s"row$i")).toDF("k", "payload")
    val right = (1L to 100L).map(i => Tuple1(i * 97L)).toDF("rk")
    val viaBloom = Joins.bloomSemiJoin(left, "k", right, "rk")
      .select("k").as[Long].collect().toSet
    val exact = left.join(right, $"k" === $"rk", "left_semi")
      .select("k").as[Long].collect().toSet
    assert(viaBloom == exact)
    // the pre-filter itself must shed most non-matching rows: with
    // 100 keys × 3 hashes in 2^16 bits, false-positive rate ≲ 1e-7
    val mask = (1 << 16).toLong - 1
    val words = new Array[Long]((1 << 16) / 64)
    right.select(explode(array((0 until 3).map(s =>
      Mix64.mix64(col("rk"), 50 + s).bitwiseAND(lit(mask))): _*)).as("p"))
      .distinct().as[Long].collect()
      .foreach(p => words(p.toInt >> 6) |= (1L << (p.toInt & 63)))
    def hits(k: Long): Boolean = (0 until 3).forall { s =>
      val p = Mix64.compute(k, 50 + s) & mask
      (words(p.toInt >> 6) >> (p.toInt & 63) & 1L) == 1L
    }
    val passed = (1L to 10000L).count(hits)
    assert(passed <= 110, s"bloom admitted $passed of 10000")
  }

  // --------------------------------------------------- fixed-point PR

  test("pageRankFixedPoint matches hand-computed integer iterations") {
    // 1 -> 2, 1 -> 3, 2 -> 3, 3 -> 1 (deg: 1->2, 2->1, 3->1)
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L)).toDF("s", "d")
    // iteration 1 from r=1e6 each:
    //  c(2) = (1e6*85) div (100*2)               = 425000
    //  c(3) = 425000 + (1e6*85) div 100          = 1275000
    //  c(1) = (1e6*85) div 100                   = 850000
    //  r1: 1 -> 1000000, 2 -> 575000, 3 -> 1425000
    // iteration 2:
    //  c(2) = (1000000*85) div 200               = 425000
    //  c(3) = 425000 + (575000*85) div 100       = 913750
    //  c(1) = (1425000*85) div 100               = 1211250
    //  r2: 1 -> 1361250, 2 -> 575000, 3 -> 1063750
    val r = Graph.pageRankFixedPoint(e, "s", "d", iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(r == Map(1L -> 1361250L, 2L -> 575000L, 3L -> 1063750L))
  }

  test("pageRankFixedPoint is deterministic across partitionings") {
    val e = (0L until 200L).map(i => (i, (i * 7 + 3) % 200)).toDF("s", "d")
    val a = Graph.pageRankFixedPoint(e.repartition(1), "s", "d")
      .as[(Long, Long)].collect().toMap
    val b = Graph.pageRankFixedPoint(e.repartition(13), "s", "d")
      .as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("pageRankFixedPoint leaves no persisted intermediates behind") {
    val before = spark.sparkContext.getPersistentRDDs.size
    val e = Seq((1L, 2L), (2L, 1L)).toDF("s", "d")
    Graph.pageRankFixedPoint(e, "s", "d").count()
    // only the returned (checkpointed) rank table may remain
    assert(spark.sparkContext.getPersistentRDDs.size <= before + 1)
  }

  // ------------------------------------------------ group quantiles

  test("groupQuantiles: exact interpolated per-group quantiles") {
    val d = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
      ("b", 10.0), ("b", 20.0)).toDF("k", "v")
    val r = Sketches.groupQuantiles(d, Seq("k"), "v",
      Seq(("p50", 0.5), ("p90", 0.9)))
      .as[(String, Double, Double, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(r("a") == ((2.5, 3.7, 4L))) // 0.9*(4-1)=2.7 -> 3 + 0.7*(4-3)
    assert(r("b") == ((15.0, 19.0, 2L)))
  }

  // ------------------------------------------------- funnel / cohort

  test("funnelMatch: strict ordering, partial depth, same-ts no-advance") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000)
    val e = Seq(
      // user 1 completes the funnel, with a decoy click BEFORE view
      (1L, ts(5), "click"), (1L, ts(10), "view"),
      (1L, ts(20), "click"), (1L, ts(30), "purchase"),
      // user 2: click at the SAME ts as view must not advance (strict >)
      (2L, ts(10), "view"), (2L, ts(10), "click"),
      // user 3: only a view
      (3L, ts(7), "view"),
      // user 4: never views
      (4L, ts(1), "purchase"))
      .toDF("user_id", "ts", "event_type")
    val r = Sessionize.funnelMatch(e, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"))
      .as[(Long, Option[Timestamp], Option[Timestamp], Option[Timestamp], Int)]
      .collect().map(t => t._1 -> t).toMap
    assert(r(1L) == ((1L, Some(ts(10)), Some(ts(20)), Some(ts(30)), 3)))
    assert(r(2L) == ((2L, Some(ts(10)), None, None, 1)))
    assert(r(3L)._5 == 1 && r(4L)._5 == 0)
  }

  test("dimLookup picks the version valid at the fact date") {
    import java.sql.Date
    val dim = Seq(
      (1L, "OLD", Date.valueOf("2020-01-01"), Option(Date.valueOf("2024-06-01"))),
      (1L, "NEW", Date.valueOf("2024-06-01"), Option.empty[Date]),
      (2L, "ONLY", Date.valueOf("2023-01-01"), Option.empty[Date]))
      .toDF("k", "seg", "eff_from", "eff_to")
    val fact = Seq(
      (10L, 1L, Date.valueOf("2024-05-31")), // day before the cut -> OLD
      (11L, 1L, Date.valueOf("2024-06-01")), // cut day itself -> NEW
      (12L, 2L, Date.valueOf("2025-01-01")),
      (13L, 2L, Date.valueOf("2022-01-01")), // precedes every version
      (14L, 9L, Date.valueOf("2024-01-01"))) // unknown key
      .toDF("fid", "fk", "d")
    val r = graft.pipeline.Scd.dimLookup(fact, dim,
      Seq("fk" -> "k"), "d")
      .select("fid", "seg").as[(Long, Option[String])].collect().toMap
    assert(r == Map(10L -> Some("OLD"), 11L -> Some("NEW"),
      12L -> Some("ONLY"), 13L -> None, 14L -> None))
  }

  test("cohortRetention: week-exact cells") {
    import java.sql.Timestamp
    // 2024-01-01 is a Monday
    def ts(day: Int) = Timestamp.valueOf(f"2024-01-${day}%02d 12:00:00")
    val e = Seq(
      (1L, ts(1)), (1L, ts(9)),   // cohort w0, active weeks 0 and 1
      (2L, ts(2)), (2L, ts(3)),   // cohort w0, active week 0 only
      (3L, ts(10)))               // cohort w1
      .toDF("user_id", "ts")
    val r = Sessionize.cohortRetention(e, "user_id", "ts")
      .as[(java.sql.Date, Int, Long)].collect()
      .map(t => (t._1.toString, t._2) -> t._3).toMap
    assert(r == Map(("2024-01-01", 0) -> 2L, ("2024-01-01", 1) -> 1L,
      ("2024-01-08", 0) -> 1L))
  }
}
