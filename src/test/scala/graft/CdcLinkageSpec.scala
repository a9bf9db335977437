package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ml.{Graph, Linkage}
import graft.operators.Resample
import graft.pipeline.Cdc

/** Specs for the round-8 additions: CDC log compaction, degree-oriented
  * triangle counting, blocked record linkage, and time-grid resampling
  * with forward fill.
  */
class CdcLinkageSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  // ------------------------------------------------------------- CDC

  test("cdc compact: latest op wins, deletes drop, n_ops counts churn") {
    val log = Seq(
      (1L, 1L, "I", "a"), (1L, 2L, "U", "b"),          // update wins
      (2L, 1L, "I", "x"), (2L, 2L, "D", ""),           // deleted
      (3L, 1L, "I", "p"),                              // plain insert
      (4L, 1L, "I", "q"), (4L, 2L, "D", ""), (4L, 3L, "I", "r"))
      .toDF("k", "seq", "op", "payload")
    val got = Cdc.compact(log, Seq("k"), "seq", "op")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, "b", 2L), (3L, "p", 1L), (4L, "r", 3L)))
  }

  test("cdc compact: a NULL winning op is NOT a delete — the key survives") {
    val log = Seq(
      (1L, 1L, Some("I"), "a"), (1L, 2L, Option.empty[String], "b"),
      (2L, 1L, Some("I"), "x"), (2L, 2L, Some("D"), ""))
      .toDF("k", "seq", "op", "payload")
    val got = Cdc.compact(log, Seq("k"), "seq", "op")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    // key 1's winner has a null op: it must surface (with its payload)
    // for a downstream DQ rule, not silently vanish like the D on key 2
    assert(got.toSeq == Seq((1L, "b", 2L)))
  }

  test("cdc compact: out-of-order arrival gives the same state") {
    val inOrder = Seq((1L, 1L, "I", "a"), (1L, 2L, "U", "b"),
      (1L, 3L, "U", "c")).toDF("k", "seq", "op", "v")
    val shuffled = Seq((1L, 3L, "U", "c"), (1L, 1L, "I", "a"),
      (1L, 2L, "U", "b")).toDF("k", "seq", "op", "v")
    val a = Cdc.compact(inOrder, Seq("k"), "seq", "op").collect().toSeq
    val b = Cdc.compact(shuffled, Seq("k"), "seq", "op").collect().toSeq
    assert(a == b && a.head.getString(1) == "c")
  }

  // ------------------------------------------------------- triangles

  test("triangles: K4 gives every node 3; pendant node excluded") {
    // K4 on 1-4 plus pendant edge 4-5; reversed + duplicate + self
    // edges must be tolerated.
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 3L), (2L, 2L), (4L, 5L), (1L, 2L))
      .toDF("s", "d")
    val got = Graph.triangleCounts(edges, "s", "d")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangles match a brute-force count on a random graph") {
    val rnd = new scala.util.Random(4242)
    val n = 40
    val edges = (1 to 300).map { _ =>
      (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
    }.distinct
    val canon = edges.collect { case (a, b) if a != b =>
      (math.min(a, b), math.max(a, b)) }.distinct.toSet
    val brute = scala.collection.mutable.Map.empty[Long, Long]
    val nodes = canon.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    for {
      a <- nodes; b <- nodes if a < b && canon((a, b))
      c <- nodes if b < c && canon((b, c)) && canon((a, c))
    } Seq(a, b, c).foreach(x => brute(x) = brute.getOrElse(x, 0L) + 1)
    val got = Graph.triangleCounts(edges.toDF("s", "d"), "s", "d")
      .as[(Long, Long)].collect().toMap
    assert(got == brute.toMap)
  }

  // --------------------------------------------------------- linkage

  test("linkage pairs within the blocked edit budget only") {
    val left = Seq((1L, "b1", "smith"), (2L, "b1", "jones"),
      (3L, "b2", "brown")).toDF("lid", "blk", "name")
    val right = Seq((10L, "b1", "smyth"), (11L, "b1", "jonez"),
      (12L, "b2", "smith"), (13L, "b1", "totally-different"))
      .toDF("rid", "blk", "name")
    val got = Linkage.linkPairs(left, right, "lid", "rid", "blk",
        Seq("name" -> "name"), maxDistance = 1)
      .select("lid", "d_name").as[(Long, Long)].collect().toSet
    // smith~smyth (1), jones~jonez (1); brown vs smith is a DIFFERENT
    // block so never compared even though both exist.
    assert(got == Set((1L, 1L), (2L, 1L)))
  }

  test("linkage drops oversized blocks from both sides") {
    val left = (1L to 50L).map(i => (i, "hot", "aaaa"))
      .toDF("lid", "blk", "n")
    val right = Seq((99L, "hot", "aaaa"), (100L, "cold", "bbbb"))
      .toDF("rid", "blk", "n")
    val cold = left.unionByName(Seq((51L, "cold", "bbbb"))
      .toDF("lid", "blk", "n"))
    val got = Linkage.linkPairs(cold, right, "lid", "rid", "blk",
        Seq("n" -> "n"), maxDistance = 0, maxBlockSize = Some(10))
      .select("lid", "rid").as[(Long, Long)].collect().toSeq
    assert(got == Seq((51L, 100L))) // only the cold-block pair survives
  }

  test("sortedNeighborPairs finds adjacent near-dups without blocking") {
    // names sort adjacently; "smith"~"smyth" are neighbors in sort
    // order even though no blocking key exists
    val left = Seq((1L, "smith"), (2L, "jones"), (3L, "zzzza"))
      .toDF("lid", "name")
    val right = Seq((10L, "smyth"), (11L, "jonez"), (12L, "aaaaa"))
      .toDF("rid", "name")
    val got = graft.ml.Linkage.sortedNeighborPairs(left, right,
        "lid", "rid", "name", "name", "name", "name",
        maxDistance = 1, windowSize = 4, partitions = 3)
      .select("lid", "rid", "distance")
      .as[(Long, Long, Int)].collect().toSet
    assert(got == Set((1L, 10L, 1), (2L, 11L, 1)))
  }

  test("sortedNeighborPairs: window bound caps the candidate span") {
    // identical keys everywhere: with windowSize w each record only
    // sees w-1 successors, so pair count stays linear
    val left = (1L to 30L).map(i => (i, f"k$i%03d")).toDF("lid", "name")
    val right = (1L to 30L).map(i => (i + 100, f"k$i%03d"))
      .toDF("rid", "name")
    val n = graft.ml.Linkage.sortedNeighborPairs(left, right,
        "lid", "rid", "name", "name", "name", "name",
        maxDistance = 2, windowSize = 3, partitions = 4).count()
    // each cross-side pair within 2 positions of the interleaved sort:
    // exactly bounded by total*(w-1) = 60*2 = 120 candidate probes
    assert(n > 0 && n <= 120)
  }

  // -------------------------------------------------------- resample

  test("kCorePeel removes the low-degree fringe, cascading") {
    // Triangle core {1,2,3} (degree 2 each) + a pendant chain 3-4-5.
    // k=2: round 1 drops 5 (deg 1); round 2 drops 4 (its degree fell
    // to 1 when 5 left) — the cascade a single pass misses.
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("s", "d")
    val got = Graph.kCorePeel(edges, "s", "d", k = 2, iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // One peel only: 5 is gone but 4 (now deg 1) still holds edge 3-4
    // — though the final >= k degree filter hides 4 itself.
    val one = Graph.kCorePeel(edges, "s", "d", k = 2, iters = 1)
      .as[(Long, Long)].collect().toMap
    assert(one == Map(1L -> 2L, 2L -> 2L, 3L -> 3L))
  }

  test("coalesceLookup resolves by priority with a default") {
    val fact = Seq((1L, 10L, 100L), (2L, 20L, 100L), (3L, 30L, 200L),
      (4L, 40L, 999L)).toDF("id", "k1", "k2")
    val d1 = Seq((10L, "exact")).toDF("k", "v")
    val d2 = Seq((100L, "coarse")).toDF("k", "v")
    val got = graft.operators.Joins.coalesceLookup(fact,
        Seq((d1, Seq("k1" -> "k"), "v"), (d2, Seq("k2" -> "k"), "v")),
        outCol = "res", default = lit("dflt"))
      .select("id", "res").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "exact", 2L -> "coarse", 3L -> "dflt",
      4L -> "dflt"))
  }

  test("rollingMean averages the trailing frame, short at the head") {
    val grid = Seq((1L, "2024-01-01", 1.0), (1L, "2024-01-02", 2.0),
      (1L, "2024-01-03", 6.0), (1L, "2024-01-04", 3.0))
      .toDF("k", "day_s", "v")
      .select(col("k"), col("day_s").cast("date").as("day"), col("v"))
    val got = graft.operators.Resample.rollingMean(grid, "k", "day", "v", 3)
      .select(col("day").cast("string"), col("mean_3"))
      .as[(String, Double)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(("2024-01-01", 1.0), ("2024-01-02", 1.5),
      ("2024-01-03", 3.0), ("2024-01-04", 3.666667)))
  }

  test("chiSquare: independent columns give zero cell terms") {
    // 2x2 balanced: o == e everywhere.
    val d = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"))
      .toDF("c1", "c2")
    val got = graft.operators.Profile.chiSquare(d, "c1", "c2")
      .select("o", "e", "chi2_cell")
      .as[(Long, Double, Double)].collect()
    assert(got.length == 4)
    assert(got.forall { case (o, e, x2) => o == 1L && e == 1.0 && x2 == 0.0 })
  }

  test("chiSquare: dependence concentrates in the right cell") {
    // c2 == c1 on 9 of 10 rows: diagonal cells o >> e.
    val d = (Seq.fill(9)(("a", "a")) ++ Seq(("b", "b")) ++
      Seq.fill(9)(("b", "b")) ++ Seq(("a", "b"))).toDF("c1", "c2")
    val cells = graft.operators.Profile.chiSquare(d, "c1", "c2")
      .select("c1", "c2", "o", "chi2_cell")
      .as[(String, String, Long, Double)].collect()
      .map(r => ((r._1, r._2), (r._3, r._4))).toMap
    assert(cells(("a", "a"))._1 == 9L)
    assert(cells(("a", "a"))._2 > cells(("a", "b"))._2)
  }

  test("forward fill completes the grid and carries the last value") {
    val ev = Seq(
      (7L, "2024-01-01 10:00:00", 1.5),
      (7L, "2024-01-01 11:00:00", 0.5),  // same day: sums to 2.0
      (7L, "2024-01-04 09:00:00", 4.0),  // 2 gap days before
      (8L, "2024-01-02 00:00:00", 9.0))  // single-day user: no gaps
      .toDF("user_id", "ts_s", "value")
      .select(col("user_id"), col("ts_s").cast("timestamp").as("ts"),
        col("value"))
    val got = Resample.dailyFillForward(ev, "user_id", "ts", "value")
      .select(col("user_id"), col("day").cast("string"), col("filled"),
        col("is_gap"))
      .as[(Long, String, Double, Int)].collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq == Seq(
      (7L, "2024-01-01", 2.0, 0),
      (7L, "2024-01-02", 2.0, 1),
      (7L, "2024-01-03", 2.0, 1),
      (7L, "2024-01-04", 4.0, 0),
      (8L, "2024-01-02", 9.0, 0)))
  }
}
