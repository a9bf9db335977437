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

  // -------------------------------------------------------- resample

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
