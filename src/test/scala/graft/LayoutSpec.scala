package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.operators.Layout

class LayoutSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  /** Reference Morton interleave for the assertion side. */
  private def morton(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  test("zOrderKey matches the reference interleave and masks inputs") {
    val rows = Seq((5L, 3L), (0L, 0L), (7L, 7L), (1L, 6L), (1029L, 2L))
    val out = rows.toDF("x", "y")
      .select($"x", $"y", Layout.zOrderKey($"x", $"y", 3).as("z"))
      .as[(Long, Long, Long)].collect()
      .map { case (x, y, z) => ((x, y), z) }.toMap
    rows.foreach { case (x, y) =>
      assert(out((x, y)) == morton(x & 7, y & 7, 3)) // masked to 3 bits
    }
    assert(out((5L, 3L)) == 27L) // hand-computed: 0b011011
  }

  test("zOrderKey round-trips 500 seeded random points") {
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(500)(
      (rnd.nextInt(1 << 10).toLong, rnd.nextInt(1 << 10).toLong))
    val out = pts.toDF("x", "y")
      .select($"x", $"y", Layout.zOrderKey($"x", $"y", 10).as("z"))
      .as[(Long, Long, Long)].collect()
    out.foreach { case (x, y, z) =>
      assert(z == morton(x, y, 10))
      val xr = (0 until 10).map(i => ((z >> (2 * i)) & 1L) << i).reduce(_ | _)
      val yr = (0 until 10).map(i => ((z >> (2 * i + 1)) & 1L) << i).reduce(_ | _)
      assert(xr == x && yr == y) // interleave loses nothing
    }
  }

  test("zOrderedWrite preserves rows and yields compact per-file boxes") {
    val n = 32
    val df = (for (x <- 0 until n; y <- 0 until n)
      yield (x.toLong, y.toLong)).toDF("x", "y")
    val dir = "target/tmp_layout/zorder"
    Layout.zOrderedWrite(df, "x", "y", bits = 5, dir, partitions = 16)
    val back = spark.read.parquet(dir)
    assert(back.count() == n.toLong * n)
    // each file covers a compact rectangle: its x and y spans must be
    // far below the full domain (a 1-D sort on x would give y-span 32
    // in every file)
    val spans = back
      .withColumn("f", input_file_name())
      .groupBy("f")
      .agg((max($"x") - min($"x")).as("xs"), (max($"y") - min($"y")).as("ys"))
      .as[(String, Long, Long)].collect()
    assert(spans.length > 1)
    assert(spans.forall { case (_, xs, ys) => xs <= 16 && ys <= 16 })
  }

  test("compactionPlan bins files by cumulative size per directory") {
    val files = Seq(
      ("a", "f1", 60L), ("a", "f2", 50L), ("a", "f3", 40L),
      ("a", "f4", 10L), ("a", "f5", 10L),
      ("b", "big", 500L), ("b", "tiny", 1L)
    ).toDF("dir", "file", "bytes")
    val got = Layout.compactionPlan(files, "dir", "file", "bytes", 100L)
      .select("dir", "file", "bin").as[(String, String, Int)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    // dir a, size-desc order f1(60) f2(50) f3(40) f4(10) f5(10):
    // prefixes 0,60,110,150,160 -> bins 0,0,1,1,1
    assert(got(("a", "f1")) == 0 && got(("a", "f2")) == 0)
    assert(got(("a", "f3")) == 1 && got(("a", "f4")) == 1 &&
      got(("a", "f5")) == 1)
    // an oversized file fills its own bin; the next starts a new one
    assert(got(("b", "big")) == 0 && got(("b", "tiny")) == 5)
    // deterministic across runs
    val again = Layout.compactionPlan(files, "dir", "file", "bytes", 100L)
      .select("dir", "file", "bin").as[(String, String, Int)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(again == got)
  }
}
