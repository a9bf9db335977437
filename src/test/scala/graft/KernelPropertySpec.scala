package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.util.GenericArrayData

import graft.functions.{MinHashSignature, ShingleHashes, SimHash64, SortedIntersectCount, Winnow}
import org.apache.spark.unsafe.types.UTF8String

/** Property tests for the native kernels (pure JVM statics — no Spark
  * session needed, so hundreds of cases run in milliseconds).
  */
class KernelPropertySpec extends AnyFunSuite {

  private def forAll[A](g: Gen[A], cases: Int = 300)(f: A => Unit): Unit = {
    var seed = Seed(42L)
    var n    = 0
    while (n < cases) {
      g.apply(Gen.Parameters.default, seed).foreach { a => f(a); n += 1 }
      seed = seed.next
    }
  }

  private val textGen: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.alphaNumStr.map(_.take(8)), Gen.const(" "), Gen.const("\t"),
    Gen.const("\n"))).map(_.mkString(" "))

  private val sortedArrayGen: Gen[Array[Long]] =
    Gen.listOf(Gen.chooseNum(Long.MinValue, Long.MaxValue))
      .map(_.distinct.sorted.toArray)

  test("sorted_intersect_count equals set intersection, symmetric") {
    forAll(Gen.zip(sortedArrayGen, sortedArrayGen)) { case (a, b) =>
      val expect = a.toSet.intersect(b.toSet).size
      val ad = new GenericArrayData(a)
      val bd = new GenericArrayData(b)
      assert(SortedIntersectCount.compute(ad, bd) == expect)
      assert(SortedIntersectCount.compute(bd, ad) == expect)
      assert(SortedIntersectCount.compute(ad, ad) == a.length)
    }
  }

  test("shingle count is max(tokens - n + 1, 1) for non-empty text") {
    forAll(Gen.zip(textGen, Gen.chooseNum(1, 5))) { case (s, n) =>
      val tokens = s.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      val got = ShingleHashes.compute(UTF8String.fromString(s), n).numElements()
      if (tokens.isEmpty) assert(got == 0)
      else assert(got == math.max(tokens.length - n + 1, 1))
    }
  }

  test("shingles are case- and surrounding-whitespace-insensitive") {
    forAll(textGen) { s =>
      val a = ShingleHashes.compute(UTF8String.fromString(s), 3)
      val b = ShingleHashes.compute(
        UTF8String.fromString("  " + s.toUpperCase + "\n"), 3)
      assert(a.toLongArray().toSeq == b.toLongArray().toSeq)
    }
  }

  test("minhash signature has fixed length, dominated by element minima") {
    forAll(Gen.zip(sortedArrayGen, Gen.chooseNum(1, 64))) { case (a, k) =>
      val sig = MinHashSignature.compute(new GenericArrayData(a), k)
      assert(sig.numElements() == k)
      // signature of a superset is element-wise <= (min can only drop)
      val sup = MinHashSignature.compute(
        new GenericArrayData(a :+ 12345L), k)
      sig.toLongArray().zip(sup.toLongArray()).foreach { case (x, y) =>
        assert(y <= x)
      }
    }
  }

  test("simhash is deterministic and whitespace-split-stable") {
    forAll(textGen) { s =>
      val a = SimHash64.compute(UTF8String.fromString(s))
      assert(a == SimHash64.compute(UTF8String.fromString(s)))
      // collapsing runs of whitespace does not change the token stream
      val collapsed = s.trim.replaceAll("\\s+", " ")
      assert(a == SimHash64.compute(UTF8String.fromString(collapsed)))
    }
  }

  private val hashArrayGen: Gen[Array[Long]] =
    Gen.listOf(Gen.chooseNum(Long.MinValue, Long.MaxValue)).map(_.toArray)

  test("winnow equals the naive min-per-window reference") {
    forAll(Gen.zip(hashArrayGen, Gen.chooseNum(1, 8))) { case (h, w) =>
      val naive =
        if (h.isEmpty) Array.empty[Long]
        else (0 to math.max(h.length - w, 0))
          .map(i => h.slice(i, math.min(i + w, h.length)).min)
          .distinct.sorted.toArray
      val got = Winnow.compute(new GenericArrayData(h), w).toLongArray()
      assert(got.sameElements(naive), s"w=$w h=${h.mkString(",")}")
    }
  }

  test("winnow selects a subset of the input at w>1 density") {
    forAll(Gen.zip(hashArrayGen, Gen.chooseNum(2, 8))) { case (h, w) =>
      val got = Winnow.compute(new GenericArrayData(h), w).toLongArray()
      val set = h.toSet
      assert(got.forall(set.contains))
      assert(got.length <= math.max(h.length - w + 1, math.min(h.length, 1)))
      // shared-run guarantee: winnow(h ++ noise) and winnow(noise2 ++ h)
      // share a hash when |h| >= w (both contain a full window inside h)
      if (h.length >= w) {
        val l = Winnow.compute(
          new GenericArrayData(h ++ Array(7L, 8L, 9L)), w).toLongArray().toSet
        val r = Winnow.compute(
          new GenericArrayData(Array(1L, 2L, 3L) ++ h), w).toLongArray().toSet
        assert(l.intersect(r).nonEmpty)
      }
    }
  }

  test("bounded edit distance equals the built-in threshold levenshtein") {
    import org.apache.spark.unsafe.types.UTF8String
    val rnd = new scala.util.Random(8181)
    def randStr(ascii: Boolean): String = {
      val len = rnd.nextInt(24)
      val chars = if (ascii) "abcx0189#" else "abcx0189#éλ漢"
      (0 until len).map(_ => chars(rnd.nextInt(chars.length))).mkString
    }
    for (_ <- 1 to 3000; ascii <- Seq(true, false)) {
      val (s1, s2) = (randStr(ascii), randStr(ascii))
      // mutate s2 from s1 sometimes so small distances are exercised
      val t2 = if (rnd.nextBoolean()) s2
        else {
          val from = rnd.nextInt(s1.length + 1)
          s1.patch(from, Seq.fill(rnd.nextInt(3))('z'),
            math.min(rnd.nextInt(3), s1.length - from)).mkString
        }
      val k = rnd.nextInt(5)
      val (u1, u2) = (UTF8String.fromString(s1), UTF8String.fromString(t2))
      val got = graft.functions.BoundedEditDistance.compute(u1, u2, k)
      val want = u1.levenshteinDistance(u2, k)
      assert(got == want, s"'$s1' vs '$t2' k=$k: got $got want $want")
    }
  }
}
