package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.core.{GlueTypes, GType}
import graft.core.GType._

class GlueTypesSpec extends AnyFunSuite {

  /** Deterministic sampling (scalatest/scalacheck bridge isn't on the
    * offline classpath; drive the generators directly).
    */
  private def forAll[A](g: Gen[A])(f: A => Unit): Unit = {
    var seed = Seed(42L)
    var n    = 0
    while (n < 200) {
      g.apply(Gen.Parameters.default, seed).foreach { a => f(a); n += 1 }
      seed = seed.next
    }
  }
  private def forAll[A, B](g1: Gen[A], g2: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(g1, g2))(p => f(p._1, p._2))
  private def forAll[A, B, C](g1: Gen[A], g2: Gen[B], g3: Gen[C])(
      f: (A, B, C) => Unit): Unit =
    forAll(Gen.zip(g1, g2, g3))(p => f(p._1, p._2, p._3))
  private def whenever(c: Boolean)(f: => Unit): Unit = if (c) f

  private val atomicGen: Gen[GType] = Gen.oneOf(
    GBoolean, GInt, GLong, GFloat, GDouble, GString, GBinary, GDate,
    GTimestamp, GNull, GUnknown, GDecimal(10, 2), GDecimal(20, 4))

  private def typeGen(depth: Int): Gen[GType] =
    if (depth <= 0) atomicGen
    else Gen.frequency(
      5 -> atomicGen,
      1 -> Gen.lzy(typeGen(depth - 1).map(GArray(_))),
      1 -> Gen.lzy(typeGen(depth - 1).map(GMap(_))),
      1 -> Gen.lzy(Gen.listOfN(2, typeGen(depth - 1)).map(ts =>
        GStruct(ts.zipWithIndex.map { case (t, i) => GField(s"f$i", t) }))))

  private val tg = typeGen(2)

  test("merge: identical types are fixpoints") {
    forAll(tg) { t => assert(GlueTypes.merge(t, t) == t) }
  }

  test("merge: Unknown and Null absorb (gluetypes.py:399-404)") {
    forAll(tg) { t =>
      whenever(t != GNull && t != GUnknown) {
        assert(GlueTypes.merge(GUnknown, t) == t)
        assert(GlueTypes.merge(t, GUnknown) == t)
        assert(GlueTypes.merge(GNull, t) == t)
        assert(GlueTypes.merge(t, GNull) == t)
      }
    }
  }

  test("merge: commutative") {
    forAll(tg, tg) { (a, b) =>
      assert(GlueTypes.merge(a, b) == GlueTypes.merge(b, a))
    }
  }

  test("merge: associative") {
    forAll(tg, tg, tg) { (a, b, c) =>
      assert(GlueTypes.merge(GlueTypes.merge(a, b), c) ==
        GlueTypes.merge(a, GlueTypes.merge(b, c)))
    }
  }

  test("merge: differing atomics promote to canonical choice") {
    val m = GlueTypes.merge(GInt, GString)
    assert(m == GChoice.of(Seq(GString, GInt)))
    // choice flattens on re-merge
    assert(GlueTypes.merge(m, GLong) == GChoice.of(Seq(GInt, GLong, GString)))
  }

  test("merge: structs merge field-wise, enums union") {
    val s1 = GStruct(Seq(GField("a", GInt), GField("b", GString)))
    val s2 = GStruct(Seq(GField("a", GLong), GField("c", GDouble)))
    val m  = GlueTypes.merge(s1, s2).asInstanceOf[GStruct]
    assert(m.fieldMap("a").dataType == GChoice.of(Seq(GInt, GLong)))
    assert(m.fieldMap("b").dataType == GString)
    assert(m.fieldMap("c").dataType == GDouble)
    assert(GlueTypes.merge(GEnum(Set("x")), GEnum(Set("y"))) ==
      GEnum(Set("x", "y")))
  }

  test("json wire format round-trips") {
    forAll(tg) { t =>
      assert(GlueTypes.fromJson(GlueTypes.toJson(t)) == t)
    }
  }

  test("json round-trips choice and set explicitly") {
    val t = GStruct(Seq(
      GField("c", GChoice.of(Seq(GInt, GString))),
      GField("s", GSet(GLong)),
      GField("e", GEnum(Set("a", "b")))))
    assert(GlueTypes.fromJson(GlueTypes.toJson(t)) == t)
  }

  test("spark round-trip for non-choice types") {
    val t = GStruct(Seq(GField("a", GInt), GField("b", GArray(GString)),
      GField("m", GMap(GDouble))))
    assert(GlueTypes.fromSpark(GlueTypes.toSpark(t)) == t)
  }
}
