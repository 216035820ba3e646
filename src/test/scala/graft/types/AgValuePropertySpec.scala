package graft.types

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based checks of the agtype value model: [[AgValue.compare]]
  * must be a TOTAL order (the reference's orderability contract,
  * agtype_util.c:213-470), [[AgValue.orderKey]] must embed that order
  * into plain string comparison (it is what ORDER BY / DISTINCT /
  * min/max sort on executor-side), and print/parse must round-trip.
  * Deterministically seeded (pureApply) so failures reproduce.
  */
class AgValuePropertySpec extends AnyFunSuite {

  // -- generators (bounded depth; strings stay below U+E000 where
  // UTF-16 compareTo and UTF-8 byte order agree, matching the
  // executor's binary string sort) --

  private val genStr: Gen[String] =
    Gen.chooseNum(0, 8).flatMap(n => Gen.listOfN(n, Gen.frequency(
      8 -> Gen.alphaNumChar,
      2 -> Gen.oneOf(' ', '_', '"', '\\', 'é', 'π', '\n'),
      1 -> Gen.choose('Ā', '⿿'))).map(_.mkString))

  private val genScalar: Gen[AgValue] = Gen.frequency(
    3 -> Gen.chooseNum(Long.MinValue, Long.MaxValue).map(AgInt(_)),
    2 -> Gen.chooseNum(-10000L, 10000L).map(AgInt(_)), // collision-prone range
    2 -> Gen.chooseNum(-1e6, 1e6).map(AgFloat(_)),
    1 -> Gen.oneOf(AgFloat(Double.NaN), AgFloat(Double.PositiveInfinity),
      AgFloat(Double.NegativeInfinity), AgFloat(0.0), AgFloat(2.0)),
    // numerics bounded to <= 15 significant digits so the text form is
    // an exact double and print/parse is lossless (AgValue.parse routes
    // `x::numeric` through a double)
    2 -> (for {
      unscaled <- Gen.chooseNum(-999999999L, 999999999L)
      scale <- Gen.chooseNum(0, 5)
    } yield AgNumeric(BigDecimal(java.math.BigDecimal.valueOf(unscaled, scale)))),
    2 -> genStr.map(AgString(_)),
    1 -> Gen.oneOf(AgBool(true), AgBool(false), AgNull))

  private def genValue(depth: Int): Gen[AgValue] =
    if (depth <= 0) genScalar
    else Gen.frequency(
      5 -> genScalar,
      2 -> Gen.chooseNum(0, 3)
        .flatMap(n => Gen.listOfN(n, genValue(depth - 1)))
        .map(xs => AgArray(xs.toVector)),
      2 -> Gen.chooseNum(0, 3).flatMap(n => Gen.listOfN(n,
          for { k <- genStr; v <- genValue(depth - 1) } yield (k, v)))
        .map(kvs => AgValue.map(kvs: _*)),
      1 -> (for {
        id <- Gen.chooseNum(0L, 1L << 48)
        label <- Gen.identifier.map(_.take(8))
        kvs <- Gen.listOfN(2, for { k <- genStr; v <- genScalar } yield (k, v))
      } yield AgVertex(id, label, AgValue.map(kvs: _*))))

  private def samples(n: Int, seed: Long): Seq[AgValue] =
    (0 until n).map(i =>
      genValue(3).pureApply(Gen.Parameters.default, Seed(seed + i)))

  private def sign(i: Int): Int = Integer.signum(i)

  test("compare is a total order: reflexive, antisymmetric, transitive") {
    val vs = samples(120, seed = 1L)
    for (a <- vs) assert(AgValue.compare(a, a) === 0, s"irreflexive: ${AgValue.print(a)}")
    for (a <- vs.take(60); b <- vs.take(60))
      assert(sign(AgValue.compare(a, b)) === -sign(AgValue.compare(b, a)),
        s"asymmetric: ${AgValue.print(a)} vs ${AgValue.print(b)}")
    // transitivity over consecutive triples of the compare-sorted list
    val sorted = vs.sortWith((a, b) => AgValue.compare(a, b) < 0)
    for (w <- sorted.sliding(3) if w.size == 3)
      assert(AgValue.compare(w(0), w(2)) <= 0,
        s"intransitive: ${w.map(AgValue.print).mkString(" | ")}")
  }

  test("orderKey embeds compare into plain string order") {
    val vs = samples(100, seed = 2L)
    val keyed = vs.map(v => v -> AgValue.orderKey(v))
    for ((a, ka) <- keyed; (b, kb) <- keyed)
      assert(sign(AgValue.compare(a, b)) === sign(Integer.signum(ka.compareTo(kb))),
        s"key order diverges from compare: ${AgValue.print(a)} vs ${AgValue.print(b)}\n" +
          s"  keys: $ka | $kb")
  }

  test("cross-type numeric equality collapses to one key") {
    // 2, 2.0 and 2::numeric are the same point in the total order
    // (agtype_ops.c cross-type comparison) — their keys must collide
    val twos = Seq(AgInt(2), AgFloat(2.0), AgNumeric(BigDecimal(2)))
    assert(twos.map(AgValue.orderKey).distinct.size === 1)
    for (a <- twos; b <- twos) assert(AgValue.compare(a, b) === 0)
  }

  test("print/parse round-trips every generated value") {
    val vs = samples(200, seed = 3L)
    for (v <- vs) {
      val txt = AgValue.print(v)
      val back = AgValue.parse(txt)
      assert(AgValue.compare(back, v) === 0, s"round-trip order drift: $txt")
      assert(AgValue.orderKey(back) === AgValue.orderKey(v),
        s"round-trip key drift: $txt -> ${AgValue.print(back)}")
    }
  }
}
