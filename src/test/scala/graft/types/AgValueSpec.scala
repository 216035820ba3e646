package graft.types

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class AgValueSpec extends AnyFunSuite {

  /** Minimal property loop (no scalatestplus bridge in the offline cache). */
  private def forSamples[A](gen: Gen[A], n: Int = 200)(check: A => Unit): Unit = {
    var seed = Seed(42L)
    var i = 0
    while (i < n) {
      gen.apply(Gen.Parameters.default, seed).foreach(check)
      seed = seed.next
      i += 1
    }
  }

  val scalarGen: Gen[AgValue] = Gen.oneOf(
    Gen.const(AgNull),
    Gen.chooseNum(Long.MinValue, Long.MaxValue).map(AgInt(_)),
    Gen.chooseNum(-1e18, 1e18).map(AgFloat(_)),
    Gen.oneOf(AgFloat(Double.NaN), AgFloat(Double.PositiveInfinity), AgFloat(Double.NegativeInfinity)),
    Gen.alphaNumStr.map(AgString(_)),
    Gen.oneOf(AgBool(true), AgBool(false)))

  val valueGen: Gen[AgValue] = Gen.frequency(
    8 -> scalarGen,
    1 -> Gen.listOfN(3, scalarGen).map(xs => AgArray(xs.toVector)),
    1 -> Gen.listOfN(2, Gen.zip(Gen.alphaStr, scalarGen))
      .map(kvs => AgValue.map(kvs: _*)))

  test("orderability is reflexive and antisymmetric") {
    forSamples(Gen.zip(valueGen, valueGen)) { case (a, b) =>
      assert(AgValue.compare(a, a) === 0)
      val ab = AgValue.compare(a, b)
      val ba = AgValue.compare(b, a)
      assert(Integer.signum(ab) === -Integer.signum(ba))
    }
  }

  test("orderability is transitive") {
    forSamples(Gen.zip(valueGen, valueGen, valueGen)) { case (a, b, c) =>
      // ties (e.g. 2 vs 2.0) make exact order input-dependent; the law
      // to check is that any sort under the comparator is non-decreasing
      for (perm <- Vector(Vector(a, b, c), Vector(c, a, b))) {
        val sorted = perm.sortWith((x, y) => AgValue.compare(x, y) < 0)
        sorted.sliding(2).foreach {
          case Vector(x, y) => assert(AgValue.compare(x, y) <= 0)
          case _ => ()
        }
      }
    }
  }

  test("cross-type sort priority: object < array < string < bool < number < null") {
    // reference: get_type_sort_priority, agtype_util.c:271-309
    val vals = Vector(AgNull, AgInt(1), AgBool(true), AgString("a"),
      AgArray(Vector(AgInt(1))), AgValue.map("k" -> AgInt(1)))
    val sorted = vals.sortWith((x, y) => AgValue.compare(x, y) < 0)
    assert(sorted.map(_.typeName) ===
      Vector("map", "list", "string", "boolean", "integer", "null"))
  }

  test("numbers compare across int/float/numeric") {
    assert(AgValue.compare(AgInt(1), AgFloat(1.5)) < 0)
    assert(AgValue.compare(AgFloat(2.0), AgInt(2)) === 0)
    assert(AgValue.compare(AgNumeric(BigDecimal("2.5")), AgFloat(2.4)) > 0)
    // NaN above all numbers, Infinity below NaN
    assert(AgValue.compare(AgFloat(Double.NaN), AgFloat(Double.PositiveInfinity)) > 0)
    assert(AgValue.compare(AgFloat(Double.PositiveInfinity), AgFloat(1e308)) > 0)
    assert(AgValue.compare(AgFloat(Double.NegativeInfinity), AgInt(Long.MinValue)) < 0)
  }

  test("cypher comparison returns null on cross-type or NaN operands") {
    assert(AgValue.cypherCompare(AgInt(1), AgString("a")).isEmpty)
    assert(AgValue.cypherCompare(AgNull, AgInt(1)).isEmpty)
    assert(AgValue.cypherCompare(AgFloat(Double.NaN), AgFloat(1.0)).isEmpty)
    assert(AgValue.cypherCompare(AgInt(1), AgFloat(1.0)) === Some(0))
    assert(AgValue.cypherCompare(AgString("a"), AgString("b")) === Some(-1))
  }

  test("print keeps int/float distinction and special floats") {
    assert(AgValue.print(AgInt(3)) === "3")
    assert(AgValue.print(AgFloat(3.0)) === "3.0")
    assert(AgValue.print(AgFloat(Double.NaN)) === "NaN")
    assert(AgValue.print(AgFloat(Double.PositiveInfinity)) === "Infinity")
    assert(AgValue.print(AgValue.map("a" -> AgInt(1), "a" -> AgInt(2))) === """{"a": 2}""")
  }

  test("parse round-trips print (property)") {
    val nested: Gen[AgValue] = Gen.frequency(
      6 -> valueGen,
      1 -> Gen.listOfN(3, valueGen).map(xs => AgArray(xs.toVector)),
      1 -> Gen.listOfN(2, Gen.zip(Gen.alphaStr, valueGen))
        .map(kvs => AgValue.map(kvs: _*)))
    forSamples(nested, 400) { v =>
      val text = AgValue.print(v)
      val back = AgValue.parse(text)
      // NaN != NaN under ==; compare via orderability (NaN sorts equal to itself)
      assert(AgValue.compare(v, back) === 0, s"round-trip failed for $text")
    }
  }

  test("parse handles annotations and specials") {
    assert(AgValue.parse("3") === AgInt(3))
    assert(AgValue.parse("3.0") === AgFloat(3.0))
    assert(AgValue.parse("-Infinity") === AgFloat(Double.NegativeInfinity))
    assert(AgValue.parse("2.5::numeric") === AgNumeric(BigDecimal("2.5")))
    assert(AgValue.parse("""{"a": [1, true, null]}""") ===
      AgValue.map("a" -> AgValue.array(AgInt(1), AgBool(true), AgNull)))
    val v = AgVertex(7L, "Person", AgValue.map("name" -> AgString("Ann")))
    assert(AgValue.parse(AgValue.print(v)) === v)
    val e = AgEdge(9L, "KNOWS", 7L, 8L, AgValue.map())
    assert(AgValue.parse(AgValue.print(e)) === e)
    val p = AgPath(Vector(v, e))
    assert(AgValue.parse(AgValue.print(p)) === p)
  }

  test("graphid packs label and entry") {
    val id = GraphId.make(7, 123456789L)
    assert(GraphId.labelId(id) === 7)
    assert(GraphId.entryId(id) === 123456789L)
    assert(GraphId.labelId(GraphId.make(0xffff, GraphId.EntryIdMax)) === 0xffff)
  }
}
