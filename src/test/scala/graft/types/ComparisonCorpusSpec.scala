package graft.types

import scala.io.Source

import org.scalatest.funsuite.AnyFunSuite

/** The reference's orderability corpus, ported wholesale: every
  * `SELECT agtype_in('L') OP agtype_in('R')` row from the comparison
  * sections of regress/sql/agtype.sql (lines ~448-560; all expected
  * true), extracted verbatim into
  * `src/test/resources/agtype_comparison_corpus.tsv` and asserted
  * against [[AgValue.compare]] — the engine's total-order model that
  * ORDER BY / DISTINCT / min / max and the variant comparison key all
  * follow.
  */
class ComparisonCorpusSpec extends AnyFunSuite {

  private def rows: Seq[(String, String, String)] = {
    val in = getClass.getResourceAsStream("/agtype_comparison_corpus.tsv")
    require(in != null, "corpus resource missing")
    Source.fromInputStream(in, "UTF-8").getLines().filter(_.nonEmpty).map { l =>
      val Array(a, op, b) = l.split("\t", 3)
      (a, op, b)
    }.toSeq
  }

  test("all 77 orderability rows from agtype.sql hold under AgValue.compare") {
    val failures = rows.flatMap { case (lTxt, op, rTxt) =>
      val l = AgValue.parse(lTxt)
      val r = AgValue.parse(rTxt)
      val c = AgValue.compare(l, r)
      val ok = op match {
        case "="  => c == 0
        case "<>" => c != 0
        case "<"  => c < 0
        case ">"  => c > 0
        case "<=" => c <= 0
        case ">=" => c >= 0
      }
      if (ok) None else Some(s"$lTxt $op $rTxt (compare=$c)")
    }
    assert(failures.isEmpty, s"${failures.size} corpus rows failed:\n" +
      failures.mkString("\n"))
  }

  test("corpus rows are symmetric: compare(a,b) == -compare(b,a)") {
    rows.foreach { case (lTxt, _, rTxt) =>
      val l = AgValue.parse(lTxt)
      val r = AgValue.parse(rTxt)
      assert(Integer.signum(AgValue.compare(l, r)) ===
        -Integer.signum(AgValue.compare(r, l)), s"$lTxt vs $rTxt")
    }
  }

  test("orderKey string comparison agrees with compare on random nested values") {
    val rnd = new scala.util.Random(20260813)
    def scalar(): AgValue = rnd.nextInt(7) match {
      case 0 => AgInt(rnd.nextLong() % 100)
      case 1 => AgInt(9007199254740990L + rnd.nextInt(8)) // past 2^53
      case 2 => AgFloat(rnd.nextInt(40) / 4.0 - 5)
      case 3 => AgString(rnd.alphanumeric.take(rnd.nextInt(4)).mkString)
      case 4 => AgBool(rnd.nextBoolean())
      case 5 => AgNull
      case 6 => AgNumeric(BigDecimal(rnd.nextInt(2000)) / 100)
    }
    def sample(depth: Int): AgValue =
      if (depth == 0 || rnd.nextInt(3) == 0) scalar()
      else rnd.nextInt(2) match {
        case 0 => AgArray(Vector.fill(rnd.nextInt(4))(sample(depth - 1)))
        case 1 => AgValue.map(Seq.fill(rnd.nextInt(4))(
          rnd.alphanumeric.take(1 + rnd.nextInt(3)).mkString -> sample(depth - 1)): _*)
      }
    for (_ <- 1 to 2000) {
      val (a, b) = (sample(3), sample(3))
      val c = Integer.signum(AgValue.compare(a, b))
      if (c != 0) {
        val kc = Integer.signum(AgValue.orderKey(a).compareTo(AgValue.orderKey(b)))
        assert(kc === c, s"orderKey disagrees with compare for\n  $a\n  $b\n" +
          s"  ${AgValue.orderKey(a)}\n  ${AgValue.orderKey(b)}")
      }
    }
    // equal values produce equal keys
    val eqs = Seq(AgFloat(0.0) -> AgFloat(-0.0),
      AgValue.parse("[1, {\"a\": [true]}]") -> AgValue.parse("[1, {\"a\": [true]}]"),
      AgValue.parse("{\"a\": 1, \"b\": 2}") -> AgValue.parse("{\"b\": 2, \"a\": 1}"))
    eqs.foreach { case (a, b) =>
      assert(AgValue.orderKey(a) === AgValue.orderKey(b), s"$a vs $b")
    }
  }

  test("cross-class numeric keys are exact: equal values share a key, double-precision ties don't invert") {
    // equal values across classes → identical keys (class-insensitive)
    assert(AgValue.orderKey(AgInt(2)) === AgValue.orderKey(AgFloat(2.0)))
    assert(AgValue.orderKey(AgInt(2)) === AgValue.orderKey(AgNumeric(BigDecimal(2))))
    // a numeric just below an int rounds to the same double but must sort first
    val nearly3 = AgNumeric(BigDecimal("2.999999999999999999"))
    assert(AgValue.compare(nearly3, AgInt(3)) < 0)
    assert(AgValue.orderKey(nearly3) < AgValue.orderKey(AgInt(3)))
    // adjacent int64s past 2^53 (identical as doubles) keep exact order vs float
    val i = AgInt(9007199254740993L)    // 2^53 + 1
    val f = AgFloat(9007199254740992.0) // 2^53
    assert(AgValue.compare(f, i) < 0)
    assert(AgValue.orderKey(f) < AgValue.orderKey(i))
    // negative mantissa-prefix pairs order correctly through the terminator
    assert(AgValue.orderKey(AgFloat(-0.51)) < AgValue.orderKey(AgFloat(-0.5)))
    assert(AgValue.orderKey(AgFloat(-0.59)) < AgValue.orderKey(AgFloat(-0.5)))
    // IEEE specials keep the float8 btree ranks
    val specials = Seq(AgFloat(Double.NegativeInfinity), AgFloat(-1e300),
      AgInt(0), AgFloat(1e300), AgFloat(Double.PositiveInfinity), AgFloat(Double.NaN))
    specials.sliding(2).foreach { case Seq(a, b) =>
      assert(AgValue.orderKey(a) < AgValue.orderKey(b), s"$a !< $b")
    }
  }

  test("the reference's cross-type rank chain: path < edge < vertex < object < array < string < bool < number < null") {
    // agtype.sql: "Path < Edge < Vertex < Object < List < String <
    // Boolean < Integer = Float = Numeric < Null"
    val chain = Seq(
      """[{"id": 0, "label": "v", "properties": {}}::vertex, {"id": 2, "start_id": 0, "end_id": 1, "label": "e", "properties": {}}::edge, {"id": 1, "label": "v", "properties": {}}::vertex]::path""",
      """{"id":2, "start_id":0, "end_id":1, "label": "e", "properties":{}}::edge""",
      """{"id":0, "label": "v", "properties":{}}::vertex""",
      """{"a": 1}""", """[1, 2]""", """"s"""", "true", "1", "1.5", "2::numeric",
      "NaN", "null")
    val vs = chain.map(AgValue.parse)
    for (i <- vs.indices; j <- vs.indices) {
      val c = AgValue.compare(vs(i), vs(j))
      if (i < j) assert(c <= 0, s"${chain(i)} should not sort after ${chain(j)}")
      if (i > j) assert(c >= 0, s"${chain(i)} should not sort before ${chain(j)}")
    }
  }
}
