package graft.cypher

import graft.SparkTestBase
import graft.graph.{MutableGraph, PropertyGraph}

/** Extension-interop golden tests: the reference lets agtype values flow
  * through pg_trgm, fuzzystrmatch and pgvector functions inside Cypher.
  * Every expectation below is ported row-for-row from
  * regress/expected/pg_trgm.out, fuzzystrmatch.out and pgvector.out.
  */
class InteropSpec extends SparkTestBase {

  lazy val empty = new PropertyGraph("interop", Nil, Nil)

  def one(q: String): Any = {
    val r = Cypher.query(spark, empty, q).collect()(0)
    if (r.isNullAt(0)) null else r.get(0)
  }

  /** The regress files' shared Person fixture (same insertion order). */
  lazy val names: MutableGraph = {
    val g = new MutableGraph("interop_names", spark)
    Cypher.execute(spark, g,
      """CREATE (:Person {name: 'Jane'}), (:Person {name: 'John'}),
        |  (:Person {name: 'Jone'}), (:Person {name: 'Jack'}),
        |  (:Person {name: 'Jax'}), (:Person {name: 'Jake'}),
        |  (:Person {name: 'Julie'}), (:Person {name: 'Julius'}),
        |  (:Person {name: 'Jill'}), (:Person {name: 'Jillie'}),
        |  (:Person {name: 'Julian'})""".stripMargin)
    g
  }

  test("show_trgm (pg_trgm.out): padded, lowercased, sorted trigram sets") {
    assert(one("RETURN show_trgm('hello') AS t") ===
      Seq("  h", " he", "ell", "hel", "llo", "lo "))
    // per-name sets from the regress table
    val got = Cypher.execute(spark, names,
      "MATCH (p:Person) RETURN p.name AS n, show_trgm(p.name) AS t")
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(got("Jane") === Seq("  j", " ja", "ane", "jan", "ne "))
    assert(got("John") === Seq("  j", " jo", "hn ", "joh", "ohn"))
    assert(got("Julian") === Seq("  j", " ju", "an ", "ian", "jul", "lia", "uli"))
  }

  test("similarity ranking (pg_trgm.out rows, float4 values)") {
    val got = Cypher.execute(spark, names,
      """MATCH (p:Person) WITH p, similarity(p.name, 'Jon') AS sim
        |RETURN p.name AS n, sim ORDER BY sim DESC, n""".stripMargin)
      .collect().map(r => (r.getString(0), r.getFloat(1)))
    val expected = Seq(
      "Jone" -> 0.5f, "John" -> 0.2857143f, "Jax" -> 0.14285715f,
      "Jack" -> 0.125f, "Jake" -> 0.125f, "Jane" -> 0.125f, "Jill" -> 0.125f,
      "Julie" -> 0.11111111f,
      "Jillie" -> 0.1f, "Julian" -> 0.1f, "Julius" -> 0.1f)
    assert(got.toSeq === expected)
  }

  test("word_similarity ranking (pg_trgm.out rows)") {
    val got = Cypher.execute(spark, names,
      """MATCH (p:Person) WITH p, word_similarity(p.name, 'Jon') AS sim
        |RETURN p.name AS n, sim ORDER BY sim DESC, n""".stripMargin)
      .collect().map(r => (r.getString(0), r.getFloat(1)))
    val expected = Seq(
      "Jone" -> 0.6f, "John" -> 0.4f, "Jax" -> 0.25f,
      "Jack" -> 0.2f, "Jake" -> 0.2f, "Jane" -> 0.2f, "Jill" -> 0.2f,
      "Julie" -> 0.16666667f,
      "Jillie" -> 0.14285715f, "Julian" -> 0.14285715f, "Julius" -> 0.14285715f)
    assert(got.toSeq === expected)
  }

  test("soundex / levenshtein / difference (fuzzystrmatch.out rows)") {
    val rows = Cypher.execute(spark, names,
      """MATCH (p:Person)
        |RETURN p.name AS n, soundex(p.name) AS sx,
        |  levenshtein(p.name, 'John') AS lev,
        |  difference(p.name, 'John') AS diff""".stripMargin)
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    val expected = Map(
      "Jane" -> ("J500", 3L, 4L), "John" -> ("J500", 0L, 4L),
      "Jone" -> ("J500", 2L, 4L), "Jack" -> ("J200", 3L, 3L),
      "Jax" -> ("J200", 3L, 3L), "Jake" -> ("J200", 3L, 3L),
      "Julie" -> ("J400", 4L, 3L), "Julius" -> ("J420", 5L, 2L),
      "Jill" -> ("J400", 3L, 3L), "Jillie" -> ("J400", 5L, 3L),
      "Julian" -> ("J450", 4L, 2L))
    assert(rows === expected)
  }

  test("pgvector functions accept '[..]' strings and lists (pgvector.out rows)") {
    assert(one("RETURN l2_distance('[1,2,3]', '[1,2,4]') AS x") === 1.0)
    assert(one("RETURN inner_product('[1,2,3]', '[1,2,4]') AS x") === 17.0)
    assert(math.abs(one("RETURN cosine_distance('[1,2,3]', '[1,2,4]') AS x")
      .asInstanceOf[Double] - 0.00853986601633272) < 1e-14)
    assert(one("RETURN cosine_distance('[1,2,3]', '[1,2,3]') AS x")
      .asInstanceOf[Double] === 0.0)
    assert(one("RETURN l1_distance('[1,2,3]', '[1,2,4]') AS x") === 1.0)
    assert(one("RETURN vector_dims('[1,2,3]') AS x") === 3L)
    assert(one("RETURN vector_norm('[1,2,3]') AS x") === 3.7416573867739413)
    assert(one("RETURN l2_normalize('[1,2,3]') AS x") ===
      Seq(0.26726124f, 0.5345225f, 0.80178374f))
    assert(one("RETURN subvector('[1,2,3,4,5,6]', 2, 4) AS x") ===
      Seq(2.0, 3.0, 4.0, 5.0))
    assert(one("RETURN binary_quantize('[1,2,4]') AS x") === "111")
  }

  test("pgvector distance operators on ::vector casts (pgvector.out rows)") {
    assert(one("RETURN [1,2,3]::vector <-> [1,2,4]::vector AS x") === 1.0)
    assert(one("RETURN [1,2,3]::vector <#> [1,2,4]::vector AS x") === -17.0)
    assert(math.abs(one("RETURN [1,2,3]::vector <=> [1,2,4]::vector AS x")
      .asInstanceOf[Double] - 0.00853986601633272) < 1e-14)
    assert(one("RETURN [1,2,3]::vector <+> [1,2,4]::vector AS x") === 1.0)
    // string-literal vectors cast too
    assert(one("RETURN '[1.22,2.22,3.33]'::vector AS x") ===
      Seq(1.22, 2.22, 3.33))
  }

  test("::halfvec quantizes through fp16 (pgvector.out halfvec rows)") {
    // pgvector.out: RETURN [1.22,2.22,3.33]::vector AS (n halfvec) =
    // [1.2197266,2.2207031,3.3300781] — the float4 prints of the exact
    // binary16 values asserted here. DEVIATION (ExprCompiler halfvec
    // case): the quantized values are carried as float64, not 2-byte
    // storage, so we assert the exact widened doubles.
    val exp = Seq(1.2197265625, 2.220703125, 3.330078125)
    assert(one("RETURN [1.22,2.22,3.33]::halfvec AS x") === exp)
    assert(one("RETURN '[1.22,2.22,3.33]'::halfvec AS x") === exp)
    // fp16-exact values pass through unchanged
    assert(one("RETURN [1,2,3]::halfvec AS x") === Seq(1.0, 2.0, 3.0))
    // distances compose over the quantized values
    assert(one("RETURN l2_distance([1,2,3]::halfvec, '[1,2,4]') AS x") === 1.0)
  }

  test("::sparsevec keeps dense element values (pgvector.out sparsevec rows)") {
    // pgvector.out: [1.22,2.22,3.33]::sparsevec = {1:1.22,2:2.22,
    // 3:3.33}/3 — same elements, sparse STORAGE rendering. DEVIATION
    // (ExprCompiler sparsevec case): one dense array<double> carrier;
    // the {i:v}/n text form is a storage format the engine does not
    // reproduce, the values are what queries consume.
    assert(one("RETURN [1.22,2.22,3.33]::sparsevec AS x") ===
      Seq(1.22, 2.22, 3.33))
    assert(one("RETURN '[1.22,2.22,3.33]'::sparsevec AS x") ===
      Seq(1.22, 2.22, 3.33))
  }

  test("fp16 round-trip kernel edge cases") {
    import graft.functions.HalfKernel.halfRoundTrip
    assert(halfRoundTrip(0.0) === 0.0)
    assert(halfRoundTrip(-1.22) === -1.2197265625)
    assert(halfRoundTrip(65504.0) === 65504.0)   // max finite half
    assert(halfRoundTrip(65519.9) === 65504.0)   // rounds down to max
    assert(halfRoundTrip(65520.0).isPosInfinity) // rounds to +inf
    assert(halfRoundTrip(1e-8) === 0.0)  // below half the min subnormal
    assert(halfRoundTrip(1e-7) === 1.1920928955078125e-7)  // 2 * 2^-24
    assert(halfRoundTrip(Double.NaN).isNaN)
    // round-half-even: 1 + 2^-11 sits exactly between 1 and 1+2^-10
    assert(halfRoundTrip(1.0 + math.pow(2, -11)) === 1.0)
    assert(halfRoundTrip(1.0 + 3 * math.pow(2, -11)) === 1.0 + math.pow(2, -9))
  }

  test("reference-spelled age_ prefixes resolve for interop functions too") {
    assert(one("RETURN age_levenshtein('kitten', 'sitting') AS x") === 3L)
  }

  test("metaphone(name, 4) matches fuzzystrmatch.out rows") {
    val got = Cypher.execute(spark, names,
      "MATCH (p:Person) RETURN p.name AS n, metaphone(p.name, 4) AS m")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got === Map(
      "Jane" -> "JN", "John" -> "JN", "Jone" -> "JN", "Jack" -> "JK",
      "Jax" -> "JKS", "Jake" -> "JK", "Julie" -> "JL", "Julius" -> "JLS",
      "Jill" -> "JL", "Jillie" -> "JL", "Julian" -> "JLN"))
  }

  test("dmetaphone matches fuzzystrmatch.out rows") {
    val got = Cypher.execute(spark, names,
      "MATCH (p:Person) RETURN p.name AS n, dmetaphone(p.name) AS m")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got === Map(
      "Jane" -> "JN", "John" -> "JN", "Jone" -> "JN", "Jack" -> "JK",
      "Jax" -> "JKS", "Jake" -> "JK", "Julie" -> "JL", "Julius" -> "JLS",
      "Jill" -> "JL", "Jillie" -> "JL", "Julian" -> "JLN"))
  }

  test("phonetic codes on published canonical examples") {
    import graft.functions.Phonetic
    // metaphone classics (Philips 1990 rule set)
    assert(Phonetic.metaphone("knight", 10) === "NT")
    assert(Phonetic.metaphone("school", 10) === "SKL")
    assert(Phonetic.metaphone("phone", 10) === "FN")
    assert(Phonetic.metaphone("aggregate", 10) === "AKRKT")
    // double metaphone primary/alternate pairs (Philips 2000)
    assert(Phonetic.doubleMetaphone("Smith") === ("SM0", "XMT"))
    assert(Phonetic.doubleMetaphone("Thomas") === ("TMS", "TMS"))
    assert(Phonetic.doubleMetaphone("Jose") === ("HS", "HS"))
    assert(Phonetic.doubleMetaphone("katherine")._1 === "K0RN")
    // DM truncates to 4 code letters like the published reference code
    assert(Phonetic.dmetaphone("albert") === "ALPR")
  }
}
