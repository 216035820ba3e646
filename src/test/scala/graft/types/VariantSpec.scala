package graft.types

import org.apache.spark.sql.{DataFrame, Row}

import graft.SparkTestBase
import graft.cypher.Cypher
import graft.graph.MutableGraph

/** Mixed-type property columns (tagged-union variant encoding) — the
  * Spark analogue of agtype's per-value typing on a schemaless
  * `properties` document (reference: agtype_value agtype.h:435-470;
  * comparison semantics sql/agtype_comparison.sql,
  * cypher_comparison_aexpr cypher_nodes.h:337-353).
  */
class VariantSpec extends SparkTestBase {

  def rows(df: DataFrame): Seq[Seq[Any]] = df.collect().toSeq.map(_.toSeq)

  /** Graph with one label whose `v` property mixes int/float/string/bool. */
  def mixedGraph(): MutableGraph = {
    val g = new MutableGraph("vt", spark)
    Cypher.execute(spark, g, "CREATE (:T {k: 1, v: 2})")
    Cypher.execute(spark, g, "CREATE (:T {k: 2, v: 'x'})")
    Cypher.execute(spark, g, "CREATE (:T {k: 3, v: 2.5})")
    Cypher.execute(spark, g, "CREATE (:T {k: 4, v: true})")
    Cypher.execute(spark, g, "CREATE (:T {k: 5})") // v missing → null
    g
  }

  test("conflicting scalar appends widen to the variant struct, not string") {
    val g = mixedGraph()
    val schema = g.snapshot.vertexLabel("T").df.schema
    assert(AgVariant.isVariant(schema("v").dataType))
  }

  test("cross-type comparison is total-order (AGE semantics, not openCypher null)") {
    val g = mixedGraph()
    // string(5) < bool(6) < numeric(7): 'x' > 1 and true > 1 are FALSE
    // (not null) under the total order, so only numeric rows pass
    assert(rows(Cypher.execute(spark, g,
      "MATCH (n:T) WHERE n.v > 1 RETURN n.k AS k ORDER BY k")) ===
      Seq(Seq(1L), Seq(3L)))
    // int/float compare numerically across the numeric class
    assert(rows(Cypher.execute(spark, g,
      "MATCH (n:T) WHERE n.v > 2.1 RETURN n.k AS k")) === Seq(Seq(3L)))
    // string equality hits only the string row
    assert(rows(Cypher.execute(spark, g,
      "MATCH (n:T) WHERE n.v = 'x' RETURN n.k AS k")) === Seq(Seq(2L)))
    // boolean equality
    assert(rows(Cypher.execute(spark, g,
      "MATCH (n:T) WHERE n.v = true RETURN n.k AS k")) === Seq(Seq(4L)))
    // int = float: 2 = 2.0 is true (numeric class compares by value)
    assert(rows(Cypher.execute(spark, g,
      "MATCH (n:T) WHERE n.v = 2.0 RETURN n.k AS k")) === Seq(Seq(1L)))
    // total-order equality: 1 = 'x' is false and 1 <> 'x' is TRUE
    // (reference: agtype_eq/agtype_ne, agtype_ops.c:1054/1117) — a
    // cross-type <> must NOT drop non-string rows
    assert(rows(Cypher.execute(spark, g,
      "MATCH (n:T) WHERE n.v <> 'x' RETURN n.k AS k ORDER BY k")) ===
      Seq(Seq(1L), Seq(3L), Seq(4L)))
    // ordering ops rank by sort priority: everything above string
    assert(rows(Cypher.execute(spark, g,
      "MATCH (n:T) WHERE n.v > 'x' RETURN n.k AS k ORDER BY k")) ===
      Seq(Seq(1L), Seq(3L), Seq(4L)))
  }

  test("integers beyond 2^53 compare exactly (i-slot tie-break, not double)") {
    val g = new MutableGraph("vtbig", spark)
    Cypher.execute(spark, g, "CREATE (:T {k: 1, v: 9007199254740992})")
    Cypher.execute(spark, g, "CREATE (:T {k: 2, v: 9007199254740993})")
    Cypher.execute(spark, g, "CREATE (:T {k: 3, v: 's'})") // force variant
    // both longs coincide on the double slot; = must still distinguish
    assert(rows(Cypher.execute(spark, g,
      "MATCH (n:T) WHERE n.v = 9007199254740993 RETURN n.k AS k")) ===
      Seq(Seq(2L)))
    // k=1 numerically below; k=3 ranks below via total order (string < numeric)
    assert(rows(Cypher.execute(spark, g,
      "MATCH (n:T) WHERE n.v < 9007199254740993 RETURN n.k AS k ORDER BY k")) ===
      Seq(Seq(1L), Seq(3L)))
  }

  test("ORDER BY follows agtype orderability: string < bool < numeric < null") {
    val g = mixedGraph()
    assert(rows(Cypher.execute(spark, g,
      "MATCH (n:T) RETURN n.k AS k ORDER BY n.v, n.k")) ===
      Seq(Seq(2L), Seq(4L), Seq(1L), Seq(3L), Seq(5L)))
  }

  test("arithmetic dispatches per value: int stays int, float stays float") {
    val g = mixedGraph()
    // the final RETURN decodes variants to scalar text (agtype output
    // serializes the value, not the encoding): int 2+1 prints without a
    // decimal point, float 2.5+1 with one
    val r = Cypher.execute(spark, g,
      "MATCH (n:T) WHERE n.v > 0 RETURN n.k AS k, n.v + 1 AS w ORDER BY k")
      .collect().toSeq
    assert(r(0).getAs[String]("w") === "3")
    assert(r(1).getAs[String]("w") === "3.5")
  }

  test("string predicates apply to the string slot only") {
    val g = mixedGraph()
    assert(rows(Cypher.execute(spark, g,
      "MATCH (n:T) WHERE n.v STARTS WITH 'x' RETURN n.k AS k")) === Seq(Seq(2L)))
  }

  test("sum/avg over variant columns: int-only stays int, float promotes") {
    val g = new MutableGraph("vtsum", spark)
    Cypher.execute(spark, g, "CREATE (:T {grp: 1, v: 2})")
    Cypher.execute(spark, g, "CREATE (:T {grp: 1, v: 3})")
    Cypher.execute(spark, g, "CREATE (:T {grp: 2, v: 1})")
    Cypher.execute(spark, g, "CREATE (:T {grp: 2, v: 2.5})")
    Cypher.execute(spark, g, "CREATE (:T {grp: 3, v: 's'})") // force variant
    val r = Cypher.execute(spark, g,
      """MATCH (n:T) WHERE n.grp < 3 WITH n.grp AS g2, sum(n.v) AS s
        |RETURN g2, s ORDER BY g2""".stripMargin).collect()
    assert(r(0).getAs[String]("s") === "5") // ints stay int
    assert(r(1).getAs[String]("s") === "3.5") // float promotes
    val av = Cypher.execute(spark, g,
      "MATCH (n:T {grp: 1}) RETURN avg(n.v) AS a").collect()(0)
    assert(av.getAs[Double]("a") === 2.5)
  }

  test("min/max follow orderability across types") {
    val g = mixedGraph()
    val r = Cypher.execute(spark, g,
      "MATCH (n:T) RETURN min(n.v) AS lo, max(n.v) AS hi").collect()(0)
    assert(r.getAs[String]("lo") === "x") // string ranks lowest
    assert(r.getAs[String]("hi") === "2.5") // numerics rank highest
  }

  test("DISTINCT and group keys work on variant columns") {
    val g = mixedGraph()
    Cypher.execute(spark, g, "CREATE (:T {k: 6, v: 'x'})")
    assert(rows(Cypher.execute(spark, g,
      "MATCH (n:T) WHERE n.v = 'x' RETURN count(*) AS n")) === Seq(Seq(2L)))
    assert(rows(Cypher.execute(spark, g,
      """MATCH (n:T) WHERE n.v = 'x' WITH DISTINCT n.v AS v
        |RETURN count(*) AS n""".stripMargin)) === Seq(Seq(1L)))
  }

  test("inline property-map constraints match variant columns per value") {
    val g = mixedGraph()
    // {v: 2} as a pattern constraint, not a WHERE — must dispatch through
    // the variant comparison, not a raw struct-vs-int equality
    assert(rows(Cypher.execute(spark, g,
      "MATCH (n:T {v: 2}) RETURN n.k AS k")) === Seq(Seq(1L)))
    assert(rows(Cypher.execute(spark, g,
      "MATCH (n:T {v: 'x'}) RETURN n.k AS k")) === Seq(Seq(2L)))
    // MERGE must find the existing row through the same path (no create)
    Cypher.execute(spark, g, "MERGE (n:T {v: 2.5})")
    assert(rows(Cypher.execute(spark, g,
      "MATCH (n:T) RETURN count(*) AS n")) === Seq(Seq(5L)))
  }

  test("SET / REMOVE on a variant column re-encodes the new value") {
    val g = mixedGraph()
    Cypher.execute(spark, g, "MATCH (n:T {k: 4}) SET n.v = 7")
    assert(rows(Cypher.execute(spark, g,
      "MATCH (n:T) WHERE n.v = 7 RETURN n.k AS k")) === Seq(Seq(4L)))
    Cypher.execute(spark, g, "MATCH (n:T {k: 1}) SET n.v = 'swapped'")
    assert(rows(Cypher.execute(spark, g,
      "MATCH (n:T) WHERE n.v = 'swapped' RETURN n.k AS k")) === Seq(Seq(1L)))
    Cypher.execute(spark, g, "MATCH (n:T {k: 4}) REMOVE n.v")
    assert(rows(Cypher.execute(spark, g,
      "MATCH (n:T) WHERE n.v IS NULL RETURN count(*) AS n")) === Seq(Seq(2L)))
  }

  test("IS NULL / IS NOT NULL on variant (missing property is null)") {
    val g = mixedGraph()
    assert(rows(Cypher.execute(spark, g,
      "MATCH (n:T) WHERE n.v IS NULL RETURN n.k AS k")) === Seq(Seq(5L)))
    assert(rows(Cypher.execute(spark, g,
      "MATCH (n:T) WHERE n.v IS NOT NULL RETURN count(*) AS n")) === Seq(Seq(4L)))
  }

  test("cross-label scan (allVertices) variant-encodes conflicting labels") {
    val g = new MutableGraph("vt2", spark)
    Cypher.execute(spark, g, "CREATE (:A {v: 1})")
    Cypher.execute(spark, g, "CREATE (:B {v: 'one'})")
    // label-less MATCH unions A and B: v becomes variant, both rows visible
    assert(rows(Cypher.execute(spark, g,
      "MATCH (n) WHERE n.v = 1 RETURN count(*) AS n")) === Seq(Seq(1L)))
    assert(rows(Cypher.execute(spark, g,
      "MATCH (n) WHERE n.v = 'one' RETURN count(*) AS n")) === Seq(Seq(1L)))
  }

  test("property: variant cypherCmp agrees with the AgValue.compare total-order model") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val rnd = new scala.util.Random(20260813)
    def sample(): AgValue = rnd.nextInt(6) match {
      case 0 => AgInt(rnd.nextLong() % 1000)
      case 1 => AgInt(9007199254740990L + rnd.nextInt(8)) // past 2^53
      case 2 => AgFloat(rnd.nextDouble() * 200 - 100)
      case 3 => AgString(rnd.alphanumeric.take(rnd.nextInt(6)).mkString)
      case 4 => AgBool(rnd.nextBoolean())
      case 5 => AgInt(rnd.nextInt(5).toLong) // collisions for = coverage
    }
    def toRow(v: AgValue): Row = v match {
      case AgInt(i) => Row(AgVariant.TagNum.toByte, i.toDouble, null, null, i, null, null)
      case AgFloat(f) => Row(AgVariant.TagNum.toByte, f, null, null, null, null, null)
      case AgString(s) => Row(AgVariant.TagString.toByte, null, s, null, null, null, null)
      case AgBool(b) => Row(AgVariant.TagBool.toByte, null, null, b, null, null, null)
      case other => fail(s"unexpected sample $other")
    }
    val pairs = Seq.fill(300)((sample(), sample()))
    val schema = StructType(Seq(
      StructField("a", AgVariant.schema), StructField("b", AgVariant.schema)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(pairs.map { case (a, b) => Row(toRow(a), toRow(b)) }, 2),
      schema)
    val got = df.select(
      AgVariant.cypherCmp("<", col("a"), col("b")).as("lt"),
      AgVariant.cypherCmp("=", col("a"), col("b")).as("eq"),
      AgVariant.cypherCmp(">", col("a"), col("b")).as("gt"),
      AgVariant.cypherCmp("<=", col("a"), col("b")).as("le"),
      AgVariant.cypherCmp(">=", col("a"), col("b")).as("ge")).collect()
    pairs.zip(got).foreach { case ((a, b), r) =>
      val c = AgValue.compare(a, b)
      // tag-level compare for cross-class; value compare within class —
      // on EVERY sample exactly one of <,=,> holds and <=/>= agree
      assert(r.getBoolean(0) === (c < 0), s"$a < $b")
      assert(r.getBoolean(1) === (c == 0), s"$a = $b")
      assert(r.getBoolean(2) === (c > 0), s"$a > $b")
      assert(r.getBoolean(3) === (c <= 0), s"$a <= $b")
      assert(r.getBoolean(4) === (c >= 0), s"$a >= $b")
      assert(Seq(r.getBoolean(0), r.getBoolean(1), r.getBoolean(2)).count(identity) === 1,
        s"trichotomy violated for ($a, $b)")
    }
  }

  test("same-tag container compares are element-wise, not textual (agtype_util.c:333+)") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    def contRow(text: String) =
      Row(AgVariant.TagArray.toByte, null, null, null, null, text, null)
    val pairs = Seq(
      ("[2]", "[2.0]", 0),          // numeric-class-insensitive equality
      ("[2::numeric]", "[2]", 0),
      ("[2]", "[10]", -1),          // numeric order, not text order
      ("[1, \"a\"]", "[1, \"b\"]", -1),
      ("[1, 2]", "[1, 2, 3]", -1),  // shorter prefix sorts first
      ("[1, {\"a\": 2}]", "[1, {\"a\": 2.0}]", 0)) // nested class-insensitive
    val schema = StructType(Seq(
      StructField("a", AgVariant.schema), StructField("b", AgVariant.schema)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        pairs.map { case (a, b, _) => Row(contRow(a), contRow(b)) }, 1), schema)
    val got = df.select(
      AgVariant.cypherCmp("=", col("a"), col("b")).as("eq"),
      AgVariant.cypherCmp("<", col("a"), col("b")).as("lt"),
      AgVariant.cypherCmp(">", col("a"), col("b")).as("gt")).collect()
    pairs.zip(got).foreach { case ((a, b, c), r) =>
      assert(r.getBoolean(0) === (c == 0), s"$a = $b")
      assert(r.getBoolean(1) === (c < 0), s"$a < $b")
      assert(r.getBoolean(2) === (c > 0), s"$a > $b")
    }
  }

  test("heterogeneous list comparison from Cypher is value-based") {
    val g = new graft.graph.PropertyGraph("vt3", Nil, Nil)
    def one(q: String): Any = {
      val r = Cypher.query(spark, g, q).collect()(0)
      if (r.isNullAt(0)) null else r.get(0)
    }
    assert(one("RETURN [2, 'a'] = [2.0, 'a'] AS x") === true)
    assert(one("RETURN [2, 'a'] < [10, 'a'] AS x") === true)
    assert(one("RETURN [2, 'a'] <> [2.0, 'b'] AS x") === true)
  }
}
