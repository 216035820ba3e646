package graft.cypher

import org.apache.spark.sql.DataFrame

import graft.SparkTestBase
import graft.graph.{EdgeLabel, PropertyGraph, VertexLabel}
import graft.types.GraphId

/** EXISTS { } / COUNT { } / CALL { } subqueries and the agtype
  * containment/existence/concat operator family
  * (reference: cypher_clause.c:4333/4389, cypher_gram.y:656-726,
  * agtype_ops.c:1472-1761; regress/sql/cypher_subquery.sql).
  * Same inline graph as CypherSpec.
  */
class SubquerySpec extends SparkTestBase {
  import spark.implicits._

  val PersonL = 1; val CityL = 2; val KnowsL = 10; val LivesL = 11
  def pid(i: Long) = GraphId.make(PersonL, i)
  def cid(i: Long) = GraphId.make(CityL, i)

  lazy val graph: PropertyGraph = {
    val people = Seq(
      (pid(1), "Alice", Some(30L)),
      (pid(2), "Bob", Some(25L)),
      (pid(3), "Carol", Some(35L)),
      (pid(4), "Dave", Some(25L))
    ).toDF("id", "name", "age")
    val cities = Seq((cid(1), "SEA"), (cid(2), "PDX")).toDF("id", "name")
    val knows = Seq(
      (GraphId.make(KnowsL, 1), pid(1), pid(2), 2010L),
      (GraphId.make(KnowsL, 2), pid(2), pid(3), 2015L),
      (GraphId.make(KnowsL, 3), pid(1), pid(3), 2020L),
      (GraphId.make(KnowsL, 4), pid(3), pid(1), 2021L)
    ).toDF("id", "start_id", "end_id", "since")
    val lives = Seq(
      (GraphId.make(LivesL, 1), pid(1), cid(1)),
      (GraphId.make(LivesL, 2), pid(2), cid(1)),
      (GraphId.make(LivesL, 3), pid(3), cid(2))
    ).toDF("id", "start_id", "end_id")
    new PropertyGraph(
      "test",
      Seq(VertexLabel("Person", PersonL, people), VertexLabel("City", CityL, cities)),
      Seq(EdgeLabel("KNOWS", KnowsL, knows), EdgeLabel("LIVES_IN", LivesL, lives)))
  }

  def run(q: String): DataFrame = Cypher.query(spark, graph, q)
  def rows(q: String): Seq[Seq[Any]] = run(q).collect().toSeq.map(_.toSeq)

  // ---- EXISTS { } --------------------------------------------------------

  test("EXISTS { pattern } as WHERE conjunct (semi join)") {
    assert(rows(
      """MATCH (a:Person)
        |WHERE EXISTS { (a)-[:KNOWS]->(:Person {name: 'Carol'}) }
        |RETURN a.name AS name ORDER BY name""".stripMargin) ===
      Seq(Seq("Alice"), Seq("Bob")))
  }

  test("NOT EXISTS { pattern } (anti join)") {
    assert(rows(
      """MATCH (a:Person) WHERE NOT EXISTS { (a)-[:KNOWS]->() }
        |RETURN a.name AS name""".stripMargin) === Seq(Seq("Dave")))
  }

  test("EXISTS { MATCH ... WHERE ... } full subquery form") {
    assert(rows(
      """MATCH (a:Person)
        |WHERE EXISTS { MATCH (a)-[e:KNOWS]->(b) WHERE e.since > 2015 }
        |RETURN a.name AS name ORDER BY name""".stripMargin) ===
      Seq(Seq("Alice"), Seq("Carol")))
  }

  test("EXISTS { } in RETURN position compiles to a boolean column") {
    assert(rows(
      """MATCH (a:Person)
        |RETURN a.name AS name, EXISTS { (a)-[:KNOWS]->() } AS has
        |ORDER BY name""".stripMargin) ===
      Seq(Seq("Alice", true), Seq("Bob", true), Seq("Carol", true), Seq("Dave", false)))
  }

  // ---- COUNT { } ---------------------------------------------------------

  test("COUNT { } scalar subquery per row") {
    assert(rows(
      """MATCH (a:Person)
        |RETURN a.name AS name, COUNT { (a)-[:KNOWS]->(b) } AS k
        |ORDER BY name""".stripMargin) ===
      Seq(Seq("Alice", 2L), Seq("Bob", 1L), Seq("Carol", 1L), Seq("Dave", 0L)))
  }

  test("COUNT { } inside a WHERE comparison") {
    assert(rows(
      """MATCH (a:Person) WHERE COUNT { (a)-[:KNOWS]->() } >= 2
        |RETURN a.name AS name""".stripMargin) === Seq(Seq("Alice")))
  }

  // ---- CALL { } ----------------------------------------------------------

  test("uncorrelated CALL { } at query start") {
    assert(rows(
      "CALL { MATCH (c:City) RETURN c.name AS city } RETURN city ORDER BY city") ===
      Seq(Seq("PDX"), Seq("SEA")))
  }

  test("correlated CALL { WITH ... } lateral per row") {
    assert(rows(
      """MATCH (a:Person)
        |CALL { WITH a MATCH (a)-[:KNOWS]->(b) RETURN b.name AS friend }
        |RETURN a.name AS name, friend ORDER BY name, friend""".stripMargin) ===
      Seq(Seq("Alice", "Bob"), Seq("Alice", "Carol"),
        Seq("Bob", "Carol"), Seq("Carol", "Alice")))
  }

  test("CALL { } multiplies rows (uncorrelated body after MATCH)") {
    assert(rows(
      """MATCH (a:Person {name: 'Alice'})
        |CALL { MATCH (c:City) RETURN c.name AS city }
        |RETURN a.name AS name, city ORDER BY city""".stripMargin) ===
      Seq(Seq("Alice", "PDX"), Seq("Alice", "SEA")))
  }

  test("correlated CALL { ... LIMIT k } is a lateral top-k (per outer row)") {
    // ordered per-row top-1: each person keeps their lexicographically
    // first friend, not one row globally
    assert(rows(
      """MATCH (a:Person)
        |CALL { WITH a MATCH (a)-[:KNOWS]->(b)
        |       RETURN b.name AS friend ORDER BY friend LIMIT 1 }
        |RETURN a.name AS name, friend ORDER BY name""".stripMargin) ===
      Seq(Seq("Alice", "Bob"), Seq("Bob", "Carol"), Seq("Carol", "Alice")))
    // SKIP per outer row as well
    assert(rows(
      """MATCH (a:Person)
        |CALL { WITH a MATCH (a)-[:KNOWS]->(b)
        |       RETURN b.name AS friend ORDER BY friend SKIP 1 }
        |RETURN a.name AS name, friend ORDER BY name""".stripMargin) ===
      Seq(Seq("Alice", "Carol")))
    // LIMIT without ORDER BY: arbitrary pick but still one per outer row
    assert(rows(
      """MATCH (a:Person)
        |CALL { WITH a MATCH (a)-[:KNOWS]->(b) RETURN b.name AS friend LIMIT 1 }
        |RETURN count(*) AS n""".stripMargin) === Seq(Seq(3L)))
  }

  test("EXISTS with per-row LIMIT inside the subquery") {
    // LIMIT 1 inside EXISTS must not starve other outer rows
    assert(rows(
      """MATCH (a:Person)
        |WHERE EXISTS { MATCH (a)-[:KNOWS]->(b) RETURN b LIMIT 1 }
        |RETURN a.name AS name ORDER BY name""".stripMargin) ===
      Seq(Seq("Alice"), Seq("Bob"), Seq("Carol")))
  }

  test("bare pattern expression in WHERE (no EXISTS keyword)") {
    assert(rows(
      """MATCH (a:Person)
        |WHERE (a)-[:KNOWS]->(:Person {name: 'Carol'})
        |RETURN a.name AS name ORDER BY name""".stripMargin) ===
      Seq(Seq("Alice"), Seq("Bob")))
    assert(rows(
      """MATCH (a:Person) WHERE NOT (a)-[:KNOWS]->()
        |RETURN a.name AS name""".stripMargin) === Seq(Seq("Dave")))
  }

  test("pattern expression under OR decorrelates to a flag") {
    assert(rows(
      """MATCH (a:Person)
        |WHERE (a)-[:KNOWS]->(:Person {name: 'Carol'}) OR a.name = 'Dave'
        |RETURN a.name AS name ORDER BY name""".stripMargin) ===
      Seq(Seq("Alice"), Seq("Bob"), Seq("Dave")))
  }

  test("parenthesized expressions still parse (no pattern false-positive)") {
    assert(rows("RETURN (1 + 2) * 3 AS x") === Seq(Seq(9L)))
    assert(rows(
      """MATCH (a:Person) WHERE (a.age > 26 AND a.name <> 'Carol')
        |RETURN a.name AS name""".stripMargin) === Seq(Seq("Alice")))
  }

  // ---- containment / existence / concat operators ------------------------

  test("map containment @> / <@") {
    assert(rows("RETURN {a: 1, b: 2} @> {a: 1} AS x") === Seq(Seq(true)))
    assert(rows("RETURN {a: 1, b: 2} @> {a: 2} AS x") === Seq(Seq(false)))
    assert(rows("RETURN {a: 1} <@ {a: 1, b: 2} AS x") === Seq(Seq(true)))
    assert(rows("RETURN {a: 1, b: 2} @>> {b: 2} AS x") === Seq(Seq(true)))
  }

  test("array containment @>") {
    assert(rows("RETURN [1, 2, 3] @> [1, 3] AS x") === Seq(Seq(true)))
    assert(rows("RETURN [1, 2, 3] @> [4] AS x") === Seq(Seq(false)))
    assert(rows("RETURN [1, 2] <@ [1, 2, 3] AS x") === Seq(Seq(true)))
  }

  test("deep containment recurses into nested containers; @>> stays top-level") {
    // nested-object containment (reference: agtype_deep_contains —
    // {a:{b:1,c:2}} @> {a:{b:1}} is TRUE because object entries are
    // contained recursively, not equality-compared)
    assert(rows("RETURN {a: {b: 1, c: 2}} @> {a: {b: 1}} AS x") === Seq(Seq(true)))
    assert(rows("RETURN {a: {b: 1, c: 2}} @> {a: {b: 9}} AS x") === Seq(Seq(false)))
    assert(rows("RETURN {a: {b: 1, c: 2}} @> {a: {z: 1}} AS x") === Seq(Seq(false)))
    // nested-array element containment: [[1,2]] @> [[1]]
    assert(rows("RETURN [[1, 2], [3]] @> [[1]] AS x") === Seq(Seq(true)))
    assert(rows("RETURN [[1, 2], [3]] @> [[4]] AS x") === Seq(Seq(false)))
    // raw scalar contained in an array
    assert(rows("RETURN [1, 2, 3] @> 2 AS x") === Seq(Seq(true)))
    // top-level variant does NOT descend: nested value must be equal
    assert(rows("RETURN {a: {b: 1, c: 2}} @>> {a: {b: 1}} AS x") === Seq(Seq(false)))
    assert(rows("RETURN {a: {b: 1, c: 2}} @>> {a: {b: 1, c: 2}} AS x") === Seq(Seq(true)))
  }

  test("containment bridges typed property structs and map literals") {
    // properties(v) is a typed struct column; the needle is a map
    // literal — the common AGE idiom `properties(v) @> {k: val}`
    // (reference: agtype_ops.c:1472, sql/agtype_operators.sql)
    assert(rows(
      """MATCH (a:Person) WHERE properties(a) @> {name: 'Alice'}
        |RETURN a.name AS name""".stripMargin) === Seq(Seq("Alice")))
    // mixed-type needle map (variant values) against typed fields
    assert(rows(
      """MATCH (a:Person) WHERE properties(a) @> {name: 'Bob', age: 25}
        |RETURN a.name AS name""".stripMargin) === Seq(Seq("Bob")))
    // wrong value, missing key, class-mismatched value: not contained
    assert(rows(
      """MATCH (a:Person) WHERE properties(a) @> {name: 'Nobody'}
        |RETURN count(*) AS n""".stripMargin) === Seq(Seq(0L)))
    assert(rows(
      """MATCH (a:Person) WHERE properties(a) @> {zzz: 1}
        |RETURN count(*) AS n""".stripMargin) === Seq(Seq(0L)))
    assert(rows(
      """MATCH (a:Person) WHERE properties(a) @> {age: 'x'}
        |RETURN count(*) AS n""".stripMargin) === Seq(Seq(0L)))
    // reverse direction and shallow variant
    assert(rows(
      """MATCH (a:Person {name: 'Carol'})
        |RETURN {name: 'Carol'} <@ properties(a) AS x,
        |  properties(a) @>> {age: 35} AS y""".stripMargin) ===
      Seq(Seq(true, true)))
  }

  test("key existence over typed property structs") {
    assert(rows(
      """MATCH (a:Person {name: 'Alice'})
        |RETURN properties(a) ? 'age' AS x, properties(a) ? 'zzz' AS y,
        |  properties(a) ?| ['zzz', 'name'] AS z,
        |  properties(a) ?& ['name', 'age'] AS w,
        |  properties(a) ?& ['name', 'zzz'] AS v""".stripMargin) ===
      Seq(Seq(true, false, true, true, false)))
  }

  test("key existence ? / ?| / ?&") {
    assert(rows("RETURN {a: 1, b: 2} ? 'a' AS x") === Seq(Seq(true)))
    assert(rows("RETURN {a: 1, b: 2} ? 'z' AS x") === Seq(Seq(false)))
    assert(rows("RETURN {a: 1, b: 2} ?| ['z', 'b'] AS x") === Seq(Seq(true)))
    assert(rows("RETURN {a: 1, b: 2} ?& ['a', 'b'] AS x") === Seq(Seq(true)))
    assert(rows("RETURN {a: 1, b: 2} ?& ['a', 'z'] AS x") === Seq(Seq(false)))
  }

  test("|| concatenation: strings, arrays, maps") {
    assert(rows("RETURN 'ab' || 'cd' AS x") === Seq(Seq("abcd")))
    assert(rows("RETURN [1, 2] || [3] AS x") === Seq(Seq(Seq(1L, 2L, 3L))))
    val m = run("RETURN {a: 1} || {b: 2} AS x").collect()(0).getMap[String, Long](0)
    assert(m === Map("a" -> 1L, "b" -> 2L))
  }

  test("|| map concat is last-wins on duplicate keys") {
    val m = run("RETURN {a: 1, b: 1} || {b: 9} AS x").collect()(0).getMap[String, Long](0)
    assert(m === Map("a" -> 1L, "b" -> 9L))
  }

  test("#> / #>> path extraction") {
    assert(rows("RETURN {b: {c: 2}} #> ['b', 'c'] AS x") === Seq(Seq(2L)))
    assert(rows("RETURN {b: {c: 2}} #>> ['b', 'c'] AS x") === Seq(Seq("2")))
    assert(rows("RETURN [[1, 2], [3, 4]] #> [1, 0] AS x") === Seq(Seq(3L)))
  }

  // rows ported from regress jsonb_operators.out:905-1040 (the
  // reference exposes -> / ->> as SQL operators outside its Cypher
  // grammar; graft surfaces them as Cypher expression operators —
  // agtype.c:4329-4467 semantics)
  test("-> object field access (jsonb_operators.out)") {
    assert(rows("RETURN {n: null, a: 1, b: [1, 2]} -> 'a' AS x") === Seq(Seq(1L)))
    assert(rows("RETURN {n: null, a: 1, b: [1, 2]} -> 'b' AS x") === Seq(Seq(Seq(1L, 2L))))
    assert(rows("RETURN {d: {'1': [2, 3]}} -> 'd' -> '1' AS x") === Seq(Seq(Seq(2L, 3L))))
    // missing key → null
    assert(rows("RETURN {n: null, a: 1} -> 'e' AS x") === Seq(Seq(null)))
    // object -> int → null (even when a numeric-text key exists)
    assert(rows("RETURN {a: 1, '1': -19} -> 1 AS x") === Seq(Seq(null)))
  }

  test("-> array element access: 0-based, negative from end (jsonb_operators.out)") {
    assert(rows("RETURN ['a', 'b', 'c'] -> 0 AS x") === Seq(Seq("a")))
    // heterogeneous array → variant elements; chained access decodes to
    // canonical text (same convention as the [i] chains, ExprSpec)
    assert(rows("RETURN ['a', 'b', 'c', [1, 2]] -> 3 -> 1 AS x") === Seq(Seq("2")))
    assert(rows("RETURN ['a', 'b', 'c', [1, 2]] -> 3 -> -1 AS x") === Seq(Seq("2")))
    assert(rows("RETURN ['a', 'b', 'c'] -> -3 AS x") === Seq(Seq("a")))
    // out of bounds → null; array -> text key → null
    assert(rows("RETURN ['a', 'b', 'c'] -> 5 AS x") === Seq(Seq(null)))
    assert(rows("RETURN [1, 2, 3] -> 'a' AS x") === Seq(Seq(null)))
  }

  test("->> returns text (expr.out:2493, jsonb_operators.out:816-830)") {
    assert(rows("RETURN {hello: 'world'} ->> 'hello' AS x") === Seq(Seq("world")))
    assert(rows("RETURN [0, 1] ->> 0 AS x") === Seq(Seq("0")))
    assert(rows("RETURN {b: {c: 2}} -> 'b' ->> 'c' AS x") === Seq(Seq("2")))
  }

  test("-> does not disturb relationship-arrow parsing") {
    // same spelling, pattern position: still an edge arrow — and both
    // meanings coexist in one statement
    assert(rows(
      """MATCH (a:Person)-[:KNOWS]->(b:Person {name: 'Carol'})
        |RETURN {who: a.name} -> 'who' AS x ORDER BY x""".stripMargin) ===
      Seq(Seq("Alice"), Seq("Bob")))
  }

  // ---- get_cypher_keywords ----------------------------------------------

  test("CALL get_cypher_keywords()") {
    assert(rows(
      """CALL get_cypher_keywords() YIELD word, catcode WHERE word STARTS WITH 'mer'
        |RETURN word, catcode""".stripMargin) === Seq(Seq("merge", "reserved")))
  }

  test("UNION inside CALL subqueries (subquery_stmt, cypher_gram.y:656-726)") {
    assert(rows("CALL { RETURN 1 AS one UNION RETURN 2 AS one } RETURN sum(one) AS s") ===
      Seq(Seq(3L)))
    assert(rows("CALL { RETURN 1 AS one UNION ALL RETURN 1 AS one } RETURN count(*) AS n") ===
      Seq(Seq(2L)))
    assert(rows("CALL { RETURN 1 AS one UNION RETURN 1 AS one } RETURN count(*) AS n") ===
      Seq(Seq(1L)))
    // correlated arms share the outer binding
    assert(rows(
      """MATCH (p:Person) CALL { WITH p MATCH (p)-[:KNOWS]->(f) RETURN f.name AS nm
        |UNION WITH p RETURN p.name AS nm }
        |RETURN count(*) AS n""".stripMargin).head.head.asInstanceOf[Long] > 0)
  }

  test("map-typed correlation keys decorrelate without pinning") {
    // the correlation key contains a map-typed binding — canonicalized
    // to sorted entries, so the content-keyed path handles it (no
    // monotonically_increasing_id / localCheckpoint fallback)
    assert(rows(
      """MATCH (p:Person) WITH p, {n: p.name, a: p.age} AS m
        |WHERE EXISTS { MATCH (q:Person) WHERE q.name = m.n AND (q)-[:KNOWS]->() }
        |RETURN m.n AS nm ORDER BY nm""".stripMargin) ===
      Seq(Seq("Alice"), Seq("Bob"), Seq("Carol")))
    // duplicate map contents collapse to one evaluation and join back
    assert(rows(
      """UNWIND [1, 1, 2] AS i WITH {k: i} AS m
        |WHERE EXISTS { MATCH (q:Person) WHERE q.age > 20 + m.k }
        |RETURN count(*) AS n""".stripMargin) === Seq(Seq(3L)))
    // COUNT{} with a map in the correlation key
    assert(rows(
      """MATCH (p:Person) WITH {nm: p.name} AS m
        |RETURN m.nm AS nm,
        |  COUNT { MATCH (q:Person)-[:KNOWS]->() WHERE q.name = m.nm } AS c
        |ORDER BY nm""".stripMargin) ===
      Seq(Seq("Alice", 2L), Seq("Bob", 1L), Seq("Carol", 1L), Seq("Dave", 0L)))
  }
}
