package graft.cypher

import org.apache.spark.sql.{DataFrame, Row}

import graft.SparkTestBase
import graft.graph.{EdgeLabel, PropertyGraph, VertexLabel}
import graft.types.GraphId

/** Regress-style golden tests over a tiny inline graph
  * (shape mirrors reference regress/sql/cypher_match.sql:25-51).
  *
  * People: a-Alice(30,SEA) b-Bob(25,SEA) c-Carol(35,PDX) d-Dave(25,null)
  * KNOWS: a->b (since 2010), b->c (2015), a->c (2020), c->a (2021)
  * LIVES_IN: a->SEA, b->SEA, c->PDX
  */
class CypherSpec extends SparkTestBase {
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

  def rows(q: String): Seq[Seq[Any]] =
    run(q).collect().toSeq.map(_.toSeq)

  test("MATCH label scan + WHERE + RETURN projection") {
    assert(rows("MATCH (n:Person) WHERE n.age > 26 RETURN n.name AS name ORDER BY name") ===
      Seq(Seq("Alice"), Seq("Carol")))
  }

  test("property map constraint in pattern") {
    assert(rows("MATCH (n:Person {age: 25}) RETURN n.name AS name ORDER BY name") ===
      Seq(Seq("Bob"), Seq("Dave")))
  }

  test("single-hop directed match") {
    assert(rows(
      """MATCH (a:Person)-[e:KNOWS]->(b:Person)
        |RETURN a.name AS a, b.name AS b, e.since AS y ORDER BY y""".stripMargin) ===
      Seq(Seq("Alice", "Bob", 2010L), Seq("Bob", "Carol", 2015L),
        Seq("Alice", "Carol", 2020L), Seq("Carol", "Alice", 2021L)))
  }

  test("undirected match returns both orientations") {
    assert(rows(
      "MATCH (a:Person {name: 'Alice'})-[e:KNOWS]-(b) RETURN b.name AS b ORDER BY b") ===
      Seq(Seq("Bob"), Seq("Carol"), Seq("Carol")))
  }

  test("incoming direction") {
    assert(rows("MATCH (a:Person)<-[:KNOWS]-(b:Person {name: 'Alice'}) RETURN a.name AS n ORDER BY n") ===
      Seq(Seq("Bob"), Seq("Carol")))
  }

  test("two-hop chain with shared var and edge uniqueness") {
    // a->b->c, but paths reusing the same edge twice are excluded
    assert(rows(
      """MATCH (a:Person)-[:KNOWS]->(b:Person)-[:KNOWS]->(c:Person)
        |RETURN a.name AS a, b.name AS b, c.name AS c ORDER BY a, b, c""".stripMargin) ===
      Seq(Seq("Alice", "Bob", "Carol"), Seq("Alice", "Carol", "Alice"),
        Seq("Bob", "Carol", "Alice"), Seq("Carol", "Alice", "Bob"),
        Seq("Carol", "Alice", "Carol")))
  }

  test("anonymous phantom nodes are not scanned") {
    val df = run("MATCH ()-[e:KNOWS]->() RETURN count(e) AS n")
    assert(df.collect().head.getLong(0) === 4L)
    // plan should contain no vertex-side scan for the endpoints
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.contains("name")) // no person columns joined in
  }

  test("implicit aggregation groups by non-aggregate items") {
    assert(rows(
      """MATCH (a:Person)-[:KNOWS]->(b:Person)
        |RETURN a.name AS name, count(b) AS n ORDER BY n DESC, name""".stripMargin) ===
      Seq(Seq("Alice", 2L), Seq("Bob", 1L), Seq("Carol", 1L)))
  }

  test("OPTIONAL MATCH preserves unmatched rows") {
    assert(rows(
      """MATCH (p:Person) OPTIONAL MATCH (p)-[:LIVES_IN]->(c:City)
        |RETURN p.name AS p, c.name AS c ORDER BY p""".stripMargin) ===
      Seq(Seq("Alice", "SEA"), Seq("Bob", "SEA"), Seq("Carol", "PDX"), Seq("Dave", null)))
  }

  test("WITH projection + WHERE barrier") {
    assert(rows(
      """MATCH (p:Person) WITH p.name AS name, p.age AS age WHERE age < 30
        |RETURN name ORDER BY name""".stripMargin) ===
      Seq(Seq("Bob"), Seq("Dave")))
  }

  test("WITH aggregation then filter") {
    assert(rows(
      """MATCH (a:Person)-[:KNOWS]->(b)
        |WITH a, count(b) AS n WHERE n > 1
        |RETURN a.name AS name, n""".stripMargin) ===
      Seq(Seq("Alice", 2L)))
  }

  test("UNWIND explodes lists and drops null/empty") {
    assert(rows("UNWIND [1, 2, 3] AS x RETURN x") === Seq(Seq(1L), Seq(2L), Seq(3L)))
    assert(rows("UNWIND [] AS x RETURN x") === Seq.empty)
  }

  test("UNION and UNION ALL") {
    assert(rows(
      """MATCH (p:Person {name: 'Bob'}) RETURN p.age AS v
        |UNION ALL MATCH (p:Person {name: 'Dave'}) RETURN p.age AS v""".stripMargin) ===
      Seq(Seq(25L), Seq(25L)))
    assert(rows(
      """MATCH (p:Person {name: 'Bob'}) RETURN p.age AS v
        |UNION MATCH (p:Person {name: 'Dave'}) RETURN p.age AS v""".stripMargin) ===
      Seq(Seq(25L)))
  }

  test("DISTINCT, SKIP, LIMIT") {
    assert(rows("MATCH (p:Person) RETURN DISTINCT p.age AS age ORDER BY age") ===
      Seq(Seq(25L), Seq(30L), Seq(35L)))
    assert(rows("MATCH (p:Person) RETURN p.name AS n ORDER BY n SKIP 1 LIMIT 2") ===
      Seq(Seq("Bob"), Seq("Carol")))
  }

  test("expression surface: CASE, IN, string predicates, arithmetic") {
    assert(rows(
      """MATCH (p:Person) WHERE p.name STARTS WITH 'A' OR p.name CONTAINS 'aro'
        |RETURN p.name AS n ORDER BY n""".stripMargin) ===
      Seq(Seq("Alice"), Seq("Carol")))
    assert(rows(
      """MATCH (p:Person) WHERE p.age IN [25, 35]
        |RETURN p.name AS n ORDER BY n""".stripMargin) ===
      Seq(Seq("Bob"), Seq("Carol"), Seq("Dave")))
    assert(rows(
      """MATCH (p:Person {name: 'Alice'})
        |RETURN p.age + 1 AS a, p.age * 2 AS b, p.age % 7 AS c,
        |  CASE WHEN p.age >= 30 THEN 'old' ELSE 'young' END AS d""".stripMargin) ===
      Seq(Seq(31L, 60L, 2L, "old")))
  }

  test("list comprehension, reduce, predicates") {
    assert(rows("RETURN [x IN range(1, 5) WHERE x % 2 = 1 | x * 10] AS l") ===
      Seq(Seq(Seq(10L, 30L, 50L))))
    assert(rows("RETURN reduce(acc = 0, x IN [1, 2, 3] | acc + x) AS s") ===
      Seq(Seq(6L)))
    assert(rows("RETURN all(x IN [1, 2] WHERE x > 0) AS a, any(x IN [1, 2] WHERE x > 1) AS b") ===
      Seq(Seq(true, true)))
  }

  test("scalar functions") {
    assert(rows("RETURN toUpper('ab') AS a, substring('hello', 1, 3) AS b, size([1,2]) AS c, head([7,8]) AS d") ===
      Seq(Seq("AB", "ell", 2, 7L)))
    assert(rows("RETURN abs(-3) AS a, sign(-2) AS b, round(2.5) AS c") ===
      Seq(Seq(3L, -1L, 3.0)))
  }

  test("id()/label()/type() accessors and graphid packing") {
    assert(rows("MATCH (p:Person {name: 'Alice'}) RETURN id(p) AS i, label(p) AS l") ===
      Seq(Seq(GraphId.make(PersonL, 1), "Person")))
    assert(rows("MATCH ()-[e:KNOWS {since: 2010}]->() RETURN type(e) AS t") ===
      Seq(Seq("KNOWS")))
  }

  test("VLE applies property constraints to every traversed edge") {
    // only the a->b edge has since=2010; 2-hop continuation b->c (2015)
    // is filtered out
    assert(rows(
      """MATCH (a:Person {name: 'Alice'})-[e:KNOWS*1..2 {since: 2010}]->(b)
        |RETURN b.name AS b ORDER BY b""".stripMargin) === Seq(Seq("Bob")))
  }

  test("unbounded VLE enumerates all edge-unique paths") {
    // edges: a->b, b->c, a->c, c->a; from Alice every edge-isomorphic
    // walk: [ab]->b [ab,bc]->c [ab,bc,ca]->a [ab,bc,ca,ac]->c
    // [ac]->c [ac,ca]->a [ac,ca,ab]->b [ac,ca,ab,bc]->c = 8 paths
    assert(rows(
      """MATCH (a:Person {name: 'Alice'})-[e:KNOWS*]->(b)
        |RETURN size(e) AS hops, b.name AS dst ORDER BY hops, dst""".stripMargin) ===
      Seq(Seq(1L, "Bob"), Seq(1L, "Carol"), Seq(2L, "Alice"), Seq(2L, "Carol"),
        Seq(3L, "Alice"), Seq(3L, "Bob"), Seq(4L, "Carol"), Seq(4L, "Carol")))
  }

  test("zero-length VLE includes the start vertex itself") {
    // *0..1: Alice herself (0 hops) + direct KNOWS targets (1 hop)
    assert(rows(
      """MATCH (a:Person {name: 'Alice'})-[e:KNOWS*0..1]->(b:Person)
        |RETURN b.name AS b ORDER BY b""".stripMargin) ===
      Seq(Seq("Alice"), Seq("Bob"), Seq("Carol")))
  }

  test("map projection: .prop, .*, variable, key: expr, override") {
    val r = run(
      """MATCH (n:Person {name: 'Alice'}) WITH n, 99 AS bonus
        |RETURN n {.name, .age, bonus, tag: 'x'} AS m""".stripMargin)
      .collect()(0).getStruct(0)
    assert(r.getAs[String]("name") === "Alice")
    assert(r.getAs[Long]("age") === 30L)
    assert(r.getAs[Long]("bonus") === 99L)
    assert(r.getAs[String]("tag") === "x")
    val all = run(
      "MATCH (n:Person {name: 'Bob'}) RETURN n {.*, age: 26} AS m")
      .collect()(0).getStruct(0)
    assert(all.getAs[String]("name") === "Bob")
    assert(all.getAs[Long]("age") === 26L) // explicit entry overrides .*
  }

  test("query parameters bind scalars, lists, and maps") {
    import graft.types._
    val params = Map[String, AgValue](
      "minAge" -> AgInt(26),
      "names" -> AgValue.array(AgString("Alice"), AgString("Dave")))
    val r = Cypher.query(spark, graph,
      """MATCH (n:Person) WHERE n.age > $minAge AND n.name IN $names
        |RETURN n.name AS name""".stripMargin, params)
      .collect().map(_.getString(0)).toSeq
    assert(r === Seq("Alice"))
  }

  test("startNode / endNode return the full vertex") {
    val r = run(
      """MATCH ()-[e:KNOWS {since: 2010}]->()
        |RETURN startNode(e) AS s, endNode(e) AS t""".stripMargin).collect()(0)
    val s = r.getStruct(0); val t = r.getStruct(1)
    assert(s.getAs[String]("label") === "Person")
    assert(s.getAs[org.apache.spark.sql.Row]("properties").getAs[String]("name") === "Alice")
    assert(t.getAs[org.apache.spark.sql.Row]("properties").getAs[String]("name") === "Bob")
  }

  test("VLE bounded expansion is edge-isomorphic") {
    // *1..2 from Alice: direct (b, c via 2010/2020) + 2-hop (a->b->c, a->c->a)
    assert(rows(
      """MATCH (a:Person {name: 'Alice'})-[e:KNOWS*1..2]->(b:Person)
        |RETURN b.name AS b, e AS ids ORDER BY size(ids), b""".stripMargin)
      .map(r => (r(0), r(1).asInstanceOf[scala.collection.Seq[Long]].size)) ===
      Seq(("Bob", 1), ("Carol", 1), ("Alice", 2), ("Carol", 2)))
  }

  test("VLE triangle allows vertex revisit but not edge reuse") {
    // reference semantics: age_vle.c:35-42 — triangle must yield the
    // 3-hop cycle revisiting the start vertex
    val r = rows(
      """MATCH (a:Person {name: 'Alice'})-[e:KNOWS*3..3]->(b)
        |RETURN b.name AS b ORDER BY b""".stripMargin)
    assert(r === Seq(Seq("Alice"), Seq("Bob")))
  }

  test("EXISTS pattern as WHERE conjunct") {
    assert(rows(
      """MATCH (p:Person) WHERE EXISTS((p)-[:LIVES_IN]->(:City {name: 'SEA'}))
        |RETURN p.name AS n ORDER BY n""".stripMargin) ===
      Seq(Seq("Alice"), Seq("Bob")))
    assert(rows(
      """MATCH (p:Person) WHERE NOT EXISTS((p)-[:LIVES_IN]->())
        |RETURN p.name AS n""".stripMargin) ===
      Seq(Seq("Dave")))
  }

  test("multi-pattern MATCH joins on shared variables") {
    assert(rows(
      """MATCH (a:Person)-[:KNOWS]->(b:Person), (a)-[:LIVES_IN]->(c:City)
        |RETURN a.name AS a, b.name AS b, c.name AS c ORDER BY a, b""".stripMargin) ===
      Seq(Seq("Alice", "Bob", "SEA"), Seq("Alice", "Carol", "SEA"),
        Seq("Bob", "Carol", "SEA"), Seq("Carol", "Alice", "PDX")))
  }

  test("RETURN whole node materializes id/label/properties struct") {
    val r = run("MATCH (p:Person {name: 'Dave'}) RETURN p").collect().head
    val s = r.getStruct(0)
    assert(s.getLong(s.fieldIndex("id")) === pid(4))
    assert(s.getString(s.fieldIndex("label")) === "Person")
    val props = s.getStruct(s.fieldIndex("properties"))
    assert(props.getString(props.fieldIndex("name")) === "Dave")
    assert(props.getLong(props.fieldIndex("age")) === 25L)
  }

  test("shortestpath returns minimal-hop path") {
    // Alice -> Carol: direct edge (2020) = 1 hop beats a->b->c
    val r = rows(
      """MATCH p = shortestpath((a:Person {name: 'Alice'})-[:KNOWS*..5]->(b:Person {name: 'Carol'}))
        |RETURN length(p) AS hops""".stripMargin)
    assert(r === Seq(Seq(1)))
  }

  test("shortestpath to all reachable targets") {
    val r = rows(
      """MATCH p = shortestpath((a:Person {name: 'Bob'})-[:KNOWS*..5]->(b:Person))
        |RETURN b.name AS name, length(p) AS hops ORDER BY hops, name""".stripMargin)
    // Bob -> Bob is the ZERO-LENGTH path (start == end answers one
    // 0-hop path; regress age_shortest_path.out, implicit min-hop 0);
    // then Carol (1 hop) and Alice (2 hops). No longer walk back to Bob
    // since BFS paths are simple (never revisit a vertex — reference:
    // age_vle.c:2798-2821 "simple paths by construction")
    assert(r === Seq(Seq("Bob", 0), Seq("Carol", 1), Seq("Alice", 2)))
  }

  test("allshortestpaths keeps equal-length alternatives") {
    val r = rows(
      """MATCH p = allshortestpaths((a:Person {name: 'Alice'})-[:KNOWS*..5]->(b:Person {name: 'Carol'}))
        |RETURN length(p) AS hops""".stripMargin)
    assert(r === Seq(Seq(1))) // only one 1-hop path exists
  }

  test("named path binds nodes/relationships/length") {
    val r = rows(
      """MATCH p = (a:Person {name: 'Alice'})-[:KNOWS]->(b:Person {name: 'Bob'})
        |RETURN length(p) AS hops, size(nodes(p)) AS nn, size(relationships(p)) AS nr""".stripMargin)
    assert(r === Seq(Seq(1L, 2, 1)))
  }

  test("CALL procedure with YIELD and WHERE") {
    val r = rows(
      """CALL graph_stats() YIELD kind, label, n WHERE kind = 'vertex'
        |RETURN label, n ORDER BY label""".stripMargin)
    assert(r === Seq(Seq("City", 2L), Seq("Person", 4L)))
    val d = rows(
      "CALL degrees() YIELD id, out_degree WHERE out_degree > 2 RETURN out_degree")
    assert(d === Seq(Seq(3L))) // only Alice (2 KNOWS + 1 LIVES_IN)
  }

  test("CALL pagerank / connected_components run on the graph") {
    val pr = run("CALL pagerank() YIELD id, rank RETURN id, rank")
    assert(pr.count() === 6) // 4 people + 2 cities
    val cc = run("CALL connected_components() YIELD id, component RETURN component")
    // Dave has no edges: own component; everyone else connected
    assert(cc.select("component").distinct().count() === 2)
  }

  test("CALL label_propagation: deterministic rounds, min-id tie-break, isolated keep their id") {
    // undirected simple-graph adjacency of the fixture: p1-p2, p2-p3,
    // p1-p3, p1-c1, p2-c1, p3-c2; p4 isolated. Round 1: every neighbor
    // label is distinct (all start as self), so each vertex adopts its
    // SMALLEST neighbor id: p1->p2, p2->p1, p3->p1, c1->p1, c2->p3.
    val r1 = run(
      """CALL label_propagation(1) YIELD id, community
        |WITH community, count(*) AS sz RETURN community, sz ORDER BY community""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(r1 === Seq((pid(1), 3L), (pid(2), 1L), (pid(3), 1L), (pid(4), 1L)))
    // Round 2 converges the connected component onto p1 (majority where
    // counts differ, min-id where they tie); p4 still keeps its own id.
    val r2 = run(
      """CALL label_propagation(2) YIELD id, community
        |WITH community, count(*) AS sz RETURN community, sz ORDER BY community""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(r2 === Seq((pid(1), 5L), (pid(4), 1L)))
    // reproducible: a second run returns the identical assignment
    val a = run("CALL label_propagation(2) YIELD id, community RETURN id, community")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val b = run("CALL label_propagation(2) YIELD id, community RETURN id, community")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(a === b)
  }

  test("CALL kcore: iterative peel with cascade; within-core degrees; empty core") {
    // fixture 2-core: c2 (degree 1) and p4 (isolated) peel; c1 keeps
    // degree 2 (p1, p2); survivors {p1, p2, p3, c1} with within-core
    // degrees p1=3 (p2, p3, c1), p2=3, p3=2 (lost c2), c1=2
    val r2 = run("CALL kcore(2) YIELD id, degree RETURN id, degree ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(r2 === Seq((pid(1), 3L), (pid(2), 3L), (pid(3), 2L), (cid(1), 2L)))
    // 3-core: c1 (degree 2) peels, then the p1-p2-p3 triangle drops to
    // degree 2 each and cascades away — empty core
    assert(run("CALL kcore(3) YIELD id RETURN count(*) AS n")
      .collect()(0).getLong(0) === 0L)
  }

  test("CALL wsssp: weighted Bellman-Ford along edge direction, absent weight = 1.0") {
    // from Alice with weight = KNOWS.since (LIVES_IN has no 'since' →
    // 1.0): p2 via e1 = 2010; p3 direct 2020 beats 2010+2015 via p2;
    // c1 = 1.0; c2 via p3 = 2021; Dave unreachable
    val r = run(s"CALL wsssp(${pid(1)}, 'since', 3) YIELD id, dist " +
        "RETURN id, dist ORDER BY id")
      .collect().map(row => (row.getLong(0), row.getDouble(1))).toSeq
    assert(r === Seq((pid(1), 0.0), (pid(2), 2010.0), (pid(3), 2020.0),
      (cid(1), 1.0), (cid(2), 2021.0)))
  }

  test("CALL scc(max_passes, 0): cap-hit surfaces the partial labeling " +
      "with NULL scc to the Cypher caller, not an abort") {
    // two 3-cycles A = {1,2,3} → B = {4,5,6}: pass 1 certifies A
    // (forward and backward min both 1) but not B (F = 4 ≠ B = 1), so
    // scc(1, 0) — one pass, endgame disabled — must return A labeled
    // and B as scc = NULL, the degrade contract driven end-to-end
    // through Procedures/YIELD instead of the GraphAlgos API only
    val NL = 5; val NE = 6
    def v(i: Long) = GraphId.make(NL, i)
    val vdf = (1L to 6L).map(i => Tuple1(v(i))).toDF("id")
    val edf = Seq((v(1), v(2)), (v(2), v(3)), (v(3), v(1)),
      (v(4), v(5)), (v(5), v(6)), (v(6), v(4)), (v(3), v(4)))
      .zipWithIndex
      .map { case ((s, t), j) => (GraphId.make(NE, j + 1L), s, t) }
      .toDF("id", "start_id", "end_id")
    val g = new PropertyGraph("scc_degrade",
      Seq(VertexLabel("node", NL, vdf)), Seq(EdgeLabel("edge", NE, edf)))
    val got = Cypher.query(spark, g,
        "CALL scc(1, 0) YIELD id, scc RETURN id, scc ORDER BY id")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1))))
    assert(got === (1L to 3L).map(i => (v(i), Some(v(1)))) ++
      (4L to 6L).map(i => (v(i), None)))
    // and the NULLs are queryable — the caller can SEE the degrade
    val nNull = Cypher.query(spark, g,
        "CALL scc(1, 0) YIELD id, scc WHERE scc IS NULL RETURN count(*) AS n")
      .collect()(0).getLong(0)
    assert(nNull === 3L)
  }

  test("CALL label_propagation(0) is the identity assignment; kcore(0) rejects") {
    val r0 = run("CALL label_propagation(0) YIELD id, community RETURN id, community")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(r0.length === 6 && r0.forall { case (id, c) => id === c })
    val e = intercept[Exception](
      run("CALL kcore(0) YIELD id RETURN count(*) AS n").collect())
    assert(e.getMessage.contains("k >= 1") ||
      Option(e.getCause).exists(_.getMessage.contains("k >= 1")), e.getMessage)
  }

  test("labels(v) returns the single-label list (age_labels, agtype.c:12708)") {
    val r = run("MATCH (n:Person) RETURN labels(n) AS l LIMIT 1").collect()
    assert(r(0).getSeq[String](0) === Seq("Person"))
  }

  test("EXPLAIN returns plan rows") {
    val r = run("EXPLAIN MATCH (n:Person) RETURN n.name AS name")
    assert(r.columns.toSeq === Seq("plan"))
    assert(r.count() > 3)
  }

  test("EXPLAIN ANALYZE executes and reports per-operator metrics (cypher_analyze.c:280)") {
    val lines = run("EXPLAIN ANALYZE MATCH (n:Person) WHERE n.age > 20 " +
      "RETURN n.name AS name").collect().map(_.getString(0))
    // executed metrics are present: actual row counts per operator and
    // the total wall time
    assert(lines.exists(_.contains("number of output rows")), lines.mkString("\n"))
    assert(lines.exists(_.startsWith("Rows out: ")), lines.mkString("\n"))
    assert(lines.exists(_.startsWith("Execution time: ")), lines.mkString("\n"))
  }

  test("EXPLAIN surfaces procedure path decisions: endgame on a small " +
      "graph, distributed when the caller disables the endgame") {
    // the tiny graph takes the driver endgame — the plan is a
    // LocalTableScan, and without the decision line a profiler cannot
    // tell that a DIFFERENT (distributed) plan runs at scale
    val small = run("EXPLAIN ANALYZE CALL connected_components() " +
      "YIELD id, component RETURN count(*) AS n")
      .collect().map(_.getString(0))
    assert(small.exists(_.contains("== Procedure Path Decisions ==")),
      small.mkString("\n"))
    assert(small.exists(l => l.contains("connected_components") &&
      l.contains("driver endgame") && l.contains("rows=")), small.mkString("\n"))
    // scc(passes, 0) disables the endgame budget: the decision line
    // must report the distributed pass with its measured gate values
    val dist = run("EXPLAIN CALL scc(64, 0) YIELD id, scc " +
      "RETURN count(*) AS n").collect().map(_.getString(0))
    assert(dist.exists(l => l.contains("scc") &&
      l.contains("distributed propagate/refine") && l.contains("budget=0")),
      dist.mkString("\n"))
    // plain queries carry no decision section
    val none = run("EXPLAIN MATCH (n:Person) RETURN n.name AS name")
      .collect().map(_.getString(0))
    assert(!none.exists(_.contains("Procedure Path Decisions")), none.mkString("\n"))
  }

  test("EXPLAIN VERBOSE renders the extended plan (logical + physical)") {
    val lines = run("EXPLAIN VERBOSE MATCH (n:Person) RETURN n.name AS name")
      .collect().map(_.getString(0))
    assert(lines.exists(_.contains("== Optimized Logical Plan ==")), lines.mkString("\n"))
    assert(lines.exists(_.contains("== Physical Plan ==")), lines.mkString("\n"))
  }

  test("graph degree statistics") {
    val d = graph.degrees.filter("label = 'Person'")
      .orderBy("id").collect().map(r => (r.getLong(2), r.getLong(3)))
    // (out, in) per person: Alice (3,1) Bob (2,1) Carol (2,2) Dave (0,0)
    assert(d.toSeq === Seq((3L, 1L), (2L, 1L), (2L, 2L), (0L, 0L)))
  }
}
