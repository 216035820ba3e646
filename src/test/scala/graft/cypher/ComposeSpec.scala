package graft.cypher

import org.apache.spark.sql.DataFrame

import graft.SparkTestBase
import graft.graph.{EdgeLabel, PropertyGraph, VertexLabel}
import graft.types.GraphId

/** Adversarial clause-composition tests: projection barriers around
  * aggregation, re-MATCH after WITH, UNWIND of collected lists,
  * DISTINCT on entities, ordered aggregation inputs — the seams where
  * clause-chain planners typically break.
  */
class ComposeSpec extends SparkTestBase {
  import spark.implicits._

  val PersonL = 1; val KnowsL = 10
  def pid(i: Long) = GraphId.make(PersonL, i)

  lazy val graph: PropertyGraph = {
    val people = Seq(
      (pid(1), "Alice", 30L), (pid(2), "Bob", 25L),
      (pid(3), "Carol", 35L), (pid(4), "Dave", 25L)
    ).toDF("id", "name", "age")
    val knows = Seq(
      (GraphId.make(KnowsL, 1), pid(1), pid(2)),
      (GraphId.make(KnowsL, 2), pid(2), pid(3)),
      (GraphId.make(KnowsL, 3), pid(1), pid(3)),
      (GraphId.make(KnowsL, 4), pid(3), pid(1))
    ).toDF("id", "start_id", "end_id")
    new PropertyGraph("c",
      Seq(VertexLabel("Person", PersonL, people)),
      Seq(EdgeLabel("KNOWS", KnowsL, knows)))
  }

  def rows(q: String): Seq[Seq[Any]] =
    Cypher.query(spark, graph, q).collect().toSeq.map(_.toSeq)

  test("WITH aggregate then re-MATCH on the aggregated variable") {
    // count friends per person, then re-expand to friend names
    assert(rows(
      """MATCH (a:Person)-[:KNOWS]->(b)
        |WITH a, count(b) AS deg WHERE deg >= 2
        |MATCH (a)-[:KNOWS]->(f)
        |RETURN a.name AS name, deg, f.name AS friend ORDER BY friend""".stripMargin) ===
      Seq(Seq("Alice", 2L, "Bob"), Seq("Alice", 2L, "Carol")))
  }

  test("UNWIND of a collected list round-trips") {
    assert(rows(
      """MATCH (a:Person) WITH collect(a.name) AS names
        |UNWIND names AS n RETURN n ORDER BY n""".stripMargin) ===
      Seq(Seq("Alice"), Seq("Bob"), Seq("Carol"), Seq("Dave")))
  }

  test("DISTINCT on entity variables") {
    // Alice is reachable twice at depth <= 2; DISTINCT collapses
    assert(rows(
      """MATCH (:Person)-[:KNOWS]->(b:Person)
        |RETURN DISTINCT b.name AS name ORDER BY name""".stripMargin) ===
      Seq(Seq("Alice"), Seq("Bob"), Seq("Carol")))
  }

  test("aggregate with a computed group key expression") {
    assert(rows(
      """MATCH (p:Person)
        |RETURN p.age % 2 = 1 AS odd, count(*) AS n, min(p.age) AS youngest
        |ORDER BY odd""".stripMargin) ===
      Seq(Seq(false, 1L, 30L), Seq(true, 3L, 25L)))
  }

  test("chained WITHs rename and filter") {
    assert(rows(
      """MATCH (p:Person) WITH p.name AS n, p.age AS a
        |WITH n, a * 2 AS a2 WHERE a2 > 55
        |RETURN n, a2 ORDER BY n""".stripMargin) ===
      Seq(Seq("Alice", 60L), Seq("Carol", 70L)))
  }

  test("ORDER BY expression not in projection") {
    assert(rows(
      "MATCH (p:Person) RETURN p.name AS name ORDER BY p.age DESC, p.name LIMIT 2") ===
      Seq(Seq("Carol"), Seq("Alice")))
  }

  test("multiple MATCH clauses cross join then correlate") {
    assert(rows(
      """MATCH (a:Person {name: 'Alice'}) MATCH (b:Person {name: 'Carol'})
        |MATCH (a)-[:KNOWS]->(b) RETURN a.name AS x, b.name AS y""".stripMargin) ===
      Seq(Seq("Alice", "Carol")))
  }

  test("OPTIONAL MATCH preserves unmatched rows with nulls") {
    assert(rows(
      """MATCH (p:Person) OPTIONAL MATCH (p)-[:KNOWS]->(f {name: 'Carol'})
        |RETURN p.name AS name, f.name AS friend ORDER BY name""".stripMargin) ===
      Seq(Seq("Alice", "Carol"), Seq("Bob", "Carol"),
        Seq("Carol", null), Seq("Dave", null)))
  }

  test("OPTIONAL MATCH WHERE folds into the optional join") {
    // the WHERE belongs to the optional side: when no candidate match
    // passes it, the incoming row survives with nulls (not dropped)
    assert(rows(
      """MATCH (p:Person) OPTIONAL MATCH (p)-[:KNOWS]->(f) WHERE f.age > 100
        |RETURN p.name AS name, f.name AS friend ORDER BY name""".stripMargin) ===
      Seq(Seq("Alice", null), Seq("Bob", null), Seq("Carol", null), Seq("Dave", null)))
    // and when some candidates pass, only those bind
    assert(rows(
      """MATCH (p:Person {name: 'Alice'}) OPTIONAL MATCH (p)-[:KNOWS]->(f)
        |WHERE f.age > 26 RETURN f.name AS friend""".stripMargin) ===
      Seq(Seq("Carol")))
  }

  test("MATCH on a never-created label matches nothing, not an error") {
    assert(rows("MATCH (n:Missing) RETURN n.name AS x") === Nil)
    assert(rows("MATCH (a:Person)-[:NO_SUCH]->(b) RETURN a.name AS x") === Nil)
    // OPTIONAL over an unknown edge label keeps the incoming rows
    assert(rows(
      """MATCH (p:Person {name: 'Dave'}) OPTIONAL MATCH (p)-[:NO_SUCH]->(f)
        |RETURN p.name AS name, f AS friend""".stripMargin) ===
      Seq(Seq("Dave", null)))
  }

  test("unmatched OPTIONAL entity returns NULL, not a struct of nulls") {
    val r = Cypher.query(spark, graph,
      """MATCH (p:Person {name: 'Dave'}) OPTIONAL MATCH (p)-[:KNOWS]->(f)
        |RETURN f""".stripMargin).collect()(0)
    assert(r.isNullAt(0))
  }

  test("UNION distinct vs UNION ALL") {
    assert(rows(
      """MATCH (p:Person {name: 'Alice'}) RETURN p.name AS n
        |UNION MATCH (p:Person {name: 'Alice'}) RETURN p.name AS n""".stripMargin) ===
      Seq(Seq("Alice")))
    assert(rows(
      """MATCH (p:Person {name: 'Alice'}) RETURN p.name AS n
        |UNION ALL MATCH (p:Person {name: 'Alice'}) RETURN p.name AS n""".stripMargin)
      .size === 2)
  }

  test("UNWIND nodes(p)/relationships(p) rebinds full entities") {
    assert(rows(
      """MATCH p = (:Person {name: 'Alice'})-[:KNOWS]->(:Person {name: 'Bob'})
        |UNWIND nodes(p) AS n RETURN n.name AS name ORDER BY name""".stripMargin) ===
      Seq(Seq("Alice"), Seq("Bob")))
    assert(rows(
      """MATCH p = (:Person {name: 'Alice'})-[:KNOWS]->(:Person {name: 'Bob'})
        |UNWIND relationships(p) AS r RETURN type(r) AS t""".stripMargin) ===
      Seq(Seq("KNOWS")))
  }

  test("RETURN nodes(p)/relationships(p) materializes full entities in order") {
    val r = Cypher.query(spark, graph,
      """MATCH p = (:Person {name: 'Alice'})-[:KNOWS]->(:Person {name: 'Bob'})
        |RETURN nodes(p) AS ns, relationships(p) AS rs""".stripMargin).collect()(0)
    val ns = r.getSeq[org.apache.spark.sql.Row](0)
    assert(ns.map(_.getAs[org.apache.spark.sql.Row]("properties")
      .getAs[String]("name")) === Seq("Alice", "Bob"))
    val rs = r.getSeq[org.apache.spark.sql.Row](1)
    assert(rs.map(_.getAs[String]("label")) === Seq("KNOWS"))
  }

  test("entity HOFs over paths in WHERE: all(n IN nodes(p) ...)") {
    assert(rows(
      """MATCH p = (:Person)-[:KNOWS]->(:Person)
        |WHERE all(n IN nodes(p) WHERE n.age >= 30)
        |RETURN size(nodes(p)) AS n""".stripMargin) ===
      // only a(30)->c(35) and c(35)->a(30) qualify (b=25 excluded)
      Seq(Seq(2L), Seq(2L)))
  }

  test("collect respects an upstream WITH ORDER BY") {
    assert(rows(
      """MATCH (p:Person) WITH p ORDER BY p.age DESC, p.name
        |RETURN collect(p.name) AS names""".stripMargin) ===
      Seq(Seq(Seq("Carol", "Alice", "Bob", "Dave"))))
  }

  test("aggregation without grouping keys over empty match yields one row") {
    assert(rows("MATCH (p:Person {name: 'Nobody'}) RETURN count(p) AS n") ===
      Seq(Seq(0L)))
  }
}
