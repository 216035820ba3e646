package graft.cypher

import org.apache.spark.sql.DataFrame

import graft.SparkTestBase
import graft.graph.MutableGraph

/** Compositional stress cases: clause/feature combinations that are easy
  * to get wrong (nested subqueries, correlated aggregation over
  * duplicates, UNION + ORDER, OPTIONAL MATCH chains, VLE + paths).
  * Each expectation is derived by hand from the seeded graph.
  */
class AdversarialSpec extends SparkTestBase {

  def rows(df: DataFrame): Seq[Seq[Any]] = df.collect().toSeq.map(_.toSeq)

  /** (:P {k})-[:R]->(:Q {k}); P1->Q1,Q2; P2->Q1; P3-> none. */
  lazy val g: MutableGraph = {
    val m = new MutableGraph("adv", spark)
    Cypher.execute(spark, m,
      """CREATE (p1:P {k: 1}), (p2:P {k: 2}), (p3:P {k: 3}),
        |(q1:Q {k: 1}), (q2:Q {k: 2}),
        |(p1)-[:R {w: 10}]->(q1), (p1)-[:R {w: 20}]->(q2),
        |(p2)-[:R {w: 30}]->(q1)""".stripMargin)
    m
  }

  test("nested subquery: EXISTS inside CALL inside WHERE") {
    // P nodes having an R-neighbor that some OTHER P also points at
    assert(rows(Cypher.execute(spark, g,
      """MATCH (p:P)
        |CALL { WITH p MATCH (p)-[:R]->(q:Q)
        |       WHERE EXISTS { (o:P)-[:R]->(q) WHERE o.k <> p.k }
        |       RETURN count(q) AS shared }
        |RETURN p.k AS k, shared ORDER BY k""".stripMargin)) ===
      Seq(Seq(1L, 1L), Seq(2L, 1L), Seq(3L, 0L)))
  }

  test("COUNT subquery over duplicated outer rows counts per row") {
    // UNWIND duplicates each P row; each copy must carry its own count
    assert(rows(Cypher.execute(spark, g,
      """MATCH (p:P) UNWIND [1, 2] AS copy
        |WITH p, copy, COUNT { (p)-[:R]->() } AS deg
        |RETURN p.k AS k, copy, deg ORDER BY k, copy""".stripMargin)) ===
      Seq(Seq(1L, 1L, 2L), Seq(1L, 2L, 2L), Seq(2L, 1L, 1L),
        Seq(2L, 2L, 1L), Seq(3L, 1L, 0L), Seq(3L, 2L, 0L)))
  }

  test("UNION parts each project; distinct dedups across parts") {
    assert(rows(Cypher.execute(spark, g,
      """MATCH (p:P) RETURN p.k AS k
        |UNION MATCH (q:Q) RETURN q.k AS k""".stripMargin))
      .map(_.head).toSet === Set(1L, 2L, 3L))
    assert(rows(Cypher.execute(spark, g,
      """MATCH (p:P) RETURN p.k AS k
        |UNION ALL MATCH (q:Q) RETURN q.k AS k""".stripMargin)).size === 5)
  }

  test("OPTIONAL MATCH chain: second optional sees first's nulls") {
    assert(rows(Cypher.execute(spark, g,
      """MATCH (p:P) OPTIONAL MATCH (p)-[:R]->(q:Q {k: 1})
        |OPTIONAL MATCH (q)-[:R]->(z)
        |RETURN p.k AS k, q.k AS qk, z IS NULL AS noz ORDER BY k""".stripMargin)) ===
      Seq(Seq(1L, 1L, true), Seq(2L, 1L, true), Seq(3L, null, true)))
  }

  test("correlated aggregation after WITH rename keeps correlation") {
    assert(rows(Cypher.execute(spark, g,
      """MATCH (p:P) WITH p.k AS pk, p AS node
        |WITH pk, COUNT { (node)-[:R]->() } AS deg
        |RETURN pk, deg ORDER BY pk""".stripMargin)) ===
      Seq(Seq(1L, 2L), Seq(2L, 1L), Seq(3L, 0L)))
  }

  test("named path through VLE with per-edge property constraint") {
    // only w=10 edges traversable: p1->q1 is the single 1-hop path
    assert(rows(Cypher.execute(spark, g,
      """MATCH pth = (p:P)-[:R*1..2 {w: 10}]->(x)
        |RETURN p.k AS k, length(pth) AS len""".stripMargin)) ===
      Seq(Seq(1L, 1L)))
  }

  test("aggregate of an arithmetic over OPTIONAL-null is null-skipping") {
    // sum skips the unmatched P3 row (w is null there)
    assert(rows(Cypher.execute(spark, g,
      """MATCH (p:P) OPTIONAL MATCH (p)-[r:R]->()
        |RETURN sum(r.w * 2) AS s""".stripMargin)) === Seq(Seq(120L)))
  }

  test("DISTINCT + ORDER + SKIP/LIMIT stack on a WITH projection") {
    assert(rows(Cypher.execute(spark, g,
      """MATCH (p:P)-[r:R]->() WITH DISTINCT p.k AS k ORDER BY k DESC
        |SKIP 1 LIMIT 1 RETURN k""".stripMargin)) === Seq(Seq(1L)))
  }

  test("EXISTS as a value in RETURN position") {
    assert(rows(Cypher.execute(spark, g,
      """MATCH (p:P) RETURN p.k AS k,
        |EXISTS { (p)-[:R]->(:Q {k: 2}) } AS hits2 ORDER BY k""".stripMargin)) ===
      Seq(Seq(1L, true), Seq(2L, false), Seq(3L, false)))
  }

  test("UNWIND a collected list round-trips with ordering") {
    assert(rows(Cypher.execute(spark, g,
      """MATCH (p:P)-[r:R]->() WITH p, collect(r.w) AS ws
        |UNWIND ws AS w RETURN p.k AS k, w ORDER BY k, w""".stripMargin)) ===
      Seq(Seq(1L, 10L), Seq(1L, 20L), Seq(2L, 30L)))
  }

  test("map projection of a renamed entity inside a subquery result") {
    val r = Cypher.execute(spark, g,
      """MATCH (p:P) WITH p AS node ORDER BY node.k LIMIT 1
        |RETURN node {.k, deg: COUNT { (node)-[:R]->() }} AS m""".stripMargin)
      .collect()(0).getStruct(0)
    assert(r.getAs[Long]("k") === 1L)
    assert(r.getAs[Long]("deg") === 2L)
  }

  test("aggregation grouped by an expression, ordered by the aggregate") {
    assert(rows(Cypher.execute(spark, g,
      """MATCH (p:P)-[r:R]->(q:Q)
        |RETURN q.k % 2 AS parity, sum(r.w) AS tot ORDER BY tot DESC""".stripMargin)) ===
      Seq(Seq(1L, 40L), Seq(0L, 20L)))
  }

  test("shortestpath between bound endpoints via WHERE-bound start") {
    assert(rows(Cypher.execute(spark, g,
      """MATCH sp = shortestpath((a:P)-[:R*..3]->(b:Q))
        |WHERE a.k = 1 AND b.k = 2
        |RETURN length(sp) AS hops""".stripMargin)) === Seq(Seq(1L)))
  }

  test("OPTIONAL MATCH after aggregation re-expands") {
    assert(rows(Cypher.execute(spark, g,
      """MATCH (q:Q) WITH count(q) AS nq
        |OPTIONAL MATCH (p:P {k: 1}) RETURN nq, p.k AS k""".stripMargin)) ===
      Seq(Seq(2L, 1L)))
  }

  test("list comprehension over collect with outer reference") {
    assert(rows(Cypher.execute(spark, g,
      """MATCH (p:P {k: 1})-[r:R]->() WITH p, collect(r.w) AS ws
        |RETURN [w IN ws WHERE w > p.k * 15 | w * 2] AS big""".stripMargin)) ===
      Seq(Seq(Seq(40L))))
  }

  test("NOT EXISTS conjunct under OR falls back to flag column") {
    // (no outgoing R) OR k=1: p1 (has R, k=1) and p3 (no R) pass
    assert(rows(Cypher.execute(spark, g,
      """MATCH (p:P) WHERE NOT EXISTS { (p)-[:R]->() } OR p.k = 1
        |RETURN p.k AS k ORDER BY k""".stripMargin)) ===
      Seq(Seq(1L), Seq(3L)))
  }

  test("updating CALL subquery runs per ROW, not per distinct key") {
    val m = new MutableGraph("advmut", spark)
    Cypher.execute(spark, m, "CREATE (:S {k: 1}), (:S {k: 2})")
    // UNWIND duplicates every row; each copy must CREATE its own node
    Cypher.execute(spark, m,
      """MATCH (s:S) UNWIND [1, 2] AS copy
        |CALL { WITH s CREATE (:Log {of: s.k}) }
        |RETURN count(*) AS n""".stripMargin)
    assert(rows(Cypher.execute(spark, m,
      "MATCH (l:Log) RETURN l.of AS o, count(*) AS n ORDER BY o")) ===
      Seq(Seq(1L, 2L), Seq(2L, 2L)))
  }

  test("chained WITHs narrow and rename without losing correlation") {
    assert(rows(Cypher.execute(spark, g,
      """MATCH (p:P) WITH p AS a WITH a AS b WITH b, b.k * 10 AS tens
        |WHERE EXISTS { (b)-[:R]->() }
        |RETURN b.k AS k, tens ORDER BY k""".stripMargin)) ===
      Seq(Seq(1L, 10L), Seq(2L, 20L)))
  }
}
