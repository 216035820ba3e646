package graft.graph

import graft.SparkTestBase
import graft.cypher.Cypher

/** Unique property constraints — the write-time analogue of the
  * reference's unique index on a label (regress/sql/index.sql:30-110;
  * expected errors index.out:51/61/83). Tests mirror index.sql's
  * numbered scenarios through real Cypher mutations.
  */
class UniqueConstraintSpec extends SparkTestBase {

  private val ERR = """duplicate key value violates unique constraint "idx_uq""""

  private def freshGraph(n: String): MutableGraph = {
    val g = new MutableGraph(n, spark)
    g.addUniqueVertexConstraint("idx_uq", "idx", Seq("i"))
    g
  }

  test("Test 1: a second CREATE with the same value violates") {
    val g = freshGraph("uq1")
    Cypher.execute(spark, g, "CREATE (:idx {i: 1})")
    val e = intercept[IllegalStateException](
      Cypher.execute(spark, g, "CREATE (:idx {i: 1})"))
    assert(e.getMessage === ERR)
    // the failed statement must not have written anything
    assert(Cypher.execute(spark, g,
      "MATCH (n:idx) RETURN count(*) AS n").collect()(0).getLong(0) === 1L)
  }

  test("Test 2: duplicates WITHIN one CREATE statement violate") {
    val g = freshGraph("uq2")
    val e = intercept[IllegalStateException](
      Cypher.execute(spark, g, "CREATE (:idx {i: 1}), (:idx {i: 1})"))
    assert(e.getMessage === ERR)
  }

  test("Test 3: SET that creates a collision violates, atomically") {
    val g = freshGraph("uq3")
    Cypher.execute(spark, g, "CREATE (:idx {i: 1})")
    Cypher.execute(spark, g, "CREATE (:idx)") // null exempt (PG NULLS DISTINCT)
    val e = intercept[IllegalStateException](
      Cypher.execute(spark, g, "MATCH (n:idx) SET n.i = 1"))
    assert(e.getMessage === ERR)
  }

  test("Tests 4/6: delete or re-SET frees the value for reuse") {
    val g = freshGraph("uq4")
    Cypher.execute(spark, g, "CREATE (:idx {i: 1})")
    Cypher.execute(spark, g, "MATCH (n:idx) DETACH DELETE n")
    Cypher.execute(spark, g, "CREATE (:idx {i: 1})") // ok again (Test 4)
    Cypher.execute(spark, g, "MATCH (n:idx) SET n.i = 2") // Test 6
    Cypher.execute(spark, g, "CREATE (:idx {i: 1})") // old value free again
    assert(Cypher.execute(spark, g,
      "MATCH (n:idx) RETURN count(*) AS n").collect()(0).getLong(0) === 2L)
  }

  test("declaring a constraint over existing duplicate data fails (index build)") {
    val g = new MutableGraph("uq5", spark)
    Cypher.execute(spark, g, "CREATE (:idx {i: 7}), (:idx {i: 7})")
    val e = intercept[IllegalStateException](
      g.addUniqueVertexConstraint("idx_uq", "idx", Seq("i")))
    assert(e.getMessage === ERR)
  }

  test("value-equality across numeric classes collides (agtype btree equality)") {
    val g = freshGraph("uq6")
    Cypher.execute(spark, g, "CREATE (:idx {i: 2})")
    // 2.0 equals 2 under agtype comparison — the variant-encoded column
    // groups by the class-insensitive order key
    val e = intercept[IllegalStateException](
      Cypher.execute(spark, g, "CREATE (:idx {i: 2.0})"))
    assert(e.getMessage === ERR)
  }

  test("multiple NULLs coexist; other labels unaffected") {
    val g = freshGraph("uq7")
    Cypher.execute(spark, g, "CREATE (:idx), (:idx)")
    Cypher.execute(spark, g, "CREATE (:other {i: 1}), (:other {i: 1})")
    assert(Cypher.execute(spark, g,
      "MATCH (n) RETURN count(*) AS n").collect()(0).getLong(0) === 4L)
  }

  test("appending a small batch to a large constrained label shuffles the batch only") {
    val g = new MutableGraph("uq_scale", spark)
    // a "large" existing label: 100k rows with unique i — appended before
    // the constraint exists, so the only O(label) pass is the one-time
    // constraint build (the analogue of PG's CREATE UNIQUE INDEX scan)
    val big = spark.range(100000).selectExpr("id", "id AS i")
    g.appendVertices("big", big, 100000L)
    g.addUniqueVertexConstraint("big_uq", "big", Seq("i"))
    g.lastUniqueProbePlan = ""
    Cypher.execute(spark, g, "CREATE (:big {i: -1})")
    val plan = g.lastUniqueProbePlan
    assert(plan.nonEmpty, "constrained append must run the existing-rows probe")
    // the probe must broadcast the batch's keys and stream the existing
    // label without repartitioning it — no full-label Exchange
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
      s"existing-rows uniqueness probe must not shuffle the label:\n$plan")
    // and a conflicting value is still caught through that plan
    val e = intercept[IllegalStateException](
      Cypher.execute(spark, g, "CREATE (:big {i: 41})"))
    assert(e.getMessage === """duplicate key value violates unique constraint "big_uq"""")
  }

  test("multi-property tuples: only the full tuple must be unique") {
    val g = new MutableGraph("uq8", spark)
    g.addUniqueVertexConstraint("pair_uq", "p", Seq("a", "b"))
    Cypher.execute(spark, g, "CREATE (:p {a: 1, b: 1}), (:p {a: 1, b: 2})")
    val e = intercept[IllegalStateException](
      Cypher.execute(spark, g, "CREATE (:p {a: 1, b: 2})"))
    assert(e.getMessage === """duplicate key value violates unique constraint "pair_uq"""")
  }

  test("multi-key SET validates the end-of-statement state, not transients") {
    // PG applies every SET item to the tuple and the heap update fires
    // the constraint once; `SET n.b = 1, n.a = 2` on (1,2) passes even
    // though setting b alone would transiently collide with (1,1)
    val g = new MutableGraph("uq9", spark)
    g.addUniqueVertexConstraint("pair_uq", "p", Seq("a", "b"))
    Cypher.execute(spark, g, "CREATE (:p {a: 1, b: 1}), (:p {a: 1, b: 2})")
    Cypher.execute(spark, g,
      "MATCH (n:p) WHERE n.b = 2 SET n.b = 1, n.a = 2")
    val rows = Cypher.execute(spark, g,
      "MATCH (n:p) RETURN n.a AS a, n.b AS b ORDER BY a, b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows === Seq((1L, 1L), (2L, 1L)))
    // and a multi-key SET that truly collides at end of statement fails
    val e = intercept[IllegalStateException](
      Cypher.execute(spark, g,
        "MATCH (n:p) WHERE n.a = 2 SET n.b = 1, n.a = 1"))
    assert(e.getMessage === """duplicate key value violates unique constraint "pair_uq"""")
  }

  test("MERGE ON MATCH SET validates the end-of-statement state, not transients") {
    // the deferred multi-property batch applies to ON CREATE / ON MATCH
    // items exactly like plain SET: `ON MATCH SET n.b = 1, n.a = 2` on
    // (1,2) passes even though setting b alone would transiently collide
    // with the existing (1,1)
    val g = new MutableGraph("uq10", spark)
    g.addUniqueVertexConstraint("pair_uq", "p", Seq("a", "b"))
    Cypher.execute(spark, g, "CREATE (:p {a: 1, b: 1, k: 1}), (:p {a: 1, b: 2, k: 2})")
    Cypher.execute(spark, g,
      "MERGE (n:p {k: 2}) ON MATCH SET n.b = 1, n.a = 2")
    val rows = Cypher.execute(spark, g,
      "MATCH (n:p) RETURN n.a AS a, n.b AS b ORDER BY a, b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows === Seq((1L, 1L), (2L, 1L)))
    // a genuinely colliding ON MATCH SET still fails
    val e = intercept[IllegalStateException](
      Cypher.execute(spark, g,
        "MERGE (n:p {k: 2}) ON MATCH SET n.b = 1, n.a = 1"))
    assert(e.getMessage === """duplicate key value violates unique constraint "pair_uq"""")
    // ON CREATE SET batches the same way
    Cypher.execute(spark, g,
      "MERGE (n:p {k: 3}) ON CREATE SET n.a = 7, n.b = 7")
    val r3 = Cypher.execute(spark, g,
      "MATCH (n:p {k: 3}) RETURN n.a AS a, n.b AS b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(r3 === Seq((7L, 7L)))
  }
}
