package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase
import graft.cypher.Cypher
import graft.graph.MutableGraph
import graft.types.GraphId

case class UserRow(uid: Long, name: String, score: Long, seq: Long)
case class FollowRow(src: Long, dst: Long, weight: Long)

class GraphIngestSpec extends SparkTestBase {
  import spark.implicits._

  def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  test("vertex merge: create-if-absent, last-writer-wins update, batch replay converges") {
    val g = new MutableGraph("ingest1", spark)
    val b1 = Seq(
      UserRow(1, "ann", 10, 100), UserRow(2, "bob", 20, 100),
      UserRow(1, "ann", 11, 101) // same key twice in one batch: seq 101 wins
    ).toDF()
    GraphIngest.mergeVertexBatch(g, "User", "uid", b1, seqCol = Some("seq"))
    assert(rows(Cypher.execute(spark, g,
      "MATCH (u:User) RETURN u.uid AS uid, u.score AS score ORDER BY uid")) ===
      Seq(Seq(1L, 11L), Seq(2L, 20L)))

    // second batch: one update (uid 1), one create (uid 3)
    val b2 = Seq(UserRow(1, "ann2", 12, 200), UserRow(3, "cat", 30, 200)).toDF()
    GraphIngest.mergeVertexBatch(g, "User", "uid", b2, seqCol = Some("seq"))
    assert(rows(Cypher.execute(spark, g,
      "MATCH (u:User) RETURN u.uid AS uid, u.name AS name, u.score AS score ORDER BY uid")) ===
      Seq(Seq(1L, "ann2", 12L), Seq(2L, "bob", 20L), Seq(3L, "cat", 30L)))

    // at-least-once replay of b2: no duplicate vertices, same final state
    GraphIngest.mergeVertexBatch(g, "User", "uid", b2, seqCol = Some("seq"))
    assert(rows(Cypher.execute(spark, g,
      "MATCH (u:User) RETURN count(*) AS n, sum(u.score) AS s")) === Seq(Seq(3L, 62L)))
  }

  test("edge merge resolves endpoints by key, skips unknowns, dedups pairs") {
    val g = new MutableGraph("ingest2", spark)
    GraphIngest.mergeVertexBatch(g, "User", "uid",
      Seq(UserRow(1, "a", 0, 0), UserRow(2, "b", 0, 0), UserRow(3, "c", 0, 0)).toDF())
    val edges = Seq(
      FollowRow(1, 2, 5), FollowRow(1, 2, 5), // in-batch duplicate pair
      FollowRow(2, 3, 7),
      FollowRow(1, 99, 1) // unknown endpoint: dropped
    ).toDF()
    GraphIngest.mergeEdgeBatch(g, "FOLLOWS", ("User", "uid"), ("User", "uid"),
      edges, "src", "dst")
    assert(rows(Cypher.execute(spark, g,
      """MATCH (a:User)-[f:FOLLOWS]->(b:User)
        |RETURN a.uid AS s, b.uid AS d ORDER BY s, d""".stripMargin)) ===
      Seq(Seq(1L, 2L), Seq(2L, 3L)))
    // replay: MERGE semantics, still two edges
    GraphIngest.mergeEdgeBatch(g, "FOLLOWS", ("User", "uid"), ("User", "uid"),
      edges, "src", "dst")
    assert(rows(Cypher.execute(spark, g,
      "MATCH ()-[f:FOLLOWS]->() RETURN count(*) AS n")) === Seq(Seq(2L)))
  }

  test("ids are label-packed and dense across batches") {
    val g = new MutableGraph("ingest3", spark)
    GraphIngest.mergeVertexBatch(g, "User", "uid", Seq(UserRow(1, "a", 0, 0)).toDF())
    GraphIngest.mergeVertexBatch(g, "User", "uid", Seq(UserRow(2, "b", 0, 0)).toDF())
    val ids = Cypher.execute(spark, g, "MATCH (u:User) RETURN id(u) AS i ORDER BY i")
      .collect().map(_.getLong(0))
    assert(ids.length === 2)
    assert(ids.map(GraphId.labelId).distinct.length === 1)
    assert(ids.map(GraphId.entryId).toSeq === Seq(1L, 2L))
  }

  test("streaming ingestion: memory stream micro-batches build the graph continuously") {
    implicit val sq = spark.sqlContext
    val g = new MutableGraph("ingest4", spark)
    val ms = MemoryStream[UserRow]
    val q = GraphIngest.startVertexIngest(ms.toDF(), g, "User", "uid",
      seqCol = Some("seq"))
    try {
      ms.addData(UserRow(1, "ann", 10, 1), UserRow(2, "bob", 20, 1))
      q.processAllAvailable()
      assert(rows(Cypher.execute(spark, g,
        "MATCH (u:User) RETURN count(*) AS n")) === Seq(Seq(2L)))
      // a later micro-batch updates uid 1 and adds uid 3
      ms.addData(UserRow(1, "ann", 99, 2), UserRow(3, "cat", 30, 2))
      q.processAllAvailable()
      assert(rows(Cypher.execute(spark, g,
        "MATCH (u:User) RETURN u.uid AS uid, u.score AS score ORDER BY uid")) ===
        Seq(Seq(1L, 99L), Seq(2L, 20L), Seq(3L, 30L)))
    } finally q.stop()
  }

  test("merging a small batch into a large label streams the label, no shuffle") {
    val g = new MutableGraph("ingest_scale", spark)
    val lid = g.vertexLabelId("User").toLong << GraphId.EntryIdBits
    g.appendVertices("User",
      spark.range(100000).selectExpr(s"id + ${lid + 1} AS id", "id AS uid",
        "CAST(0 AS LONG) AS score"),
      100000L)
    GraphIngest.lastMergeProbePlan = ""
    GraphIngest.mergeVertexBatch(g, "User", "uid",
      Seq((5L, 7L), (200000L, 9L)).toDF("uid", "score"))
    val plan = GraphIngest.lastMergeProbePlan
    assert(plan.nonEmpty, "non-empty-label merge must run the create probe")
    // the 100k label streams through broadcast joins (present-keys semi +
    // create anti); a sort-merge join would mean the label was shuffled
    // (hash exchanges remain only on the batch's own dedup, which is
    // batch-sized by construction)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    val n = Cypher.execute(spark, g.asInstanceOf[MutableGraph],
      "MATCH (u:User) RETURN count(*) AS n, sum(u.score) AS s").collect()(0)
    assert(n.getLong(0) === 100001L) // one create
    assert(n.getLong(1) === 16L)     // 7 updated onto uid 5, 9 created
  }

  test("streaming edge ingestion resolves endpoints across micro-batches") {
    implicit val sq = spark.sqlContext
    val g = new MutableGraph("ingest6", spark)
    GraphIngest.mergeVertexBatch(g, "User", "uid",
      Seq(UserRow(1, "a", 0, 0), UserRow(2, "b", 0, 0), UserRow(3, "c", 0, 0)).toDF())
    val ms = MemoryStream[FollowRow]
    val q = GraphIngest.startEdgeIngest(ms.toDF(), g, "FOLLOWS",
      ("User", "uid"), ("User", "uid"), "src", "dst")
    try {
      ms.addData(FollowRow(1, 2, 1))
      q.processAllAvailable()
      ms.addData(FollowRow(2, 3, 1), FollowRow(1, 2, 9)) // second batch replays pair 1->2
      q.processAllAvailable()
      assert(rows(Cypher.execute(spark, g,
        """MATCH (a:User)-[:FOLLOWS]->(b:User)
          |RETURN a.uid AS s, b.uid AS d ORDER BY s, d""".stripMargin)) ===
        Seq(Seq(1L, 2L), Seq(2L, 3L)))
    } finally q.stop()
  }

  test("batch properties named like entity columns, or dotted, store without collision") {
    val g = new MutableGraph("ingest_enc", spark)
    // a property literally named "id" must NOT be mistaken for the graph
    // id (merge key or payload), and a dotted key must survive the selects
    val b1 = Seq((10L, "x", 1L), (20L, "y", 2L)).toDF("id", "a.b", "seq")
    GraphIngest.mergeVertexBatch(g, "Item", "id", b1, seqCol = Some("seq"))
    assert(rows(Cypher.execute(spark, g,
      "MATCH (i:Item) RETURN i.id AS k, i.`a.b` AS ab ORDER BY k")) ===
      Seq(Seq(10L, "x"), Seq(20L, "y")))
    // update via the same reserved-name merge key; graph ids stay distinct
    // from the property
    val b2 = Seq((10L, "x2", 3L), (30L, "z", 3L)).toDF("id", "a.b", "seq")
    GraphIngest.mergeVertexBatch(g, "Item", "id", b2, seqCol = Some("seq"))
    assert(rows(Cypher.execute(spark, g,
      "MATCH (i:Item) RETURN i.id AS k, i.`a.b` AS ab, id(i) <> i.id AS neq ORDER BY k")) ===
      Seq(Seq(10L, "x2", true), Seq(20L, "y", true), Seq(30L, "z", true)))
    // edge batch carrying a property named start_id: stored as a property,
    // not the endpoint column
    GraphIngest.mergeEdgeBatch(g, "REL", ("Item", "id"), ("Item", "id"),
      Seq((10L, 20L, 777L)).toDF("s", "d", "start_id"), "s", "d")
    assert(rows(Cypher.execute(spark, g,
      """MATCH (a:Item)-[r:REL]->(b:Item)
        |RETURN a.id AS s, b.id AS d, r.start_id AS p""".stripMargin)) ===
      Seq(Seq(10L, 20L, 777L)))
  }

  test("surge batches above the broadcast row limit degrade to a shuffled probe") {
    val g = new MutableGraph("ingest_surge", spark)
    val lid = g.vertexLabelId("User").toLong << GraphId.EntryIdBits
    g.appendVertices("User",
      spark.range(1000).selectExpr(s"id + ${lid + 1} AS id", "id AS uid",
        "CAST(0 AS LONG) AS score"),
      1000L)
    // force the fallback: tiny row limit + no planner auto-broadcast, so
    // the executed plan provably takes the shuffled path
    spark.conf.set("spark.graft.ingest.broadcastRowLimit", "1")
    val prevAuto = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      GraphIngest.lastMergeProbePlan = ""
      val batch = Seq((5L, 7L), (2000L, 9L)).toDF("uid", "score")
      GraphIngest.mergeVertexBatch(g, "User", "uid", batch)
      val plan = GraphIngest.lastMergeProbePlan
      assert(plan.nonEmpty)
      assert(!plan.contains("BroadcastHashJoin"), plan)
      // merge is still correct through the shuffled path...
      val r = Cypher.execute(spark, g,
        "MATCH (u:User) RETURN count(*) AS n, sum(u.score) AS s").collect()(0)
      assert(r.getLong(0) === 1001L)
      assert(r.getLong(1) === 16L)
      // ...and replay stays idempotent
      GraphIngest.mergeVertexBatch(g, "User", "uid", batch)
      val r2 = Cypher.execute(spark, g,
        "MATCH (u:User) RETURN count(*) AS n, sum(u.score) AS s").collect()(0)
      assert(r2.getLong(0) === 1001L)
      assert(r2.getLong(1) === 16L)
      assert(GraphIngest.lastMetrics("User").exists(m => !m.broadcastProbe))
    } finally {
      spark.conf.unset("spark.graft.ingest.broadcastRowLimit")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevAuto)
    }
  }

  test("per-batch metrics report rows in, creates, updates, and probe mode") {
    GraphIngest.resetMetrics()
    val g = new MutableGraph("ingest_metrics", spark)
    GraphIngest.mergeVertexBatch(g, "User", "uid",
      Seq(UserRow(1, "a", 1, 1), UserRow(2, "b", 2, 1), UserRow(1, "a2", 3, 2)).toDF(),
      seqCol = Some("seq"))
    val m1 = GraphIngest.lastMetrics("User").get
    assert((m1.rowsIn, m1.distinctKeys, m1.created, m1.updated) === ((3L, 2L, 2L, 0L)))
    assert(m1.broadcastProbe)
    GraphIngest.mergeVertexBatch(g, "User", "uid",
      Seq(UserRow(1, "a3", 9, 3), UserRow(3, "c", 4, 3)).toDF(), seqCol = Some("seq"))
    val m2 = GraphIngest.lastMetrics("User").get
    assert((m2.rowsIn, m2.distinctKeys, m2.created, m2.updated) === ((2L, 2L, 1L, 1L)))
    // edge batch: 2 resolved pairs, then a replay that matches both
    GraphIngest.mergeEdgeBatch(g, "F", ("User", "uid"), ("User", "uid"),
      Seq(FollowRow(1, 2, 0), FollowRow(2, 3, 0)).toDF(), "src", "dst")
    val e1 = GraphIngest.lastMetrics("F").get
    assert((e1.rowsIn, e1.distinctKeys, e1.created, e1.updated) === ((2L, 2L, 2L, 0L)))
    GraphIngest.mergeEdgeBatch(g, "F", ("User", "uid"), ("User", "uid"),
      Seq(FollowRow(1, 2, 0)).toDF(), "src", "dst")
    val e2 = GraphIngest.lastMetrics("F").get
    assert((e2.created, e2.updated) === ((0L, 1L)))
    assert(GraphIngest.recentMetrics.count(_.label == "User") === 2)
    // the metrics ring is CALL-able from Cypher (YIELD + WHERE work)
    val viaCypher = Cypher.execute(spark, g,
      """CALL ingest_stats() YIELD label, created, updated
        |WHERE label = 'F' RETURN label, created, updated""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(viaCypher === Seq(("F", 2L, 0L), ("F", 0L, 1L)))
    // the procedure scopes to ITS graph: another graph ingesting the same
    // label names doesn't interleave
    val g2 = new MutableGraph("ingest_metrics_other", spark)
    GraphIngest.mergeVertexBatch(g2, "User", "uid",
      Seq(UserRow(9, "z", 9, 1)).toDF())
    val scoped = Cypher.execute(spark, g,
      "CALL ingest_stats() YIELD label RETURN count(*) AS n")
      .collect()(0).getLong(0)
    assert(scoped === 4L) // g's 2 vertex + 2 edge batches only
    // a dropped edge batch (endpoint key column missing) is still visible
    GraphIngest.mergeEdgeBatch(g2, "F", ("User", "nosuchkey"), ("User", "uid"),
      Seq(FollowRow(9, 9, 0)).toDF(), "src", "dst")
    val dropped = GraphIngest.lastMetrics("F").get
    assert((dropped.graph, dropped.rowsIn, dropped.created) === (("ingest_metrics_other", 1L, 0L)))
  }

  test("edge merge supports srcKeyCol == dstKeyCol (self-loop batches)") {
    val g = new MutableGraph("ingest_selfloop", spark)
    GraphIngest.mergeVertexBatch(g, "User", "uid",
      Seq(UserRow(1, "a", 0, 0), UserRow(2, "b", 0, 0)).toDF())
    GraphIngest.mergeEdgeBatch(g, "SELF", ("User", "uid"), ("User", "uid"),
      Seq(Tuple1(1L), Tuple1(2L)).toDF("k"), "k", "k")
    assert(rows(Cypher.execute(spark, g,
      """MATCH (a:User)-[:SELF]->(b:User)
        |RETURN a.uid AS s, b.uid AS d ORDER BY s""".stripMargin)) ===
      Seq(Seq(1L, 1L), Seq(2L, 2L)))
  }

  test("soak: ingest batches interleaved with Cypher mutations match sequential replay") {
    val g = new MutableGraph("ingest_soak", spark)
    g.addUniqueVertexConstraint("u_uid", "User", Seq("uid"))
    // interleave streaming-style merges with Cypher SET / MERGE / CREATE
    // on the same label, then check the final state against an oracle
    // computed by replaying the same operations per-key on the driver
    val oracle = scala.collection.mutable.Map.empty[Long, (String, Long)]
    def ingest(rs: (Long, String, Long)*): Unit = {
      GraphIngest.mergeVertexBatch(g, "User", "uid",
        rs.map { case (u, n, s) => UserRow(u, n, s, s) }.toDF(), seqCol = Some("seq"))
      rs.foreach { case (u, n, s) => oracle(u) = (n, s) }
    }
    def cySet(uid: Long, score: Long): Unit = {
      Cypher.execute(spark, g,
        s"MATCH (u:User {uid: $uid}) SET u.score = $score").collect()
      oracle.get(uid).foreach { case (n, _) => oracle(uid) = (n, score) }
    }
    def cyMerge(uid: Long, name: String): Unit = {
      Cypher.execute(spark, g,
        s"""MERGE (u:User {uid: $uid})
           |ON CREATE SET u.name = '$name', u.score = 0
           |ON MATCH SET u.name = '$name'""".stripMargin).collect()
      oracle(uid) = (name, oracle.get(uid).map(_._2).getOrElse(0L))
    }
    ingest((1, "a", 1), (2, "b", 1), (3, "c", 1))
    cySet(2, 50)
    ingest((2, "b2", 2), (4, "d", 2)) // overwrites the Cypher SET on uid 2
    cyMerge(5, "e")                   // creates via Cypher
    cyMerge(3, "c2")                  // matches an ingested vertex
    ingest((5, "e2", 3))              // updates the Cypher-created vertex
    cySet(4, 99)
    val got = Cypher.execute(spark, g,
      "MATCH (u:User) RETURN u.uid AS uid, u.name AS name, u.score AS score ORDER BY uid")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got === oracle.toMap)
    // the unique constraint held throughout: one vertex per uid
    assert(rows(Cypher.execute(spark, g,
      "MATCH (u:User) RETURN count(*) AS n")) === Seq(Seq(oracle.size.toLong)))
  }

  test("ingest survives durable commit + reload: ids resume, replay converges") {
    // the recovery path a real deployment runs: micro-batches land,
    // the store commits durably, the process dies, a new store resumes
    // from the manifest — id allocation must continue from the recorded
    // sequence state and an at-least-once replay of the last batch must
    // not duplicate entities
    val dir = java.nio.file.Files.createTempDirectory("graft_ingest_commit").toString
    val g1 = new MutableGraph("ingestdur", spark)
    val b1 = Seq(UserRow(1, "a", 1, 1), UserRow(2, "b", 2, 1)).toDF()
    GraphIngest.mergeVertexBatch(g1, "User", "uid", b1, seqCol = Some("seq"))
    graft.graph.GraphStore.commitAndRebind(g1, dir)
    val b2 = Seq(UserRow(2, "b2", 9, 2), UserRow(3, "c", 3, 2)).toDF()
    GraphIngest.mergeVertexBatch(g1, "User", "uid", b2, seqCol = Some("seq"))
    graft.graph.GraphStore.commitAndRebind(g1, dir)

    // "crash": resume a fresh store from the durable manifest
    val g2 = graft.graph.GraphStore.loadMutableVersion(spark, dir)
    // replay of the last batch (at-least-once delivery across restart)
    GraphIngest.mergeVertexBatch(g2, "User", "uid", b2, seqCol = Some("seq"))
    // and a new batch: created ids must continue past the committed ones
    GraphIngest.mergeVertexBatch(g2, "User", "uid",
      Seq(UserRow(4, "d", 4, 3)).toDF(), seqCol = Some("seq"))
    val out = Cypher.execute(spark, g2,
      "MATCH (u:User) RETURN u.uid AS uid, u.name AS name, id(u) AS i ORDER BY uid")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.map(t => (t._1, t._2)).toSeq ===
      Seq((1L, "a"), (2L, "b2"), (3L, "c"), (4L, "d")))
    // ids are unique and dense across the restart boundary
    val entries = out.map(t => graft.types.GraphId.entryId(t._3)).sorted
    assert(entries.toSeq === Seq(1L, 2L, 3L, 4L))
  }

  test("unique constraints hold under merged ingestion") {
    val g = new MutableGraph("ingest5", spark)
    g.addUniqueVertexConstraint("u_name", "User", Seq("name"))
    GraphIngest.mergeVertexBatch(g, "User", "uid",
      Seq(UserRow(1, "ann", 0, 0), UserRow(2, "bob", 0, 0)).toDF())
    // a DIFFERENT key with a conflicting unique prop must be rejected
    val e = intercept[Exception] {
      GraphIngest.mergeVertexBatch(g, "User", "uid",
        Seq(UserRow(3, "ann", 0, 0)).toDF())
    }
    assert(e.getMessage.toLowerCase.contains("unique"))
  }
}
