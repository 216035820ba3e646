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
