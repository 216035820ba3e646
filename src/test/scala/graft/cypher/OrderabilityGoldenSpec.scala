package graft.cypher

import graft.SparkTestBase
import graft.graph.MutableGraph
import graft.types.GraphId

/** The reference's orderability_graph regression, ported wholesale
  * (regress/sql/agtype.sql:2203-2226 / expected/agtype.out): thirteen
  * vertices whose `prop` spans every agtype rank — absent, integer,
  * float, bool, strings, two arrays, two objects, a vertex, an edge
  * and a path — ordered by `n.prop` ascending and descending. The
  * expected permutation is the reference's own output, asserted on
  * entry ids.
  */
class OrderabilityGoldenSpec extends SparkTestBase {

  private def graphWithAllRanks(): MutableGraph = {
    val m = new MutableGraph("orderability", spark)
    // created in the reference's order, so entry ids 1..13 line up with
    // agtype.out's 844424930131969..981
    Cypher.execute(spark, m,
      """CREATE (:vertex {prop: null}), (:vertex {prop: 1}),
        |  (:vertex {prop: 1.01}), (:vertex {prop: true}),
        |  (:vertex {prop: 'string'}), (:vertex {prop: 'string_2'}),
        |  (:vertex {prop: [1, 2, 3]}), (:vertex {prop: [1, 2, 3, 4, 5]}),
        |  (:vertex {prop: {bool: true, i: 0}}),
        |  (:vertex {prop: {bool: true, i: null}}),
        |  (:vertex {prop: {id: 0, label: 'v', properties: {i: 0}}::vertex}),
        |  (:vertex {prop: {id: 2, start_id: 0, end_id: 1, label: 'e',
        |            properties: {i: 0}}::edge}),
        |  (:vertex {prop: [{id: 0, label: 'v', properties: {i: 0}}::vertex,
        |            {id: 2, start_id: 0, end_id: 1, label: 'e',
        |             properties: {i: 0}}::edge,
        |            {id: 1, label: 'v', properties: {i: 0}}::vertex]::path})
        |""".stripMargin)
    m
  }

  // agtype.out ascending: path, edge, vertex, {i:0,...}, {i:null,...},
  // [1,2,3], [1,2,3,4,5], "string", "string_2", true, 1, 1.01, null-prop
  private val expectedAsc = Seq(13L, 12L, 11L, 9L, 10L, 7L, 8L, 5L, 6L, 4L, 2L, 3L, 1L)

  test("ORDER BY n.prop follows the reference's cross-rank permutation (agtype.out:2204)") {
    val m = graphWithAllRanks()
    val asc = Cypher.query(spark, m.snapshot,
      "MATCH (n:vertex) RETURN id(n) AS i ORDER BY n.prop").collect()
      .map(r => GraphId.entryId(r.getLong(0)))
    assert(asc.toSeq === expectedAsc)
    val desc = Cypher.query(spark, m.snapshot,
      "MATCH (n:vertex) RETURN id(n) AS i ORDER BY n.prop DESC").collect()
      .map(r => GraphId.entryId(r.getLong(0)))
    assert(desc.toSeq === expectedAsc.reverse)
  }

  test("container/entity property conflicts widen to the variant, not string") {
    val m = graphWithAllRanks()
    val propType = m.snapshot.vertexLabels.head.df.schema("prop").dataType
    assert(graft.types.AgVariant.isVariant(propType), propType.toString)
    // the container values survive the round-trip with their text form
    val arr = Cypher.query(spark, m.snapshot,
      "MATCH (n:vertex) WHERE n.prop = [1, 2, 3] RETURN n.prop AS p").collect()
    assert(arr.length === 1)
    assert(arr(0).getString(0) === "[1, 2, 3]")
  }
}
