package graft.plans

import org.apache.spark.sql.SparkSession

import graft.SparkTestBase
import graft.graph.TpchGraph

/** The SQL-callable cypher() table function (SparkSessionExtensions +
  * resolution rule) — parity with the reference's entry point
  * `SELECT * FROM cypher('g', $$...$$)` (sql/age_query.sql:49-54). */
class ExtensionsSpec extends SparkTestBase {

  /** A second session over the shared SparkContext with the graft
    * extensions installed (extensions bind at session construction). */
  lazy val extSession: SparkSession = {
    val base = spark // force shared context init
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    SparkSession.setDefaultSession(base)
    SparkSession.setActiveSession(base)
    s
  }

  test("SELECT * FROM cypher('g', query) resolves through the rule") {
    GraphRegistry.register("t1", TpchGraph(extSession, "/root/testdata/sf0.001"))
    val rows = extSession.sql(
      """SELECT nation, n_cust FROM cypher('t1',
        |  'MATCH (n:Nation)<-[:FROM_NATION]-(c:Customer)
        |   RETURN n.name AS nation, count(c) AS n_cust ORDER BY nation')
        |WHERE n_cust > 0 ORDER BY nation LIMIT 3""".stripMargin).collect()
    assert(rows.nonEmpty)
    assert(rows.head.getString(0).startsWith("NATION_"))
  }

  test("third argument binds agtype params") {
    GraphRegistry.register("t2", TpchGraph(extSession, "/root/testdata/sf0.001"))
    val rows = extSession.sql(
      """SELECT * FROM cypher('t2',
        |  'MATCH (n:Nation {name: $nm}) RETURN n.name AS name',
        |  '{"nm": "NATION_3"}')""".stripMargin).collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("NATION_3"))
  }

  test("a testdata directory resolves as a graph name") {
    val rows = extSession.sql(
      """SELECT * FROM cypher('/root/testdata/sf0.001',
        |  'MATCH (r:Region) RETURN r.name AS name ORDER BY name LIMIT 2')""".stripMargin)
      .collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("AFRICA", "AMERICA"))
  }

  test("SQL composes over the cypher() subtree (joins, aggregates)") {
    GraphRegistry.register("t3", TpchGraph(extSession, "/root/testdata/sf0.001"))
    val n = extSession.sql(
      """SELECT count(*) AS n FROM cypher('t3', 'MATCH (c:Customer) RETURN c.name AS name') a
        |JOIN cypher('t3', 'MATCH (c:Customer) RETURN c.name AS name') b USING (name)""".stripMargin)
      .collect()(0).getLong(0)
    assert(n === 150L)
  }
}
