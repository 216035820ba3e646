package graft.cypher

import graft.SparkTestBase
import graft.graph.{PropertyGraph, VertexLabel}
import graft.types.GraphId

/** Error-path behavior: the failure modes the reference's regress suite
  * pins (unbound variables, grammar errors, invalid MERGE/CREATE
  * shapes) surface as clear exceptions, not planner internals.
  */
class ErrorSpec extends SparkTestBase {
  import spark.implicits._

  lazy val graph = new PropertyGraph("err",
    Seq(VertexLabel("P", 1, Seq((GraphId.make(1, 1), "x")).toDF("id", "name"))), Nil)

  def err(q: String): String =
    intercept[Exception](Cypher.query(spark, graph, q).collect()).getMessage

  test("unbound variable") {
    assert(err("MATCH (n:P) RETURN m.name AS x").contains("unbound variable m"))
  }

  test("grammar errors carry position context") {
    val e = intercept[Exception](Parser.parse("MATCH (n:P RETURN n"))
    assert(e.getMessage.contains("expected"))
  }

  test("mixed UNION and UNION ALL parse with per-joint connectors") {
    // legal and left-associative in the reference (cypher_union.sql:53-65)
    val q = Parser.parse(
      "RETURN 1 AS x UNION RETURN 2 AS x UNION ALL RETURN 3 AS x")
    q match {
      case Ast.UnionQuery(parts, alls) =>
        assert(parts.size === 3)
        assert(alls === Seq(false, true))
      case other => fail(s"expected UnionQuery, got $other")
    }
  }

  test("mutations require a mutable store") {
    assert(err("CREATE (:Q {i: 1})").contains("mutating clauses require"))
  }

  test("unknown procedure errors like a missing function") {
    // non-registry CALL falls through to the scalar-function source;
    // an unknown name errors the way the reference reports a missing
    // ag_catalog function (cypher_call.sql 'does not exist' cases)
    assert(err("CALL no_such_proc() YIELD x RETURN x")
      .contains("unknown function no_such_proc"))
  }

  test("missing parameter") {
    assert(err("MATCH (n:P) WHERE n.name = $nope RETURN n")
      .contains("missing"))
  }

  test("duplicate edge variable in one pattern") {
    assert(err("MATCH (a:P)-[r]->()-[r]->() RETURN a")
      .contains("duplicate edge variable"))
  }

  test("invalid VLE bounds") {
    assert(err("MATCH (a:P)-[*3..1]->() RETURN a").contains("invalid VLE bounds"))
  }

  test("UNWIND nodes() of a VLE binding needs a named path") {
    // e binds the VLE relationship list, which carries edge ids only
    assert(err("MATCH (a:P)-[e*1..2]->() UNWIND nodes(e) AS n RETURN n")
      .contains("named path"))
  }
}
