package graft.tools

import org.apache.spark.sql.SparkSession

import graft.cypher.Cypher
import graft.graph.{GraphStore, MutableGraph, TpchGraph}

/** CLI runner for Cypher queries.
  *
  * Read-only against the TPC-H overlay graph:
  *   sbt "runMain graft.tools.CypherRun <sfDir> <query> [--explain]"
  *
  * Read-write against a fresh in-memory graph (statements split on ';',
  * last result shown):
  *   sbt "runMain graft.tools.CypherRun - \"CREATE (:V {i: 1}); MATCH (n:V) RETURN n.i AS i\""
  *
  * Persistent graph at a directory (created if absent, saved after
  * mutating statements):
  *   sbt "runMain graft.tools.CypherRun graph:/tmp/g \"MERGE (:V {i: 1}); MATCH (n) RETURN n\""
  *
  * Parameters as an agtype object (the analogue of cypher()'s third
  * argument): --params '{\"min\": 5000}' then $min in the query.
  *
  * --agtype renders every result column as agtype text (entities as
  * {"id": ...}::vertex / ::edge, containers as agtype JSON) — the
  * reference's output format (agtype_out, agtype.c:418).
  */
object CypherRun {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: CypherRun <sfDir|-> <query> [--explain]")
    val sfDir = args(0)
    val query = args(1)
    val explain = args.contains("--explain")
    val agtype = args.contains("--agtype")
    def render(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      if (!agtype) df
      else df.select(df.schema.fields.map(f =>
        graft.types.AgVariant.printedNative(
          org.apache.spark.sql.functions.col(f.name), f.dataType).as(f.name)).toSeq: _*)
    val params: Map[String, graft.types.AgValue] =
      args.indexOf("--params") match {
        case -1 => Map.empty
        case i =>
          graft.types.AgValue.parse(args(i + 1)) match {
            case m: graft.types.AgMap => m.entries.toMap
            case other => throw new IllegalArgumentException(
              s"--params must be an object, got ${other.typeName}")
          }
      }
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .appName("graft-cypher-run")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      if (sfDir == "-" || sfDir.startsWith("graph:")) {
        val dir = if (sfDir.startsWith("graph:")) Some(sfDir.stripPrefix("graph:")) else None
        val store = dir match {
          case Some(d) if new java.io.File(s"$d/_meta").exists() =>
            GraphStore.loadMutable(spark, d)
          case _ => new MutableGraph(dir.fold("cli")(_ => "persisted"), spark)
        }
        val stmts = query.split(";").map(_.trim).filter(_.nonEmpty)
        var last: Option[org.apache.spark.sql.DataFrame] = None
        for (stmt <- stmts) last = Some(Cypher.execute(spark, store, stmt, params))
        last.foreach { df =>
          if (explain) df.explain("formatted")
          render(df).show(50, truncate = false)
        }
        dir.foreach(d => GraphStore.save(store.snapshot, d))
      } else {
        val df = Cypher.query(spark, TpchGraph(spark, sfDir), query, params)
        if (explain) df.explain("formatted")
        render(df).show(50, truncate = false)
      }
    } finally spark.stop()
  }
}
