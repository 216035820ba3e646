package graft.tools

import org.apache.spark.sql.SparkSession
import graft.cypher.Cypher
import graft.graph.PropertyGraph

/** Batch-run RETURN-style probe queries (one per line of a file, or
  * from stdin) against an empty graph and print `QUERY => result` —
  * for diffing behavior against the reference's regress expectations
  * without paying one JVM per query. */
object Probe {
  def main(args: Array[String]): Unit = {
    val src = scala.io.Source.fromFile(args(0))
    val queries = try src.getLines().map(_.trim)
      .filter(q => q.nonEmpty && !q.startsWith("#")).toList
    finally src.close()
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val empty =
      if (args.length > 1) graft.graph.TpchGraph(spark, args(1))
      else new PropertyGraph("probe", Nil, Nil)
    for (q <- queries) {
      val res = try {
        val rows = Cypher.query(spark, empty, q).collect()
        rows.map(r => (0 until r.length).map(i =>
          if (r.isNullAt(i)) "null" else r.get(i).toString).mkString(", "))
          .mkString("; ")
      } catch { case e: Throwable => s"ERROR ${e.getClass.getSimpleName}: ${e.getMessage.take(120)}" }
      println(s"PROBE| $q => $res")
    }
    spark.stop()
  }
}
