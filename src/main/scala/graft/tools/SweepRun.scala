package graft.tools

import org.apache.spark.sql.SparkSession

import graft.cypher.Cypher
import graft.graph.TpchGraph

/** Dev tool: run a newline-delimited batch of Cypher queries (file arg;
  * blank lines and # comments skipped; a literal `\n` splits a query
  * over one line) against the sf0.001 TPC-H graph, printing each result
  * or error compactly — for sweeping reference-regress idioms to find
  * semantic gaps. */
object SweepRun {
  def main(args: Array[String]): Unit = {
    val file = args.head
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val g = TpchGraph(spark, "/root/testdata/sf0.001")
    // '!' prefix: execute against a scratch mutable graph (shared until
    // a '!!reset' line); plain lines query the TPC-H overlay read-only
    var scratch = new graft.graph.MutableGraph("sweep", spark)
    val lines = scala.io.Source.fromFile(file).getLines()
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
    for (q0 <- lines) {
      val q = q0.replace("\\n", "\n")
      if (q == "!!reset") {
        scratch = new graft.graph.MutableGraph("sweep", spark)
        println("Q: !!reset\n   -> ok")
      } else {
        print(s"Q: ${q0.take(110)}\n   -> ")
        try {
          val rows =
            if (q.startsWith("!")) Cypher.execute(spark, scratch, q.drop(1)).collect()
            else Cypher.query(spark, g, q).collect()
          val shown = rows.take(4).map(_.toString).mkString(" | ")
          println(s"${rows.length} rows: $shown")
        } catch {
          case e: Throwable =>
            val m = Option(e.getMessage).getOrElse(e.getClass.getName)
            println(s"ERROR ${m.linesIterator.take(1).mkString.take(160)}")
        }
      }
    }
    spark.stop()
  }
}
