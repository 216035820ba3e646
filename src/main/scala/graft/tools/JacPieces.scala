package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decompose cy_call_jaccard's cost at bench scale: time the edge
  * count, the degree census, and the wedge plan separately on the
  * store-backed graph — drift attribution needs to know which piece
  * grew (dev probe). Usage: runMain graft.tools.JacPieces <sfDir> */
object JacPieces {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[jacpieces] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s -> $r")
      r
    }
    val g = graft.graph.TpchGraph.storeBacked(spark, sfDir)
    for (i <- 1 to 3) {
      timed(s"edges.count #$i")(g.allEdges.count())
      val ed = g.allEdges.select(col("start_id").as("src"), col("end_id").as("dst"))
      val und = ed.union(ed.select(col("dst").as("src"), col("src").as("dst")))
        .filter(col("src") =!= col("dst")).distinct()
      val deg = und.groupBy(col("src").as("v")).agg(count(lit(1)).as("deg"))
      timed(s"census #$i")(
        deg.filter(col("deg") <= 64)
          .agg(coalesce(sum((col("deg") * (col("deg") - 1) / 2).cast("double")), lit(0.0)),
            coalesce(sum(col("deg").cast("double")), lit(0.0))).collect()(0).toString)
      timed(s"top10 full call #$i")(
        graft.graph.GraphAlgos.jaccardSimilarity(g, degCap = 64)
          .orderBy(desc("jaccard"), col("id_a"), col("id_b")).limit(10).count())
    }
    spark.stop()
  }
}
