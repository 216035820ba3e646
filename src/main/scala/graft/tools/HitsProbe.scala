package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: run GraphAlgos.hits on the store-backed TPC-H graph and
  * print timing + top rows. Usage: runMain graft.tools.HitsProbe <sfDir> [rounds]
  */
object HitsProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val g = graft.graph.TpchGraph.storeBacked(spark, args(0))
    val rounds = args.lift(1).map(_.toInt).getOrElse(4)
    val t0 = System.nanoTime()
    val out = graft.graph.GraphAlgos.hits(g, rounds)
    val top = out.orderBy(org.apache.spark.sql.functions.col("auth").desc).limit(5).collect()
    println(s"[hitsprobe] rounds=$rounds took ${(System.nanoTime() - t0) / 1e9}s")
    top.foreach(r => println(s"[hitsprobe] $r"))
    spark.stop()
  }
}
