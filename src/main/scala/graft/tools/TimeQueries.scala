package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Time named SparkEntry queries (all when none given) against a data
  * dir, replicating the Bench protocol: warm every query at sf0.001 and
  * sf0.01 (codegen + HotSpot tier-up), then per query clearCache + GC +
  * one timed run. `runMain graft.tools.TimeQueries <sfDir> [names...]`.
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").count()
    val qs = SparkEntry.queries.filter(q => names.isEmpty || names.contains(q._1))
    val warmDirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
      .map(new java.io.File(_))
      .filter(f => f.isDirectory &&
        f.getCanonicalPath != new java.io.File(sfDir).getCanonicalPath)
      .map(_.getPath)
    for (wd <- warmDirs; (_, fn) <- qs) {
      try fn(spark, wd).count() catch { case _: Throwable => () }
    }
    // one-time store materialization outside the timed loop, like Bench
    try graft.graph.TpchGraph.storeBacked(spark, sfDir)
    catch { case _: Throwable => () }
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "1").toInt
    for (r <- 1 to reps; (name, fn) <- qs) {
      spark.catalog.clearCache()
      System.gc()
      Thread.sleep(200)
      val t0 = System.nanoTime()
      val n = try fn(spark, sfDir).count() catch { case _: Throwable => -1L }
      val t1 = System.nanoTime()
      println(f"TIME $name%-24s rep=$r timed=${(t1 - t0) / 1e9}%8.3f rows=$n")
    }
    spark.stop()
  }
}
