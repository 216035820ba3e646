package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Time named SparkEntry queries (all when none given) against a data
  * dir: `runMain graft.tools.TimeQueries <sfDir> [names...]`. Each query
  * runs twice so first-run (codegen/JIT) and warm costs are separable.
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.drop(1).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").count()
    val qs = SparkEntry.queries.filter(q => names.isEmpty || names.contains(q._1))
    for ((name, fn) <- qs) {
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val t1 = System.nanoTime()
      fn(spark, sfDir).count()
      val t2 = System.nanoTime()
      println(f"TIME $name%-24s cold=${(t1 - t0) / 1e9}%8.3f warm=${(t2 - t1) / 1e9}%8.3f rows=$n")
    }
    spark.stop()
  }
}
