package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Measure the effect of graduated warm-up (sf0.001 then sf0.01) on
  * first-run sf0.1 latency — isolates HotSpot JIT tier-up from plan
  * compilation. */
object WarmTest {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq
      else Seq("p_minhash_lsh", "p_curation", "p_dedup_clusters")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").count()
    val qs = SparkEntry.queries.filter(q => names.contains(q._1))
    for ((name, fn) <- qs) {
      val t0 = System.nanoTime()
      fn(spark, "/root/testdata/sf0.001").count()
      val t1 = System.nanoTime()
      fn(spark, "/root/testdata/sf0.01").count()
      val t2 = System.nanoTime()
      spark.catalog.clearCache(); System.gc()
      val t3 = System.nanoTime()
      fn(spark, "/root/testdata/sf0.1").count()
      val t4 = System.nanoTime()
      spark.catalog.clearCache(); System.gc()
      val t5 = System.nanoTime()
      fn(spark, "/root/testdata/sf0.1").count()
      val t6 = System.nanoTime()
      println(f"WARM $name%-20s sf001=${(t1 - t0) / 1e9}%6.2f sf01=${(t2 - t1) / 1e9}%6.2f sf1-first=${(t4 - t3) / 1e9}%6.2f sf1-again=${(t6 - t5) / 1e9}%6.2f")
    }
    spark.stop()
  }
}
