package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Box shuffle-speed floor probe (dev tool, r14 optimization): times a
  * distinct over a synthetic 2-long-column frame of the same volume as
  * the TPC-H und frame, printing per-stage task counts/durations — is
  * the und build slow because of the plan, or is ~2 s simply what a
  * 2.7M-row exchange costs here? Usage: runMain graft.tools.ShufBase
  */
object ShufBase {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2700000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        println(f"[stage] ${i.stageId}%3d tasks=${i.numTasks}%4d " +
          f"wall=${(i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L)) / 1e3}%7.2f s " +
          s"name=${i.name.take(60)}")
      }
    })
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[shufbase] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val df = spark.range(n).select(
      (col("id") * 2654435761L % 1000000L).as("src"),
      (col("id") * 40503L % 1000000L).as("dst"))
    time("warm scan noop")(noop(df))
    for (i <- 1 to 3) {
      time(s"synthetic distinct #$i")(noop(df.distinct()))
      time(s"synthetic repart+dedup #$i")(noop(
        df.repartition(32, col("src")).dropDuplicates("src", "dst")))
      time(s"synthetic groupBy count #$i")(noop(
        df.groupBy("src").agg(count(lit(1)))))
    }
    spark.stop()
  }
}
