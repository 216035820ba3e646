package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.graph.TpchGraph

/** Micro-decomposition of the undirected-simple-graph build that every
  * whole-graph algorithm starts from (dev tool, r14 optimization):
  * where do the seconds actually go — scan, union, exchange, dedup?
  * Usage: runMain graft.tools.UndProbe <sfDir> [iters]
  */
object UndProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val i = s.stageInfo
          val m = i.taskMetrics
          println(f"[stage] ${i.stageId}%3d tasks=${i.numTasks}%4d " +
            f"wall=${(i.completionTime.getOrElse(0L) -
              i.submissionTime.getOrElse(0L)) / 1e3}%7.2f s " +
            f"cpu=${m.executorCpuTime / 1e9}%7.2f run=${m.executorRunTime / 1e3}%7.2f " +
            f"gc=${m.jvmGCTime / 1e3}%5.2f deser=${m.executorDeserializeTime / 1e3}%5.2f " +
            f"shW=${m.shuffleWriteMetrics.bytesWritten / 1e6}%7.1fMB " +
            f"shR=${m.shuffleReadMetrics.totalBytesRead / 1e6}%7.1fMB")
        }
      })

    def time[A](name: String)(f: => A): A = {
      spark.catalog.clearCache(); System.gc(); Thread.sleep(100)
      val t0 = System.nanoTime()
      val r = f
      println(f"[und] $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val g = TpchGraph.storeBacked(spark, sfDir)
    val ed = g.allEdges.select(col("start_id").as("src"), col("end_id").as("dst"))

    def stageCount[A](f: => A): A = f
    def withConf[A](k: String, v: String)(f: => A): A = {
      val old = spark.conf.getOption(k)
      spark.conf.set(k, v)
      try f finally old match {
        case Some(o) => spark.conf.set(k, o); case None => spark.conf.unset(k)
      }
    }
    for (i <- 1 to iters) {
      println(s"--- iter $i ---")
      time("allEdges 2col noop")(noop(ed))
      time("union+filter noop (no shuffle)")(noop(
        ed.union(ed.select(col("dst").as("src"), col("src").as("dst")))
          .filter(col("src") =!= col("dst"))))
      time("union+filter noop NOBUCKET")(
        withConf("spark.sql.sources.bucketing.enabled", "false")(noop(
          ed.union(ed.select(col("dst").as("src"), col("src").as("dst")))
            .filter(col("src") =!= col("dst")))))
      time("repart+dropDup noop")(noop(
        ed.union(ed.select(col("dst").as("src"), col("src").as("dst")))
          .filter(col("src") =!= col("dst"))
          .repartition(32, col("src"))
          .dropDuplicates("src", "dst")))
      time("repart+dropDup noop NOBUCKET")(
        withConf("spark.sql.sources.bucketing.enabled", "false")(noop(
          ed.union(ed.select(col("dst").as("src"), col("src").as("dst")))
            .filter(col("src") =!= col("dst"))
            .repartition(32, col("src"))
            .dropDuplicates("src", "dst"))))
      time("distinct noop")(noop(
        ed.union(ed.select(col("dst").as("src"), col("src").as("dst")))
          .filter(col("src") =!= col("dst")).distinct()))
      time("distinct noop NOBUCKET")(
        withConf("spark.sql.sources.bucketing.enabled", "false")(noop(
          ed.union(ed.select(col("dst").as("src"), col("src").as("dst")))
            .filter(col("src") =!= col("dst")).distinct())))
    }
    spark.stop()
  }
}
