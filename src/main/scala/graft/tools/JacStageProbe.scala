package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-stage metrics for the REAL jaccardSimilarity call path (dev
  * tool, r14 optimization). Usage: runMain graft.tools.JacStageProbe
  * <sfDir> [iters] */
object JacStageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = args.drop(1).headOption.map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    @volatile var report = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        if (report) {
          val i = s.stageInfo
          val m = i.taskMetrics
          println(f"[stage] ${i.stageId}%3d tasks=${i.numTasks}%4d " +
            f"wall=${(i.completionTime.getOrElse(0L) -
              i.submissionTime.getOrElse(0L)) / 1e3}%7.2f s " +
            f"cpu=${m.executorCpuTime / 1e9}%7.2f run=${m.executorRunTime / 1e3}%7.2f " +
            f"gc=${m.jvmGCTime / 1e3}%5.2f " +
            f"shW=${m.shuffleWriteMetrics.bytesWritten / 1e6}%7.1fMB " +
            f"shR=${m.shuffleReadMetrics.totalBytesRead / 1e6}%7.1fMB " +
            f"spill=${m.diskBytesSpilled / 1e6}%6.1fMB")
        }
    })
    val g = graft.graph.TpchGraph.storeBacked(spark, sfDir)
    for (i <- 1 to iters) {
      spark.catalog.clearCache(); System.gc(); Thread.sleep(200)
      report = true
      val t0 = System.nanoTime()
      val n = graft.graph.GraphAlgos.jaccardSimilarity(g, degCap = 64)
        .orderBy(desc("jaccard"), col("id_a"), col("id_b")).limit(10).count()
      println(f"[jacstage] iter $i total ${(System.nanoTime() - t0) / 1e9}%7.2f s rows=$n")
      report = false
    }
    spark.stop()
  }
}
