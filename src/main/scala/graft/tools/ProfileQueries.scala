package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Repeated-measurement profiler for individual graded queries — dev
  * tool, not part of the driver contract. Mirrors Bench's measurement
  * protocol (warm SF passes, storeBacked save outside the window,
  * clearCache+gc+settle between runs) but times each named query
  * several times and reports min/median/max plus Spark job and stage
  * counts per run, so bench jitter can be separated from real plan
  * regressions.
  *
  * Usage: runMain graft.tools.ProfileQueries <iters> <name> [<name>...]
  */
object ProfileQueries {
  def main(args: Array[String]): Unit = {
    val iters = args.headOption.map(_.toInt).getOrElse(5)
    val names = args.drop(1).toSeq
    require(names.nonEmpty, "pass query names")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // scaling probes override the session width (8-vs-32-core series at
    // 10×, r14 verdict #7); default matches the bench session, so the
    // in-bench identical-code control subprocess is unchanged
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var jobs = 0
    @volatile var stages = 0
    val verbose = sys.env.contains("SPARK_GRAFT_PROFILE_JOBS")
    val jobStartNs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs += 1
        if (verbose) {
          val site = Option(j.properties)
            .flatMap(p => Option(p.getProperty("callSite.short")))
            .orElse(j.stageInfos.lastOption.map(si =>
              si.name.take(60) + " tasks=" + si.numTasks))
            .getOrElse("?")
          jobStartNs.put(j.jobId, (System.nanoTime(), site))
        }
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        if (verbose) Option(jobStartNs.remove(j.jobId)).foreach { case (t0, site) =>
          println(f"[job] ${j.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%7.3f s  $site")
        }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = stages += 1
    })

    val qs = names.map(n => n -> graft.SparkEntry.queries(n))
    for (wd <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01");
         (_, fn) <- qs) {
      try fn(spark, wd).count() catch { case _: Throwable => () }
    }
    try graft.graph.TpchGraph.storeBacked(spark, sfDir)
    catch { case _: Throwable => () }

    for ((name, fn) <- qs) {
      val samples = (1 to iters).map { i =>
        spark.catalog.clearCache()
        System.gc()
        Thread.sleep(200)
        jobs = 0; stages = 0
        val t0 = System.nanoTime()
        try fn(spark, sfDir).count() catch { case e: Throwable =>
          println(s"[profile] $name iter $i FAILED: ${e.getMessage.take(200)}") }
        val s = (System.nanoTime() - t0) / 1e9
        println(f"[profile] $name%-20s iter $i%2d ${s}%7.3f s  jobs=$jobs stages=$stages")
        s
      }.sorted
      val med = samples(samples.size / 2)
      println(f"[profile] $name%-20s min=${samples.head}%7.3f med=$med%7.3f max=${samples.last}%7.3f")
    }
    spark.stop()
  }
}
