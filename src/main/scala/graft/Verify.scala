package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  // JSON string escape: backslash, quote, and ALL control chars (<0x20)
  // — a tab or CR in builder-authored SQL would otherwise make the
  // driver's json.load fail and silently zero the round's correctness.
  private def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private def readJsonMap(p: java.nio.file.Path): Map[String, String] = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    import scala.jdk.CollectionConverters._
    m.readValue(Files.readString(p), classOf[java.util.Map[String, String]])
      .asScala.toMap
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // SPARK_GRAFT_MASTER overrides for multi-executor evidence runs
    // (e.g. local-cluster[2,16,4096] — the bucketed-store read path,
    // checkpoint dirs, and endgame collect gates all have
    // local-mode-only evidence otherwise); the driver's graded runs
    // keep the local[$cpus] default.
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val builder = SparkSession.builder()
    if (master.startsWith("local-cluster")) {
      // forked executor JVMs need the same JDK17 module opens the
      // driver gets from build.sbt, and the compiled graft classes on
      // their classpath (the worker does not inherit sbt's classpath
      // for the executor command it assembles)
      val addOpens = Seq(
        "java.base/java.lang", "java.base/java.lang.invoke",
        "java.base/java.lang.reflect", "java.base/java.io",
        "java.base/java.net", "java.base/java.nio",
        "java.base/java.util", "java.base/java.util.concurrent",
        "java.base/java.util.concurrent.atomic",
        "java.base/sun.nio.ch", "java.base/sun.nio.cs",
        "java.base/sun.security.action", "java.base/sun.util.calendar")
        .map(p => s"--add-opens $p=ALL-UNNAMED").mkString(" ")
      builder.config("spark.executor.extraJavaOptions", addOpens)
      sys.env.get("SPARK_GRAFT_CLASSPATH").foreach(cp =>
        builder.config("spark.executor.extraClassPath", cp))
    }
    // SPARK_GRAFT_CONF="k=v;k2=v2" injects extra session confs for
    // scale sweeps (e.g. raising spark.graft.traversal.maxPaths where
    // the 100× answer legitimately exceeds the explosion guard's
    // default) without changing the graded-run session shape.
    val extraConf = sys.env.get("SPARK_GRAFT_CONF").toSeq
      .flatMap(_.split(";")).map(_.trim).filter(_.contains("="))
      .map { kv => val i = kv.indexOf('='); (kv.take(i), kv.drop(i + 1)) }
    def buildSession(): SparkSession = {
      extraConf.foreach { case (k, v) => builder.config(k, v) }
      val s = builder
        .master(master)
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        // compress reliable-checkpoint blocks (betweenness's level
        // pins): lz4 on packed long rows is ~3-4× — a static conf, so
        // it must be set before the context starts
        .config("spark.checkpoint.compress", "true")
        .config("spark.ui.enabled", "false")
        .withExtensions(new graft.plans.GraftExtensions)
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s
    }
    var spark = buildSession()
    new java.io.File(outDir).mkdirs()
    // Scale value-grading (the 100× protocol): a per-query wall budget
    // converts a query that cannot finish at the probed scale into a
    // NAMED reason in skips.json instead of a hung run — the compare
    // tool reports those as skipped-with-reason, mirroring its own
    // DuckDB-side timeout protocol. Unset (the driver's graded runs) =
    // no budget, identical behavior to before.
    val budgetSec = sys.env.get("SPARK_GRAFT_QUERY_BUDGET_SEC").map(_.toLong)
    // SPARK_GRAFT_ONLY=a,b,c reruns a subset into the same outDir — the
    // scale-sweep retry path (a query that hit a capacity wall in the
    // sweep heap gets a second pass at a bigger heap without repaying
    // the other ~2h of queries). Unset = full suite, driver behavior.
    val onlySet = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // SPARK_GRAFT_RESUME=1 makes the sweep restartable ACROSS JVMs: a
    // local-mode executor-thread heap OOM goes through Spark's uncaught
    // exception handler → System.exit → shutdown hook, so NO in-process
    // recovery exists for that class (the in-loop session rebuild below
    // only survives job-level failures). An outer retry loop (see
    // tools/run_main.sh callers) relaunches Verify; resume mode skips
    // every query whose _SUCCESS marker exists, attributes a JVM death
    // to the query named in the _running marker, and flushes skips.json
    // on every skip so named reasons survive the crash.
    val resume = sys.env.contains("SPARK_GRAFT_RESUME")
    val skipPath = Paths.get(s"$outDir/skips.json")
    val runningMarker = Paths.get(s"$outDir/_running")
    val skips = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // both restart modes preload the prior pass's reasons so every
    // incremental flush below rewrites the COMPLETE skip set — retry
    // mode drops the retried names (they either succeed, overwriting
    // their result dir, or re-skip with a fresh reason)
    if ((resume || onlySet.isDefined) && Files.exists(skipPath))
      skips ++= readJsonMap(skipPath)
        .filterNot { case (k, _) => onlySet.exists(_.contains(k)) }
    def flushSkips(): Unit =
      if (skips.nonEmpty)
        Files.writeString(skipPath,
          skips.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))
    if (resume && Files.exists(runningMarker)) {
      val died = Files.readString(runningMarker).trim
      // a name in the ONLY set is being retried RIGHT NOW — attributing
      // the old JVM death to it would let the `done` gate below skip the
      // retry and re-report the stale failure as if re-verified. Drop
      // the marker for retried names; they rerun and write fresh state.
      if (died.nonEmpty && onlySet.exists(_.contains(died)))
        Files.deleteIfExists(runningMarker)
      else if (died.nonEmpty && !skips.contains(died) &&
          !Files.exists(Paths.get(s"$outDir/$died/_SUCCESS"))) {
        skips(died) = "spark: JVM exited running this query at this scale " +
          "(executor-thread OOM triggers System.exit in local mode)"
        System.err.println(s"[verify] $died skipped: ${skips(died)}")
        flushSkips()
      }
    }
    SparkEntry.queries.foreach { case (name, fn) =>
      // ONLY membership overrides `done`: an explicitly requested name
      // always reruns (e.g. regrading one query under a different
      // SPARK_GRAFT_CONF) — otherwise its prior _SUCCESS marker would
      // silently no-op the deliberate retry
      val done = resume && onlySet.isEmpty && (skips.contains(name) ||
        Files.exists(Paths.get(s"$outDir/$name/_SUCCESS")))
      if (onlySet.forall(_.contains(name)) && !done) {
      // an executor-thread OOM in local mode stops the whole context
      // (SparkUncaughtExceptionHandler); without a rebuild every later
      // query "fails" on the corpse and a one-query blowup zeroes the
      // rest of a scale sweep (measured: the first 100× run lost 87
      // queries to one session-window OOM)
      if (spark.sparkContext.isStopped) {
        System.err.println(s"[verify] context stopped — rebuilding session")
        SparkSession.clearActiveSession()
        SparkSession.clearDefaultSession()
        graft.graph.TpchGraph.invalidate() // cached frames bind the corpse
        spark = buildSession()
      }
      if (resume) Files.writeString(runningMarker, name)
      // a rerun invalidates the prior pass's result NOW — otherwise a
      // budget timeout that fires before the overwrite starts would
      // leave the stale _SUCCESS in place, and the race check below
      // (skip dropped when _SUCCESS exists) would report the OLD result
      // as freshly graded
      Files.deleteIfExists(Paths.get(s"$outDir/$name/_SUCCESS"))
      def run(): Unit = fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      try budgetSec match {
        case None => run()
        case Some(budget) =>
          import scala.concurrent.{Await, Future}
          import scala.concurrent.duration._
          import scala.concurrent.ExecutionContext.Implicits.global
          spark.sparkContext.setJobGroup(name, name, interruptOnCancel = true)
          val f = Future(run())
          try Await.result(f, budget.seconds)
          catch { case _: java.util.concurrent.TimeoutException =>
            spark.sparkContext.cancelJobGroup(name)
            skips(name) = s"spark: exceeded ${budget}s budget at this scale"
            System.err.println(s"[verify] $name skipped: ${skips(name)}")
            try Await.result(f.failed.map(_ => ()), 120.seconds)
            catch { case _: Throwable => () } // drain the cancelled job
            // cancellation race: if the job beat the cancel and wrote
            // _SUCCESS, a graded result exists on disk — keeping the
            // skip would make resume mode report a skip over a valid
            // result (skips wins over the result dir in the compare)
            if (Files.exists(Paths.get(s"$outDir/$name/_SUCCESS"))) {
              skips.remove(name)
              System.err.println(
                s"[verify] $name completed despite cancel — skip dropped")
            }
          }
          finally spark.sparkContext.clearJobGroup()
      } catch { case e: Throwable =>
        // scale mode (budget set): a capacity failure (executor OOM,
        // shuffle disk exhaustion) is a NAMED reason like a timeout —
        // e.g. the unthresholded jaccard's ~1.5B-pair output exhausts
        // shuffle disk at 100× (the documented §41 wall). Graded runs
        // (no budget) keep the plain failure path.
        if (budgetSec.isDefined)
          skips(name) = "spark: failed at this scale: " +
            Option(e.getMessage).getOrElse(e.getClass.getName).take(160)
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      flushSkips()
      }
    }
    if (resume) Files.deleteIfExists(runningMarker)
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // skips preloaded the prior pass's reasons above, so this write is
    // the complete merged set
    if (skips.nonEmpty)
      Files.writeString(skipPath,
        skips.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))
    else Files.deleteIfExists(skipPath)
    spark.stop()
  }
}
