package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: run a named SparkEntry query under the bench session shape
  * and print the EXECUTED (post-AQE) plan's node-type census — the only
  * place runtime exchange/stage reuse is visible (the static formatted
  * plan prints `isFinalPlan=false` before any reuse decision exists).
  *
  * Usage: ExecPlanProbe <sfDir> <query> [<query>...]
  */
object ExecPlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- args.drop(1)) {
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      // collect() (not a noop write) so THIS QueryExecution is the one
      // that ran — the write path builds its own QueryExecution and the
      // probe would print a pre-execution isFinalPlan=false plan
      df.collect()
      // the adaptive plan string AFTER execution shows final stages,
      // ReusedExchange / ReusedSubquery nodes and codegen spans
      val s = df.queryExecution.executedPlan.toString
      def cnt(re: String): Int = re.r.findAllIn(s).size
      println(s"[execplan] $name lines=${s.linesIterator.size} " +
        s"Exchange=${cnt("Exchange")} Reused=${cnt("ReusedExchange")} " +
        s"SMJ=${cnt("SortMergeJoin")} BHJ=${cnt("BroadcastHashJoin")} " +
        s"scans=${cnt("Scan parquet")} WSCG=${cnt("WholeStageCodegen")}")
      sys.env.get("GRAFT_EXECPLAN_OUT").foreach { dir =>
        new java.io.File(dir).mkdirs()
        val w = new java.io.PrintWriter(
          new java.io.File(dir, s"${name}_exec.txt"), "UTF-8")
        try w.write(s) finally w.close()
      }
    }
    spark.stop()
  }
}
