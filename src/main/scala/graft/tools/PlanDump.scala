package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Dev tool: write `plans/r15/<query>_<suffix>.txt` formatted physical
  * plans for the named SparkEntry queries under the BENCH session shape
  * (local[32], 32 shuffle partitions, AQE on) so plan evidence matches
  * what the graded bench actually plans — ExplainProbe's local[4]
  * session can pick different strategies (broadcast thresholds, widths).
  *
  * Usage: PlanDump <sfDir> <suffix> <query> [<query>...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val suffix = args(1)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val outDir = new java.io.File("plans/r15")
    outDir.mkdirs()
    for (name <- args.drop(2)) {
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(FormattedMode)
      val f = new java.io.File(outDir, s"${name}_$suffix.txt")
      val w = new java.io.PrintWriter(f, "UTF-8")
      try w.write(txt) finally w.close()
      println(s"[plandump] wrote ${f.getPath} (${txt.linesIterator.size} lines)")
    }
    spark.stop()
  }
}
