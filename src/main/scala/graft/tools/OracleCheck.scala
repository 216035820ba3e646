package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: run a named subset of SparkEntry.queries against an sf dir,
  * writing each result to `outDir/<name>` (parquet) and its oracle SQL
  * to `outDir/<name>.sql` — so a local DuckDB pass can replicate the
  * driver's correctness compare before the round gate runs.
  *
  * Usage: runMain graft.tools.OracleCheck <sfDir> <outDir> <name...>
  */
object OracleCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2).toSeq
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    for (name <- names) {
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      graft.SparkEntry.oracleSql.get(name).foreach { sql =>
        java.nio.file.Files.write(java.nio.file.Paths.get(s"$outDir/$name.sql"),
          sql.getBytes("UTF-8"))
      }
      println(s"[oraclecheck] wrote $name")
    }
    spark.stop()
  }
}
