package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.StreamingDedup

/** Measures durable-state RESTORE cost vs batch-history length (r11
  * verdict #5's unmet half): builds a direct-call history of N
  * single-partition batches from the documents table, then times a
  * fresh processor's restore (a) with compaction disabled — restore
  * cost tracks the partition count — and (b) with the default
  * compactMinParts=16 — the first restore folds history into one
  * generation and every later restore reads a BOUNDED partition set,
  * so restore cost stays flat no matter how long the crawl ran.
  *
  * Usage: runMain graft.tools.DurableProbe <sfDir> [batchCounts...]
  * (default 50 100 200)
  */
object DurableProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val counts = if (args.length > 1) args.drop(1).map(_.toInt).toSeq
      else Seq(50, 100, 200)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).limit(4000)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    docs.count()

    def timeRestore(path: String, minParts: Option[Int]): (Double, Long) = {
      minParts.foreach(v =>
        spark.conf.set("spark.graft.stream.state.compactMinParts", v.toString))
      try {
        val t0 = System.nanoTime()
        val sd = new StreamingDedup(spark, threshold = 0.3,
          statePath = Some(path))
        val n = sd.corpusSize // forces restore (and compaction if due)
        ((System.nanoTime() - t0) / 1e9, n)
      } finally minParts.foreach(_ =>
        spark.conf.unset("spark.graft.stream.state.compactMinParts"))
    }
    def liveParts(path: String): Int =
      new java.io.File(path).listFiles()
        .count(_.getName.startsWith("__batch="))

    for (n <- counts) {
      val path = java.nio.file.Files
        .createTempDirectory(s"durable-probe-$n").toString
      // n direct-call batch PARTITIONS, written the way StreamingDedup
      // writes them (same sigTable schema, same dynamic-overwrite
      // layout) but without the processor's emission machinery — the
      // restore cost under measurement depends only on what's on disk,
      // and driving 200 batches through the full near-dup pipeline
      // (whose store is a growing union of pinned pieces) measures the
      // probe harness, not the restore
      for (b <- 0 until n) {
        val batch = docs.limit(20)
          .select((col("doc_id") + lit(b.toLong * 100000L)).as("doc_id"),
            concat(col("text"), lit(s" batch$b")).as("text"))
        graft.pipeline.Dedup.sigTable(batch, "text", "doc_id", 3, 32)
          .withColumn("__batch", lit((1L << 40) + b)) // DirectKeyBase + b
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("__batch").parquet(path)
      }
      // restore over the raw batch-per-partition history (no compaction)
      val (tRaw, rows) = timeRestore(path, Some(Int.MaxValue))
      // first compacting restore folds the history...
      val (tCompacting, _) = timeRestore(path, None)
      // ...and steady-state restores read the bounded layout
      val (tSteady, rows2) = timeRestore(path, None)
      println(f"[durable] batches=$n%4d rows=$rows raw_parts=$n " +
        f"restore_raw=$tRaw%6.2f s  compacting=$tCompacting%6.2f s  " +
        f"steady=$tSteady%6.2f s  steady_parts=${liveParts(path)} " +
        f"(rows_check=$rows2)")
    }
    spark.stop()
  }
}
