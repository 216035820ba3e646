package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.pipeline.{Dedup, TextOps}

/** Ad-hoc stage timer for the curation pipeline — dev tool, not part of
  * the driver contract. Prints wall time of each phase so regressions in
  * one stage aren't hidden inside the end-to-end number. */
object PhaseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[phase] $name%-18s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // warm pass to absorb JIT
    Dedup.minhashLsh(docs, "text", "doc_id", 3, 8, 4, 0.3).count()
    spark.catalog.clearCache()

    val filtered = docs
      .filter(TextOps.langId(col("text")) === "en")
      .filter(TextOps.tokenCount(col("text")) >= 10)
    val exact = Dedup.dedupExact(filtered, "text", "doc_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("exact-dedup")(exact.count())
    val pairs = Dedup.minhashLsh(exact, "text", "doc_id", 3, 8, 4, 0.3)
    val clusters = time("lsh+clusters")(Dedup.dupClusters(pairs))
    val dropIds = clusters.filter(col("id") =!= col("rep"))
      .select(col("id").as("doc_id"))
    val kept = exact.join(dropIds, Seq("doc_id"), "left_anti")
    time("anti+stats")(
      kept.agg(count(lit(1)).as("n_kept"),
        sum(TextOps.tokenCount(col("text")).cast(LongType)).as("total_tokens"))
        .collect())

    spark.catalog.clearCache()
    time("lsh-alone")(
      Dedup.minhashLsh(docs, "text", "doc_id", 3, 8, 4, 0.3).count())

    // LSH sub-phases (mirrors Dedup.minhashLsh internals)
    spark.catalog.clearCache()
    val rows = TextOps.shingleRows(docs, "text", "doc_id", 3)
      .select(col("__id"), TextOps.portableHash64(col("__sh")).as("__h"))
      .withColumn("__hp", pmod(col("__h"), lit(Dedup.MinhashP)))
    time("shingle-rows")(rows.count())
    val sigs = rows.groupBy("__id").agg(
        collect_set(col("__h")).as("__set"),
        (0 until 32).map(seed =>
          min(pmod(lit(Dedup.minhashCoef(seed)._1) * col("__hp") +
            lit(Dedup.minhashCoef(seed)._2), lit(Dedup.MinhashP))).as(s"__m$seed")): _*)
      .withColumn("__n", size(col("__set")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("signatures")(sigs.count())
    spark.stop()
  }
}
