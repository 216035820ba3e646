package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the MinHash-LSH pipeline stages. */
object ProfileLsh {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.read.parquet(s"$dir/documents.parquet")
    df.count() // warm
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $name%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    time("shingleRows") {
      graft.pipeline.TextOps.shingleRows(df, "text", "doc_id", 3).count()
    }
    def arrForm = df.select(col("doc_id").as("__id"),
      explode(graft.pipeline.TextOps.shingles(col("text"), 3)).as("__sh"))
    time("explode(array-shingles)") { arrForm.count() }
    time("explode(array) again") { arrForm.count() }
    def barrierForm = {
      val toks = graft.pipeline.TextOps.tokens(col("text"))
      val t = df.select(col("doc_id").as("__id"), toks.as("__toks"))
        .repartition(32)
      val n = size(col("__toks"))
      t.select(col("__id"), explode(
        when(n < 3, array(concat_ws(" ", col("__toks"))))
          .otherwise(transform(sequence(lit(0), n - 3),
            i => concat_ws(" ", slice(col("__toks"), i + 1, lit(3)))))).as("__sh"))
    }
    time("barrier+explode") { barrierForm.count() }
    time("barrier+explode again") { barrierForm.count() }
    time("shingleRows+distinct") {
      graft.pipeline.TextOps.shingleRows(df, "text", "doc_id", 3)
        .select(col("__id"), xxhash64(col("__sh")).as("__h")).distinct().count()
    }
    time("full minhashLsh") {
      graft.pipeline.Dedup.minhashLsh(df, "text", "doc_id",
        shingleK = 3, bands = 8, rowsPerBand = 4, threshold = 0.3).count()
    }
    time("full again (2nd)") {
      graft.pipeline.Dedup.minhashLsh(df, "text", "doc_id",
        shingleK = 3, bands = 8, rowsPerBand = 4, threshold = 0.3).count()
    }
    // stage-by-stage inside minhashLsh
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.storage.StorageLevel
    val numHashes = 32; val bands = 8; val rowsPerBand = 4
    val ex = graft.pipeline.TextOps.shingleRows(df, "text", "doc_id", 3)
      .select(col("__id"), xxhash64(col("__sh")).as("__h"))
      .distinct().persist(StorageLevel.MEMORY_AND_DISK)
    time("s1: ex persist") { ex.count() }
    val sigs = ex.groupBy("__id").agg(
      count(lit(1)).as("__n"),
      (0 until numHashes).map(seed =>
        min(xxhash64(lit(seed), col("__h"))).as(s"__m$seed")): _*)
      .persist(StorageLevel.MEMORY_AND_DISK)
    time("s2: sigs persist") { sigs.count() }
    val bandCols = (0 until bands).map { b =>
      xxhash64(lit(b) +: (0 until rowsPerBand)
        .map(r => col(s"__m${b * rowsPerBand + r}")): _*).as(s"__b$b")
    }
    val banded = sigs.select(col("__id") +: bandCols: _*)
      .select(col("__id"),
        posexplode(array((0 until bands).map(b => col(s"__b$b")): _*)))
      .withColumnRenamed("pos", "__band").withColumnRenamed("col", "__bucket")
    val pruned = banded
      .withColumn("__cnt", count(lit(1)).over(Window.partitionBy("__band", "__bucket")))
      .filter(col("__cnt").between(2, 200)).drop("__cnt")
    val l = pruned.select(col("__band"), col("__bucket"), col("__id").as("id_a"))
    val r = pruned.select(col("__band"), col("__bucket"), col("__id").as("id_b"))
    val candidates = l.join(r, Seq("__band", "__bucket"))
      .filter(col("id_a") < col("id_b")).select("id_a", "id_b").distinct()
    time("s3: candidates") { candidates.count() }
    val inter = candidates
      .join(ex.select(col("__id").as("id_a"), col("__h")), Seq("id_a"))
      .join(ex.select(col("__id").as("id_b"), col("__h")), Seq("id_b", "__h"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("__inter"))
    time("s4: jaccard") { inter.count() }
    spark.stop()
  }
}
