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
    // stage-by-stage inside minhashLsh, REAL portable-hash scheme
    import org.apache.spark.storage.StorageLevel
    import graft.pipeline.{Dedup, TextOps}
    val numHashes = 32; val bands = 8; val rowsPerBand = 4
    // warm the real pipeline once so stage timings are steady-state
    time("real pipeline warm") {
      Dedup.minhashLsh(df, "text", "doc_id", 3, bands, rowsPerBand, 0.3).count()
    }
    spark.catalog.clearCache()
    val rows0 = TextOps.shingleRows(df, "text", "doc_id", 3)
    time("s0: shingleRows") { rows0.count() }
    val rows = rows0
      .select(col("__id"), TextOps.portableHash64(col("__sh")).as("__h"))
      .withColumn("__hp", pmod(col("__h"), lit(Dedup.MinhashP)))
    time("s0b: + md5 hash") { rows.count() }
    val sigs = rows.groupBy("__id").agg(
        collect_set(col("__h")).as("__set"),
        (0 until numHashes).map(seed =>
          min(pmod(lit(Dedup.minhashCoef(seed)._1) * col("__hp") +
            lit(Dedup.minhashCoef(seed)._2), lit(Dedup.MinhashP))).as(s"__m$seed")): _*)
      .withColumn("__n", size(col("__set")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    time("s1: sigs persist") { sigs.count() }
    val bandCols = (0 until bands).map { b =>
      array((0 until rowsPerBand)
        .map(r => col(s"__m${b * rowsPerBand + r}")): _*).as(s"__b$b")
    }
    val banded = sigs.select(col("__id") +: bandCols: _*)
      .select(col("__id"),
        posexplode(array((0 until bands).map(b => col(s"__b$b")): _*)))
      .withColumnRenamed("pos", "__band").withColumnRenamed("col", "__bucket")
    val buckets = banded.groupBy("__band", "__bucket")
      .agg(collect_list(col("__id")).as("__ids"))
      .filter(size(col("__ids")).between(2, 200))
    val candidates = buckets
      .select(explode(filter(
        flatten(transform(col("__ids"),
          a => transform(col("__ids"), b => struct(a.as("id_a"), b.as("id_b"))))),
        p => p.getField("id_a") < p.getField("id_b"))).as("__p"))
      .select(col("__p.id_a").as("id_a"), col("__p.id_b").as("id_b"))
      .distinct()
    time("s2: candidates") { candidates.count() }
    val jac = candidates
      .join(sigs.select(col("__id").as("id_a"), col("__set").as("__sa"),
        col("__n").as("__na")), Seq("id_a"))
      .join(sigs.select(col("__id").as("id_b"), col("__set").as("__sb"),
        col("__n").as("__nb")), Seq("id_b"))
      .withColumn("__inter", size(array_intersect(col("__sa"), col("__sb"))))
      .filter(col("__inter").cast("double") /
        (col("__na") + col("__nb") - col("__inter")).cast("double") >= 0.3)
    time("s3: jaccard") { jac.count() }
    spark.stop()
  }
}
