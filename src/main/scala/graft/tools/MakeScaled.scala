package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesize an N× scale-up of a testdata directory for scaling
  * evidence runs (PLANS.md §26): fact tables replicate N times with
  * key offsets so foreign keys stay consistent and distinct-key
  * cardinality scales linearly; fixed dimensions (region, nation) copy
  * through. Document text is salted per replica (every token gets a
  * replica suffix), so shingle/MinHash workloads scale linearly — raw
  * replication would make each document a near-duplicate of its own
  * replicas and blow candidate-pair counts up quadratically, which is
  * not a scale-up, it's a different workload.
  *
  * Usage: runMain graft.tools.MakeScaled <srcDir> <outDir> [factor=10]
  */
object MakeScaled {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val factor = args.drop(2).headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")
    def write(df: DataFrame, name: String): Unit =
      df.write.mode(SaveMode.Overwrite).parquet(s"$out/$name.parquet")
    // per-replica key STRIDE = max(key) + 1: the testdata keys are
    // 0-BASED dense (0..n-1), so an offset of i * max(key) overlapped
    // one key at every replica boundary (replica i's key 0 == replica
    // i-1's key max) — 9 duplicate keys per table at factor 10, enough
    // to put duplicate vertex ids into graph overlays and quietly
    // corrupt join-multiplicity at the seams. max+1 tiles exactly.
    def strideOf(df: DataFrame, c: String): Long =
      df.agg(max(col(c))).collect()(0).getLong(0) + 1L

    // replicate with per-replica key offsets: replica i shifts each key
    // space by i * stride so key spaces tile disjointly and FK joins
    // stay replica-consistent
    def rep(df: DataFrame)(shift: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until factor).map(i => shift(df, i)).reduce(_ unionByName _)

    val strideCust = strideOf(t("customer"), "c_custkey")
    val strideOrder = strideOf(t("orders"), "o_orderkey")
    val stridePart = strideOf(t("part"), "p_partkey")
    val strideSupp = strideOf(t("supplier"), "s_suppkey")
    val strideDoc = strideOf(t("documents"), "doc_id")
    val strideEvent = strideOf(t("events"), "event_id")
    val strideUser = strideOf(t("events"), "user_id")

    write(t("region"), "region")
    write(t("nation"), "nation")
    write(rep(t("customer")) { (d, i) =>
      d.withColumn("c_custkey", col("c_custkey") + lit(i * strideCust))
        .withColumn("c_name", concat(col("c_name"), lit(s"#r$i")))
    }, "customer")
    write(rep(t("supplier")) { (d, i) =>
      d.withColumn("s_suppkey", col("s_suppkey") + lit(i * strideSupp))
        .withColumn("s_name", concat(col("s_name"), lit(s"#r$i")))
    }, "supplier")
    write(rep(t("part")) { (d, i) =>
      d.withColumn("p_partkey", col("p_partkey") + lit(i * stridePart))
        .withColumn("p_name", concat(col("p_name"), lit(s"#r$i")))
    }, "part")
    write(rep(t("orders")) { (d, i) =>
      d.withColumn("o_orderkey", col("o_orderkey") + lit(i * strideOrder))
        .withColumn("o_custkey", col("o_custkey") + lit(i * strideCust))
    }, "orders")
    write(rep(t("lineitem")) { (d, i) =>
      d.withColumn("l_orderkey", col("l_orderkey") + lit(i * strideOrder))
        .withColumn("l_partkey", col("l_partkey") + lit(i * stridePart))
        .withColumn("l_suppkey", col("l_suppkey") + lit(i * strideSupp))
    }, "lineitem")
    write(rep(t("documents")) { (d, i) =>
      d.withColumn("doc_id", col("doc_id") + lit(i * strideDoc))
        // token-level salt: replicas share (almost) no shingles with
        // each other, so each replica reproduces the source corpus's
        // internal near-dup structure and the whole thing scales
        // linearly. The language-ID marker words stay UNSALTED so
        // langId-gated pipelines (p_curation) see the same language mix
        // at every scale — salting them turned every replica "und" and
        // emptied the curation corpus instead of scaling it.
        .withColumn("text", regexp_replace(col("text"),
          "\\b(?!(?i:the|and|of|le|la|et|der|und|die|el|los|y)\\b)(\\w+)",
          s"$$1_r$i"))
    }, "documents")
    // per-replica TIME shift: replica i's timeline tiles after replica
    // i-1's (stride = span + 1 day). Raw replication kept every replica
    // on the SAME timeline, so the instant-density of the time axis —
    // not the data volume — grew with the factor: any point-in-interval
    // or as-of probe then met factor× more covering candidates, and the
    // interval join's output grew ×factor² (measured: q_interval_join
    // completes at 10× but not in 900 s at 100×, with every covering
    // span a REAL result row). That is a different workload, not a
    // scale-up — a 100× crawl is 100× longer/wider, not 100× denser at
    // every instant. Events only time-join against themselves, so
    // shifting events.ts alone is internally consistent.
    // ts is TIMESTAMP_NTZ: no long cast — diff via day-granularity
    // datediff (+1) and shift in whole days, which also keeps
    // date_trunc('day') bucket populations identical per replica
    val tsStrideDays = t("events")
      .agg((datediff(max(col("ts")).cast("date"),
        min(col("ts")).cast("date")) + lit(1)).as("d"))
      .collect()(0).getInt(0)
    write(rep(t("events")) { (d, i) =>
      d.withColumn("event_id", col("event_id") + lit(i * strideEvent))
        .withColumn("user_id", col("user_id") + lit(i * strideUser))
        .withColumn("ts", col("ts") + expr(s"INTERVAL ${i * tsStrideDays} DAY"))
    }, "events")
    val strideVec = strideOf(t("embeddings"), "vec_id")
    write(rep(t("embeddings")) { (d, i) =>
      // per-replica ORTHOGONAL transform (sign flip of a replica-specific
      // coordinate subset): pairwise cosines WITHIN a replica are exactly
      // preserved — each replica reproduces the source corpus's near-dup
      // structure — while copies of the same vector across replicas land
      // near cosine 0, so ANN/near-dup pair counts scale linearly instead
      // of quadratically on identical-replica pairs
      // replica i (>0) flips the coordinates where bit i of a hash of
      // the coordinate index is set — every replica pair differs on
      // ~half the coordinates, so no two replicas share a transform
      val vec =
        if (i == 0) col("embedding")
        else transform(col("embedding"), (x, j) =>
          when(shiftrightunsigned(xxhash64(j), i % 63).bitwiseAND(lit(1L)) === 0L, x)
            .otherwise(-x))
      d.withColumn("vec_id", col("vec_id") + lit(i * strideVec))
        .withColumn("embedding", vec)
    }, "embeddings")

    println(s"wrote ${factor}x of $src to $out")
    spark.stop()
  }
}
