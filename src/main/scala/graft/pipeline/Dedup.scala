package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication operators for training-data pipelines.
  *
  * Scale design: exact dedup is one hash-shuffle; MinHash-LSH turns the
  * O(n²) near-dup problem into band-bucket equi-joins (shuffle on band
  * signature, candidate pairs only within buckets) — the standard
  * shingle→minhash→band→bucket-join pipeline; SimHash reduces each doc
  * to a 64-bit signature joinable on rotated prefixes. No driver-side
  * loops; everything is DataFrame ops.
  */
object Dedup {

  /** Exact duplicate groups by content hash. Returns one row per
    * duplicated content: (keep_id = min id, dup_count). */
  def exactDupGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))
      .filter(col("dup_count") > 1)

  /** Exact dedup: keep the smallest id per distinct content. */
  def dedupExact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val keep = df.groupBy(md5(col(textCol)).as("__h")).agg(min(col(idCol)).as(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }

  /** MinHash signature: for each of `numHashes` seeded hash functions,
    * min over the doc's shingle hashes. xxhash64(seed, shingle) keeps
    * everything in codegen. Returns array<long> of length numHashes. */
  def minhashSignature(text: Column, shingleK: Int, numHashes: Int): Column = {
    val sh = TextOps.shingles(text, shingleK)
    array((0 until numHashes).map { seed =>
      array_min(transform(sh, s => xxhash64(lit(seed), s)))
    }: _*)
  }

  /** LSH candidate pairs: split the signature into `bands` bands of
    * `rows` hashes; docs sharing any band bucket are candidates, then
    * exact-Jaccard-verified on their shingle sets.
    *
    * Returns (id_a, id_b, jaccard) with id_a < id_b and jaccard >=
    * threshold. The band join shuffles on (band index, band hash) —
    * candidate generation never materializes the n² pair space.
    */
  def minhashLsh(
      df: DataFrame, textCol: String, idCol: String,
      shingleK: Int = 3, bands: Int = 8, rowsPerBand: Int = 4,
      threshold: Double = 0.5, maxBucketSize: Int = 200): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val numHashes = bands * rowsPerBand
    // (doc, shingle-hash) SET rows: one window-based shingling pass.
    // Everything downstream is aggregation/join over these rows — no
    // array HOFs, no per-position re-tokenization.
    val ex = TextOps.shingleRows(df, textCol, idCol, shingleK)
      .select(col("__id"), xxhash64(col("__sh")).as("__h"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // One groupBy computes the shingle-set size AND all seed-minima.
    // One tiny row per document — cached because every later stage
    // (banding, candidate join, Jaccard) reuses it; at cluster scale
    // this is the signature table you would materialize anyway.
    val sigs = ex.groupBy("__id").agg(
      count(lit(1)).as("__n"),
      (0 until numHashes).map(seed =>
        min(xxhash64(lit(seed), col("__h"))).as(s"__m$seed")): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // band bucket = hash of the band's minima + band index
    val bandCols = (0 until bands).map { b =>
      xxhash64(lit(b) +: (0 until rowsPerBand)
        .map(r => col(s"__m${b * rowsPerBand + r}")): _*).as(s"__b$b")
    }
    val banded = sigs.select(col("__id") +: bandCols: _*)
      .select(col("__id"),
        posexplode(array((0 until bands).map(b => col(s"__b$b")): _*)))
      .withColumnRenamed("pos", "__band").withColumnRenamed("col", "__bucket")

    // Cap bucket sizes in-line with a window: an over-full bucket is
    // non-discriminative and would make candidate generation quadratic.
    val pruned = banded
      .withColumn("__cnt",
        count(lit(1)).over(Window.partitionBy("__band", "__bucket")))
      .filter(col("__cnt").between(2, maxBucketSize))
      .drop("__cnt")

    val l = pruned.select(col("__band"), col("__bucket"), col("__id").as("id_a"))
    val r = pruned.select(col("__band"), col("__bucket"), col("__id").as("id_b"))
    val candidates = l.join(r, Seq("__band", "__bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct() // same pair may collide in several bands

    // exact Jaccard via joins on the shingle-hash rows:
    // |A∩B| = matching-hash count, |A∪B| = |A| + |B| − |A∩B|
    val inter = candidates
      .join(ex.select(col("__id").as("id_a"), col("__h")), Seq("id_a"))
      .join(ex.select(col("__id").as("id_b"), col("__h")), Seq("id_b", "__h"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("__inter"))
    inter
      .join(sigs.select(col("__id").as("id_a"), col("__n").as("__na")), Seq("id_a"))
      .join(sigs.select(col("__id").as("id_b"), col("__n").as("__nb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(col("__inter").cast(DoubleType) /
          (col("__na") + col("__nb") - col("__inter")).cast(DoubleType), 4)
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Exact n-gram Jaccard similarity for given candidate pairs
    * (or all pairs of a small frame when `pairs` is None — testing only). */
  def ngramJaccard(
      df: DataFrame, textCol: String, idCol: String, shingleK: Int = 3): DataFrame = {
    val sh = df.select(col(idCol).as("id_a"),
      TextOps.shingles(col(textCol), shingleK).as("__sh_a"))
    val sh2 = df.select(col(idCol).as("id_b"),
      TextOps.shingles(col(textCol), shingleK).as("__sh_b"))
    sh.crossJoin(sh2).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(size(array_intersect(col("__sh_a"), col("__sh_b"))).cast(DoubleType) /
          size(array_union(col("__sh_a"), col("__sh_b"))).cast(DoubleType), 4)
          .as("jaccard"))
  }

  /** SimHash: 64-bit signature; bit b is the sign of the sum over tokens
    * of ±1 weighted by bit b of the token hash. Near-dups differ in few
    * bits (Hamming distance). Pure HOF pipeline, no UDF. */
  def simhash(text: Column): Column = {
    val toks = TextOps.tokens(text)
    val hashes = transform(toks, t => xxhash64(t))
    // bit b of the signature = sign of sum over tokens of (bit b of
    // token hash ? +1 : -1); shifts are compile-time constants so the
    // whole expression stays codegen-able
    (0 until 64).map { b =>
      val cnt = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, b).bitwiseAND(1) === 1, 1L).otherwise(-1L))
      when(cnt > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce((a, c) => a.bitwiseOR(c))
  }

  /** Hamming distance between two simhash signatures. */
  def hammingDist(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))
}
