package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over embedding columns (array<float>).
  *
  * Brute-force cosine is the exact baseline: one scan + TakeOrdered —
  * fully distributed, no shuffle beyond the final top-k. The LSH-bucketed
  * variant (random-hyperplane signatures) is the 100 TB path: candidate
  * generation becomes an equi-join on signature prefixes, pruning the
  * n·m dot products to bucket-local ones.
  */
object Similarity {

  /** Inner product — a native codegen'd Expression (graft.functions
    * .DotProduct); semantically identical to
    * aggregate(zip_with(a, b, _*_), 0.0, _+_) but fused into one loop
    * inside whole-stage codegen instead of per-element HOF lambdas. */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.dotProduct(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k nearest neighbors of `queryVec` by cosine.
    * Output: (vec_id, sim) ordered by sim desc, id asc. */
  def bruteForceTopK(
      embeddings: DataFrame, queryVec: Seq[Double], k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = array(queryVec.map(lit): _*)
    embeddings
      .select(col(idCol),
        round(cosine(col(vecCol).cast(ArrayType(DoubleType)), q), 6).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** All-pairs exact top-k per query row against a corpus — broadcast the
    * (small) query set, scan the corpus once, window-rank per query. */
  def crossTopK(
      queries: DataFrame, corpus: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = broadcast(queries.select(col(idCol).as("q_id"),
      col(vecCol).cast(ArrayType(DoubleType)).as("q_vec")))
    val c = corpus.select(col(idCol).as("c_id"),
      col(vecCol).cast(ArrayType(DoubleType)).as("c_vec"))
    val scored = q.join(c, col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        round(cosine(col("q_vec"), col("c_vec")), 6).as("sim"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("c_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k).drop("rk")
  }

  /** Hyperplane sign for plane `i`, coordinate `d`: ±1 derived from the
    * portable md5 hash. Pure driver-side constant — the planes embed in
    * the Spark plan AND the SQL oracle as identical literals. */
  def rhpSign(i: Int, d: Int): Double =
    if (TextOps.md5Long(s"$i,$d") % 2 == 0) 1.0 else -1.0

  /** Random-hyperplane LSH signature: bit i = sign(dot(v, h_i)) with
    * deterministic pseudo-random hyperplanes — no stored model,
    * reproducible across runs/executors, and (since the signs are
    * plan-time literals) zero per-row hashing cost. `planeSeed` selects
    * an independent plane family (for band-OR amplification). */
  def rhpSignature(vec: Column, bits: Int, dim: Int, planeSeed: Int = 0): Column = {
    val planes = (0 until bits).map { i =>
      val signs = array((0 until dim).map(d =>
        lit(rhpSign(planeSeed * 10000 + i, d))): _*)
      val contrib = dot(vec, signs)
      when(contrib > 0, shiftleft(lit(1L), i)).otherwise(0L)
    }
    planes.reduce((a, b) => a.bitwiseOR(b))
  }

  /** IVF-style ANN: a coarse quantizer partitions the corpus into cells
    * (inverted lists); a query probes only its `nProbe` nearest cells and
    * exact-reranks within them — the classic recall/cost dial. The
    * codebook here is a deterministic corpus sample (`id % sampleMod = 0`)
    * so results are reproducible and SQL-oracle-checkable; swap in
    * k-means centroids at deployment — the dataflow (broadcast codebook,
    * argmin assignment, cell-local search) is identical and shuffles only
    * on the cell id. Output: (q_id, c_id, sim), top-k per query. */
  def ivfTopK(
      queries: DataFrame, corpus: DataFrame, k: Int, nProbe: Int, sampleMod: Long,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // norms hoisted out of the per-pair comparison: the codebook scan
    // computes |v| once per vector instead of once per (vector, centroid)
    // pair — the dot product is the only per-pair array pass
    val cents = broadcast(corpus.filter(col(idCol) % sampleMod === 0)
      .select(col(idCol).as("cent_id"),
        col(vecCol).cast(ArrayType(DoubleType)).as("cent_vec"))
      .withColumn("cent_nrm", norm(col("cent_vec"))))
    def nearestCells(df: DataFrame, outId: String, outVec: String, keep: Int) = {
      val w = Window.partitionBy(col(outId))
        .orderBy(col("__csim").desc, col("cent_id"))
      df.select(col(idCol).as(outId),
          col(vecCol).cast(ArrayType(DoubleType)).as(outVec))
        .withColumn("__nrm", norm(col(outVec)))
        .join(cents)
        .withColumn("__csim",
          round(dot(col(outVec), col("cent_vec")) / (col("__nrm") * col("cent_nrm")), 6))
        .withColumn("__rk", row_number().over(w))
        .filter(col("__rk") <= keep)
        .select(col(outId), col(outVec), col("__nrm"),
          col("cent_id").as("cell"))
    }
    val assigned = nearestCells(corpus, "c_id", "c_vec", 1)
      .withColumnRenamed("__nrm", "__cnrm")
    val probes = nearestCells(queries, "q_id", "q_vec", nProbe)
      .withColumnRenamed("__nrm", "__qnrm")
    val scored = probes.join(assigned, Seq("cell"))
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        round(dot(col("q_vec"), col("c_vec")) / (col("__qnrm") * col("__cnrm")), 6)
          .as("sim"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("c_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k).drop("rk")
  }

  /** Approximate NN: bucket by RHP signature, search within bucket
    * (plus optional multi-probe by signature ^ single-bit flips). */
  def lshTopK(
      queries: DataFrame, corpus: DataFrame, k: Int, bits: Int, dim: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col(idCol).as("q_id"),
      col(vecCol).cast(ArrayType(DoubleType)).as("q_vec"))
      .withColumn("sig", rhpSignature(col("q_vec"), bits, dim))
    val c = corpus.select(col(idCol).as("c_id"),
      col(vecCol).cast(ArrayType(DoubleType)).as("c_vec"))
      .withColumn("sig", rhpSignature(col("c_vec"), bits, dim))
    val scored = q.join(c, Seq("sig")).filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        round(cosine(col("q_vec"), col("c_vec")), 6).as("sim"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("c_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k).drop("rk")
  }
}
