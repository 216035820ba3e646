package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Deterministic k-means over embedding columns — the clustering stage
  * of SemDeDup-style curation (Abbas et al. 2023, arXiv:2303.09540)
  * and of IVF index training, as a graded operator.
  *
  * Floating-point k-means is NOT reproducible across engines or even
  * partitionings (centroid means sum doubles in partition order), so
  * this variant does every step in exact integer arithmetic:
  * components quantize to `floor(x·10⁶ + 0.5)` (portable — multiply,
  * add, floor are exactly defined IEEE ops), distances are integer
  * sums of squares, and centroid updates are `floor(sum/count)` (the
  * double division is exact-enough by a 1/count ≫ ulp margin, so the
  * floor is unambiguous). Every quantity is bit-equal under any
  * partitioning and replayable relationally in a SQL oracle.
  *
  * Scale shape: assignment is ZERO-shuffle — the k·dim codebook rides
  * the plan as ONE typedlit literal (the §19 array-parameter lesson)
  * and each row takes an argmin over a transform'd struct array; the
  * only exchange per iteration is the map-side-combined
  * (cluster, pos) sum for the update, whose result is k·dim rows
  * (metadata-scale) collected to the driver like [[Similarity]]'s
  * codebook. Iterations are O(1) plans — no lineage growth.
  */
object Clustering {

  private val Scale = 1000000L

  /** Quantize an array<float|double> column to exact integer micros. */
  def quantize(vec: Column): Column =
    transform(vec, x => floor(x.cast("double") * Scale + lit(0.5)).cast(LongType))

  /** Squared L2 between two equal-length long-array columns (exact). */
  private def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, x) => acc + x)

  /** Run `iters` Lloyd iterations from the embeddings of the k
    * smallest ids and return the final assignment:
    * (idCol, cluster, dist) where dist is the exact integer squared
    * distance to the winning centroid. `iters = 1` assigns against the
    * initial centroids; each further iteration recomputes centroids
    * from the previous assignment (empty clusters keep their previous
    * centroid) and reassigns. */
  def kmeans(
      corpus: DataFrame, k: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(k >= 1 && iters >= 1, s"kmeans(k=$k, iters=$iters)")
    val q = corpus
      .select(col(idCol).cast(LongType).as("__id"), quantize(col(vecCol)).as("__q"))

    // deterministic init: the k smallest ids, cluster index in id order
    var centroids: Seq[(Int, Seq[Long])] = q.orderBy(col("__id")).limit(k)
      .collect().zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Long](1).toSeq) }.toSeq

    def assign(): DataFrame = {
      // ONE literal node for the whole codebook; per-row argmin over a
      // struct array — lexicographic array_min ties to the smallest
      // cluster index with no shuffle
      val cb = typedlit(centroids.map { case (i, v) => (i, v) })
      q.withColumn("__best", array_min(transform(cb, c =>
          struct(sqDist(col("__q"), c.getField("_2")).as("d"),
            c.getField("_1").cast(LongType).as("k")))))
        .select(col("__id"), col("__best.k").as("cluster"),
          col("__best.d").as("dist"), col("__q"))
    }

    var assigned = assign()
    for (_ <- 2 to iters) {
      // exact integer centroid update: floor(sum/count) per component
      val sums = assigned
        .select(col("cluster"), posexplode(col("__q")).as(Seq("pos", "v")))
        .groupBy(col("cluster"), col("pos"))
        .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
        .select(col("cluster"), col("pos"),
          floor(col("s") / col("n")).cast(LongType).as("c"))
        .collect()
      val byCluster = sums.groupBy(_.getLong(0).toInt)
      centroids = centroids.map { case (i, prev) =>
        byCluster.get(i) match {
          case Some(rows) =>
            (i, rows.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq)
          case None => (i, prev) // empty cluster keeps its centroid
        }
      }
      assigned = assign()
    }
    assigned.select(col("__id").as(idCol), col("cluster"), col("dist"))
  }
}
