package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.pipeline.Similarity

/** Dev tool: time semanticDedup over an embeddings dir with a chosen
  * centroid count — evidence that centroid count is the scale dial that
  * keeps the cluster-local pair space linear as the corpus grows
  * (constant cluster SIZE, not constant cluster COUNT).
  *
  * Usage: runMain graft.tools.SemScale <dir> <sampleMod> <maxCentroids> [iters=3]
  */
object SemScale {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val sampleMod = args(1).toLong
    val maxCents = args(2).toInt
    val iters = args.drop(3).headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast(ArrayType(DoubleType)).as("embedding"))
    val dup = e.filter(col("vec_id") < 20)
      .select((col("vec_id") + 1000000).as("vec_id"),
        transform(col("embedding"),
          (x, i) => when(i === 0, x + lit(0.01)).otherwise(x)).as("embedding"))
    val corpus = e.unionByName(dup)
    val cb = Similarity.ivfCodebook(e, sampleMod = sampleMod, maxCentroids = maxCents)
    for (i <- 1 to iters) {
      spark.catalog.clearCache(); System.gc(); Thread.sleep(200)
      val t0 = System.nanoTime()
      val n = Similarity.semanticDedup(corpus, 0.99, cb, maxCents).count()
      println(f"[semscale] cents<=$maxCents iter $i  ${(System.nanoTime() - t0) / 1e9}%6.3f s  dropped=$n")
    }
    spark.stop()
  }
}
