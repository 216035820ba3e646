package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.graph.TpchGraph

/** Stage timer for the thresholded-jaccard plan (dev tool): replicates
  * jaccardThresholded's stages one by one and prints per-stage wall
  * time plus row counts, so a perf regression has a named owner before
  * the plan is rewritten. */
object JacProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val t = 0.5
    val degCap = 64
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.expressions.Window

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[jac] $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val g = TpchGraph(spark, sfDir)
    val ed = g.allEdges.select(col("start_id").as("src"), col("end_id").as("dst"))
    val und = ed.union(ed.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst")).distinct()
    val deg = und.groupBy(col("src").as("v")).agg(count(lit(1)).as("deg"))
    val mids0 = und.join(deg.filter(col("deg") <= degCap), col("src") === col("v"))
      .select(col("src").as("mid"), col("deg").as("mdeg"), col("dst").as("leaf"))
      .join(deg.select(col("v").as("leaf"), col("deg").as("ldeg")), Seq("leaf"))

    val mids = time("mids checkpoint")(mids0.localCheckpoint(true))
    println(s"[jac]   mids rows = ${mids.count()}")

    val sa = mids.groupBy(col("leaf")).agg(count(lit(1)).as("__sa"))
    val ranked = mids.join(sa, Seq("leaf")).withColumn("__rn",
      row_number().over(
        Window.partitionBy("leaf").orderBy(col("mdeg"), col("mid"))))
    val pref = time("pref checkpoint")(ranked
      .filter(col("__rn") <= col("__sa") - ceil(lit(t) * col("ldeg")) + 1)
      .select(col("mid"), col("leaf"), col("ldeg"), col("__sa"), col("__rn"))
      .localCheckpoint(true))
    println(s"[jac]   pref rows = ${pref.count()}")

    val minOv = ceil(lit(t) * (col("x.ldeg") + col("y.ldeg")) / (1 + t))
    val cands = pref.as("x").join(pref.as("y"), col("x.mid") === col("y.mid"))
      .filter(col("x.leaf") < col("y.leaf"))
      .filter(least(col("x.__sa"), col("y.__sa")) >= minOv)
      .filter(lit(1) + least(col("x.__sa") - col("x.__rn"),
        col("y.__sa") - col("y.__rn")) >= minOv)
      .select(col("x.leaf").as("id_a"), col("y.leaf").as("id_b"))
      .distinct()
    val candsC = time("cands")(cands.localCheckpoint(true))
    println(s"[jac]   cand pairs = ${candsC.count()}")

    val stream = mids.as("x").join(mids.as("y"), col("x.mid") === col("y.mid"))
      .filter(col("x.leaf") < col("y.leaf"))
      .select(col("x.leaf").as("id_a"), col("y.leaf").as("id_b"),
        col("x.ldeg").as("__da"), col("y.ldeg").as("__db"))
    val out = stream.join(candsC, Seq("id_a", "id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("common"),
        min(col("__da")).as("__da2"), min(col("__db")).as("__db2"))
      .select(col("id_a"), col("id_b"), col("common"),
        (col("common") / (col("__da2") + col("__db2") - col("common")))
          .as("jaccard"))
      .filter(col("jaccard") >= t)
    time("verify+agg")(println(s"[jac]   result pairs = ${out.count()}"))
    spark.stop()
  }
}
