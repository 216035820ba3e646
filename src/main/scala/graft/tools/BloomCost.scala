package graft.tools

import org.apache.spark.sql.SparkSession

import graft.graph.{GraphStore, PropertyGraph, TpchGraph}

/** Measures autoBloom's write-side cost on the real tpch labels (the
  * r9 verdict #6 question): saveBucketed wall time and on-disk bytes
  * with auto-designation ON vs OFF, N repetitions each, interleaved.
  * The designation adds one stats aggregate per label (count + approx
  * NDV + string avg-length) plus the parquet bloom writer's hashing
  * and filter blocks for the designated columns.
  *
  * Usage: runMain graft.tools.BloomCost <sfDir> [iters=3]
  */
object BloomCost {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val iters = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val g0 = TpchGraph(spark, sfDir)

    def dirBytes(p: java.io.File): Long =
      if (p.isFile) p.length()
      else Option(p.listFiles()).map(_.map(dirBytes).sum).getOrElse(0L)

    def wh: java.io.File = new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath)

    def save(name: String, auto: Boolean): (Double, Long) = {
      val g = new PropertyGraph(name, g0.vertexLabels, g0.edgeLabels)
      val t0 = System.nanoTime()
      GraphStore.saveBucketed(g, spark, analyze = false, autoBloom = auto)
      val s = (System.nanoTime() - t0) / 1e9
      val bytes = Option(wh.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.startsWith(s"${name}_")).map(dirBytes).sum
      (s, bytes)
    }

    // designation report: what autoBloom picks per label at this SF
    for (l <- g0.vertexLabels)
      println(s"[bloomcost] label v:${l.name} auto=${GraphStore.autoBloomCols(l.df).mkString(",")}")
    for (l <- g0.edgeLabels)
      println(s"[bloomcost] label e:${l.name} auto=${GraphStore.autoBloomCols(l.df).mkString(",")}")

    val on = Array.newBuilder[(Double, Long)]
    val off = Array.newBuilder[(Double, Long)]
    for (i <- 1 to iters) {
      off += save(s"bloomcost_off_$i", auto = false)
      on += save(s"bloomcost_on_$i", auto = true)
    }
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.length / 2)
    val (onT, onB) = (med(on.result().map(_._1).toSeq), on.result().map(_._2).max)
    val (offT, offB) = (med(off.result().map(_._1).toSeq), off.result().map(_._2).max)
    println(f"[bloomcost] save_s  auto=ON $onT%7.2f  OFF $offT%7.2f  " +
      f"(+${(onT / offT - 1) * 100}%.1f%%)")
    println(f"[bloomcost] bytes   auto=ON $onB%d  OFF $offB%d  " +
      f"(+${(onB.toDouble / offB - 1) * 100}%.1f%%)")
    spark.stop()
  }
}
