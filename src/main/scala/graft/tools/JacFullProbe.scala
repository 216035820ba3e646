package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.graph.TpchGraph

/** Stage timer + variant bench for the UNTHRESHOLDED jaccard full
  * wedge plan (dev tool, r14 optimization): decomposes the current
  * shape's cost (und build / mids build / self-join+aggregate) and
  * times candidate rewrites side by side on the store-backed graph —
  * a plan rewrite needs a measured owner first (guide §1.2).
  * Usage: runMain graft.tools.JacFullProbe <sfDir> [iters]
  */
object JacFullProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val degCap = 64
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[A](name: String)(f: => A): A = {
      spark.catalog.clearCache(); System.gc(); Thread.sleep(200)
      val t0 = System.nanoTime()
      val r = f
      println(f"[jacfull] $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val g = TpchGraph.storeBacked(spark, sfDir)
    val ed = g.allEdges.select(col("start_id").as("src"), col("end_id").as("dst"))

    // current shape pieces
    def undCur = ed.union(ed.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst")).distinct()
    def degOf(und: DataFrame) =
      und.groupBy(col("src").as("v")).agg(count(lit(1)).as("deg"))
    def midsOf(und: DataFrame, deg: DataFrame) =
      und.join(deg.filter(col("deg") <= degCap), col("src") === col("v"))
        .select(col("src").as("mid"), col("deg").as("mdeg"), col("dst").as("leaf"))
        .join(deg.select(col("v").as("leaf"), col("deg").as("ldeg")), Seq("leaf"))
    def topOf(mids: DataFrame): DataFrame = {
      val stream = mids.as("x").join(mids.as("y"), col("x.mid") === col("y.mid"))
        .filter(col("x.leaf") < col("y.leaf"))
        .select(col("x.leaf").as("id_a"), col("y.leaf").as("id_b"),
          col("x.ldeg").as("__da"), col("y.ldeg").as("__db"))
      stream.groupBy(col("id_a"), col("id_b"))
        .agg(count(lit(1)).as("common"),
          min(col("__da")).as("da"), min(col("__db")).as("db"))
        .select(col("id_a"), col("id_b"), col("common"),
          (col("common") / (col("da") + col("db") - col("common"))).as("jaccard"))
        .orderBy(desc("jaccard"), col("id_a"), col("id_b")).limit(10)
    }

    // one-shuffle und: partition by src once; dedup and degree are then
    // partition-local (HashPartitioning(src) ⊂ dedup keys — LPA idiom)
    val parts = spark.sessionState.conf.numShufflePartitions
    def undOne = ed.union(ed.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst"))
      .repartition(parts, col("src"))
      .dropDuplicates("src", "dst")

    // per-mid array pair generation: mids are degree-capped (≤ degCap
    // entries per group — NOT the per-leaf hub trap), so collect the
    // capped adjacency per mid and explode C(d,2) ordered pairs in-row,
    // replacing the SMJ self-join (two 2.1M-row sorts + probe) with one
    // bounded-group aggregate + generator.
    def topArr(mids: DataFrame): DataFrame = {
      val adj = mids.groupBy(col("mid"))
        .agg(sort_array(collect_list(struct(col("leaf"), col("ldeg"))))
          .as("__a"))
      val pairs = adj.select(explode(flatten(transform(col("__a"),
        (x, i) => transform(slice(col("__a"), i + 2, size(col("__a"))),
          y => struct(x.getField("leaf").as("id_a"),
            y.getField("leaf").as("id_b"),
            x.getField("ldeg").as("__da"),
            y.getField("ldeg").as("__db")))))).as("__p"))
        .select(col("__p.id_a"), col("__p.id_b"),
          col("__p.__da"), col("__p.__db"))
      pairs.groupBy(col("id_a"), col("id_b"))
        .agg(count(lit(1)).as("common"),
          min(col("__da")).as("da"), min(col("__db")).as("db"))
        .select(col("id_a"), col("id_b"), col("common"),
          (col("common") / (col("da") + col("db") - col("common"))).as("jaccard"))
        .orderBy(desc("jaccard"), col("id_a"), col("id_b")).limit(10)
    }

    // single-scan both-directions (the new edgesBothDirs shape)
    def bothDirs = g.allEdges.select(explode(array(
        struct(col("start_id").as("src"), col("end_id").as("dst")),
        struct(col("end_id").as("src"), col("start_id").as("dst")))).as("__e"))
      .select(col("__e.src").as("src"), col("__e.dst").as("dst"))
    // V5: coalesce survives under the dedup AGGREGATE's own exchange
    // (CollapseRepartition kills it under an explicit repartition)
    def undAgg = bothDirs.coalesce(parts)
      .filter(col("src") =!= col("dst")).dropDuplicates("src", "dst")
    // V6: explicit repartition (current prod shape, coalesce collapsed)
    def undRep = bothDirs.filter(col("src") =!= col("dst"))
      .repartition(parts, col("src")).dropDuplicates("src", "dst")
    // degree packing: one long through the wedge exchange instead of two
    def topPacked(mids: DataFrame): DataFrame = {
      val stream = mids.as("x").join(mids.as("y"), col("x.mid") === col("y.mid"))
        .filter(col("x.leaf") < col("y.leaf"))
        .select(col("x.leaf").as("id_a"), col("y.leaf").as("id_b"),
          (shiftleft(col("x.ldeg"), 32) + col("y.ldeg")).as("__dd"))
      stream.groupBy(col("id_a"), col("id_b"))
        .agg(count(lit(1)).as("common"), min(col("__dd")).as("dd"))
        .select(col("id_a"), col("id_b"), col("common"),
          (col("common") / (shiftright(col("dd"), 32) +
            col("dd").bitwiseAND(lit(0xffffffffL)) - col("common"))).as("jaccard"))
        .orderBy(desc("jaccard"), col("id_a"), col("id_b")).limit(10)
    }
    for (i <- 1 to iters) {
      println(s"--- iter $i ---")
      time(s"V6 repart(src) top10") {
        noop(topOf(midsOf(undRep, degOf(undRep))))
      }
      time(s"V5 coalesce+aggdedup top10") {
        noop(topOf(midsOf(undAgg, degOf(undAgg))))
      }
      time(s"V7 repart packed top10") {
        noop(topPacked(midsOf(undRep, degOf(undRep))))
      }
      time(s"V8 coalesce+aggdedup packed top10") {
        noop(topPacked(midsOf(undAgg, degOf(undAgg))))
      }
    }
    // how many exchanges does the executed current plan actually run?
    val top = topOf { val u = undCur; midsOf(u, degOf(u)) }
    noop(top)
    val fin = top.queryExecution.executedPlan.toString
    def cnt(p: String) = p.r.findAllIn(fin).size
    println(s"[jacfull] final plan: Exchange=${cnt("Exchange")} " +
      s"Reused=${cnt("ReusedExchange")} SMJ=${cnt("SortMergeJoin")} " +
      s"BHJ=${cnt("BroadcastHashJoin")} scans=${cnt("Scan parquet")}")
    spark.stop()
  }
}
