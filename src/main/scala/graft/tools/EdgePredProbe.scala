package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.cypher.Cypher
import graft.graph.{EdgeLabel, PropertyGraph, TpchGraph, VertexLabel}

/** Edge-predicate pushdown measurement (PLANS §73) on the §56/§62
  * cyclic trade graph, weighted: `all(x IN r WHERE x.weight > t)` over
  * a bounded VLE runs once in its pushable form (the planner filters
  * the traversal's edge frame before expansion, so dead branches are
  * never explored) and once as a semantically identical two-variable
  * disjunction that blocks the push (the second disjunct is vacuously
  * false), so the expansion walks the FULL edge set and the all() is
  * evaluated after materializing every path's edge entities. Results
  * must be equal; the wall gap is what the push buys.
  *
  * Arms run in separate JVMs (`pushed` / `blocked` arg): the blocked
  * arm's full-graph expansion can OOM the probe heap, and that outcome
  * is itself the measurement.
  *
  * Usage: runMain graft.tools.EdgePredProbe <sfDir> <pushed|blocked> [iters=3]
  */
object EdgePredProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val arm = args(1)
    val iters = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String) = spark.read.parquet(s"$sfDir/$name.parquet")
    // the IterScale trade graph with the lineitem quantity kept as an
    // edge weight (36..50 after the >35 cut; denser than the IterScale
    // cut so depth-6 expansion has real fan-out): c→s per high-quantity 'R'
    // lineitem, s→c per 'A' — real cycles, frontier scales with data
    val g = {
      val stride = 1L << graft.types.GraphId.EntryIdBits
      def gid(labelId: Int, entry: org.apache.spark.sql.Column) =
        lit(labelId.toLong * stride) + entry.cast("long")
      val li = t("lineitem")
        .join(t("orders"), col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_quantity") > 35)
      val cGid = gid(TpchGraph.CustomerL, col("o_custkey"))
      val sGid = gid(TpchGraph.SupplierL, col("l_suppkey"))
      val ed = li.filter(col("l_returnflag") === "R")
        .select(cGid.as("s"), sGid.as("t"), col("l_quantity").as("w"))
        .unionByName(li.filter(col("l_returnflag") === "A")
          .select(sGid.as("s"), cGid.as("t"), col("l_quantity").as("w")))
        .groupBy("s", "t").agg(max(col("w")).as("weight"))
        .withColumn("__rn", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy("s", "t")))
        .select(gid(20, col("__rn")).as("id"),
          col("s").as("start_id"), col("t").as("end_id"), col("weight"))
      val cv = t("customer").select(gid(TpchGraph.CustomerL, col("c_custkey")).as("id"))
      val sv = t("supplier").select(gid(TpchGraph.SupplierL, col("s_suppkey")).as("id"))
      new PropertyGraph("trade_probe_w",
        Seq(VertexLabel("Customer", TpchGraph.CustomerL, cv),
          VertexLabel("Supplier", TpchGraph.SupplierL, sv)),
        Seq(EdgeLabel("TRADES", 20, ed)))
    }

    val pushedPred = "all(x IN r WHERE x.weight >= 49)"
    // same rows (the disjunct is false for every vertex id), but a
    // two-variable all()-body is not pushable by design
    val blockedPred =
      "all(x IN r WHERE x.weight >= 49 OR id(c) < -900000000000000)"
    def q(pred: String): String =
      s"""MATCH (c:Customer)-[r:TRADES*..6]->(s:Supplier)
         |WHERE id(c) % 293 = 1 AND $pred
         |RETURN count(*) AS n_paths, count(DISTINCT id(s)) AS n_dsts""".stripMargin

    val pred = if (arm == "pushed") pushedPred else blockedPred
    def run(): (Double, Seq[(Long, Long)]) = {
      spark.catalog.clearCache()
      System.gc()
      Thread.sleep(200)
      val t0 = System.nanoTime()
      val rows = Cypher.query(spark, g, q(pred)).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[edgepred] $arm run: $dt%.2f s rows=$rows") // eager — an
      // OOM on a later iteration must not lose earlier numbers
      (dt, rows)
    }
    val runs = (1 to iters).map(_ => run())
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.length / 2)
    println(f"[edgepred] bounded VLE all()-push (cyclic trade graph) " +
      f"$arm med=${med(runs.map(_._1))}%7.2f s  rows=${runs.head._2}")
    spark.stop()
  }
}
