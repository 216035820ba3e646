package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.cypher.Cypher
import graft.graph.{EdgeLabel, PropertyGraph, TpchGraph, VertexLabel}

/** §56's seed-pushdown measurement repeated on OPTIONAL MATCH (r12
  * verdict missing #4), on the same CYCLIC trade graph §56/§62 used —
  * the fact→dimension chains are dimension-bounded and show nothing.
  * The same seeded traversal runs twice: once with the pushable
  * single-variable conjunct (planner pushes it into the optional
  * pattern's source scan, so the BFS runs from the selected sources
  * only) and once as a two-variable disjunction that is semantically
  * identical but blocks the push (the second disjunct is vacuously
  * false), so the BFS runs from EVERY customer. Results must be equal;
  * the wall gap is what the push buys an OPTIONAL traversal.
  *
  * Each arm runs in its own JVM (`pushed` / `blocked` arg): the
  * blocked arm's all-sources frontier can OOM the probe heap outright
  * (an executor-thread OOM exits the JVM in local mode), and that
  * outcome is itself the measurement — record it without losing the
  * pushed arm's numbers.
  *
  * Usage: runMain graft.tools.OptSeedProbe <sfDir> <pushed|blocked> [iters=3]
  */
object OptSeedProbe {
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
    // the IterScale trade graph: c→s per high-quantity 'R' lineitem,
    // s→c per 'A' — real cycles, frontier scales with the data
    val g = {
      val stride = 1L << graft.types.GraphId.EntryIdBits
      def gid(labelId: Int, entry: org.apache.spark.sql.Column) =
        lit(labelId.toLong * stride) + entry.cast("long")
      val li = t("lineitem")
        .join(t("orders"), col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_quantity") > 42)
      val cGid = gid(TpchGraph.CustomerL, col("o_custkey"))
      val sGid = gid(TpchGraph.SupplierL, col("l_suppkey"))
      val ed = li.filter(col("l_returnflag") === "R")
        .select(cGid.as("s"), sGid.as("t"))
        .unionByName(li.filter(col("l_returnflag") === "A")
          .select(sGid.as("s"), cGid.as("t")))
        .distinct()
        .withColumn("__rn", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy("s", "t")))
        .select(gid(20, col("__rn")).as("id"),
          col("s").as("start_id"), col("t").as("end_id"))
      val cv = t("customer").select(gid(TpchGraph.CustomerL, col("c_custkey")).as("id"))
      val sv = t("supplier").select(gid(TpchGraph.SupplierL, col("s_suppkey")).as("id"))
      new PropertyGraph("trade_probe",
        Seq(VertexLabel("Customer", TpchGraph.CustomerL, cv),
          VertexLabel("Supplier", TpchGraph.SupplierL, sv)),
        Seq(EdgeLabel("TRADES", 20, ed)))
    }

    val pushedPred = "id(c) % 1021 = 1"
    // same rows (the second disjunct is false for every vertex id), but
    // a two-variable conjunct is not pushable by design
    val blockedPred = "(id(c) % 1021 = 1 OR id(s) < -900000000000000)"
    def q(pred: String): String =
      s"""MATCH (s:Supplier) WHERE id(s) % 293 = 1
         |OPTIONAL MATCH p = shortestpath((c:Customer)-[:TRADES*..4]->(s))
         |WHERE $pred
         |RETURN count(*) AS outer_rows, count(p) AS n_paths""".stripMargin

    val pred = if (arm == "pushed") pushedPred else blockedPred
    def run(): (Double, Seq[(Long, Long)]) = {
      spark.catalog.clearCache()
      System.gc()
      Thread.sleep(200)
      val t0 = System.nanoTime()
      val rows = Cypher.query(spark, g, q(pred)).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[optseed] $arm run: $dt%.2f s rows=$rows") // eager — an
      // OOM on a later iteration must not lose earlier numbers
      (dt, rows)
    }
    val runs = (1 to iters).map(_ => run())
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.length / 2)
    println(f"[optseed] optional shortestpath (cyclic trade graph) " +
      f"$arm med=${med(runs.map(_._1))}%7.2f s  rows=${runs.head._2}")
    spark.stop()
  }
}
