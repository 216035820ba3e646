package graft.graph

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.types.GraphId

/** Property-style checks for the deterministic iterative algorithms
  * (labelPropagationDet, kCore) on a seeded random graph: results must
  * be invariant to input partitioning, and k-core must satisfy its own
  * fixpoint definition. */
class AlgoPropertySpec extends SparkTestBase {
  import spark.implicits._

  private val VL = 1; private val EL = 2

  /** Seeded Erdős–Rényi-ish graph: n vertices, m random edges. */
  private def randomGraph(n: Int, m: Int, seed: Long, parts: Int): PropertyGraph = {
    val rnd = new scala.util.Random(seed)
    val vs = (1 to n).map(i => Tuple1(GraphId.make(VL, i))).toDF("id")
      .repartition(parts)
    val es = (1 to m).map { j =>
      (GraphId.make(EL, j),
        GraphId.make(VL, rnd.nextInt(n) + 1),
        GraphId.make(VL, rnd.nextInt(n) + 1))
    }.toDF("id", "start_id", "end_id").repartition(parts)
    new PropertyGraph(s"rand_$parts",
      Seq(VertexLabel("node", VL, vs)), Seq(EdgeLabel("edge", EL, es)))
  }

  test("labelPropagationDet is invariant to input partitioning") {
    val a = GraphAlgos.labelPropagationDet(randomGraph(80, 200, seed = 7, parts = 2), 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val b = GraphAlgos.labelPropagationDet(randomGraph(80, 200, seed = 7, parts = 13), 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(a === b)
    assert(a.size === 80)
  }

  test("clusteringCoefficient: K6 closed form (20 triangles, 60 wedges, 1.0)") {
    val r = GraphAlgos.clusteringCoefficient(Generators.completeGraph(spark, 6))
      .collect()(0)
    assert(r.getLong(0) === 20L)
    assert(r.getLong(1) === 60L)
    assert(r.getDouble(2) === 1.0)
  }

  test("kCore satisfies its fixpoint definition and is partition-invariant") {
    val g = randomGraph(100, 260, seed = 11, parts = 3)
    val core = GraphAlgos.kCore(g, 3)
    val rows = core.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    // fixpoint: every surviving vertex has within-core degree >= k
    assert(rows.forall(_._2 >= 3L), rows.take(5).toString)
    // self-consistency: recompute within-core degrees from the raw
    // edges restricted to the core; must equal the reported degrees
    val ids = rows.map(_._1).toSet
    val ed = g.allEdges.select("start_id", "end_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .flatMap { case (s, t) => Seq((s, t), (t, s)) }
      .filter { case (s, t) => s != t && ids(s) && ids(t) }
      .distinct
    val deg = ed.groupBy(_._1).map { case (v, xs) => (v, xs.size.toLong) }
    assert(rows.forall { case (v, d) => deg.getOrElse(v, 0L) === d })
    // partition invariance
    val rows2 = GraphAlgos.kCore(randomGraph(100, 260, seed = 11, parts = 17), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(rows === rows2)
  }
}
