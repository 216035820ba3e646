package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Induced-subgraph extraction — the analogue of `create_subgraph`
  * (reference: sql/age_subgraph.sql:45-179; Neo4j GDS filter semantics:
  * keep vertices passing the vertex predicate, keep edges passing the
  * edge predicate whose BOTH endpoints survive).
  *
  * Spark shape: vertex filter → semi-join edges on both endpoints.
  * Ids are preserved (the reference remaps ids into fresh sequences —
  * a deviation noted here: stable ids make the subgraph joinable back
  * to its parent, which is strictly more useful on an analytics stack).
  */
object Subgraph {

  /** @param vertexPred SQL predicate over each vertex label frame's
    *                   columns (id + props), e.g. "acctbal > 1000"; null
    *                   keeps all
    * @param edgePred   same for edge frames */
  def extract(
      g: PropertyGraph, name: String,
      vertexPred: Option[String] = None,
      edgePred: Option[String] = None): PropertyGraph = {

    val newVLabels = g.vertexLabels.map { vl =>
      val df = vertexPred.map(p => vl.df.filter(resilientPred(vl.df, p))).getOrElse(vl.df)
      VertexLabel(vl.name, vl.labelId, df)
    }
    // no vertex predicate → every vertex survives, and referential
    // integrity of the edge frames makes the endpoint semi-joins no-ops:
    // skip them (two avoided shuffles per edge label)
    lazy val keptIds = newVLabels.map(_.df.select("id")).reduce(_ unionByName _)

    val newELabels = g.edgeLabels.map { el =>
      val base = edgePred.map(p => el.df.filter(resilientPred(el.df, p))).getOrElse(el.df)
      val df =
        if (vertexPred.isEmpty) base
        else base
          .join(keptIds.withColumnRenamed("id", "__s"), col("start_id") === col("__s"), "left_semi")
          .join(keptIds.withColumnRenamed("id", "__e"), col("end_id") === col("__e"), "left_semi")
      EdgeLabel(el.name, el.labelId, df)
    }
    new PropertyGraph(name, newVLabels, newELabels)
  }

  /** A predicate referencing a column absent from this label's frame
    * evaluates to false for the whole label (per-label schemas differ). */
  private def resilientPred(df: DataFrame, pred: String) =
    try { df.select(expr(pred)); expr(pred) }
    catch { case _: Throwable => lit(false) }
}
