package graft.graph

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.types.GraphId

/** Parquet-backed graph persistence — the durable analogue of the
  * reference's per-label heap tables + ag_catalog rows (reference:
  * sql/age_main.sql:54-86; table shape label_commands.c:361-420).
  *
  * Layout (one directory per graph):
  * {{{
  *   <path>/_meta/        one-row JSON: name + label catalog
  *   <path>/v_<label>/    vertex label parquet (id, <props...>)
  *   <path>/e_<label>/    edge label parquet (id, start_id, end_id, <props...>)
  * }}}
  *
  * Per-label directories keep the AGE per-label-table model: a
  * label-known scan reads exactly one directory (partition pruning by
  * construction), and property predicates push into each label's
  * parquet footer. At cluster scale these would be Delta tables; the
  * layout and catalog are the same.
  */
object GraphStore {

  private def metaDf(spark: SparkSession, g: PropertyGraph) = {
    import spark.implicits._
    val v = g.vertexLabels.map(l => (l.name, l.labelId)).toList
    val e = g.edgeLabels.map(l => (l.name, l.labelId)).toList
    Seq((g.name, v, e)).toDF("name", "vertex_labels", "edge_labels")
  }

  def save(g: PropertyGraph, path: String): Unit = {
    val spark = g.vertexLabels.headOption.map(_.df.sparkSession)
      .orElse(g.edgeLabels.headOption.map(_.df.sparkSession))
      .getOrElse(throw new IllegalArgumentException("empty graph"))
    metaDf(spark, g).coalesce(1).write.mode(SaveMode.Overwrite).json(s"$path/_meta")
    for (l <- g.vertexLabels)
      l.df.write.mode(SaveMode.Overwrite).parquet(s"$path/v_${l.name}")
    for (l <- g.edgeLabels)
      l.df.write.mode(SaveMode.Overwrite).parquet(s"$path/e_${l.name}")
  }

  def load(spark: SparkSession, path: String): PropertyGraph = {
    val meta = spark.read.json(s"$path/_meta").collect()(0)
    val name = meta.getAs[String]("name")
    def labels(field: String): Seq[(String, Int)] =
      meta.getAs[scala.collection.Seq[org.apache.spark.sql.Row]](field)
        .toSeq.map(r => (r.getString(0), r.getLong(1).toInt))
    val v = labels("vertex_labels").map { case (n, id) =>
      VertexLabel(n, id, spark.read.parquet(s"$path/v_$n"))
    }
    val e = labels("edge_labels").map { case (n, id) =>
      EdgeLabel(n, id, spark.read.parquet(s"$path/e_$n"))
    }
    new PropertyGraph(name, v, e)
  }

  /** Load into a mutable store (max entry ids recovered from the data —
    * the analogue of sequence state). */
  def loadMutable(spark: SparkSession, path: String): MutableGraph = {
    val g = load(spark, path)
    val m = new MutableGraph(g.name, spark)
    def maxEntry(df: org.apache.spark.sql.DataFrame): Long =
      if (df.isEmpty) 0L
      else df.agg(max(col("id"))).collect()(0).getLong(0) & GraphId.EntryIdMax
    for (l <- g.vertexLabels) {
      m.registerVertexLabel(l.name, l.labelId)
      m.appendVertices(l.name, l.df, maxEntry(l.df))
    }
    for (l <- g.edgeLabels) {
      m.registerEdgeLabel(l.name, l.labelId)
      m.appendEdges(l.name, l.df, maxEntry(l.df))
    }
    m
  }
}
