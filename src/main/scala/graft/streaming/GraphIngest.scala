package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.storage.StorageLevel

import graft.graph.{DfUtils, MutableGraph}
import graft.types.GraphId

/** Continuous graph construction: upsert a stream of entity rows into a
  * [[MutableGraph]], one micro-batch at a time, via `foreachBatch`.
  *
  * The per-batch merge is the set-oriented form of Cypher's
  * `MERGE (v:L {key: row.key}) SET v.p = row.p`:
  *   1. dedup WITHIN the batch on the merge key (highest `seqCol` wins
  *      when one is given — last-writer-wins replay semantics);
  *   2. an anti-join of batch keys against the existing label finds the
  *      rows to CREATE — an O(batch) probe of one label scan, never a
  *      full-label re-aggregation (same scale contract as the unique-
  *      constraint batch probe, MutableGraph.checkUniqueBatch);
  *   3. new entries get ids partition-parallel (DfUtils.withRowNum —
  *      local row numbers + broadcast offsets, no global window);
  *   4. keys that already exist get property overwrites through
  *      MutableGraph.setVertexProperty (copy-on-write column swap).
  *
  * Everything is DataFrame plans — no driver-side row loops — so a
  * micro-batch of any size distributes. Replaying a batch (streaming
  * at-least-once delivery) converges: creates are suppressed by the
  * anti-join, updates are idempotent overwrites.
  *
  * Reference analogue: AGE has no streaming surface; this is the
  * beyond-parity path for keeping a 100 TB graph continuously up to
  * date from event streams rather than bulk reloads.
  */
object GraphIngest {

  /** Column reference by exact name (keys may contain dots/backticks). */
  private def qc(name: String) =
    if (name.exists(c => c == '.' || c == '`'))
      col(s"`${name.replace("`", "``")}`")
    else col(name)

  /** Test/diagnostic hook: physical plan of the most recent vertex-merge
    * create probe against a non-empty label (the anti-join that decides
    * which batch rows create). */
  @volatile private[streaming] var lastMergeProbePlan: String = ""

  /** Distributed upsert of one micro-batch of vertex rows.
    *
    * @param batch   one column per property; must contain `keyProp`.
    * @param seqCol  optional ordering column: within a batch the row
    *                with the highest value per key wins (ties broken
    *                arbitrarily); without it an arbitrary row per key
    *                is kept.
    */
  def mergeVertexBatch(
      store: MutableGraph,
      label: String,
      keyProp: String,
      batch: DataFrame,
      seqCol: Option[String] = None): Unit = store.synchronized {
    store.createVertexLabel(label)
    val deduped = (seqCol match {
      case Some(sc) =>
        val w = Window.partitionBy(qc(keyProp)).orderBy(qc(sc).desc)
        batch.withColumn("__rk", row_number().over(w))
          .filter(col("__rk") === 1).drop("__rk")
      case None => batch.dropDuplicates(Seq(keyProp))
    }).persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val existing = store.snapshot.vertexLabel(label).df
      val props = deduped.columns.toSeq
      if (!existing.columns.contains(keyProp)) {
        // empty label: everything creates
        appendWithIds(store, label, deduped, props)
      } else {
        // scale shape: the label is STREAMED exactly once and never
        // shuffled — `batch ANTI existing` directly would broadcast the
        // label or sort-merge-shuffle it; instead a broadcast semi-join
        // extracts the (batch-sized) set of keys already present, and
        // both the create anti-join and the update join broadcast
        // batch-sized sides against it
        val present = existing
          .join(broadcast(deduped.select(qc(keyProp))), Seq(keyProp), "left_semi")
          .select(col("id"), qc(keyProp))
          .persist(StorageLevel.MEMORY_AND_DISK)
        try {
          val fresh =
            deduped.join(broadcast(present.select(qc(keyProp))), Seq(keyProp), "left_anti")
          appendWithIds(store, label, fresh, props)
          lastMergeProbePlan = fresh.queryExecution.executedPlan.toString
          // last-writer-wins overwrite for keys that already existed
          val upd = deduped
            .join(broadcast(present), Seq(keyProp))
            .persist(StorageLevel.MEMORY_AND_DISK)
          try {
            val updKeys = props.filterNot(_ == keyProp)
            if (updKeys.nonEmpty && !upd.isEmpty)
              // one join + one label pin for ALL changed properties;
              // value columns ride positionally under synthetic names
              store.setVertexProperties(updKeys,
                upd.select(col("id") +: updKeys.zipWithIndex.map {
                  case (k, i) => qc(k).as(s"__v$i")
                }: _*))
          } finally upd.unpersist()
        } finally present.unpersist()
      }
    } finally deduped.unpersist()
  }

  private def appendWithIds(
      store: MutableGraph, label: String, rows: DataFrame, props: Seq[String]): Unit = {
    val cached = rows.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val n = cached.count()
      if (n > 0) {
        val labelId = store.vertexLabelId(label)
        val maxE = store.vertexMaxEntry(label)
        val withIds = DfUtils.withRowNum(cached, "__rn")
          .withColumn("id",
            (lit(labelId.toLong << GraphId.EntryIdBits) + lit(maxE) + col("__rn"))
              .cast("long"))
          .select(("id" +: props).map(col): _*)
        // localCheckpoint: pin the allocated ids — appendVertices unions
        // lazily and a later recompute must not renumber
        store.appendVertices(label, withIds.localCheckpoint(true), maxE + n)
      }
    } finally cached.unpersist()
  }

  /** Distributed merge of one micro-batch of edge rows. Endpoints are
    * resolved by key against their vertex labels (rows whose endpoints
    * don't exist yet are dropped — ingest vertices first, e.g. from the
    * same stream via [[mergeVertexBatch]]); an existing (start, end)
    * pair of this label is NOT duplicated (MERGE, not CREATE).
    *
    * @param batch      must contain `srcKeyCol` and `dstKeyCol`; all
    *                   other columns become edge properties.
    * @param src / dst  (vertexLabel, keyProp) of each endpoint.
    */
  def mergeEdgeBatch(
      store: MutableGraph,
      edgeLabel: String,
      src: (String, String),
      dst: (String, String),
      batch: DataFrame,
      srcKeyCol: String,
      dstKeyCol: String): Unit = store.synchronized {
    store.createEdgeLabel(edgeLabel)
    val (srcLabel, srcKey) = src
    val (dstLabel, dstKey) = dst
    val g = store.snapshot
    val sv = g.vertexLabel(srcLabel).df
    val dv = g.vertexLabel(dstLabel).df
    if (!sv.columns.contains(srcKey) || !dv.columns.contains(dstKey)) return
    val props = batch.columns.toSeq.filterNot(c => c == srcKeyCol || c == dstKeyCol)
    // endpoint resolution and the existing-pair probe both stream the
    // big side (vertex label / edge label) against a BROADCAST
    // batch-sized side — no label is ever shuffled or broadcast
    val withSrc = sv.select(col("id").as("start_id"), qc(srcKey).as(srcKeyCol))
      .join(broadcast(batch), Seq(srcKeyCol))
    val resolved = dv.select(col("id").as("end_id"), qc(dstKey).as(dstKeyCol))
      .join(broadcast(withSrc), Seq(dstKeyCol))
      .dropDuplicates(Seq("start_id", "end_id"))
    val existing = store.snapshot.edgeLabel(edgeLabel).df
    val presentPairs = existing.select(col("start_id"), col("end_id"))
      .join(broadcast(resolved.select(col("start_id"), col("end_id"))),
        Seq("start_id", "end_id"), "left_semi")
    val fresh = resolved.join(broadcast(presentPairs),
      Seq("start_id", "end_id"), "left_anti")
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val n = fresh.count()
      if (n > 0) {
        val labelId = store.edgeLabelId(edgeLabel)
        val maxE = store.edgeMaxEntry(edgeLabel)
        val withIds = DfUtils.withRowNum(fresh, "__rn")
          .withColumn("id",
            (lit(labelId.toLong << GraphId.EntryIdBits) + lit(maxE) + col("__rn"))
              .cast("long"))
          .select(("id" +: "start_id" +: "end_id" +: props).map(col): _*)
        store.appendEdges(edgeLabel, withIds.localCheckpoint(true), maxE + n)
      }
    } finally fresh.unpersist()
  }

  /** Continuous vertex ingestion: `stream` rows upsert into `store`
    * per micro-batch. Returns the running [[StreamingQuery]]. */
  def startVertexIngest(
      stream: DataFrame,
      store: MutableGraph,
      label: String,
      keyProp: String,
      seqCol: Option[String] = None,
      checkpointDir: Option[String] = None): StreamingQuery = {
    val w0 = stream.writeStream.outputMode("append")
    val w = checkpointDir.fold(w0)(d => w0.option("checkpointLocation", d))
    w.foreachBatch { (b: DataFrame, _: Long) =>
      mergeVertexBatch(store, label, keyProp, b, seqCol)
    }.start()
  }

  /** Continuous edge ingestion — see [[mergeEdgeBatch]]. */
  def startEdgeIngest(
      stream: DataFrame,
      store: MutableGraph,
      edgeLabel: String,
      src: (String, String),
      dst: (String, String),
      srcKeyCol: String,
      dstKeyCol: String,
      checkpointDir: Option[String] = None): StreamingQuery = {
    val w0 = stream.writeStream.outputMode("append")
    val w = checkpointDir.fold(w0)(d => w0.option("checkpointLocation", d))
    w.foreachBatch { (b: DataFrame, _: Long) =>
      mergeEdgeBatch(store, edgeLabel, src, dst, b, srcKeyCol, dstKeyCol)
    }.start()
  }
}
