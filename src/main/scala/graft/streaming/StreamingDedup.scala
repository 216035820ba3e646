package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.Dedup

/** Continuous near-duplicate detection: as document micro-batches
  * arrive, emit the MinHash-LSH near-dup pairs WITHIN the batch and
  * AGAINST everything ingested so far, then fold the batch's
  * signatures into the accumulated corpus state.
  *
  * This is the streaming form of [[graft.pipeline.Dedup.minhashLsh]]:
  * a training-data pipeline at 100 TB doesn't re-shingle the whole
  * corpus per crawl increment — it keeps the (small) per-doc signature
  * table and band index as state and probes each increment against
  * them.
  *
  * Scale shape, same discipline as [[GraphIngest]]:
  *   - the corpus state is STREAMED once per batch, never shuffled:
  *     the cross-probe joins the store's banded rows against the
  *     BROADCAST batch-side bands, and replay suppression extracts
  *     present ids with a broadcast semi-join (output ≤ |batch|);
  *   - broadcast hints obey `spark.graft.ingest.broadcastRowLimit` —
  *     surge batches degrade to shuffled joins;
  *   - per-batch state is pinned (localCheckpoint) so the store is a
  *     union of O(batch)-sized materialized pieces — lineage doesn't
  *     deepen with stream length;
  *   - with `statePath` set, the signature state is DURABLE: each
  *     batch's fresh signatures land in a parquet partition keyed by
  *     the stream's batchId (dynamic partition overwrite, so an
  *     at-least-once replay rewrites its own partition instead of
  *     appending twice), and a restarted processor rebuilds its store
  *     from the path — history is probed, never re-shingled. Without
  *     it the state is session-local (the original in-memory mode).
  *
  * Replaying a batch (at-least-once delivery) is idempotent: already-
  * present ids are anti-joined out before pairing, so no duplicate
  * pairs and no duplicate state.
  *
  * Documented deviation from batch mode: the batch operator drops
  * GLOBALLY over-full band buckets (maxBucketSize); online, global
  * bucket sizes are unknowable, so the cap applies per batch and the
  * cross-probe is uncapped. Results are identical whenever no global
  * bucket exceeds the cap.
  */
final class StreamingDedup(
    spark: SparkSession,
    shingleK: Int = 3,
    bands: Int = 8,
    rowsPerBand: Int = 4,
    threshold: Double = 0.5,
    maxBucketSize: Int = 200,
    statePath: Option[String] = None,
    commitDir: Option[String] = None) extends MicroBatchProcessor {

  override protected def sparkSession: SparkSession = spark

  private val numHashes = bands * rowsPerBand

  /** Accumulated signature table (__id, __set, __n, __mins) — a union
    * of per-batch pinned frames (plus, in durable mode, the parquet
    * state restored at startup). */
  @volatile private var store: Option[DataFrame] = None
  private var restoredFromPath = false
  /** Durable-partition key for DIRECT processBatch calls (no stream
    * batchId): drawn from [[DurableState.DirectKeyBase]]'s keyspace —
    * disjoint from stream batchIds, so a NEW stream restarting at
    * batchId 0 over direct-call state can never overwrite it (r11
    * ADVICE) — and continued past the restored history's max key. */
  private var directSeq = DurableState.DirectKeyBase - 1

  def corpusSize: Long = { restoreIfNeeded(); store.map(_.count()).getOrElse(0L) }

  /** Durable mode only: rebuild the store from the state path once per
    * processor instance (a restarted stream probes history instead of
    * re-shingling it) — compacting old partitions and honoring commit
    * markers, see [[DurableState.restore]]. Missing/empty path = fresh
    * state. */
  private def restoreIfNeeded(): Unit = synchronized {
    if (statePath.isDefined && !restoredFromPath) {
      restoredFromPath = true
      try {
        val r = DurableState.restore(spark, statePath.get, Seq("__id"), commitDir)
        directSeq = math.max(directSeq, r.maxDirectKey)
        store = r.frame
      } catch { case _: org.apache.spark.sql.AnalysisException => () }
    }
  }

  /** Test/diagnostic hook: executed plan of the most recent cross-probe
    * (batch bands against the accumulated store). */
  @volatile private[streaming] var lastCrossProbePlan: String = ""

  /** Process one micro-batch: returns the verified near-dup pairs
    * (id_a, id_b, jaccard), id_a < id_b — both within-batch pairs and
    * pairs against the accumulated corpus — and absorbs the batch into
    * the state. */
  override def processBatch(batch: DataFrame, textCol: String, idCol: String): DataFrame =
    processBatch(batch, textCol, idCol, batchId = -1L)

  /** Batch-id-aware form (the [[MicroBatchProcessor.start]] path):
    * `batchId` keys the durable state partition so an at-least-once
    * replay overwrites its own partition. Direct calls (batchId < 0)
    * get a monotone sequence continued past any restored history. */
  override def processBatch(batch: DataFrame, textCol: String, idCol: String,
      batchId: Long): DataFrame =
    processBatchSized(batch, textCol, idCol, batchId, knownSmall = None)

  /** [[processBatch]] with the broadcast gate optionally pre-decided by
    * a caller that already counted a SUPERSET of this batch
    * (StreamingCuration counts the raw batch; the curated survivors it
    * hands down can only be smaller, so `Some(true)` is sound). `None`
    * counts here as before — the gate's semantics are unchanged, one
    * count job per micro-batch is saved (r14 verdict #3). */
  private[streaming] def processBatchSized(
      batch: DataFrame, textCol: String, idCol: String,
      batchId: Long, knownSmall: Option[Boolean]): DataFrame =
    synchronized {
      restoreIfNeeded()
      val doBroadcast =
        knownSmall.getOrElse(batch.count() <= broadcastRowLimit)
      val hint = hinted(doBroadcast) _
      val bs0 = Dedup.sigTable(batch, textCol, idCol, shingleK, numHashes)
      // replay suppression: ids already in the store don't re-enter —
      // store streamed once, batch-sized sides broadcast
      val freshLazy = store match {
        case None => bs0
        case Some(st) =>
          val present = st.select(col("__id"))
            .join(hint(bs0.select(col("__id"))), Seq("__id"), "left_semi")
          bs0.join(hint(present), Seq("__id"), "left_anti")
      }
      // pin: the batch's signatures are computed exactly once, and the
      // store stays a union of O(batch) materialized pieces
      val fresh = freshLazy.localCheckpoint(true)
      // durable mode: persist this batch's fresh signatures under a
      // batch-keyed partition. Dynamic overwrite makes a replayed
      // batchId rewrite its own partition (idempotent at the storage
      // layer); empty fresh (fully replay-suppressed batch) writes
      // nothing, leaving the original partition intact.
      statePath.foreach { p =>
        val key = if (batchId >= 0L) batchId else { directSeq += 1; directSeq }
        if (!fresh.isEmpty)
          fresh.withColumn("__batch", lit(key))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__batch").parquet(p)
      }
      val bBanded = Dedup.bandedRows(fresh, bands, rowsPerBand)
      val within = Dedup.verifyPairs(
        Dedup.bucketPairs(bBanded, maxBucketSize), fresh, fresh, threshold)
      val cross = store match {
        case None => within.limit(0)
        case Some(st) =>
          val cands = Dedup.bandedRows(st, bands, rowsPerBand)
            .join(hint(bBanded.withColumnRenamed("__id", "id_b")
              .withColumnRenamed("__band", "__band2")
              .withColumnRenamed("__bucket", "__bucket2")),
              col("__band") === col("__band2") && col("__bucket") === col("__bucket2"))
            .select(col("__id").as("id_a"), col("id_b"))
            .distinct()
          lastCrossProbePlan = cands.queryExecution.executedPlan.toString
          Dedup.verifyPairs(hint(cands), st, fresh, threshold)
      }
      store = Some(store.fold(fresh)(_ unionByName fresh))
      // normalize: cross pairs carry (store id, batch id) in arrival
      // order; batch mode emits id_a < id_b
      within.unionByName(cross)
        .select(least(col("id_a"), col("id_b")).as("id_a"),
          greatest(col("id_a"), col("id_b")).as("id_b"),
          col("jaccard"))
    }
}
