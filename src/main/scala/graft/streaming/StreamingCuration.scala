package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, TextOps}

/** End-to-end ONLINE corpus curation: each arriving micro-batch is
  * language/length filtered, exact-deduplicated against everything seen
  * so far, near-deduplicated (MinHash-LSH) against the accumulated
  * signature state, and the surviving documents are emitted — the
  * streaming form of the p_curation batch pipeline, for corpora that
  * arrive as a rolling crawl.
  *
  * Online semantics (deterministic, SQL-oracle-replicable): a document
  * is dropped when (a) its exact text hash was already seen by an
  * earlier arrival — earlier batch, or smaller id within the same
  * batch — or (b) it near-dup-pairs with ANY earlier arrival, kept or
  * dropped (the state keeps every unique document's signature, so a
  * chain A~B, B~C drops C even after B was dropped). This is the
  * standard greedy online policy; it differs from batch curation's
  * connected-component representative only on components whose pair
  * graph is not "earlier-connected" (documented; the oracle encodes the
  * online rule exactly, arrival key = (batch, id)).
  *
  * Scale shape, same discipline as the other streaming operators: the
  * exact-hash state and the signature state are each STREAMED once per
  * batch against broadcast batch-sized sides (guarded by
  * `spark.graft.ingest.broadcastRowLimit`); near-dup candidates come
  * from band buckets, never an all-pairs product; per-batch state
  * pieces are pinned so lineage stays O(batches). Replay is idempotent:
  * a replayed batch is wholly exact-suppressed.
  */
final class StreamingCuration(
    spark: SparkSession, lang: String = "en", minTokens: Int = 10,
    shingleK: Int = 3, bands: Int = 8, rowsPerBand: Int = 4,
    threshold: Double = 0.5, maxBucketSize: Int = 200,
    statePath: Option[String] = None) extends MicroBatchProcessor {

  override protected def sparkSession: SparkSession = spark

  // durable mode: signature state under <path>/sig (StreamingDedup's
  // own batch-keyed parquet), exact-hash state under <path>/hash. The
  // two stores commit ATOMICALLY per batch via <path>/_commits markers
  // (r11 ADVICE: hash was written after sig, so a crash between the two
  // left a replayed batch sig-suppressed but not hash-suppressed and
  // replay emission diverged): the marker is created only after BOTH
  // writes, and both stores' restores EXCLUDE unmarked partitions —
  // the replay then rewrites both and marks.
  private val commitDir = statePath.map(_ + "/_commits")
  private val dedup = new StreamingDedup(
    spark, shingleK, bands, rowsPerBand, threshold, maxBucketSize,
    statePath = statePath.map(_ + "/sig"), commitDir = commitDir)
  private val hashPath = statePath.map(_ + "/hash")

  /** md5 content hashes of every absorbed (exact-unique) document. */
  @volatile private var seenHashes: Option[DataFrame] = None
  private var restoredFromPath = false
  /** Direct-call partition key, [[DurableState.DirectKeyBase]]'s
    * keyspace (disjoint from stream batchIds, r11 ADVICE). Stays in
    * LOCKSTEP with the inner [[StreamingDedup]]'s own sequence — both
    * advance exactly once per durable direct call — so one marker key
    * covers both stores' partitions. */
  private var directSeq = DurableState.DirectKeyBase - 1

  def absorbedCount: Long = dedup.corpusSize

  private def restoreIfNeeded(): Unit = synchronized {
    if (hashPath.isDefined && !restoredFromPath) {
      restoredFromPath = true
      try {
        val r = DurableState.restore(spark, hashPath.get, Seq("__h"), commitDir)
        directSeq = math.max(directSeq, r.maxDirectKey)
        seenHashes = r.frame
      } catch { case _: org.apache.spark.sql.AnalysisException => () }
    }
  }

  /** Process one micro-batch: returns the surviving (curated) rows of
    * the batch with all their columns, and absorbs the batch's unique
    * documents into the exact-hash and signature states. */
  override def processBatch(batch: DataFrame, textCol: String, idCol: String): DataFrame =
    processBatch(batch, textCol, idCol, batchId = -1L)

  /** Batch-id-aware form: the id keys BOTH durable state partitions
    * (hash here, signatures inside [[StreamingDedup]]) so replays
    * rewrite their own partitions. */
  override def processBatch(batch: DataFrame, textCol: String, idCol: String,
      batchId: Long): DataFrame =
    synchronized {
      restoreIfNeeded()
      val doBroadcast = batch.count() <= broadcastRowLimit
      val hint = hinted(doBroadcast) _
      val filtered = batch
        .filter(TextOps.langId(col(textCol)) === lang)
        .filter(TextOps.tokenCount(col(textCol)) >= minTokens)
      // within-batch exact dedup (keep smallest id), then drop texts
      // already seen: hash state streamed once, batch side broadcast
      val exBatch = Dedup.dedupExact(filtered, textCol, idCol)
      val freshLazy = seenHashes match {
        case None => exBatch
        case Some(st) =>
          val present = st.join(
            hint(exBatch.select(md5(col(textCol)).as("__h"))), Seq("__h"), "left_semi")
          exBatch.join(hint(present),
            md5(col(textCol)) === present("__h"), "left_anti")
      }
      // pin: feeds the pair probe, the hash state, and the kept output
      val fresh = freshLazy.localCheckpoint(true)
      // near-dup pairs within the batch and against the accumulated
      // state (absorbs fresh signatures; the stream batchId keys the
      // inner durable partition too). |fresh| ≤ |batch|, so when this
      // batch already passed the broadcast gate the inner processor's
      // own count job is provably redundant — thread the decision down
      // instead of re-counting (r14 verdict #3: fold the per-batch
      // probe jobs); an over-limit batch still lets the inner count
      // decide on the (possibly much smaller) curated survivor set.
      val pairs = dedup.processBatchSized(fresh, textCol, idCol, batchId,
        if (doBroadcast) Some(true) else None)
      // drop the LATER-ARRIVED side of every pair: both-in-batch pairs
      // drop the larger id (pairs are least/greatest-normalized), cross
      // pairs drop the batch side whichever slot it landed in
      val m = fresh.select(col(idCol).as("__mid")).withColumn("__in", lit(1))
      val dropIds = pairs
        .join(hint(m.select(col("__mid").as("id_a"), col("__in").as("__ina"))),
          Seq("id_a"), "left_outer")
        .join(hint(m.select(col("__mid").as("id_b"), col("__in").as("__inb"))),
          Seq("id_b"), "left_outer")
        .select(
          when(col("__ina").isNotNull && col("__inb").isNotNull, col("id_b"))
            .when(col("__ina").isNotNull, col("id_a"))
            .otherwise(col("id_b")).as(idCol))
      // no distinct: dropIds only ever feeds the LEFT ANTI join below,
      // which is key-set semantics — duplicate drop ids change nothing,
      // and the dedup shuffle was one more per-batch exchange
      // fresh is exact-deduped within the batch AND seen-suppressed
      // across batches, so its content hashes are ALREADY distinct —
      // and fresh is pinned, so this lazy select re-reads cached blocks:
      // the former distinct+localCheckpoint paid one shuffle and one
      // pin job per micro-batch for rows that were already unique
      // (r14 verdict #3); lineage over the pinned frame stays O(1)
      val newHashes = fresh.select(md5(col(textCol)).as("__h"))
      hashPath.foreach { p =>
        val key = if (batchId >= 0L) batchId else { directSeq += 1; directSeq }
        if (!newHashes.isEmpty)
          newHashes.withColumn("__batch", lit(key))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__batch").parquet(p)
        // both stores on disk (sig landed inside dedup.processBatch
        // above) — acknowledge the batch. Restore ignores unmarked
        // partitions, so a crash before this line replays cleanly.
        commitDir.foreach(DurableState.mark(spark, _, key))
      }
      seenHashes = Some(seenHashes.fold(newHashes)(_ unionByName newHashes))
      fresh.join(hint(dropIds), Seq(idCol), "left_anti")
    }
}
