package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.TextOps

/** Continuous benchmark decontamination: as training-document
  * micro-batches arrive, flag the documents sharing a word-`gramK`-gram
  * with a FIXED evaluation suite — the streaming form of the
  * p_decontaminate batch operator, for pipelines where the corpus is a
  * rolling crawl but the benchmark set is pinned.
  *
  * Scale shape:
  *   - the eval gram set is built ONCE at construction (the benchmark
  *     suite is tiny relative to any training corpus), pinned, and
  *     BROADCAST into every batch probe — each increment is shingled
  *     exactly once and left-semi-joined against the grams; the corpus
  *     side never shuffles and nothing is ever re-shingled;
  *   - replay suppression (at-least-once delivery) keeps a seen-id
  *     state streamed once per batch with the batch side broadcast,
  *     same discipline as [[GraphIngest]] / [[StreamingDedup]];
  *   - broadcast hints obey `spark.graft.ingest.broadcastRowLimit` so a
  *     surge batch degrades to a shuffled join instead of OOMing.
  *
  * Equivalence: the union of per-batch flags over any partition of the
  * training corpus equals the batch operator's flag set (flagging is
  * per-document against fixed grams — no cross-document interaction).
  */
final class StreamingDecontaminate(
    spark: SparkSession, evalDocs: DataFrame, textCol: String, idCol: String,
    gramK: Int = 4) extends MicroBatchProcessor {

  override protected def sparkSession: SparkSession = spark

  /** Distinct eval gram HASHES (the fused 60-bit kernel — batch probes
    * join 8-byte longs instead of gram strings, matching the batch
    * operator's hashed probe; collisions 2^-60, disclosed), computed
    * once and pinned. Documents shorter than `gramK` tokens can't
    * define a full gram and are excluded — matching the batch
    * operator. */
  private val evalGrams: DataFrame = TextOps.shingleHashRows(
      evalDocs.filter(size(TextOps.tokens(col(textCol))) >= gramK),
      textCol, idCol, gramK)
    .select(col("__sh")).distinct()
    .localCheckpoint(true)
  private val evalBroadcastable: Boolean = evalGrams.count() <= broadcastRowLimit

  /** Ids already processed (pinned per-batch unions) — replay
    * suppression only; flagging itself is deterministic per document. */
  @volatile private var seen: Option[DataFrame] = None
  @volatile private[streaming] var lastProbePlan: String = ""

  def processedCount: Long = seen.map(_.count()).getOrElse(0L)

  /** Process one micro-batch: returns the batch rows (all columns) of
    * documents contaminated by the eval suite, with replayed ids
    * suppressed, and absorbs the batch ids into the seen state. */
  override def processBatch(batch: DataFrame, textCol: String, idCol: String): DataFrame =
    synchronized {
      val doBroadcast = batch.count() <= broadcastRowLimit
      val hint = hinted(doBroadcast) _
      val freshLazy = seen match {
        case None => batch
        case Some(st) =>
          // seen streamed once; batch-sized sides broadcast
          val present = st.join(hint(batch.select(col(idCol))),
            Seq(idCol), "left_semi")
          batch.join(hint(present), Seq(idCol), "left_anti")
      }
      val fresh = freshLazy.localCheckpoint(true)
      val grams = TextOps.shingleHashRows(
        fresh.filter(size(TextOps.tokens(col(textCol))) >= gramK),
        textCol, idCol, gramK)
      val flaggedIds = grams
        .join(if (evalBroadcastable) broadcast(evalGrams) else evalGrams,
          Seq("__sh"), "left_semi")
        .select(col("__id").as(idCol)).distinct()
      lastProbePlan = flaggedIds.queryExecution.executedPlan.toString
      seen = Some(seen.fold(fresh.select(col(idCol)))(
        _ unionByName fresh.select(col(idCol))))
      fresh.join(hint(flaggedIds), Seq(idCol), "left_semi")
    }
}
