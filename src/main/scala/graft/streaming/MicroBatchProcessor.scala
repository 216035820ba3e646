package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.broadcast
import org.apache.spark.sql.streaming.StreamingQuery

/** Shared micro-batch plumbing for the streaming operators
  * (StreamingDedup / StreamingDecontaminate / StreamingCuration): one
  * definition of the broadcast row-limit policy, the size-guarded
  * broadcast hint, and the foreachBatch driver — so a change to the
  * surge-batch discipline lands in exactly one place. */
private[streaming] trait MicroBatchProcessor {
  protected def sparkSession: SparkSession

  /** Rows above which batch-sized sides stop being broadcast and the
    * probes degrade to shuffled joins (mirrors GraphIngest). */
  protected final def broadcastRowLimit: Long = sparkSession.conf
    .getOption("spark.graft.ingest.broadcastRowLimit")
    .map(_.toLong).getOrElse(GraphIngest.DefaultBroadcastRowLimit)

  /** Size-guarded broadcast hint: `hinted(doBroadcast)(df)`. */
  protected final def hinted(doBroadcast: Boolean)(df: DataFrame): DataFrame =
    if (doBroadcast) broadcast(df) else df

  /** Process one micro-batch and return its emission. */
  def processBatch(batch: DataFrame, textCol: String, idCol: String): DataFrame

  /** Batch-id-aware variant for processors with DURABLE state: the
    * stream's batchId keys the state write so a replayed batch
    * overwrites its own partition instead of appending twice.
    * Processors without durable state ignore the id. */
  def processBatch(batch: DataFrame, textCol: String, idCol: String,
      batchId: Long): DataFrame = processBatch(batch, textCol, idCol)

  /** Continuous ingestion: per micro-batch, hand [[processBatch]]'s
    * emission to `sink` and absorb the batch. */
  final def start(stream: DataFrame, textCol: String, idCol: String,
      checkpointDir: Option[String] = None)(
      sink: (DataFrame, Long) => Unit): StreamingQuery = {
    val w0 = stream.writeStream.outputMode("append")
    val w = checkpointDir.fold(w0)(d => w0.option("checkpointLocation", d))
    w.foreachBatch { (b: DataFrame, id: Long) =>
      sink(processBatch(b, textCol, idCol, id), id)
    }.start()
  }
}
