package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the events stream.
  *
  * The reference has no streaming surface (AGE is a transactional
  * extension — SURVEY §2.6); this is the additive Spark-native story:
  * the same event schema served batch (SparkEntry q_events_*) and
  * streaming, with watermarks bounding state.
  *
  * All operators take an unbounded DataFrame (readStream) and return a
  * transformed streaming DataFrame the caller writes with writeStream.
  */
object EventStreams {

  /** Tumbling-window counts + value sums per event type, late data
    * bounded by the watermark. */
  def windowedCounts(
      events: DataFrame,
      window_ : String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n"), col("total_value"))

  /** Per-user sessionization with a native session window (gap-based). */
  def sessions(
      events: DataFrame,
      gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("session_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("session_value"))

  /** Exactly-once-ish dedup on event_id within the watermark horizon. */
  def dedup(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  final case class UserRunning(userId: Long, events: Long, value: Double)

  /** Custom stateful aggregation: running per-user totals via
    * mapGroupsWithState (the KeyValueGroupedDataset custom-state path). */
  def runningTotals(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    val typed = events.select(col("user_id").cast("long"), col("value").cast("double"))
      .as[(Long, Double)]
    typed.groupByKey(_._1)
      .mapGroupsWithState[UserRunning, UserRunning](GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[(Long, Double)], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(userId, 0L, 0.0))
          var n = prev.events
          var v = prev.value
          rows.foreach { case (_, dv) => n += 1; v += dv }
          val next = UserRunning(userId, n, v)
          state.update(next)
          next
      }
      .toDF("user_id", "events", "value")
  }

  /** Batch-mode readers for the driver testdata, usable as
    * `spark.readStream` sources when pointed at a directory. The ts
    * column is normalized across generator versions: TIMESTAMP(NANOS)
    * parquet (which the vectorized reader only accepts as long via the
    * legacy conf) converts ns→us; TIMESTAMP(MICROS) reads natively as
    * timestamp_ntz and passes through (no session-timezone
    * reinterpretation — the wall-clock labels match the SQL oracle under
    * any driver timezone). */
  def readEventsBatch(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/events.parquet")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(floor(col("ts") / 1000).cast("long")))
      case _ => df
    }
  }
}
