package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase

case class Ev(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)

class EventStreamsSpec extends SparkTestBase {
  import spark.implicits._

  def t(m: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  def runToMemory(df: org.apache.spark.sql.DataFrame, name: String,
      mode: String = "append"): Unit = {
    val q = df.writeStream.format("memory").queryName(name).outputMode(mode).start()
    q.processAllAvailable()
    q.stop()
  }

  test("windowed counts aggregate a memory stream") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[Ev]
    ms.addData(
      Ev(1, t(1), 1, "click", 1.0), Ev(2, t(2), 1, "click", 2.0),
      Ev(3, t(3), 2, "view", 5.0))
    runToMemory(EventStreams.windowedCounts(ms.toDF(), "10 minutes", "1 hour"),
      "wc", mode = "update")
    val rows = spark.sql("SELECT event_type, n, total_value FROM wc ORDER BY event_type")
      .collect().map(_.toSeq)
    assert(rows.toSeq === Seq(Seq("click", 2L, 3.0), Seq("view", 1L, 5.0)))
  }

  test("sessionization groups events within the gap") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[Ev]
    // user 1: events at 00:01 and 00:05 (same session, 10m gap), then 00:40 (new session)
    ms.addData(
      Ev(1, t(1), 1, "a", 1.0), Ev(2, t(5), 1, "a", 1.0), Ev(3, t(40), 1, "a", 1.0))
    runToMemory(EventStreams.sessions(ms.toDF(), "10 minutes", "2 hours"),
      "sess", mode = "complete")
    val rows = spark.sql("SELECT n_events FROM sess ORDER BY session_start")
      .collect().map(_.getLong(0))
    assert(rows.toSeq === Seq(2L, 1L))
  }

  test("dedup within watermark removes duplicate event ids") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[Ev]
    ms.addData(Ev(7, t(1), 1, "a", 1.0), Ev(7, t(2), 1, "a", 1.0), Ev(8, t(3), 1, "a", 1.0))
    runToMemory(EventStreams.dedup(ms.toDF(), "1 hour"), "dd")
    assert(spark.sql("SELECT count(*) FROM dd").collect().head.getLong(0) === 2L)
  }

  test("running totals via mapGroupsWithState") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[Ev]
    ms.addData(Ev(1, t(1), 1, "a", 1.5), Ev(2, t(2), 1, "a", 2.5), Ev(3, t(3), 2, "a", 4.0))
    runToMemory(EventStreams.runningTotals(spark, ms.toDF()), "rt", mode = "update")
    val rows = spark.sql("SELECT user_id, events, value FROM rt ORDER BY user_id")
      .collect().map(_.toSeq)
    assert(rows.toSeq === Seq(Seq(1L, 2L, 4.0), Seq(2L, 1L, 4.0)))
  }

  test("batch and streaming share the operator: windowedCounts on batch frame") {
    val batch = Seq(
      Ev(1, t(1), 1, "click", 1.0), Ev(2, t(2), 1, "click", 2.0)).toDF()
    val out = EventStreams.windowedCounts(batch, "10 minutes", "1 hour")
    assert(out.collect().head.getAs[Long]("n") === 2L)
  }
}
