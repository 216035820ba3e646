package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.pipeline.TimeSeries

class StreamingAsofSpec extends SparkTestBase {
  import spark.implicits._

  // (event_id, ts, user_id) — lefts and rights over three users with
  // interleaved timestamps, equal-ts ties, and a user that never clicks
  private val rights = Seq(
    (1L, 10L, "u1"), (2L, 30L, "u1"), (3L, 30L, "u1"), // tie at ts=30
    (4L, 20L, "u2"), (5L, 90L, "u2")
  ).toDF("event_id", "ts", "user_id")
  private val lefts = Seq(
    (11L, 5L, "u1"),  // before any right → null
    (12L, 30L, "u1"), // tie boundary → max event_id at ts 30
    (13L, 50L, "u1"),
    (14L, 25L, "u2"),
    (15L, 95L, "u2"),
    (16L, 40L, "u3")  // user with no rights
  ).toDF("event_id", "ts", "user_id")

  private def enriched(df: DataFrame): Seq[(Long, Long)] =
    df.select(col("event_id"), coalesce(col("asof_event_id"), lit(-1L)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq

  private val batchExpected = enriched(TimeSeries.asofJoinBackward(
    lefts, rights, Seq("user_id"), "ts", "ts", Seq("event_id"), tieCol = "event_id"))

  test("the batch operator itself gives the hand-computed matches") {
    assert(batchExpected === Seq(
      (11L, -1L), (12L, 3L), (13L, 3L), (14L, 4L), (15L, 5L), (16L, -1L)))
  }

  test("any time-ordered micro-batch split reproduces the batch as-of join") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 4) {
      // random cut points over the ts axis → 1..4 ordered batches
      val cuts = (Seq(Long.MaxValue) ++ Seq.fill(rnd.nextInt(3))(rnd.nextInt(100).toLong))
        .distinct.sorted
      val sa = new StreamingAsof(spark, Seq("user_id"), "ts", "event_id", Seq("event_id"))
      var lo = Long.MinValue
      var out = Seq.empty[(Long, Long)]
      for (hi <- cuts) {
        val l = lefts.filter(col("ts") > lo && col("ts") <= hi)
        val r = rights.filter(col("ts") > lo && col("ts") <= hi)
        out = out ++ enriched(sa.processBatch(l, r))
        lo = hi
      }
      sa.reset()
      assert(out.sortBy(_._1) === batchExpected, s"trial $trial cuts=$cuts")
    }
  }

  test("state compacts to one row per key (the latest right)") {
    val sa = new StreamingAsof(spark, Seq("user_id"), "ts", "event_id", Seq("event_id"))
    sa.processBatch(lefts.limit(0), rights)
    val st = sa.stateSnapshot.get.collect()
      .map(r => (r.getString(r.fieldIndex("user_id")),
        r.getLong(r.fieldIndex("event_id")))).toSet
    assert(st === Set(("u1", 3L), ("u2", 5L))) // ts-30 tie → max event_id
    sa.reset()
  }
}
