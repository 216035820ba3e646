package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Hand-computed semantics + plan-shape assertions for the time-series
  * joins (asofJoinBackward, intervalJoin) and the A-Res weighted
  * sampler. */
class TimeSeriesSpec extends SparkTestBase {
  import spark.implicits._

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  // left: (key, ts, lid); right: (key, ts, rid)
  private val left = Seq(
    ("u1", 100L, 1L), // after r@50 and r@100 → ties/order below
    ("u1", 10L, 2L),  // before any right row → null match
    ("u2", 500L, 3L), // exactly at a right ts → inclusive
    ("u3", 77L, 4L)   // key with no right rows at all
  ).toDF("key", "ts", "lid")
  private val right = Seq(
    ("u1", 50L, 10L),
    ("u1", 100L, 11L), // equal ts as left lid=1 → included
    ("u1", 100L, 12L), // tie on ts → greatest rid wins
    ("u2", 500L, 20L),
    ("u2", 600L, 21L)  // in the future of lid=3 → excluded
  ).toDF("key", "ts", "rid")

  test("asofJoinBackward: latest-at-or-before semantics, ties, nulls") {
    val out = TimeSeries.asofJoinBackward(left, right, Seq("key"), "ts", "ts",
        Seq("rid"), tieCol = "rid")
      .select("lid", "asof_rid", "asof_ts_long")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).sortBy(_._1)
    assert(out === Array(
      (1L, 12L, 100L), // equal-ts right rows included, max rid on tie
      (2L, -1L, -1L),  // nothing at-or-before
      (3L, 20L, 500L), // inclusive boundary
      (4L, -1L, -1L))) // key never seen on the right
  }

  test("asofJoinBackward: tolerance nulls matches that are too far back") {
    val out = TimeSeries.asofJoinBackward(left, right, Seq("key"), "ts", "ts",
        Seq("rid"), tieCol = "rid", tolerance = Some(5L))
      .select("lid", "asof_rid")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .sortBy(_._1)
    // lid=1 matched rid=12 at gap 0 → kept; lid=3 gap 0 → kept
    assert(out === Array((1L, 12L), (2L, -1L), (3L, 20L), (4L, -1L)))
  }

  test("asofJoinBackward plan: ONE shuffle, no join operator at all") {
    val plan = planOf(TimeSeries.asofJoinBackward(left, right, Seq("key"),
      "ts", "ts", Seq("rid"), tieCol = "rid"))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"))
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles === 1, s"expected exactly 1 shuffle, plan:\n$plan")
  }

  test("intervalJoin: inclusive bounds, multi-bucket spans, multi-cover") {
    val points = Seq((1L, 0L), (2L, 10L), (3L, 15L), (4L, 99L), (5L, -7L))
      .toDF("pid", "p")
    // widths straddle several 10-unit buckets; iv 101 and 102 overlap
    val ivs = Seq((101L, 0L, 20L), (102L, 10L, 35L), (103L, -10L, -1L))
      .toDF("iid", "lo", "hi")
    val got = TimeSeries.intervalJoin(points, ivs, "p", "lo", "hi", bucketWidth = 10L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(identity).toSeq
    assert(got === Seq(
      (1L, 101L),            // p=0 at iv 101's lower bound (inclusive)
      (2L, 101L), (2L, 102L), // covered by both — exactly once each
      (3L, 101L), (3L, 102L),
      (5L, 103L)))           // negative values bucket correctly
  }

  test("intervalJoin plan: equi-join on the bucket id, no nested loop") {
    val points = Seq((1L, 0L)).toDF("pid", "p")
    val ivs = Seq((101L, 0L, 20L)).toDF("iid", "lo", "hi")
    val plan = planOf(TimeSeries.intervalJoin(points, ivs, "p", "lo", "hi", 10L))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"interval join must never be a nested loop:\n$plan")
  }

  test("asofJoinBackwardSalted: multiset-equal to the plain operator on a hot key") {
    // 80 % of right rows on one key — the skew shape the salted
    // two-phase exists for; results must match the plain operator
    // row-for-row (including ties, nulls, and tolerance)
    val rnd = new scala.util.Random(99)
    val hotL = (1 to 40).map(i => ("hot", (i * 17 % 500).toLong, i.toLong))
    val coldL = (1 to 10).map(i => (s"u${i % 3}", (i * 31 % 500).toLong, 100L + i))
    val l = (hotL ++ coldL).toDF("key", "ts", "lid")
    val hotR = (1 to 400).map(i => ("hot", rnd.nextInt(520).toLong, 1000L + i))
    val coldR = (1 to 100).map(i => (s"u${i % 4}", rnd.nextInt(520).toLong, 5000L + i))
    val r = (hotR ++ coldR).toDF("key", "ts", "rid")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("lid", "asof_rid", "asof_ts_long").collect()
        .map(x => (x.getLong(0),
          if (x.isNullAt(1)) -1L else x.getLong(1),
          if (x.isNullAt(2)) -1L else x.getLong(2))).sorted.toSeq
    val plain = canon(TimeSeries.asofJoinBackward(
      l, r, Seq("key"), "ts", "ts", Seq("rid"), tieCol = "rid"))
    val salted = canon(TimeSeries.asofJoinBackwardSalted(
      l, r, Seq("key"), "ts", "ts", Seq("rid"), tieCol = "rid", numSalts = 5))
    assert(salted === plain)
    // tolerance composes identically
    val plainTol = canon(TimeSeries.asofJoinBackward(
      l, r, Seq("key"), "ts", "ts", Seq("rid"), tieCol = "rid", tolerance = Some(25L)))
    val saltedTol = canon(TimeSeries.asofJoinBackwardSalted(
      l, r, Seq("key"), "ts", "ts", Seq("rid"), tieCol = "rid",
      tolerance = Some(25L), numSalts = 5))
    assert(saltedTol === plainTol)
  }

  test("asofJoinBackwardSalted plan: window partitions carry the salt") {
    val l = Seq(("k", 1L, 1L)).toDF("key", "ts", "lid")
    val r = Seq(("k", 1L, 2L)).toDF("key", "ts", "rid")
    val plan = planOf(TimeSeries.asofJoinBackwardSalted(
      l, r, Seq("key"), "ts", "ts", Seq("rid"), tieCol = "rid", numSalts = 4))
    // the sort exchange must hash on (key, __salt) — that S-way split of
    // the hot key's history is the whole point
    assert(plan.contains("__salt"), s"expected a salted exchange, plan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
  }

  test("autoSalts: sizes from the hottest key's history and falls back " +
      "to the plain plan when the left side dominates") {
    // hottest key's history = 1000 rows; target 100 → 10 salts when the
    // left side is small relative to the right
    val hotR = (1 to 1000).map(i => ("hot", i.toLong, 1000L + i)) ++
      (1 to 50).map(i => (s"u$i", i.toLong, 5000L + i))
    val r = hotR.toDF("key", "ts", "rid")
    val smallL = (1 to 20).map(i => ("hot", i.toLong, i.toLong))
      .toDF("key", "ts", "lid")
    assert(TimeSeries.autoSalts(smallL, r, Seq("key"), target = 100L) === 10)
    // no key above the sort target → 0 (the plain single-sort plan
    // already fits one task; salting would only add the merge pass)
    assert(TimeSeries.autoSalts(smallL, r, Seq("key"), target = 2000L) === 0)
    // left-heavy: replicating a left side bigger than the right side it
    // splits costs more rows than the split saves → 0 + warn
    val bigL = (1 to 20000).map(i => ("hot", i.toLong, i.toLong))
      .toDF("key", "ts", "lid")
    assert(TimeSeries.autoSalts(bigL, r, Seq("key"), target = 100L) === 0)
    // empty right: nothing to split
    assert(TimeSeries.autoSalts(smallL, r.limit(0), Seq("key"), target = 100L) === 0)
    // a join key literally named "count" must not collide with the
    // census aggregate's alias (reserved __graft_cnt, not the groupBy
    // .count() default)
    val rNamed = r.withColumnRenamed("key", "count")
    val lNamed = smallL.withColumnRenamed("key", "count")
    assert(TimeSeries.autoSalts(lNamed, rNamed, Seq("count"), target = 100L) === 10)
  }

  test("asofJoinBackwardSalted auto mode: fallback results still match " +
      "the plain operator exactly") {
    // left-heavy frame → auto falls back to the plain operator inside
    // the same call; results are identical either way (the guard is a
    // plan decision, never a semantics change)
    val l = (1 to 500).map(i => ("k", (i % 37).toLong, i.toLong))
      .toDF("key", "ts", "lid")
    val r = (1 to 30).map(i => ("k", i.toLong, 100L + i)).toDF("key", "ts", "rid")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("lid", "asof_rid").collect()
        .map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1)))
        .sorted.toSeq
    val auto = canon(TimeSeries.asofJoinBackwardSalted(
      l, r, Seq("key"), "ts", "ts", Seq("rid"), tieCol = "rid"))
    val plain = canon(TimeSeries.asofJoinBackward(
      l, r, Seq("key"), "ts", "ts", Seq("rid"), tieCol = "rid"))
    assert(auto === plain)
  }

  test("floorDiv: exact over extreme longs where double rounding lies") {
    // beyond 2^53 the old double-cast floor was off-by-one on some
    // inputs; Math.floorDiv is the ground truth
    val w = 3600L * 1000000000L // nanos per hour
    val xs = Seq(0L, 1L, -1L, w - 1, -w, -w - 1,
      (1L << 62) - 1, -(1L << 62), (1L << 62) - 12345L,
      1234567890123456789L, -1234567890123456789L,
      Long.MaxValue - w, Long.MinValue + w)
    val got = xs.toDF("x")
      .select(col("x"), TimeSeries.floorDiv(col("x"), w).as("q"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (x <- xs)
      assert(got(x) === Math.floorDiv(x, w), s"floorDiv($x, $w)")
  }

  test("intervalJoin: nanosecond-scale longs bucket exactly") {
    // values > 2^53 — a double-rounded bucket id would misplace points
    // at bucket boundaries and silently drop containment pairs
    val base = (1L << 60) + 7L // not a bucket multiple
    val w = 1000000000L
    val points = Seq((1L, base), (2L, base + w - 1), (3L, base + w),
      (4L, base - 1)).toDF("pid", "p")
    val ivs = Seq((10L, base, base + w - 1), (11L, base - 5L, base + 5L))
      .toDF("iid", "lo", "hi")
    val got = TimeSeries.intervalJoin(points, ivs, "p", "lo", "hi", w)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(identity).toSeq
    assert(got === Seq((1L, 10L), (1L, 11L), (2L, 10L), (4L, 11L)))
  }

  test("weightedSample: deterministic A-Res ranking replayed in scala") {
    val df = (1 to 50).map(i => (i.toLong, (i % 7 + 1).toLong * 100))
      .toDF("doc_id", "w")
    val got = Sampling.weightedSample(df, "doc_id", "w", 5)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val expect = (1 to 50).map { i =>
      val h = TextOps.md5Long(s"ws$i")
      val u = ((h % 1048576L) + 1L).toDouble / 1048576.0
      val key = math.rint(math.pow(u, 1.0 / ((i % 7 + 1) * 100).toDouble) * 1e9) / 1e9
      (i.toLong, key)
    }.sortBy { case (id, k) => (-k, id) }.take(5).map(_._1)
    assert(got === expect)
  }
}
