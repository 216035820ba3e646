package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series join operators Spark lacks natively: backward as-of join
  * and interval (range) containment join — both expressed as single-
  * shuffle DataFrame plans, never a broadcast-nested-loop and never an
  * all-pairs product, so they hold up big-against-big at 100 TB.
  *
  * The reference engine has no as-of surface; these are beyond-parity
  * operators motivated by event-log feature extraction (join each label
  * event to the latest preceding context event) and concurrency
  * analysis (how many sessions span an incident).
  */
object TimeSeries {

  /** Backward as-of join: for every left row, attach the payload of the
    * single right row with the same key and the greatest `rightTs`
    * satisfying `rightTs <= leftTs` (ties on `rightTs` broken toward
    * the greatest `tieCol`, so results are deterministic). Left rows
    * with no preceding right row keep null payload (left-outer
    * semantics).
    *
    * Plan shape — the 100 TB story: both sides are tagged and UNIONed,
    * then ONE hash-partition on the key and ONE sort on
    * (ts, side, tie) feed a codegen'd running `last(_, ignoreNulls)`
    * window that carries the latest right payload forward into each
    * left row. No broadcast, no nested loop, no per-key collect; cost
    * is one Exchange + one Sort regardless of how many right rows
    * precede each left row. The payload rides as ONE struct column so
    * all attached fields come atomically from the same right row.
    *
    * @param leftCols   left columns to keep (default: all).
    * @param rightCols  right payload columns, attached as
    *                   `{prefix}{name}`.
    * @param tieCol     right column ordering equal-timestamp right rows
    *                   (the max wins); must be in `right`.
    * @param tolerance  optional max allowed `leftTs - rightTs` (same
    *                   unit as the ts columns after cast to long, e.g.
    *                   microseconds for timestamps); matches further
    *                   back are nulled out.
    */
  def asofJoinBackward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightCols: Seq[String],
      tieCol: String,
      leftCols: Option[Seq[String]] = None,
      prefix: String = "asof_",
      tolerance: Option[Long] = None): DataFrame = {
    val lCols = leftCols.getOrElse(left.columns.toSeq)
    require(!lCols.contains("__ts") && keys.forall(left.columns.contains),
      "left must carry the join keys; __ts/__side/__pay are reserved")
    // ts compares as epoch micros for timestamps, raw long otherwise
    def tsLong(df: DataFrame, c: String): Column = epochLong(df, c)
    // the matched right row's ts rides inside the payload (as __rts) so
    // the tolerance bound can compare against it after the carry-forward
    val payload = struct(
      rightCols.map(col) :+ tsLong(right, rightTs).as("__rts"): _*)
    val rTagged = right.select(
      keys.map(col) ++ Seq(
        tsLong(right, rightTs).as("__ts"),
        col(tieCol).cast("long").as("__order"),
        lit(0).as("__side"),
        payload.as("__pay")) ++
        lCols.filterNot(keys.contains).map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val lTagged = left.select(
      keys.map(col) ++ Seq(
        tsLong(left, leftTs).as("__ts"),
        lit(Long.MaxValue).as("__order"), // left rows sort after right ties
        lit(1).as("__side"),
        lit(null).cast(rTagged.schema("__pay").dataType).as("__pay")) ++
        lCols.filterNot(keys.contains).map(col): _*)
    // ONE shuffle + ONE sort: right rows at the same (key, ts) sort
    // before left rows (side 0 < 1) and among themselves by tieCol, so
    // the running last() sees exactly the as-of row when a left row
    // arrives
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"), col("__order"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rTagged.unionByName(lTagged)
      .withColumn("__match", last(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    // tolerance: null the match when it is further back than allowed
    val bounded = tolerance.fold(carried)(tol =>
      carried.withColumn("__match",
        when(col("__ts") - col("__match.__rts") <= lit(tol), col("__match"))))
    bounded.select(
      lCols.map(col) ++
        rightCols.map(c => col(s"__match.$c").as(s"$prefix$c")) :+
        col("__match.__rts").as(s"${prefix}ts_long"): _*)
  }

  /** Hot-key variant of [[asofJoinBackward]]: identical semantics,
    * skew-safe plan. The plain operator windows on the bare key — one
    * hot key means ONE partition sorts that key's entire history, the
    * exact skew shape [[SkewJoin.salted]] mitigates for equi-joins
    * (r8 verdict #4). Here the two-phase cure:
    *   1. right rows scatter over `numSalts` deterministic salts
    *      (hash of their own (ts, tie) — uniform, reproducible); left
    *      rows replicate to EVERY salt. Per (key, salt) the plain
    *      operator computes the salt-local latest-preceding candidate,
    *      so each sort handles |left_k| + |right_k|/numSalts rows.
    *   2. the per-left-row candidates merge with ONE map-side-combined
    *      max over a (ts, tie, payload) struct — the global
    *      latest-preceding is the max of the salt-local ones, ties
    *      resolved by the same tieCol order, and a null ts loses to
    *      any real candidate (struct ordering puts nulls first).
    * Multiset-equal to the plain operator for any input (the spec
    * checks an 80 %-one-key frame); cost is a `numSalts`× replication
    * of the (small) left side against an S-way split of the (huge)
    * hot right history — use it when the RIGHT side is the skewed one.
    * Tolerance composes exactly: salt-local matches beyond the bound
    * null out, and if the most recent candidate is out of tolerance
    * every older one is too, so the merged result nulls just as the
    * plain operator does.
    *
    * `numSalts <= 0` (the default) sizes the salt count from the data:
    * one cheap census on the right side measures the hottest key's
    * history, salts = ceil(hottest / [[SaltTargetRowsPerSort]]) capped
    * at 64 — and when the plan would NOT pay for itself (no key's
    * history exceeds one task's sort budget, or the replicated left
    * side would outweigh the right side it is splitting), the call
    * falls back to the plain [[asofJoinBackward]] with a log warning
    * (see [[autoSalts]]). Explicit `numSalts >= 2` skips the census
    * and always salts — the caller has measured their own skew. */
  def asofJoinBackwardSalted(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightCols: Seq[String],
      tieCol: String,
      leftCols: Option[Seq[String]] = None,
      prefix: String = "asof_",
      tolerance: Option[Long] = None,
      numSalts: Int = -1): DataFrame = {
    require(numSalts <= 0 || numSalts >= 2,
      s"numSalts must be >= 2 (or <= 0 for auto), got $numSalts")
    val salts =
      if (numSalts >= 2) numSalts
      else autoSalts(left, right, keys)
    if (salts == 0)
      return asofJoinBackward(left, right, keys, leftTs, rightTs,
        rightCols, tieCol, leftCols, prefix, tolerance)
    doSalted(left, right, keys, leftTs, rightTs, rightCols, tieCol,
      leftCols, prefix, tolerance, salts)
  }

  /** One right-side task should sort at most this many rows of a single
    * key's history — the auto-salt sizing target. Package-visible so the
    * spec can exercise the sizing math with a small target. */
  private[pipeline] val SaltTargetRowsPerSort = 1L << 20

  /** Salt-count decision for auto mode: 0 = use the plain operator.
    * One groupBy census on the right (hottest-key count + total) plus a
    * left count when salting is on the table. Falls back to plain when
    * (a) no key's history exceeds `target` rows — the plain operator's
    * single per-key sort already fits one task; or (b) the `salts`-way
    * replicated left side exceeds 2× the right side — the replication
    * would cost more rows than the hot-key split saves (the left-heavy
    * shape; warned, since the caller asked for the salted plan). */
  private[pipeline] def autoSalts(left: DataFrame, right: DataFrame,
      keys: Seq[String], target: Long = SaltTargetRowsPerSort): Int = {
    // reserved alias, not the default "count" name: a join key column
    // itself named "count" would make max(col("count")) ambiguous and
    // throw AnalysisException on an otherwise valid call
    val census = right.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__graft_cnt"))
      .agg(max(col("__graft_cnt")).as("mx"),
        sum(col("__graft_cnt")).as("n")).collect()(0)
    if (census.isNullAt(0)) return 0 // empty right: nothing to split
    val hottest = census.getLong(0)
    val nRight = census.getLong(1)
    if (hottest <= target) 0
    else {
      val salts = math.min(64L, (hottest + target - 1) / target)
        .max(2L).toInt
      val nLeft = left.count()
      if (nLeft * salts > 2L * nRight) {
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"asofJoinBackwardSalted(auto): left side ($nLeft rows) x " +
            s"$salts salts outweighs the right side ($nRight rows) — " +
            "falling back to the plain single-sort as-of join")
        0
      } else salts
    }
  }

  private def doSalted(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightCols: Seq[String],
      tieCol: String,
      leftCols: Option[Seq[String]],
      prefix: String,
      tolerance: Option[Long],
      numSalts: Int): DataFrame = {
    val lCols = leftCols.getOrElse(left.columns.toSeq)
    require(!lCols.contains("__lid") && !lCols.contains("__salt"),
      "__lid/__salt are reserved")
    // per-execution row identity for the merge; values are internal to
    // this plan (the groupBy collapses them), so only uniqueness within
    // one execution matters
    val lw = left.select((keys ++ lCols ++ Seq(leftTs)).distinct.map(col): _*)
      .withColumn("__lid", monotonically_increasing_id())
      .withColumn("__salt", explode(sequence(lit(0), lit(numSalts - 1))))
    val rSalted = right.withColumn("__salt",
      pmod(xxhash64(epochLong(right, rightTs), col(tieCol)), lit(numSalts))
        .cast("int"))
    // the tie column rides along so the merge can re-apply the same
    // equal-ts tie-break across salts
    val innerRight = (rightCols :+ tieCol).distinct
    val perSalt = asofJoinBackward(lw, rSalted, keys :+ "__salt",
      leftTs, rightTs, innerRight, tieCol,
      leftCols = Some(lCols ++ Seq("__lid")),
      prefix = "__c_", tolerance = tolerance)
    val cand = struct(
      col("__c_ts_long").as("__rts"),
      col(s"__c_$tieCol").cast("long").as("__tie"), // plain op orders ties as long
      struct(rightCols.map(c => col(s"__c_$c").as(c)): _*).as("__pay"))
    perSalt
      .groupBy((col("__lid") +: lCols.map(col)): _*)
      .agg(max(cand).as("__top"))
      .select(lCols.map(col) ++
        rightCols.map(c => col(s"__top.__pay.$c").as(s"$prefix$c")) :+
        col("__top.__rts").as(s"${prefix}ts_long"): _*)
  }

  /** Interval containment join: pair every point row with every
    * interval row whose `[lo, hi]` contains `point` — without a
    * broadcast-nested-loop. Both sides map to integer buckets of
    * `bucketWidth` (an interval explodes to every bucket it overlaps;
    * a point to exactly one), the sides equi-join on the bucket id, and
    * the exact containment predicate filters. Each qualifying
    * (point, interval) pair meets in exactly one bucket — the point's —
    * so no dedup pass is needed.
    *
    * Scale: one hash shuffle on the bucket id for each side; the
    * interval side's row expansion is `ceil(len / bucketWidth) + 1` per
    * interval, so pick `bucketWidth` near the median interval length
    * (expansion ~2x) — never smaller than the skew you can shuffle.
    * Join type is inner; wrap with a left join against the point side
    * to keep unmatched points.
    *
    * All columns of both inputs are kept (point columns first); the
    * caller guarantees disjoint column names.
    */
  def intervalJoin(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      loCol: String,
      hiCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def toLong(df: DataFrame, c: String): Column = epochLong(df, c)
    val p = points.withColumn("__bkt",
      floorDiv(toLong(points, pointCol), bucketWidth))
    val iv = intervals
      .withColumn("__bkt", explode(sequence(
        floorDiv(toLong(intervals, loCol), bucketWidth),
        floorDiv(toLong(intervals, hiCol), bucketWidth))))
    p.join(iv, Seq("__bkt"))
      .filter(toLong(points, pointCol).between(
        toLong(intervals, loCol), toLong(intervals, hiCol)))
      .drop("__bkt")
  }

  /** Floor division that is correct for negative values (Spark's
    * integer `/` truncates toward zero) AND exact over the whole long
    * range: `(x - pmod(x, w)) / w` in pure integral arithmetic. The
    * old double-cast floor was exact only below 2^53 — fine for epoch
    * micros (~1.8e15) but silently off-by-one for nanosecond
    * timestamps or other large long keys. The numerator is an exact
    * multiple of `w`, so the integral `div` is lossless (valid for
    * |x| < Long.MaxValue - w; the subtraction cannot underflow there).
    */
  private[pipeline] def floorDiv(x: Column, w: Long): Column =
    call_function("div", x - pmod(x, lit(w)), lit(w))

  /** Epoch micros for timestamp columns (NTZ reads as UTC — sessions
    * run with spark.sql.session.timeZone=UTC, so the LTZ hop is
    * exact), pass-through cast for numeric columns. */
  def epochLong(df: DataFrame, c: String): Column = df.schema(c).dataType match {
    case org.apache.spark.sql.types.TimestampType => unix_micros(col(c))
    case org.apache.spark.sql.types.TimestampNTZType =>
      unix_micros(col(c).cast(org.apache.spark.sql.types.TimestampType))
    case _ => col(c).cast("long")
  }
}
