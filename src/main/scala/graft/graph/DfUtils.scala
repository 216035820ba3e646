package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

object DfUtils {

  /** Skew-resistant inner equi-join: replicate each `right` row
    * `saltBuckets` times and scatter `left` rows uniformly across the
    * replicas, so one hot key spreads over `saltBuckets` tasks instead
    * of stalling a single reducer. Complements AQE's runtime skew-join
    * split (which needs the skew visible in shuffle statistics): salting
    * is the static answer when the hot key is known or AQE is off. Use
    * for large-×-small-but-not-broadcastable joins; the right side's
    * replication factor is its cost. */
  def saltedJoin(
      left: DataFrame, right: DataFrame, leftKey: Column, rightKey: Column,
      saltBuckets: Int): DataFrame = {
    val saltedL = left.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id(), spark_partition_id()),
        lit(saltBuckets)).cast("int"))
    val saltedR = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedL.join(saltedR,
      leftKey === rightKey && saltedL("__salt") === saltedR("__salt"))
      .drop("__salt")
  }

  /** Append a dense 1-based row number without a global single-partition
    * window (which would serialize every row through one task at scale):
    * local row_number per partition + broadcast-joined partition offsets.
    * The only non-parallel step is a window over one row per partition.
    * The input is checkpointed so both passes see the same partitioning.
    */
  def withRowNum(df0: DataFrame, out: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pid = "__rn_pid"; val loc = "__rn_loc"; val off = "__rn_off"
    val withPid = df0.withColumn(pid, spark_partition_id()).localCheckpoint(true)
    val offsets = withPid.groupBy(col(pid)).agg(count(lit(1)).as("__rn_cnt"))
      .withColumn(off, coalesce(
        sum(col("__rn_cnt")).over(
          Window.orderBy(col(pid)).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col(pid), col(off))
    withPid
      .withColumn(loc, row_number().over(
        Window.partitionBy(col(pid)).orderBy(monotonically_increasing_id())))
      .join(broadcast(offsets), Seq(pid))
      .withColumn(out, (col(off) + col(loc)).cast("long"))
      .drop(pid, loc, off)
  }
}
