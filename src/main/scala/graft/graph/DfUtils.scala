package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

object DfUtils {

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
