package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robust (median / MAD) scoring for corpus curation — the
  * length-outlier and metric-outlier filters of C4/Gopher-style
  * pipelines, done with medians so a heavy tail cannot drag the
  * threshold the way mean/stddev filters do.
  *
  * Scale shape: two exact-percentile aggregations (median, then median
  * absolute deviation) — each is one map-side-combined pass whose merge
  * state is proportional to the column's DISTINCT value count, not its
  * row count (document lengths, token counts and quality scores are
  * low-cardinality; for genuinely unbounded columns switch to
  * approx_percentile). Both scalars ride as 1-row broadcasts; the
  * scoring itself is a pure per-row expression.
  */
object RobustStats {

  /** Append `outCol` = |x − median| / MAD to every row. MAD 0 (over
    * half the rows share the median value) yields null scores — filter
    * or coalesce at the call site if that regime is possible. */
  def robustZ(df: DataFrame, valCol: String,
      outCol: String = "robust_z"): DataFrame = {
    val med = df.agg(expr(s"percentile($valCol, 0.5)").as("__med"))
    val withMed = df.crossJoin(broadcast(med))
    val mad = withMed
      .agg(expr(s"percentile(abs($valCol - __med), 0.5)").as("__mad"))
    withMed.crossJoin(broadcast(mad))
      .withColumn(outCol, abs(col(valCol) - col("__med")) / col("__mad"))
      .drop("__med", "__mad")
  }
}
