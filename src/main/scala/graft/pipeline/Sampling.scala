package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Weighted sampling without replacement at corpus scale —
  * Efraimidis & Spirakis (2006) "A-Res": each row draws a deterministic
  * pseudo-uniform u ∈ (0,1] from the portable 60-bit hash of its id and
  * ranks by key = u^(1/w); the global top-k of that key IS a weighted
  * sample without replacement. Used for picking training-mixture
  * documents proportionally to a quality/size weight.
  *
  * Scale shape: the key is one codegen'd expression per row (no
  * shuffle), and the selection is a TakeOrdered (per-partition top-k,
  * then a k-row merge on the driver) — never a full sort of the
  * corpus. Determinism: the hash is [[TextOps.portableHash64]], so a
  * SQL oracle replays the exact sample.
  */
object Sampling {

  /** A-Res ranking key for one row: u^(1/weight), u derived from
    * md5(salt || id) — identical in Spark and DuckDB
    * (see TextOps.portableHash64). `weight` must be > 0. */
  def aresKey(id: Column, weight: Column, salt: String): Column = {
    // u in (0, 1]: ((h mod 2^20) + 1) / 2^20 — the +1 keeps u > 0 so
    // pow() never collapses to 0^x
    val u = ((TextOps.portableHash64(concat(lit(salt), id.cast("string")))
      % lit(1048576L)) + 1L).cast(DoubleType) / lit(1048576.0)
    pow(u, lit(1.0) / weight.cast(DoubleType))
  }

  /** The weighted sample: top-`k` rows of `df` by A-Res key on
    * `weightCol`, deterministic (key rounded to 9 places before
    * ordering, ties broken by `idCol` — so float noise can never flip
    * the cross-engine order). Returns the input columns plus the
    * rounded `ares_key`. */
  def weightedSample(
      df: DataFrame, idCol: String, weightCol: String, k: Int,
      salt: String = "ws"): DataFrame =
    df.withColumn("ares_key",
        round(aresKey(col(idCol), col(weightCol), salt), 9))
      .orderBy(col("ares_key").desc, col(idCol))
      .limit(k)
}
