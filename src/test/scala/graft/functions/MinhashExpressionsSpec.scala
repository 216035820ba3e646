package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.pipeline.{Dedup, TextOps}

/** Fused MinHash kernels vs the exploded SQL formulation they replace —
  * identical hashes and minima on real documents. */
class MinhashExpressionsSpec extends SparkTestBase {
  import spark.implicits._

  lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("shingle hashes match portableHash64 over TextOps.shingles") {
    val viaSql = docs.select(col("doc_id"),
      sort_array(transform(TextOps.shingles(col("text"), 3),
        s => TextOps.portableHash64(s))).as("h"))
    val viaNative = docs.select(col("doc_id"),
      sort_array(MinhashExpressions.shingleHashes(
        TextOps.tokens(col("text")), 3)).as("h"))
    val joined = viaSql.as("a").join(viaNative.as("b"), "doc_id")
      .filter(col("a.h") =!= col("b.h"))
    assert(joined.count() === 0)
  }

  test("fused minima match per-seed min over seed-mixed hashes") {
    val coefs = (0 until 8).map(Dedup.minhashCoef)
    val hs = MinhashExpressions.shingleHashes(TextOps.tokens(col("text")), 3)
    val native = docs.select(col("doc_id"),
      MinhashExpressions.minhashMinima(hs, coefs, Dedup.MinhashP).as("m"))
    val viaSql = docs.select(col("doc_id"),
      array((0 until 8).map { s =>
        val (a, b) = coefs(s)
        array_min(transform(hs, h =>
          pmod(lit(a) * pmod(h, lit(Dedup.MinhashP)) + lit(b), lit(Dedup.MinhashP))))
      }: _*).as("m"))
    val joined = native.as("a").join(viaSql.as("b"), "doc_id")
      .filter(col("a.m") =!= col("b.m"))
    assert(joined.count() === 0)
  }

  test("short and empty docs: one join-all shingle") {
    val d = Seq("a b", "", "one two three four").toDF("text")
    val r = d.select(size(MinhashExpressions.shingleHashes(
      TextOps.tokens(col("text")), 3)).as("n")).collect().map(_.getInt(0))
    assert(r.toSeq === Seq(1, 1, 2))
  }
}
