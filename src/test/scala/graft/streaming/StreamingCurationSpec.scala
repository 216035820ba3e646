package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

case class RawDoc(doc_id: Long, text: String)

class StreamingCurationSpec extends SparkTestBase {
  import spark.implicits._

  private val baseA = "the quick brown fox jumps over the lazy dog near the river"
  private val corpus = Seq(
    RawDoc(1, baseA),
    RawDoc(2, baseA), // exact duplicate of 1
    RawDoc(3, "the quick brown fox jumps over the lazy cat near the river"), // near-dup of 1
    RawDoc(4, "le renard brun saute par dessus le chien paresseux pres de la riviere"), // fr
    RawDoc(5, "the short one"), // < 10 tokens
    RawDoc(6, "the completely different document talks about spark plans and shuffles of data"))

  private def curator(threshold: Double = 0.3) = new StreamingCuration(
    spark, lang = "en", minTokens = 10, shingleK = 3, bands = 8,
    rowsPerBand = 4, threshold = threshold, maxBucketSize = 200)

  private def kept(df: DataFrame): Set[Long] =
    df.select("doc_id").as[Long].collect().toSet

  test("filters, exact-dedups and near-dedups across micro-batches") {
    val sc = curator()
    val k0 = kept(sc.processBatch(Seq(corpus(0), corpus(3), corpus(4)).toDF(),
      "text", "doc_id"))
    assert(k0 === Set(1L)) // 4 filtered by language, 5 by length
    val k1 = kept(sc.processBatch(Seq(corpus(1), corpus(2), corpus(5)).toDF(),
      "text", "doc_id"))
    // 2 exact-dropped against the hash state, 3 near-dropped against
    // the signature state, 6 survives
    assert(k1 === Set(6L))
  }

  test("replaying a batch emits nothing (exact suppression)") {
    val sc = curator()
    val b = corpus.toDF()
    assert(kept(sc.processBatch(b, "text", "doc_id")) === Set(1L, 6L))
    assert(sc.processBatch(b, "text", "doc_id").count() === 0L)
  }

  test("online semantics: the EARLIER arrival of an exact pair wins") {
    val sc = curator()
    assert(kept(sc.processBatch(Seq(corpus(1)).toDF(), "text", "doc_id")) === Set(2L))
    // doc 1 (same text, later arrival) is the one suppressed
    assert(kept(sc.processBatch(Seq(corpus(0), corpus(5)).toDF(), "text", "doc_id"))
      === Set(6L))
  }

  test("the state keeps dropped documents' signatures: chains keep dropping") {
    // B near-dups A (last token changed: jaccard 18/20 = 0.90); C
    // near-dups B (first token changed: 0.90) but NOT A (both ends
    // changed: 17/21 = 0.81 < 0.85). With the chain in one batch: B
    // drops against A, C drops against the ALREADY-DROPPED B — the
    // state must retain B's signature.
    val mid = ((2 to 10).map(i => f"tok$i%02d") ++ Seq("of") ++
      (11 to 19).map(i => f"tok$i%02d")).mkString(" ")
    val a = s"tok01 $mid tok21"
    val b = s"tok01 $mid zz"
    val c = s"yy $mid zz"
    val sc = curator(threshold = 0.85)
    val k = kept(sc.processBatch(
      Seq(RawDoc(10, a), RawDoc(11, b), RawDoc(12, c)).toDF(), "text", "doc_id"))
    assert(k === Set(10L))
  }

  test("any batch split keeps exactly the earliest arrival of the near-dup pair") {
    // corpus without exact dups: docs 1 and 3 near-dup; whichever
    // ARRIVES first survives (same batch -> smaller id), 6 always does
    val docs = Seq(corpus(0), corpus(2), corpus(3), corpus(4), corpus(5))
    for (seed <- 1 to 3) {
      val rng = new scala.util.Random(seed)
      val assign = docs.map(d => d.doc_id -> rng.nextInt(2)).toMap
      val sc = curator()
      val all = (0 to 1).flatMap { b =>
        val bd = docs.filter(d => assign(d.doc_id) == b)
        if (bd.isEmpty) Set.empty[Long]
        else kept(sc.processBatch(bd.toDF(), "text", "doc_id"))
      }.toSet
      val winner = Seq(1L, 3L).minBy(id => (assign(id), id))
      assert(all === Set(winner, 6L), s"seed=$seed assign=$assign")
    }
  }
}
