package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class TextScoringSpec extends SparkTestBase {
  import spark.implicits._

  test("bm25 matches an independent plain-Scala computation") {
    val corpus = Seq(
      (1L, "a a b x"),
      (2L, "a x y z"),
      (3L, "x y z w q"),
      (4L, "b b"))
    val df = corpus.toDF("doc_id", "text")
    val terms = Seq("a", "b")

    // reference implementation over plain collections
    val docs = corpus.map { case (id, t) => (id, t.split("\\s+").toSeq) }
    val n = docs.size.toDouble
    val avgdl = docs.map(_._2.size).sum / n
    val dfq = terms.map(t => t -> docs.count(_._2.contains(t)).toDouble).toMap
    val (k1, b) = (1.2, 0.75)
    val expected = docs.flatMap { case (id, toks) =>
      val contribs = terms.flatMap { t =>
        val tf = toks.count(_ == t).toDouble
        if (tf == 0) None
        else {
          val idf = math.log((n - dfq(t) + 0.5) / (dfq(t) + 0.5) + 1.0)
          Some(idf * tf * (k1 + 1) /
            (tf + k1 * (1 - b + b * toks.size / avgdl)))
        }
      }
      if (contribs.isEmpty) None
      else Some(id -> (contribs.size.toLong, contribs.sum))
    }.toMap

    val got = TextOps.bm25(df, "text", "doc_id", terms)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_terms"), r.getAs[Double]("bm25")))
      .toMap
    assert(got.keySet === expected.keySet)
    for ((id, (nt, sc)) <- expected) {
      assert(got(id)._1 === nt, s"n_terms for doc $id")
      assert(math.abs(got(id)._2 - sc) < 1e-12, s"bm25 for doc $id")
    }
    // doc 3 has no query terms — absent, not zero-scored
    assert(!got.contains(3L))
  }

  test("robustZ is |x - median| / MAD with exact interpolated medians") {
    val df = ((1 to 9).map(_.toLong) :+ 100L).map(v => (v, v))
      .toDF("id", "v")
    val z = RobustStats.robustZ(df, "v").select("id", "robust_z")
      .as[(Long, Double)].collect().toMap
    // median 5.5, deviations' median (MAD) 2.5
    assert(math.abs(z(100L) - 94.5 / 2.5) < 1e-12)
    assert(math.abs(z(1L) - 4.5 / 2.5) < 1e-12)
    assert(math.abs(z(5L) - 0.5 / 2.5) < 1e-12)
  }
}
