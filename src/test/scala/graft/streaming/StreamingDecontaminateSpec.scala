package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.pipeline.TextOps

case class TrainDoc(doc_id: Long, source: String, text: String)

class StreamingDecontaminateSpec extends SparkTestBase {
  import spark.implicits._

  // doc 107 is the "eval" doc; 1 and 4 share its 4-gram, 2 does not,
  // 3 is too short to define a 4-gram
  private val evalDocs = Seq(
    TrainDoc(107, "e", "alpha beta gamma delta unique eval tail"))
  private val train = Seq(
    TrainDoc(1, "s0", "prefix words alpha beta gamma delta suffix"),
    TrainDoc(2, "s0", "totally different text with no shared grams here"),
    TrainDoc(3, "s1", "tiny doc"),
    TrainDoc(4, "s1", "more filler then alpha beta gamma delta closing words"))

  private def flagged(df: DataFrame): Set[Long] =
    df.select("doc_id").as[Long].collect().toSet

  private def detector() = new StreamingDecontaminate(
    spark, evalDocs.toDF(), "text", "doc_id", gramK = 4)

  test("two-batch streaming equals the batch flag set") {
    val sd = detector()
    val f0 = flagged(sd.processBatch(train.toDF().filter($"doc_id" % 2 === 0), "text", "doc_id"))
    val f1 = flagged(sd.processBatch(train.toDF().filter($"doc_id" % 2 === 1), "text", "doc_id"))
    assert((f0 ++ f1) === Set(1L, 4L))
    assert(f0.intersect(f1).isEmpty)
    assert(sd.processedCount === train.size)
  }

  test("flagged rows keep their batch columns for downstream routing") {
    val sd = detector()
    val out = sd.processBatch(train.toDF(), "text", "doc_id")
    assert(out.columns.toSet === Set("doc_id", "source", "text"))
    assert(out.select("source").as[String].collect().toSet === Set("s0", "s1"))
  }

  test("replaying a batch emits nothing and leaves the seen state unchanged") {
    val sd = detector()
    assert(flagged(sd.processBatch(train.toDF(), "text", "doc_id")) === Set(1L, 4L))
    val replay = sd.processBatch(train.toDF(), "text", "doc_id")
    assert(replay.count() === 0L)
    assert(sd.processedCount === train.size)
  }

  test("probe broadcasts the eval grams; no sort-merge join of the corpus side") {
    val sd = detector()
    sd.processBatch(train.toDF(), "text", "doc_id").count()
    val plan = sd.lastProbePlan
    assert(plan.nonEmpty)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("surge batches degrade to shuffled joins under the broadcast row limit") {
    spark.conf.set("spark.graft.ingest.broadcastRowLimit", "1")
    try {
      val sd = detector()
      sd.processBatch(train.toDF().filter($"doc_id" <= 2), "text", "doc_id").count()
      // replay-suppression path on the second batch must not broadcast
      val out = sd.processBatch(train.toDF(), "text", "doc_id")
      assert(flagged(out) === Set(4L)) // 1 already seen; merge still correct
      assert(sd.processedCount === train.size)
    } finally spark.conf.unset("spark.graft.ingest.broadcastRowLimit")
  }

  test("any seeded random micro-batch partition reproduces the batch flag set") {
    for (seed <- 1 to 4) {
      val rng = new scala.util.Random(seed)
      val nBatches = 2 + rng.nextInt(2)
      val assign = train.map(d => d.doc_id -> rng.nextInt(nBatches)).toMap
      val sd = detector()
      val streamed = (0 until nBatches).map { b =>
        val ids = assign.collect { case (id, `b`) => id }.toSeq
        if (ids.isEmpty) Set.empty[Long]
        else flagged(sd.processBatch(
          train.toDF().filter($"doc_id".isin(ids: _*)), "text", "doc_id"))
      }
      assert(streamed.reduce(_ ++ _) === Set(1L, 4L), s"seed=$seed split=$assign")
      assert(streamed.map(_.size).sum === 2, s"seed=$seed")
    }
  }

  test("streaming source drives decontamination through foreachBatch") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[TrainDoc]
    val got = scala.collection.mutable.Set.empty[Long]
    val sd = detector()
    val q = sd.start(ms.toDF(), "text", "doc_id") { (df, _) =>
      got ++= df.select("doc_id").as[Long].collect()
    }
    try {
      ms.addData(train.take(2): _*)
      q.processAllAvailable()
      ms.addData(train.drop(2): _*)
      q.processAllAvailable()
      assert(got.toSet === Set(1L, 4L))
    } finally q.stop()
  }
}
