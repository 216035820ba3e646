package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.pipeline.Dedup

case class Doc(doc_id: Long, text: String)

class StreamingDedupSpec extends SparkTestBase {
  import spark.implicits._

  private val corpus = Seq(
    Doc(1, "the quick brown fox jumps over the lazy dog"),
    Doc(2, "the quick brown fox jumps over the lazy cat"), // near-dup of 1
    Doc(3, "completely different text about spark pipelines and shuffles"),
    Doc(4, "the quick brown fox jumps over the lazy dog today"), // near-dup of 1, 2
    Doc(5, "another unrelated document mentioning parquet row groups"),
    Doc(6, "completely different text about spark pipelines and shuffles ok") // ~3
  )

  private def pairs(df: DataFrame): Set[(Long, Long, Double)] =
    df.select("id_a", "id_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("two-batch streaming equals the batch operator") {
    val docs = corpus.toDF()
    val batchMode = pairs(Dedup.minhashLsh(docs, "text", "doc_id",
      shingleK = 3, bands = 8, rowsPerBand = 4, threshold = 0.3))
    assert(batchMode.nonEmpty, "corpus must contain near-dups for the test to bite")

    val sd = new StreamingDedup(spark, shingleK = 3, bands = 8,
      rowsPerBand = 4, threshold = 0.3)
    val p0 = pairs(sd.processBatch(docs.filter(col("doc_id") % 2 === 0), "text", "doc_id"))
    val p1 = pairs(sd.processBatch(docs.filter(col("doc_id") % 2 === 1), "text", "doc_id"))
    assert((p0 ++ p1) === batchMode)
    assert(p0.intersect(p1).isEmpty) // no pair emitted twice
    assert(sd.corpusSize === corpus.size)
  }

  test("replaying a batch emits nothing new and leaves the state unchanged") {
    val docs = corpus.toDF()
    val sd = new StreamingDedup(spark, threshold = 0.3)
    val b = docs.filter(col("doc_id") <= 3)
    sd.processBatch(b, "text", "doc_id").count()
    val n0 = sd.corpusSize
    val replay = sd.processBatch(b, "text", "doc_id")
    assert(replay.count() === 0L)
    assert(sd.corpusSize === n0)
  }

  test("cross-probe streams the store against broadcast batch bands") {
    val sd = new StreamingDedup(spark, threshold = 0.3)
    sd.processBatch(corpus.take(4).toDF(), "text", "doc_id").count()
    sd.lastCrossProbePlan = ""
    sd.processBatch(corpus.drop(4).toDF(), "text", "doc_id").count()
    val plan = sd.lastCrossProbePlan
    assert(plan.nonEmpty)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("any seeded random micro-batch partition reproduces the batch operator") {
    val docs = corpus.toDF()
    val batchMode = pairs(Dedup.minhashLsh(docs, "text", "doc_id",
      shingleK = 3, bands = 8, rowsPerBand = 4, threshold = 0.3))
    for (seed <- 1 to 4) {
      val rng = new scala.util.Random(seed)
      val nBatches = 2 + rng.nextInt(2)
      val assign = corpus.map(d => d.doc_id -> rng.nextInt(nBatches)).toMap
      val sd = new StreamingDedup(spark, shingleK = 3, bands = 8,
        rowsPerBand = 4, threshold = 0.3)
      val streamed = (0 until nBatches).map { b =>
        val ids = assign.collect { case (id, `b`) => id }.toSeq
        if (ids.isEmpty) Set.empty[(Long, Long, Double)]
        else pairs(sd.processBatch(
          docs.filter(col("doc_id").isin(ids: _*)), "text", "doc_id"))
      }
      assert(streamed.reduce(_ ++ _) === batchMode, s"seed=$seed split=$assign")
      // emissions are disjoint across batches: nothing reported twice
      assert(streamed.map(_.size).sum === batchMode.size, s"seed=$seed")
    }
  }

  test("streaming source drives the detector through foreachBatch") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[Doc]
    val got = scala.collection.mutable.Set.empty[(Long, Long)]
    val sd = new StreamingDedup(spark, threshold = 0.3)
    val q = sd.start(ms.toDF(), "text", "doc_id") { (pairsDf, _) =>
      got ++= pairsDf.select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
    }
    try {
      ms.addData(corpus.take(3): _*)
      q.processAllAvailable()
      ms.addData(corpus.drop(3): _*)
      q.processAllAvailable()
      val batchMode = Dedup.minhashLsh(corpus.toDF(), "text", "doc_id",
        shingleK = 3, bands = 8, rowsPerBand = 4, threshold = 0.3)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got.toSet === batchMode)
    } finally q.stop()
  }

  test("durable state: a killed-and-resumed MemoryStream run emits the " +
      "identical pair set, without re-shingling history") {
    implicit val sq = spark.sqlContext
    val statePath = java.nio.file.Files.createTempDirectory("sdedup-state").toString
    val ckpt = java.nio.file.Files.createTempDirectory("sdedup-ckpt").toString
    // unbroken in-memory reference run over the same two batches
    val ref = new StreamingDedup(spark, threshold = 0.3)
    val r0 = pairs(ref.processBatch(corpus.take(3).toDF(), "text", "doc_id"))
    val r1 = pairs(ref.processBatch(corpus.drop(3).toDF(), "text", "doc_id"))
    assert(r1.nonEmpty, "cross-batch pairs must exist for the resume to bite")

    val collected = scala.collection.mutable.Set.empty[(Long, Long, Double)]
    val ms = MemoryStream[Doc]
    val sd1 = new StreamingDedup(spark, threshold = 0.3,
      statePath = Some(statePath))
    val q1 = sd1.start(ms.toDF(), "text", "doc_id", Some(ckpt)) { (out, _) =>
      collected ++= pairs(out)
    }
    try { ms.addData(corpus.take(3): _*); q1.processAllAvailable() }
    finally q1.stop() // kill after batch 0 commits

    // resume: NEW processor (empty in-memory state) on the same state
    // path + checkpoint — history must come from the durable store
    val sd2 = new StreamingDedup(spark, threshold = 0.3,
      statePath = Some(statePath))
    val q2 = sd2.start(ms.toDF(), "text", "doc_id", Some(ckpt)) { (out, _) =>
      collected ++= pairs(out)
    }
    try { ms.addData(corpus.drop(3): _*); q2.processAllAvailable() }
    finally q2.stop()
    assert(collected.toSet === (r0 ++ r1))
    assert(sd2.corpusSize === corpus.size.toLong)

    // a third resumed instance replaying already-absorbed docs emits
    // nothing and leaves the durable state unchanged
    val sd3 = new StreamingDedup(spark, threshold = 0.3,
      statePath = Some(statePath))
    assert(sd3.processBatch(corpus.take(3).toDF(), "text", "doc_id").count() === 0L)
    assert(sd3.corpusSize === corpus.size.toLong)
  }

  test("durable state: a new stream restarting at batchId 0 never " +
      "overwrites direct-call partitions (disjoint keyspaces)") {
    val statePath = java.nio.file.Files.createTempDirectory("sdedup-ks").toString
    // direct calls (no stream batchId) populate the store
    val sd1 = new StreamingDedup(spark, threshold = 0.3, statePath = Some(statePath))
    sd1.processBatch(corpus.take(3).toDF(), "text", "doc_id").count()
    // a NEW stream over the same path restarts its checkpoint counter
    // at batchId 0 — with a shared keyspace this dynamically overwrote
    // the direct partition 0 and silently discarded absorbed state
    val sd2 = new StreamingDedup(spark, threshold = 0.3, statePath = Some(statePath))
    sd2.processBatch(corpus.drop(3).toDF(), "text", "doc_id", batchId = 0L).count()
    val sd3 = new StreamingDedup(spark, threshold = 0.3, statePath = Some(statePath))
    assert(sd3.corpusSize === corpus.size.toLong)
    assert(sd3.processBatch(corpus.take(3).toDF(), "text", "doc_id").count() === 0L)
  }

  test("restore compacts batch-per-partition state without changing " +
      "behavior; replay idempotence survives") {
    val statePath = java.nio.file.Files.createTempDirectory("sdedup-cmp").toString
    // one partition per batch: 6 single-doc direct batches
    val sd1 = new StreamingDedup(spark, threshold = 0.3, statePath = Some(statePath))
    val emitted = corpus.map(d =>
      pairs(sd1.processBatch(Seq(d).toDF(), "text", "doc_id"))).reduce(_ ++ _)
    val ref = pairs(graft.pipeline.Dedup.minhashLsh(corpus.toDF(), "text",
      "doc_id", shingleK = 3, bands = 8, rowsPerBand = 4, threshold = 0.3))
    assert(emitted === ref)
    def stateParts(): Seq[String] = {
      val d = new java.io.File(statePath)
      d.listFiles().toSeq.map(_.getName).filter(_.startsWith("__batch="))
    }
    assert(stateParts().size === corpus.size)
    spark.conf.set("spark.graft.stream.state.compactMinParts", "2")
    try {
      val sd2 = new StreamingDedup(spark, threshold = 0.3, statePath = Some(statePath))
      assert(sd2.corpusSize === corpus.size.toLong) // triggers restore+compaction
      // all direct partitions fold into one compacted generation
      assert(stateParts().size === 1, stateParts().mkString(","))
      assert(stateParts().head ===
        s"__batch=${DurableState.CompactKeyBase}")
      // behavior unchanged: full replay of the corpus emits nothing
      assert(sd2.processBatch(corpus.toDF(), "text", "doc_id").count() === 0L)
      // a THIRD restore over the compacted layout still works and a new
      // near-dup batch still pairs against compacted history
      val sd3 = new StreamingDedup(spark, threshold = 0.3, statePath = Some(statePath))
      val p = pairs(sd3.processBatch(
        Seq(Doc(7, "the quick brown fox jumps over the lazy dogs")).toDF(),
        "text", "doc_id"))
      assert(p.map(x => (x._1, x._2)).contains((1L, 7L)), p)
    } finally spark.conf.unset("spark.graft.stream.state.compactMinParts")
  }

  test("curation: a batch whose commit marker is missing is discarded " +
      "from BOTH stores on restore — replay reproduces the original emission") {
    val statePath = java.nio.file.Files.createTempDirectory("scur-atomic").toString
    def survivors(df: DataFrame): Set[Long] =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    val docs = corpus.toDF()
    // batch B keeps doc 3 and drops doc 4 ONLY because batch A's state
    // says so — the cross-store consistency this test is about (doc 5
    // is language-filtered, doc 6 near-dups doc 3 within the batch)
    val bA = docs.filter(col("doc_id") <= 2)
    val bB = docs.filter(col("doc_id") > 2)
    val c1 = new StreamingCuration(spark, minTokens = 2, threshold = 0.3,
      statePath = Some(statePath))
    c1.processBatch(bA, "text", "doc_id", batchId = 0L).count()
    val sB = survivors(c1.processBatch(bB, "text", "doc_id", batchId = 1L))
    assert(sB.nonEmpty)
    // simulate the crash window: batch 1's sig + hash partitions are on
    // disk but the commit marker never landed
    assert(new java.io.File(s"$statePath/_commits/1").delete())
    // restore must treat batch 1 as never written in BOTH stores, so
    // the checkpoint's replay of batch 1 reproduces the original
    // emission exactly (not a half-suppressed variant)
    val c2 = new StreamingCuration(spark, minTokens = 2, threshold = 0.3,
      statePath = Some(statePath))
    assert(survivors(c2.processBatch(bB, "text", "doc_id", batchId = 1L)) === sB)
    // and after the replay re-commits, a further restore suppresses it
    val c3 = new StreamingCuration(spark, minTokens = 2, threshold = 0.3,
      statePath = Some(statePath))
    assert(c3.processBatch(bB, "text", "doc_id", batchId = 1L).count() === 0L)
  }

  test("a restore racing a live writer's write→mark window does not " +
      "lose the batch: unmarked partitions are excluded, never deleted") {
    val statePath = java.nio.file.Files.createTempDirectory("scur-race").toString
    val docs = corpus.toDF()
    val bA = docs.filter(col("doc_id") <= 2)
    val bB = docs.filter(col("doc_id") > 2)
    val c1 = new StreamingCuration(spark, minTokens = 2, threshold = 0.3,
      statePath = Some(statePath))
    c1.processBatch(bA, "text", "doc_id", batchId = 0L).count()
    c1.processBatch(bB, "text", "doc_id", batchId = 1L).count()
    // rewind to the window: batch 1's partitions are on disk, marker not
    // yet — and a CONCURRENT restore fires inside that window
    assert(new java.io.File(s"$statePath/_commits/1").delete())
    DurableState.restore(spark, s"$statePath/sig", Seq("__id"),
      Some(s"$statePath/_commits"))
    DurableState.restore(spark, s"$statePath/hash", Seq("__h"),
      Some(s"$statePath/_commits"))
    // ...then the live writer marks, exactly as processBatch would have
    DurableState.mark(spark, s"$statePath/_commits", 1L)
    // the marked batch's state must be INTACT: a replay of batch 1
    // against a fresh restore is wholly suppressed (the old
    // delete-unmarked behavior left a marker blessing a hole, and the
    // replay re-emitted batch 1 as if never absorbed)
    val c2 = new StreamingCuration(spark, minTokens = 2, threshold = 0.3,
      statePath = Some(statePath))
    assert(c2.processBatch(bB, "text", "doc_id", batchId = 1L).count() === 0L)
  }

  test("a restored frame survives a later compacting restore deleting " +
      "the folded partition dirs") {
    val statePath = java.nio.file.Files.createTempDirectory("sdedup-pin").toString
    val sd1 = new StreamingDedup(spark, threshold = 0.3, statePath = Some(statePath))
    corpus.foreach(d =>
      sd1.processBatch(Seq(d).toDF(), "text", "doc_id").count())
    // restore WITHOUT compaction: one frame over 6 partition dirs
    val r1 = DurableState.restore(spark, statePath, Seq("__id"), None)
    assert(r1.frame.isDefined)
    // a second processor's restore compacts and DELETES the folded dirs
    spark.conf.set("spark.graft.stream.state.compactMinParts", "2")
    try DurableState.restore(spark, statePath, Seq("__id"), None)
    finally spark.conf.unset("spark.graft.stream.state.compactMinParts")
    assert(new java.io.File(statePath).listFiles()
      .count(_.getName.startsWith("__batch=")) === 1)
    // the first restore's frame is pinned — the deletions can't break it
    assert(r1.frame.get.count() === corpus.size.toLong)
  }

  test("durable state: curation resumes from its hash + signature stores") {
    val statePath = java.nio.file.Files.createTempDirectory("scur-state").toString
    def survivors(df: DataFrame): Set[Long] =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    val docs = corpus.toDF()
    // unbroken reference
    val ref = new StreamingCuration(spark, minTokens = 2, threshold = 0.3)
    val s0 = survivors(ref.processBatch(docs.filter(col("doc_id") <= 3), "text", "doc_id"))
    val s1 = survivors(ref.processBatch(docs.filter(col("doc_id") > 3), "text", "doc_id"))
    // durable run, new instance per batch (process kill between batches)
    val c1 = new StreamingCuration(spark, minTokens = 2, threshold = 0.3,
      statePath = Some(statePath))
    val d0 = survivors(c1.processBatch(docs.filter(col("doc_id") <= 3), "text", "doc_id"))
    val c2 = new StreamingCuration(spark, minTokens = 2, threshold = 0.3,
      statePath = Some(statePath))
    val d1 = survivors(c2.processBatch(docs.filter(col("doc_id") > 3), "text", "doc_id"))
    assert(d0 === s0)
    assert(d1 === s1)
    // exact replay against a fresh resumed instance: wholly suppressed
    val c3 = new StreamingCuration(spark, minTokens = 2, threshold = 0.3,
      statePath = Some(statePath))
    assert(c3.processBatch(docs.filter(col("doc_id") <= 3), "text", "doc_id")
      .count() === 0L)
  }
}
