package graft.graph

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.cypher.Cypher

/** Evidence for the GIN-gap closure story (reference: agtype_gin.c
  * indexes keys/values inside the `properties` jsonb column; Spark has
  * no GIN): saveBucketed stores every property as a TYPED parquet column, so
  * a selective Cypher property predicate reaches the scan as a pushed
  * parquet filter and row-group min/max stats skip most of the data —
  * the columnar moral equivalent of the reference's property index.
  */
class DataSkippingSpec extends SparkTestBase {

  /** All parquet scans, descending through AQE's materialized stages
    * (collect() does not cross QueryStageExec boundaries). */
  private def allScans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
    p match {
      case s: FileSourceScanExec => Seq(s)
      case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => allScans(q.plan)
      case other => other.children.flatMap(allScans)
    }

  test("autoBloomCols: free-text strings and low-NDV columns never " +
      "designate; designation caps at the top-8 by NDV") {
    // a high-NDV long key and a short high-NDV string qualify; a 100-char
    // free-text payload (high NDV too — that's what makes it a trap) and
    // a 7-value segment column do not (r9 ADVICE: a bloom on a payload
    // column is pure write amplification, it never serves an equality probe)
    val pad = "x" * 100
    val df = spark.range(2000).select(
      col("id"),
      (col("id") * 48271L % 100003L).as("sku"),
      concat(lit("k"), col("id")).as("code"),
      concat(lit(pad), col("id")).as("body"),
      (col("id") % 7L).as("seg"))
    assert(GraphStore.autoBloomCols(df).toSet === Set("sku", "code"))
    // 12 qualifying columns → only the 8 highest-NDV designate
    val wide = spark.range(2000).select(
      (col("id") +: (1 to 12).map(k => (col("id") + lit(k * 1000000L)).as(s"c$k"))): _*)
    val got = GraphStore.autoBloomCols(wide)
    assert(got.size === 8 && got.forall(_.startsWith("c")))
    // under the 1024-row floor nothing designates (blooms on tiny labels
    // cost more than the scan they'd skip)
    assert(GraphStore.autoBloomCols(df.limit(500)).isEmpty)
  }

  test("selective property predicate: PushedFilters + row-group skipping on a reloaded graph") {
    // many row groups per bucket file: small parquet block size, and the
    // property (`ts`) correlates with the in-file sort order (`id`), the
    // time-ordered-ingest shape — row-group min/max stats are tight
    val hc = spark.sparkContext.hadoopConfiguration
    val prevBlock = hc.get("parquet.block.size")
    hc.set("parquet.block.size", (64 * 1024).toString)
    val n = 100000L
    try {
      val df = spark.range(n).select(
        col("id"),
        col("id").as("ts"),
        concat(lit("payload_padding_padding_"), col("id")).as("txt"))
      val g = new PropertyGraph("skipdemo", Seq(VertexLabel("Ev", 1, df)), Nil)
      GraphStore.saveBucketed(g, spark, buckets = 4)
    } finally {
      if (prevBlock == null) hc.unset("parquet.block.size")
      else hc.set("parquet.block.size", prevBlock)
    }

    val re = GraphStore.loadBucketed(spark, "skipdemo")
    val out = Cypher.query(spark, re,
      s"MATCH (e:Ev) WHERE e.ts >= ${n - 1000} RETURN count(*) AS n")
    assert(out.collect()(0).getLong(0) === 1000L)

    val scans = allScans(out.queryExecution.executedPlan)
    assert(scans.nonEmpty, "expected a parquet file scan in the executed plan")
    val scan = scans.head
    // 1) the predicate reached the parquet reader
    val pushed = scan.metadata.getOrElse("PushedFilters", "")
    assert(pushed.contains("GreaterThanOrEqual(ts"),
      s"property predicate not pushed to parquet: $pushed")
    // 2) column pruning: the wide payload column is not read
    val readSchema = scan.metadata.getOrElse("ReadSchema", "")
    assert(!readSchema.contains("txt"), s"unused property read: $readSchema")
    // 3) row-group skipping: the scan OUTPUT a small fraction of the
    // table because whole row groups failed the pushed min/max check
    // (without skipping the scan would output all rows and the filter
    // node above would drop them)
    val scanned = scan.metrics("numOutputRows").value
    info(s"scan output $scanned of $n rows (pushed: $pushed)")
    assert(scanned < n / 10,
      s"scan output $scanned of $n rows - row groups were not skipped")
  }

  test("negative control: without a predicate the scan outputs every row") {
    val re = GraphStore.loadBucketed(spark, "skipdemo")
    val out = Cypher.query(spark, re, "MATCH (e:Ev) RETURN count(*) AS n")
    assert(out.collect()(0).getLong(0) === 100000L)
    val scan = allScans(out.queryExecution.executedPlan).head
    assert(scan.metrics("numOutputRows").value === 100000L)
  }

  test("bloom filter on a designated hot key skips row groups with NO layout correlation") {
    // the GIN residual case: the predicate column (`sku`) is hash-shuffled
    // relative to the file sort order (`id`), so row-group min/max spans
    // the whole value range everywhere and skips nothing; a write-time
    // parquet bloom filter on the designated key restores the skip for
    // equality lookups — the layout-independent property index
    val hc = spark.sparkContext.hadoopConfiguration
    val prevBlock = hc.get("parquet.block.size")
    hc.set("parquet.block.size", (64 * 1024).toString)
    val n = 100000L
    // dictionary encoding OFF for the key column in BOTH tables: parquet
    // dictionary row-group filtering would mask what the bloom does (and
    // at real scale per-chunk dictionaries overflow and vanish anyway)
    hc.set("parquet.enable.dictionary#sku", "false")
    try {
      val df = spark.range(n).select(
        col("id"),
        // uncorrelated with id: multiply-shuffle over a prime modulus
        (col("id") * 48271L % 100003L).as("sku"),
        concat(lit("payload_padding_padding_"), col("id")).as("txt"))
      GraphStore.saveBucketed(
        new PropertyGraph("bloomdemo", Seq(VertexLabel("Ev", 1, df)), Nil),
        spark, buckets = 4, bloomProps = Seq("sku"))
      GraphStore.saveBucketed(
        new PropertyGraph("bloomctl", Seq(VertexLabel("Ev", 1, df)), Nil),
        spark, buckets = 4, autoBloom = false)
    } finally {
      if (prevBlock == null) hc.unset("parquet.block.size")
      else hc.set("parquet.block.size", prevBlock)
      hc.unset("parquet.enable.dictionary#sku")
    }
    val target = 7L * 48271L % 100003L // an existing sku value
    def scanRows(graph: String): Long = {
      val re = GraphStore.loadBucketed(spark, graph)
      val out = Cypher.query(spark, re,
        s"MATCH (e:Ev) WHERE e.sku = $target RETURN count(*) AS n")
      assert(out.collect()(0).getLong(0) >= 1L)
      allScans(out.queryExecution.executedPlan).head.metrics("numOutputRows").value
    }
    val withBloom = scanRows("bloomdemo")
    val control = scanRows("bloomctl")
    info(s"scan output with bloom: $withBloom, control: $control of $n")
    // min/max can't skip (every row group spans the full sku range): the
    // control scans essentially everything; the bloom table reads only
    // the row groups that might contain the value
    assert(control > n / 2,
      s"control scan output $control - min/max unexpectedly skipped an uncorrelated column")
    assert(withBloom < n / 10,
      s"bloom scan output $withBloom of $n rows - bloom filter did not skip row groups")
  }

  test("auto-designated bloom: an UN-NAMED high-NDV column skips row groups") {
    // the r8 "configuration gap": a hot key the caller never designated.
    // The write-time NDV pass must spot `sku` (mostly distinct) on its
    // own and write the bloom — no bloomProps anywhere; `seg` (low NDV)
    // must NOT be designated (a bloom there rejects nothing).
    val hc = spark.sparkContext.hadoopConfiguration
    val prevBlock = hc.get("parquet.block.size")
    hc.set("parquet.block.size", (64 * 1024).toString)
    val n = 100000L
    hc.set("parquet.enable.dictionary#sku", "false")
    try {
      val df = spark.range(n).select(
        col("id"),
        (col("id") * 48271L % 100003L).as("sku"), // high NDV, uncorrelated
        (col("id") % 7L).as("seg"),               // low NDV
        concat(lit("payload_padding_padding_"), col("id")).as("txt"))
      GraphStore.saveBucketed(
        new PropertyGraph("autodemo", Seq(VertexLabel("Ev", 1, df)), Nil),
        spark, buckets = 4) // autoBloom default ON, nothing named
      GraphStore.saveBucketed(
        new PropertyGraph("autoctl", Seq(VertexLabel("Ev", 1, df)), Nil),
        spark, buckets = 4, autoBloom = false)
    } finally {
      if (prevBlock == null) hc.unset("parquet.block.size")
      else hc.set("parquet.block.size", prevBlock)
      hc.unset("parquet.enable.dictionary#sku")
    }
    val target = 7L * 48271L % 100003L
    def scanRows(graph: String): Long = {
      val re = GraphStore.loadBucketed(spark, graph)
      val out = Cypher.query(spark, re,
        s"MATCH (e:Ev) WHERE e.sku = $target RETURN count(*) AS n")
      assert(out.collect()(0).getLong(0) >= 1L)
      allScans(out.queryExecution.executedPlan).head.metrics("numOutputRows").value
    }
    val auto = scanRows("autodemo")
    val control = scanRows("autoctl")
    info(s"scan output auto-bloom: $auto, control: $control of $n")
    assert(control > n / 2,
      s"control scan output $control - min/max unexpectedly skipped")
    assert(auto < n / 10,
      s"auto-bloom scan output $auto of $n rows - no auto-designated skip")
  }

  test("Z-order layout: RANGE skipping on two uncorrelated dimensions at once") {
    // blooms cover equality only; range predicates on a column that does
    // not correlate with the sort order skip nothing. Z-ordering the
    // designated dimensions keeps row-group min/max tight on BOTH at
    // once — the multi-dimensional end of the GIN-analogue story.
    val hc = spark.sparkContext.hadoopConfiguration
    val prevBlock = hc.get("parquet.block.size")
    hc.set("parquet.block.size", (32 * 1024).toString)
    val n = 100000L
    try {
      // one file per table: Z-order locality is per FILE, and a 100k-row
      // corpus split 16 ways leaves each file too sparse for tight
      // squares (at real scale files are GB-sized and groups plentiful —
      // the sparse-file regime is a small-test artifact, not the design)
      val df = spark.range(n).coalesce(1).select(
        col("id"),
        (col("id") * 48271L % 100003L).as("x"), // shuffled vs id
        (col("id") * 69621L % 99991L).as("y"),  // shuffled vs id AND x
        concat(lit("payload_padding_padding_"), col("id")).as("txt"))
      GraphStore.saveBucketed(
        new PropertyGraph("zdemo", Seq(VertexLabel("Ev", 1, df)), Nil),
        spark, buckets = 1, zorderProps = Seq("x", "y"))
      GraphStore.saveBucketed(
        new PropertyGraph("zctl", Seq(VertexLabel("Ev", 1, df)), Nil),
        spark, buckets = 1)
    } finally {
      if (prevBlock == null) hc.unset("parquet.block.size")
      else hc.set("parquet.block.size", prevBlock)
    }
    def scanRows(graph: String, dim: String): (Long, Long) = {
      val re = GraphStore.loadBucketed(spark, graph)
      val out = Cypher.query(spark, re,
        s"MATCH (e:Ev) WHERE e.$dim >= 0 AND e.$dim <= 999 RETURN count(*) AS n")
      val cnt = out.collect()(0).getLong(0)
      (cnt, allScans(out.queryExecution.executedPlan).head.metrics("numOutputRows").value)
    }
    for (dim <- Seq("x", "y")) {
      val (zCnt, zScan) = scanRows("zdemo", dim)
      val (cCnt, cScan) = scanRows("zctl", dim)
      assert(zCnt === cCnt) // identical answers, different layout
      info(s"dim $dim: z-ordered scan $zScan, control scan $cScan of $n")
      assert(cScan > n / 2,
        s"control scan output $cScan - unexpectedly skipped on $dim")
      assert(zScan < n / 4,
        s"z-ordered scan output $zScan of $n - no multi-dimensional skipping on $dim")
    }
    // the synthetic sort column is a layout artifact: not a property
    val re = GraphStore.loadBucketed(spark, "zdemo")
    assert(!re.vertexLabel("Ev").df.columns.contains("__z"))
  }
}
