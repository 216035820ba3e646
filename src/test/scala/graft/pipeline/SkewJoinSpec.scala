package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SkewJoinSpec extends SparkTestBase {
  import spark.implicits._

  // hot key 1 carries 80% of probe rows — the shape salting exists for
  val probe = (1 to 80).map(i => (1L, i)) ++ (1 to 20).map(i => (i % 5 + 2L, 100 + i))
  val build = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (4L, "c"), (5L, "d"),
    (6L, "e"), (9L, "unmatched"))

  test("salted join result multiset equals the plain join's") {
    val p = probe.toDF("k", "v")
    val b = build.toDF("k", "tag")
    val plain = p.join(b, Seq("k")).groupBy("k", "v", "tag")
      .agg(count(lit(1)).as("n")).collect().toSet
    val salted = SkewJoin.salted(p, b, Seq("k"), 8, col("v"))
      .groupBy("k", "v", "tag").agg(count(lit(1)).as("n")).collect().toSet
    assert(salted === plain)
    // every probe row met its build row exactly once (no replica double-count)
    assert(salted.forall(_.getAs[Long]("n") === 1L))
  }

  test("salt spreads the hot key across partitions proportional to saltFactor") {
    val p = probe.toDF("k", "v")
    val salts = p.withColumn("__salt",
        pmod(xxhash64(col("v")), lit(8L)).cast("int"))
      .filter(col("k") === 1L)
      .select("__salt").as[Int].collect().toSet
    // 80 rows hashing a distinct v each: expect (nearly) all 8 salts hit
    assert(salts.size >= 6, s"hot key only reached salts $salts")
  }

  test("duplicate build keys and probe rows with no match behave like a plain inner join") {
    val p = Seq((1L, 1), (1L, 2), (7L, 3)).toDF("k", "v") // 7 has no build row
    val b = Seq((1L, "x"), (1L, "y")).toDF("k", "tag")    // duplicate build key
    val plain = p.join(b, Seq("k")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted.toSeq
    val salted = SkewJoin.salted(p, b, Seq("k"), 4, col("v")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted.toSeq
    assert(salted === plain)
    assert(plain.size === 4) // 2 probe rows × 2 build rows, key 7 dropped
  }

  test("reserved __salt column is rejected") {
    val p = probe.toDF("k", "__salt")
    val b = build.toDF("k", "tag")
    intercept[IllegalArgumentException] {
      SkewJoin.salted(p, b, Seq("k"), 4, col("__salt"))
    }
  }
}
