package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase

/** Native DotProduct vs the HOF formulation it replaces: identical
  * values (same summation order) and identical null semantics. */
class VectorExpressionsSpec extends SparkTestBase {
  import spark.implicits._

  private def hofDot = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  test("matches the HOF dot product bit-for-bit") {
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (Seq(0.1, 0.2), Seq(0.3, 0.7)),
      (Seq.empty[Double], Seq.empty[Double])
    ).toDF("a", "b")
    val r = df.select(
      VectorExpressions.dotProduct(col("a"), col("b")).as("native"),
      hofDot(col("a"), col("b")).as("hof")).collect()
    r.foreach(row => assert(row.getDouble(0) === row.getDouble(1)))
  }

  test("null semantics: null input, length mismatch, null element") {
    val df = Seq(
      (Some(Seq(Some(1.0), Some(2.0))), Some(Seq(Some(3.0)))), // length mismatch
      (Some(Seq(Some(1.0), None)), Some(Seq(Some(3.0), Some(4.0)))), // null elem
      (None, Some(Seq(Some(1.0)))) // null input
    ).toDF("a", "b")
      .select(col("a").cast(ArrayType(DoubleType)).as("a"),
        col("b").cast(ArrayType(DoubleType)).as("b"))
    val r = df.select(VectorExpressions.dotProduct(col("a"), col("b"))).collect()
    assert(r.forall(_.isNullAt(0)))
  }

  test("interpreted path agrees with codegen") {
    // literal fold happens via the interpreted eval; column path via codegen
    val lit1 = array(Seq(1.5, -2.0, 4.0).map(lit): _*)
    val lit2 = array(Seq(2.0, 3.0, 0.5).map(lit): _*)
    val v = spark.range(1).select(
      VectorExpressions.dotProduct(lit1, lit2)).collect()(0).getDouble(0)
    assert(v === 1.5 * 2.0 + -2.0 * 3.0 + 4.0 * 0.5)
  }

  test("simhash signature matches the per-bit HOF formulation") {
    val bits = 60
    def hofSig(hashes: org.apache.spark.sql.Column) =
      (0 until bits).map { b =>
        val cnt = aggregate(hashes, lit(0L),
          (acc, h) => acc + when(shiftright(h, b).bitwiseAND(1) === 1, 1L).otherwise(-1L))
        when(cnt > 0, lit(1L << b)).otherwise(lit(0L))
      }.reduce((a, c) => a.bitwiseOR(c))
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(50)(Seq.fill(rnd.nextInt(20) + 1)(rnd.nextLong() & ((1L << 60) - 1)))
    val df = (rows :+ Seq.empty[Long]).toDF("h")
    val r = df.select(
      VectorExpressions.simhashSignature(col("h"), bits).as("native"),
      hofSig(col("h")).as("hof")).collect()
    r.foreach(row => assert(row.getLong(0) === row.getLong(1)))
  }

  test("rejects non-double arrays") {
    val df = Seq((Seq(1, 2), Seq(3, 4))).toDF("a", "b")
    assertThrows[Exception] {
      df.select(VectorExpressions.dotProduct(col("a"), col("b"))).collect()
    }
  }

  test("sq8 round-trip: codes in [0,255], bounds exact, degenerate dim, null element") {
    val b = Sq8BoundsRef(Array(0.0, -1.0, 5.0), Array(10.0, 1.0, 5.0))
    val df = Seq(
      (1L, Seq(Some(0.0), Some(-1.0), Some(5.0))),   // exact lower bounds
      (2L, Seq(Some(10.0), Some(1.0), Some(5.0))),   // exact upper bounds
      (3L, Seq(Some(5.03), Some(0.004), Some(5.0))), // interior values
      (4L, Seq(Some(1.0), None, Some(5.0)))          // null element passes through
    ).toDF("id", "v")
      .select(col("id"), col("v").cast(ArrayType(DoubleType)).as("v"))
    val r = df.select(col("id"), VectorExpressions.sq8RoundTrip(col("v"), b).as("dq"))
      .collect().map(row => row.getLong(0) -> row.getSeq[Any](1)).toMap
    // bounds are representable codes (0 and 255): round-trip is exact
    assert(r(1L) === Seq(0.0, -1.0, 5.0))
    assert(r(2L) === Seq(10.0, 1.0, 5.0))
    // interior: dq = mn + round((v-mn)*255/(mx-mn)) * (mx-mn)/255
    val d0 = 0.0 + Math.round(5.03 * 255.0 / 10.0).toDouble * 10.0 / 255.0
    val d1 = -1.0 + Math.round((0.004 + 1.0) * 255.0 / 2.0).toDouble * 2.0 / 255.0
    assert(r(3L)(0) === d0 && r(3L)(1) === d1)
    // degenerate dimension (mx == mn) decodes to mn for every input
    assert(r(3L)(2) === 5.0)
    assert(r(4L) === Seq(0.0 + Math.round(1.0 * 25.5).toDouble * 10.0 / 255.0, null, 5.0))
    // length mismatch → null result (dim contract violated)
    val bad = Seq(Seq(1.0, 2.0)).toDF("v")
      .select(VectorExpressions.sq8RoundTrip(col("v").cast(ArrayType(DoubleType)), b))
      .collect()
    assert(bad(0).isNullAt(0))
  }

  test("sq8 interpreted path agrees with codegen") {
    val b = Sq8BoundsRef(Array(0.0, 0.0), Array(1.0, 2.0))
    // literal fold runs interpreted eval; column path runs codegen
    val litV = array(lit(0.37), lit(1.23))
    val folded = spark.range(1)
      .select(VectorExpressions.sq8RoundTrip(litV, b)).collect()(0).getSeq[Double](0)
    val colPath = Seq(Seq(0.37, 1.23)).toDF("v")
      .select(VectorExpressions.sq8RoundTrip(col("v").cast(ArrayType(DoubleType)), b))
      .collect()(0).getSeq[Double](0)
    assert(folded === colPath)
  }
}
