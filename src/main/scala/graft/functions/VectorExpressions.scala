package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native dot product over two array<double> columns.
  *
  * The HOF formulation `aggregate(zip_with(a, b, _*_), 0.0, _+_)` is
  * semantically identical but evaluates interpreted lambda closures per
  * element and materializes the zipped intermediate array — higher-order
  * functions sit outside whole-stage codegen. This expression generates a
  * tight fused loop (and an equivalent interpreted path), keeping the
  * embedding pipelines' hot inner product inside codegen.
  *
  * Null semantics mirror the HOF form exactly (so the DuckDB oracle
  * parity is unchanged): null input → null; length mismatch → null
  * (zip_with pads with null and the sum poisons); any null element →
  * null. Summation order is left-to-right like aggregate().
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product expects two array<double> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** SimHash signature over a token-hash array: bit b of the result is
  * set iff the sum over elements of (bit b of hash ? +1 : -1) is
  * positive. The HOF formulation evaluates one aggregate() pass PER BIT
  * (60 interpreted array traversals per row); this expression computes
  * all bit counters in a single fused loop. Null semantics mirror the
  * HOF form: null input → null; a null ELEMENT contributes -1 to every
  * bit (`when(bit-test, 1).otherwise(-1)` takes the otherwise branch on
  * a null hash). */
case class SimhashSignature(child: Expression, bits: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash_signature expects array<bigint>, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash_signature"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val cnt = new Array[Long](bits)
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) {
        var b = 0
        while (b < bits) { cnt(b) -= 1; b += 1 }
      } else {
        val h = x.getLong(i)
        var b = 0
        while (b < bits) {
          cnt(b) += (if (((h >> b) & 1L) == 1L) 1L else -1L)
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < bits) { if (cnt(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val cnt = ctx.freshName("cnt")
      val sig = ctx.freshName("sig")
      s"""
         |int $n = $a.numElements();
         |long[] $cnt = new long[$bits];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) {
         |    for (int $b = 0; $b < $bits; $b++) { $cnt[$b] -= 1L; }
         |  } else {
         |    long $h = $a.getLong($i);
         |    for (int $b = 0; $b < $bits; $b++) {
         |      $cnt[$b] += ((($h >> $b) & 1L) == 1L) ? 1L : -1L;
         |    }
         |  }
         |}
         |long $sig = 0L;
         |for (int $b = 0; $b < $bits; $b++) {
         |  if ($cnt[$b] > 0) { $sig |= (1L << $b); }
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** A driver-built IVF codebook carried into executors as one plan
  * reference: centroid ids, vectors, and precomputed norms. Bounded by
  * construction (Similarity.ivfTopK caps the collect), so the closure
  * is a few KB — the FAISS-style in-memory coarse quantizer. */
final class IvfCodebookRef(
    val ids: Array[Long], val vecs: Array[Array[Double]]) extends Serializable {
  val norms: Array[Double] = vecs.map(v => math.sqrt(v.map(x => x * x).sum))
  override def toString: String = s"ivf_codebook(${ids.length})"
}

object IvfKernel {
  /** Spark round(x, 6) twin (BigDecimal HALF_UP) so cell-assignment
    * tie-breaks match the SQL oracle's rounded similarity exactly.
    * NaN passes through (BigDecimal.valueOf would throw): a zero-norm
    * vector's cosine is NaN, its sims stay NaN, and `cells` never
    * selects a NaN sim — the vector gets no cell instead of crashing
    * the task. */
  def round6(x: Double): Double =
    if (x.isNaN) Double.NaN
    else java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Top-`n` codebook cells of `v` by rounded cosine similarity, ties
    * toward the lowest centroid id; null on null input/element (HOF dot
    * semantics). O(C·dim) per row in ONE compiled loop — the expression
    * tree this replaces inlined C separate literal-array dot products,
    * which blew past JIT method limits at C=64. */
  def cells(v: ArrayData, cb: IvfCodebookRef, n: Int): ArrayData = {
    val dim = v.numElements()
    val x = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (v.isNullAt(i)) return null
      x(i) = v.getDouble(i); i += 1
    }
    var ss = 0.0; i = 0
    while (i < dim) { ss += x(i) * x(i); i += 1 }
    val nrm = math.sqrt(ss)
    val c = cb.ids.length
    val sims = new Array[Double](c)
    var ci = 0
    while (ci < c) {
      val cv = cb.vecs(ci)
      sims(ci) =
        if (cv.length != dim) Double.NaN
        else {
          var d = 0.0; var j = 0
          while (j < dim) { d += x(j) * cv(j); j += 1 }
          round6(d / (nrm * cb.norms(ci)))
        }
      ci += 1
    }
    // rank-by-rank selection (k and C are small): rank order is
    // (sim desc, id asc); NaN sims never selected
    val k = math.min(n, c)
    val out = new Array[Long](k)
    var filled = 0
    var prevSim = Double.PositiveInfinity
    var prevId = Long.MinValue
    var r = 0
    while (r < k) {
      var bestSim = 0.0; var bestId = 0L; var found = false
      ci = 0
      while (ci < c) {
        val s = sims(ci); val id = cb.ids(ci)
        val afterPrev = s < prevSim || (s == prevSim && id > prevId)
        if (!s.isNaN && afterPrev &&
            (!found || s > bestSim || (s == bestSim && id < bestId))) {
          bestSim = s; bestId = id; found = true
        }
        ci += 1
      }
      if (found) {
        out(filled) = bestId; filled += 1
        prevSim = bestSim; prevId = bestId
      }
      r += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(out, filled))
  }
}

/** IVF coarse-quantizer assignment: the `n` nearest codebook cells of
  * an array<double> vector, in rank order (rounded cosine desc, cell id
  * asc). The codebook travels as a single reference object and the
  * argmin is a static compiled kernel, so the stage stays inside
  * whole-stage codegen with compact generated code at any centroid
  * count. */
case class IvfNearestCells(child: Expression, codebook: IvfCodebookRef, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ivf_nearest_cells expects array<double>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "ivf_nearest_cells"

  override def nullSafeEval(a: Any): Any =
    IvfKernel.cells(a.asInstanceOf[ArrayData], codebook, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("ivfCodebook", codebook,
      classOf[IvfCodebookRef].getName)
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.IvfKernel.cells($c, $cbRef, $n);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HalfKernel {
  /** IEEE-754 binary16 round-trip of one double: round-to-nearest-even
    * at 10 mantissa bits with the fp16 exponent floor, widened back —
    * pgvector's float→half storage conversion (halfvec casts in
    * regress/sql/pgvector.sql print the quantized values, e.g.
    * 1.22::halfvec = 1.2197266). Arithmetic formulation (scalb + rint)
    * rather than bit twiddling: rint IS round-half-even, and the
    * exponent floor at -14 makes subnormal rounding fall out. */
  def halfRoundTrip(d: Double): Double = {
    if (d.isNaN) return Double.NaN
    val a = math.abs(d)
    if (a == 0.0) return d
    val e = math.max(math.getExponent(a), -14)
    val ulp = math.scalb(1.0, e - 10)
    val q = math.rint(a / ulp) * ulp
    // fp16 overflow: max finite is 65504; >= 65520 rounds to infinity
    val r =
      if (q >= 65520.0) Double.PositiveInfinity
      else if (q > 65504.0) 65504.0
      else q
    if (d < 0) -r else r
  }

  def quantize(v: ArrayData): ArrayData = {
    val n = v.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) = if (v.isNullAt(i)) null else halfRoundTrip(v.getDouble(i))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Per-element fp16 quantization of an array<double> vector — the
  * `::halfvec` cast (pgvector half-precision storage, values widened
  * back to float64; regress/expected/pgvector.out halfvec rows). */
case class HalfQuantize(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"half_quantize expects array<double>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(DoubleType)
  override def nullable: Boolean = true
  override def prettyName: String = "half_quantize"

  override def nullSafeEval(a: Any): Any =
    HalfKernel.quantize(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HalfKernel.quantize($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-dimension scalar-quantization bounds (corpus-global min/max),
  * computed once by a stats job and shipped as ONE reference object —
  * the same pattern as [[IvfCodebookRef]]. */
case class Sq8BoundsRef(mins: Array[Double], maxs: Array[Double])
    extends Serializable

object Sq8Kernel {
  /** int8 scalar-quantization round-trip of one vector: per dimension,
    * code = round((v - mn) * 255 / (mx - mn)) ∈ [0, 255] (the stored
    * byte), widened back to dq = mn + code * (mx - mn) / 255. A
    * degenerate dimension (mx == mn, no spread) stores code 0 and
    * decodes to mn. Math.round is nearest-with-ties-up, which matches
    * DuckDB's round() (ties away from zero) on this non-negative
    * domain — the oracle replays the identical formula, so the
    * dequantized values are bit-equal on both sides. */
  def roundTrip(v: ArrayData, b: Sq8BoundsRef): ArrayData = {
    val n = v.numElements()
    if (n != b.mins.length) return null
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) out(i) = null
      else {
        val mn = b.mins(i); val mx = b.maxs(i)
        out(i) =
          if (mx > mn) {
            val code = Math.round((v.getDouble(i) - mn) * 255.0 / (mx - mn)).toDouble
            mn + code * (mx - mn) / 255.0
          } else mn
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** int8 scalar-quantization round-trip of an array<double> vector —
  * the 4× (fp32) / 8× (fp64) storage-compression path for embedding
  * corpora: at 100 TB the corpus is stored as byte codes + one tiny
  * bounds vector, and search runs over the deterministic dequantized
  * values. Bounds travel as a single reference object; the per-element
  * loop is a static compiled kernel inside whole-stage codegen. */
case class Sq8RoundTrip(child: Expression, bounds: Sq8BoundsRef)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sq8_round_trip expects array<double>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(DoubleType)
  override def nullable: Boolean = true
  override def prettyName: String = "sq8_round_trip"

  override def nullSafeEval(a: Any): Any =
    Sq8Kernel.roundTrip(a.asInstanceOf[ArrayData], bounds)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bRef = ctx.addReferenceObj("sq8Bounds", bounds,
      classOf[Sq8BoundsRef].getName)
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.Sq8Kernel.roundTrip($c, $bRef);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorExpressions {
  /** Column wrapper for [[HalfQuantize]]. */
  def halfQuantize(vec: Column): Column =
    ColumnBridge.column(HalfQuantize(ColumnBridge.expression(vec)))

  /** Column wrapper for [[DotProduct]]. */
  def dotProduct(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column wrapper for [[SimhashSignature]]. */
  def simhashSignature(hashes: Column, bits: Int): Column =
    ColumnBridge.column(SimhashSignature(ColumnBridge.expression(hashes), bits))

  /** Column wrapper for [[IvfNearestCells]]. */
  def ivfNearestCells(vec: Column, codebook: IvfCodebookRef, n: Int): Column =
    ColumnBridge.column(IvfNearestCells(
      ColumnBridge.expression(vec), codebook, n))

  /** Column wrapper for [[Sq8RoundTrip]]. */
  def sq8RoundTrip(vec: Column, bounds: Sq8BoundsRef): Column =
    ColumnBridge.column(Sq8RoundTrip(ColumnBridge.expression(vec), bounds))
}
