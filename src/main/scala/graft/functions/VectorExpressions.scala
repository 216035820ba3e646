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

object VectorExpressions {
  /** Column wrapper for [[DotProduct]]. */
  def dotProduct(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column wrapper for [[SimhashSignature]]. */
  def simhashSignature(hashes: Column, bits: Int): Column =
    ColumnBridge.column(SimhashSignature(ColumnBridge.expression(hashes), bits))
}
