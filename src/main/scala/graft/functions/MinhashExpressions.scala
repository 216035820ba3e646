package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-document MinHash kernels. The exploded formulation
  * (shingle rows → md5 → groupBy minima) pays a full shuffle to build
  * each signature; these expressions compute the same values in one
  * per-row pass, so the signature build is a map-only stage — at
  * 100 TB the difference between shuffling the shingle multiset and
  * shuffling nothing.
  *
  * Hash parity is bit-for-bit with the SQL oracle: shingle text is the
  * k-token window joined with single spaces (all tokens when the doc has
  * fewer than k — TextOps.shingles), hashed as the first 15 hex digits
  * of md5 parsed base-16 (TextOps.portableHash64 ==
  * CAST(concat('0x', substr(md5(s),1,15)) AS BIGINT)).
  */
object MinhashKernel {
  private val hex = "0123456789abcdef".toCharArray

  /** Portable 60-bit hash of a UTF-8 string (md5 prefix). */
  def hash60(s: UTF8String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(s.getBytes)
    // first 15 hex chars = 7.5 bytes; build the long directly
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >> 4)
  }

  /** Shingle hashes of a token array: n-k+1 k-grams joined with ' '
    * (single join-all shingle when n < k). */
  def shingleHashes(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    def joined(from: Int, len: Int): UTF8String = {
      val parts = new Array[UTF8String](len)
      var i = 0
      while (i < len) {
        parts(i) = toks.getUTF8String(from + i)
        if (parts(i) == null) parts(i) = UTF8String.EMPTY_UTF8
        i += 1
      }
      UTF8String.concatWs(UTF8String.fromString(" "), parts: _*)
    }
    if (n < k) new GenericArrayData(Array[Any](hash60(joined(0, n))))
    else {
      val out = new Array[Any](n - k + 1)
      var i = 0
      while (i <= n - k) { out(i) = hash60(joined(i, k)); i += 1 }
      new GenericArrayData(out)
    }
  }

  /** All Carter-Wegman permutation minima in one pass:
    * min over hashes of ((a_s * (h mod p) + b_s) mod p) per seed. */
  def minima(hashes: ArrayData, as: Array[Long], bs: Array[Long], p: Long): ArrayData = {
    val seeds = as.length
    val mins = Array.fill(seeds)(Long.MaxValue)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      val hp = java.lang.Math.floorMod(hashes.getLong(i), p)
      var s = 0
      while (s < seeds) {
        val v = (as(s) * hp + bs(s)) % p
        if (v < mins(s)) mins(s) = v
        s += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(m => if (m == Long.MaxValue) null else (m: Any)))
  }
}

/** tokens: array<string> → array<long> shingle hashes (see kernel). */
case class ShingleHashes(child: Expression, k: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes expects array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(a: Any): Any =
    MinhashKernel.shingleHashes(a.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.MinhashKernel.shingleHashes($a, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** hashes: array<long> → array<long> of per-seed permutation minima
  * (null minima for an empty hash array, matching min() over no rows). */
case class MinhashMinima(child: Expression, as: Seq[Long], bs: Seq[Long], p: Long)
    extends UnaryExpression {
  require(as.length == bs.length, "coefficient arity mismatch")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_minima expects array<long>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "minhash_minima"

  @transient private lazy val aArr = as.toArray
  @transient private lazy val bArr = bs.toArray

  override def nullSafeEval(a: Any): Any =
    MinhashKernel.minima(a.asInstanceOf[ArrayData], aArr, bArr, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bArr, "long[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.MinhashKernel.minima($a, $aRef, $bRef, ${p}L);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinhashExpressions {
  def shingleHashes(tokens: Column, k: Int): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(tokens), k))

  def minhashMinima(hashes: Column, coefs: Seq[(Long, Long)], p: Long): Column =
    ColumnBridge.column(MinhashMinima(
      ColumnBridge.expression(hashes), coefs.map(_._1), coefs.map(_._2), p))
}
