package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** A driver-built bounded vocabulary carried into executors as ONE plan
  * reference: token → corpus count in a hash map keyed by UTF8String so
  * per-token lookup is O(1) directly on the tokenizer's output bytes —
  * no UTF-16 decode per token. Bounded by construction
  * (TextOps.topVocabulary caps the collect), so the closure is a few KB.
  *
  * This replaces the map-literal + `aggregate` HOF formulation: a
  * literal map's GetMapValue does a LINEAR scan of all K entries per
  * token, and higher-order functions evaluate interpreted lambda
  * closures outside whole-stage codegen — at corpus scale that is
  * K·tokens interpreted comparisons per document on the hot scoring
  * path. */
final class VocabRef(entries: Seq[(String, Long)]) extends Serializable {
  @transient lazy val map: java.util.HashMap[UTF8String, java.lang.Long] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long](entries.size * 2)
    entries.foreach { case (t, c) => m.put(UTF8String.fromString(t), c) }
    m
  }
  override def toString: String = s"vocab(${entries.size})"
}

object VocabKernel {
  /** Sum of vocabulary counts over a token array (out-of-vocabulary
    * tokens contribute 0). A null ELEMENT nulls the whole score — a
    * deliberate strictness (a token array with null holes is malformed
    * input, not an OOV token; the tokenizer never produces one) and
    * pinned by tests. Exact integer arithmetic: evaluation order can
    * never change the result. */
  def score(toks: ArrayData, vocab: VocabRef): java.lang.Long = {
    val n = toks.numElements()
    var sum = 0L
    var i = 0
    while (i < n) {
      if (toks.isNullAt(i)) return null
      val c = vocab.map.get(toks.getUTF8String(i))
      if (c != null) sum += c.longValue()
      i += 1
    }
    java.lang.Long.valueOf(sum)
  }
}

/** Total corpus-frequency of a document's tokens under a bounded
  * vocabulary — the hot kernel of the unigram-LM familiarity gate as a
  * single compiled hash-lookup loop inside whole-stage codegen. */
case class VocabScoreSum(child: Expression, vocab: VocabRef)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vocab_score expects array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "vocab_score"

  override def nullSafeEval(a: Any): Any =
    VocabKernel.score(a.asInstanceOf[ArrayData], vocab)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vRef = ctx.addReferenceObj("vocab", vocab, classOf[VocabRef].getName)
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |java.lang.Long ${ev.value}$$box = graft.functions.VocabKernel.score($c, $vRef);
         |if (${ev.value}$$box == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}$$box.longValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VocabExpressions {
  /** Column wrapper for [[VocabScoreSum]]. */
  def vocabScoreSum(toks: Column, vocab: VocabRef): Column =
    ColumnBridge.column(VocabScoreSum(ColumnBridge.expression(toks), vocab))
}
