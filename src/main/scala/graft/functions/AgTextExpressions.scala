package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.types.{AgArray, AgBool, AgEdge, AgFloat, AgInt, AgMap, AgNull,
  AgNumeric, AgPath, AgString, AgValue, AgVariant, AgVertex}

/** Decode-on-access into a container-slot variant: parse the canonical
  * agtype text and select one member, returning the member re-encoded
  * as a variant struct — the executor-side half of the AGTV_ARRAY/
  * AGTV_OBJECT recursion (reference: agtype_access_operator,
  * agtype.c:4482). `key` is a string (object key) or integer (list
  * index, negative from the end); a miss, out-of-bounds index, or
  * scalar target yields SQL null, like the reference's access
  * operator. Not codegen'd — this sits on the rare deep-access path,
  * never in a hot scan loop.
  */
case class AgTextGet(text: Expression, key: Expression)
    extends BinaryExpression with CodegenFallback {

  override def left: Expression = text
  override def right: Expression = key

  override def checkInputDataTypes(): TypeCheckResult =
    (text.dataType, key.dataType) match {
      case (StringType, StringType | LongType | IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (t, k) => TypeCheckResult.TypeCheckFailure(
        s"agtype_get expects (string, string|int), got ${t.simpleString}, ${k.simpleString}")
    }

  override def dataType: DataType = AgVariant.schema
  override def nullable: Boolean = true
  override def prettyName: String = "agtype_get"

  override def nullSafeEval(t: Any, k: Any): Any = {
    val parsed =
      try AgValue.parse(t.toString)
      catch { case _: Exception => return null }
    val member = (parsed, k) match {
      case (AgMap(m), ks: UTF8String) => m.getOrElse(ks.toString, AgNull)
      case (AgArray(items), i: Long) => at(items, i)
      case (AgArray(items), i: Integer) => at(items, i.longValue)
      case (AgPath(items), i: Long) => at(items, i)
      case (v: AgVertex, ks: UTF8String) => entityMember(v, ks.toString)
      case (e: AgEdge, ks: UTF8String) => entityMember(e, ks.toString)
      case _ => AgNull
    }
    AgTextGet.toVariantRow(member)
  }

  private def at(items: Vector[AgValue], i0: Long): AgValue = {
    val i = if (i0 < 0) items.length + i0 else i0
    if (i < 0 || i >= items.length) AgNull else items(i.toInt)
  }

  private def entityMember(v: AgValue, key: String): AgValue = v match {
    case AgVertex(id, label, props) => key match {
      case "id" => AgInt(id)
      case "label" => AgString(label)
      case "properties" => props
      case k => props.entries.getOrElse(k, AgNull)
    }
    case AgEdge(id, label, s, e, props) => key match {
      case "id" => AgInt(id)
      case "label" => AgString(label)
      case "start_id" => AgInt(s)
      case "end_id" => AgInt(e)
      case "properties" => props
      case k => props.entries.getOrElse(k, AgNull)
    }
    case _ => AgNull
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AgTextGet =
    copy(text = newLeft, key = newRight)
}

object AgTextGet {
  /** Re-encode an AgValue as a variant-struct InternalRow (the runtime
    * twin of AgVariant.encode). */
  def toVariantRow(v: AgValue): InternalRow = v match {
    case AgNull => null
    case AgInt(i) =>
      row(AgVariant.TagNum, f = i.toDouble, i = java.lang.Long.valueOf(i))
    case AgFloat(d) => row(AgVariant.TagNum, f = d)
    case AgNumeric(n) =>
      row(AgVariant.TagNum, f = n.toDouble,
        n = Decimal(n, AgVariant.NumericType.precision, AgVariant.NumericType.scale))
    case AgString(s) => row(AgVariant.TagString, s = UTF8String.fromString(s))
    case AgBool(b) => row(AgVariant.TagBool, b = java.lang.Boolean.valueOf(b))
    case a: AgArray =>
      row(AgVariant.TagArray, c = UTF8String.fromString(AgValue.print(a)))
    case m: AgMap =>
      row(AgVariant.TagMap, c = UTF8String.fromString(AgValue.print(m)))
    case x: AgVertex =>
      row(AgVariant.TagVertex, c = UTF8String.fromString(AgValue.print(x)))
    case x: AgEdge =>
      row(AgVariant.TagEdge, c = UTF8String.fromString(AgValue.print(x)))
    case x: AgPath =>
      row(AgVariant.TagPath, c = UTF8String.fromString(AgValue.print(x)))
  }

  private def row(tag: Int, f: Any = null, s: Any = null, b: Any = null,
      i: Any = null, c: Any = null, n: Any = null): InternalRow =
    InternalRow(tag.toByte, f, s, b, i, c, n)

  def get(text: Column, key: Column): Column =
    ColumnBridge.column(AgTextGet(
      ColumnBridge.expression(text), ColumnBridge.expression(key)))
}
