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

/** The agtype orderability key of any engine value (scalar, container,
  * variant struct, entity struct): a string whose plain comparison has
  * the sign of AgValue.compare — so ORDER BY / min / max over
  * heterogeneous values follow the reference's container orderability
  * (compare_agtype_containers_orderability, agtype_util.c:333+) rather
  * than Spark's struct/text order. Used only on sort paths of
  * variant-typed columns; scans and equality never pay for it.
  *
  * Codegen: the per-row key walk is a static-kernel call
  * ([[AgOrderKey.kernel]]), so the surrounding stage stays inside
  * WholeStageCodegen — a CodegenFallback here would de-fuse every
  * projection sharing the stage, which is the cost that matters at
  * scale (the walk itself is O(value size) either way).
  */
case class AgOrderKey(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "agtype_order_key"

  override def nullSafeEval(v: Any): Any = AgOrderKey.kernel(v, child.dataType)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val dtRef = ctx.addReferenceObj("agKeyType", child.dataType,
      classOf[DataType].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.AgOrderKey.kernel($c, $dtRef)")
  }

  override protected def withNewChildInternal(c: Expression): AgOrderKey =
    copy(child = c)
}

/** Runtime Spark value → AgValue conversion (dataType-directed). */
object AgRuntime {
  import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}

  def toAg(v: Any, dt: DataType): AgValue = (v, dt) match {
    case (null, _) => AgNull
    case (x: Long, _) => AgInt(x)
    case (x: Int, _) => AgInt(x.toLong)
    case (x: Double, _) => AgFloat(x)
    case (x: Float, _) => AgFloat(x.toDouble)
    case (x: Decimal, _) => AgNumeric(x.toBigDecimal)
    case (x: Boolean, _) => AgBool(x)
    case (x: UTF8String, _) => AgString(x.toString)
    case (x: ArrayData, ArrayType(et, _)) =>
      AgArray((0 until x.numElements())
        .map(i => toAg(x.get(i, et), et)).toVector)
    case (x: MapData, MapType(kt, vt, _)) =>
      val ks = x.keyArray(); val vs = x.valueArray()
      AgValue.map((0 until x.numElements()).map { i =>
        (toAg(ks.get(i, kt), kt) match {
          case AgString(s) => s
          case other => AgValue.print(other)
        }) -> toAg(vs.get(i, vt), vt)
      }: _*)
    case (row: InternalRow, st: StructType) if AgVariant.isVariant(st) =>
      variantToAg(row)
    case (row: InternalRow, st: StructType) if AgVariant.isEntityStruct(st) =>
      entityToAg(row, st)
    case (row: InternalRow, st: StructType) =>
      AgValue.map(st.fields.zipWithIndex.map { case (f, i) =>
        f.name -> toAg(row.get(i, f.dataType), f.dataType)
      }.toSeq: _*)
    case (x, other) =>
      throw new IllegalArgumentException(
        s"cannot convert $x of type ${other.simpleString} to agtype")
  }

  /** Variant struct (tag, f, s, b, i, c, n) → AgValue by slot. */
  private def variantToAg(row: InternalRow): AgValue = {
    val tag = row.getByte(0)
    if (tag < AgVariant.TagString) {
      // container/entity: stored canonical text round-trips exactly
      AgValue.parse(row.getUTF8String(5).toString)
    } else if (tag == AgVariant.TagString) AgString(row.getUTF8String(2).toString)
    else if (tag == AgVariant.TagBool) AgBool(row.getBoolean(3))
    else if (!row.isNullAt(4)) AgInt(row.getLong(4))
    else if (!row.isNullAt(6))
      AgNumeric(row.getDecimal(6, AgVariant.NumericType.precision,
        AgVariant.NumericType.scale).toBigDecimal)
    else AgFloat(row.getDouble(1))
  }

  private def entityToAg(row: InternalRow, st: StructType): AgValue = {
    def idx(n: String) = st.fieldIndex(n)
    val id = row.getLong(idx("id"))
    val label = Option(row.getUTF8String(idx("label"))).map(_.toString).getOrElse("")
    val props = AgValue.map() // orderability compares entities by id only
    if (st.fieldNames.contains("start_id") && !row.isNullAt(idx("start_id")))
      AgEdge(id, label, row.getLong(idx("start_id")), row.getLong(idx("end_id")), props)
    else AgVertex(id, label, props)
  }
}

object AgOrderKey {
  /** Static codegen kernel: Spark value + its DataType → orderability
    * key. Shared by the interpreted and generated paths. */
  def kernel(v: Any, dt: DataType): UTF8String =
    UTF8String.fromString(AgValue.orderKey(AgRuntime.toAg(v, dt)))

  def key(c: Column): Column =
    ColumnBridge.column(AgOrderKey(ColumnBridge.expression(c)))
}

/** Exact-numeric division at the engine's full decimal scale. Spark's
  * decimal divide under allowPrecisionLoss yields scale 6 for
  * (38,18)/(38,18) operands; PG numeric division keeps >=16
  * significant fractional digits (reference: numeric division via
  * select_div_scale). Divides to scale 18 rounding half-up (numeric's
  * round-half-away) — overflow and division by zero yield null, like
  * the engine's other non-ANSI decimal ops. Off the hot path: only
  * exact-NUMERIC / exact-NUMERIC arithmetic reaches it.
  */
case class NumericDivide(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = AgVariant.NumericType
  override def nullable: Boolean = true
  override def prettyName: String = "numeric_div"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val lb = l.asInstanceOf[Decimal].toJavaBigDecimal
    val rb = r.asInstanceOf[Decimal].toJavaBigDecimal
    if (rb.signum == 0) null
    else {
      val q = lb.divide(rb, AgVariant.NumericType.scale,
        java.math.RoundingMode.HALF_UP)
      val d = Decimal(q)
      if (d.changePrecision(AgVariant.NumericType.precision,
          AgVariant.NumericType.scale)) d
      else null
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NumericDivide =
    copy(left = newLeft, right = newRight)
}

object NumericDivide {
  def div(l: Column, r: Column): Column =
    ColumnBridge.column(NumericDivide(
      ColumnBridge.expression(l), ColumnBridge.expression(r)))
}
