package graft.types

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Tagged-union column encoding for properties whose values mix scalar
  * types across rows — the Spark stand-in for agtype's per-value typing
  * (reference: agtype_value, src/include/utils/agtype.h:435-470).
  *
  * Per-label property columns stay natively typed (the scale path:
  * parquet pushdown + pruning); a column only becomes variant when two
  * appends/labels disagree on a scalar type.
  *
  * Layout: `struct<tag: byte, f: double, s: string, b: boolean, i: long,
  * c: string>`. `tag` follows agtype orderability rank
  * (AgValue.sortPriority: path=0 < edge=1 < vertex=2 < object=3 <
  * array=4 < string=5 < bool=6 < numeric=7); SQL null encodes as a NULL
  * struct. Numerics always set `f` (the comparison key) and set `i` iff
  * the value is an integer, preserving int/float fidelity like
  * AGT_HEADER_INTEGER vs _FLOAT (reference: agtype_ext.c:45+).
  * Containers and entities (tags 0-4) carry their canonical agtype text
  * in `c` — the recursive heterogeneity of AGTV_ARRAY/AGTV_OBJECT
  * (reference: agtype.h:307-324) expressed as serialized form + decode
  * on output. Same-tag containers compare element-wise through
  * AgOrderKey (parse + orderability key), matching agtype's container
  * compare exactly — `[2] = [2.0]` is true and `[2] < [10]` orders
  * numerically, not textually.
  * Field order (tag, f, s, b, i, c) makes the raw struct ordering agree
  * with agtype orderability: rank first, then per-type key fields,
  * which are NULL (ties) outside their own tag. Everything here is
  * built-in expressions — codegen stays whole-stage.
  */
object AgVariant {
  val TagPath: Int = 0
  val TagEdge: Int = 1
  val TagVertex: Int = 2
  val TagMap: Int = 3
  val TagArray: Int = 4
  val TagString: Int = 5
  val TagBool: Int = 6
  val TagNum: Int = 7

  /** Exact-decimal slot type (the AGTV_NUMERIC carrier — reference:
    * agtype.c:5385 keeps numeric distinct from float end-to-end). */
  val NumericType: DecimalType = DecimalType(38, 18)

  val schema: StructType = StructType(Seq(
    StructField("tag", ByteType),
    StructField("f", DoubleType),
    StructField("s", StringType),
    StructField("b", BooleanType),
    StructField("i", LongType),
    StructField("c", StringType),
    StructField("n", NumericType)))

  def isVariant(dt: DataType): Boolean = dt match {
    case st: StructType => st.fieldNames.sameElements(schema.fieldNames)
    case _ => false
  }

  /** Can `dt` be carried by the variant encoding? */
  def scalar(dt: DataType): Boolean = dt match {
    case StringType | BooleanType | LongType | IntegerType | DoubleType |
        FloatType | NullType => true
    case _: DecimalType => true
    case d if isVariant(d) => true
    case _ => false
  }

  private def v(tag: Int, f: Column, s: Column, b: Column, i: Column,
      c: Column = nullC, n: Column = nullN): Column =
    struct(lit(tag).cast(ByteType).as("tag"), f.as("f"), s.as("s"), b.as("b"),
      i.as("i"), c.as("c"), n.as("n"))

  private val nullF = lit(null).cast(DoubleType)
  private val nullS = lit(null).cast(StringType)
  private val nullB = lit(null).cast(BooleanType)
  private val nullI = lit(null).cast(LongType)
  private val nullC = lit(null).cast(StringType)
  private def nullN = lit(null).cast(NumericType)

  def ofString(c: Column): Column = v(TagString, nullF, c, nullB, nullI)
  def ofBool(c: Column): Column = v(TagBool, nullF, nullS, c, nullI)
  def ofLong(c: Column): Column =
    v(TagNum, c.cast(DoubleType), nullS, nullB, c.cast(LongType))
  def ofDouble(c: Column): Column =
    v(TagNum, c.cast(DoubleType), nullS, nullB, nullI)
  /** An exact numeric: `f` stays the cross-class comparison key, `n`
    * keeps full precision (AGTV_NUMERIC — reference: agtype.c:5385). */
  def ofNumeric(c: Column): Column =
    v(TagNum, c.cast(DoubleType), nullS, nullB, nullI, nullC,
      c.cast(NumericType))
  /** A container/entity value (tags 0-4) from its canonical agtype
    * text. */
  def ofContainer(tag: Int, text: Column): Column =
    v(tag, nullF, nullS, nullB, nullI, text)

  /** Can `dt` be carried by the variant encoding, container slot
    * included? (Everything agtype can hold.) */
  def encodable(dt: DataType): Boolean = dt match {
    case _: ArrayType | _: MapType | _: StructType => true
    case d => scalar(d)
  }

  /** Encode a natively-typed column as a variant (null → NULL struct).
    * Containers/entities serialize to canonical agtype text in the `c`
    * slot — the flat analogue of AGTV_ARRAY/AGTV_OBJECT recursion
    * (reference: agtype.h:307-324). */
  def encode(c: Column, dt: DataType): Column = {
    val enc = dt match {
      case d if isVariant(d) => return c
      case StringType => ofString(c)
      case BooleanType => ofBool(c)
      case LongType | IntegerType => ofLong(c)
      case DoubleType | FloatType => ofDouble(c)
      case _: DecimalType => ofNumeric(c)
      case NullType => return lit(null).cast(schema)
      case at: ArrayType => ofContainer(TagArray, printedNative(c, at))
      case st: StructType if isEntityStruct(st) =>
        ofContainer(if (st.fieldNames.contains("start_id")) TagEdge else TagVertex,
          printedEntity(c, st))
      case st: StructType if isPathStruct(st) =>
        ofContainer(TagPath, printedPath(c))
      case st: StructType => ofContainer(TagMap, printedStructObj(c, st))
      case mt: MapType => ofContainer(TagMap, printedNative(c, mt))
      case other =>
        throw new IllegalArgumentException(s"cannot variant-encode $other")
    }
    when(c.isNotNull, enc)
  }

  /** Orderability sort key. The struct layout is its own sort key (rank,
    * then per-type fields); exposed as a function so call sites document
    * intent and the layout can change. */
  def sortKey(c: Column): Column = c

  /** Cypher comparison over variants, following the reference's TOTAL
    * ORDER across types (reference: agtype_eq/agtype_ne are total,
    * agtype_ops.c:1054/1117; ordering ops compare by sort priority,
    * compare_agtype_containers_orderability, agtype_util.c) — NOT
    * openCypher's null-on-incomparable. Documented choice: AGE treats
    * `1 = 'x'` as false, `1 <> 'x'` as true, and `<`/`>` rank
    * string < bool < numeric (our tag order), so WHERE / ORDER BY / btree
    * agree. SQL-null operands still yield null (3-valued logic).
    *
    * Numerics: both-integer operands compare exactly on the `i` slot
    * (int64 compare, reference: compare_agtype_scalar_values
    * AGTV_INTEGER) — distinct longs beyond 2^53 must not tie; int-vs-
    * float compares through the shared `f` key. `op` is the Cypher
    * operator lexeme. */
  def cypherCmp(op: String, l: Column, r: Column): Column = {
    val (lt, rt) = (l.getField("tag"), r.getField("tag"))
    val sameType = lt === rt
    val (li, ri) = (l.getField("i"), r.getField("i"))
    val bothInt = li.isNotNull && ri.isNotNull
    // exact same-class numeric compares: int-int on the i slot, numeric-
    // numeric on the n slot (full decimal precision); mixed classes and
    // floats go through the shared f key
    val (ln, rn) = (l.getField("n"), r.getField("n"))
    val bothDec = ln.isNotNull && rn.isNotNull
    // same-tag key: only the tag's own fields are non-null, so struct
    // comparison reduces to the right per-type compare
    val key: Column => Column = x =>
      struct(x.getField("f"), x.getField("s"), x.getField("b"), x.getField("c"))
    // same-tag containers/entities (tags 0-4): element-wise agtype
    // orderability via AgOrderKey over the canonical text — equality is
    // value-based ([2] = [2.0] like the reference's
    // compare_agtype_containers_orderability, agtype_util.c:333+), and
    // `<`/`>` order numerically ('[2]' < '[10]'), not textually. The
    // key computation only runs on rows that take this branch; scalar
    // compares never pay for it.
    val bothCont = lt < lit(TagString) && rt < lit(TagString)
    val ok: Column => Column = x => graft.functions.AgOrderKey.key(x)
    val eqSame = when(bothInt, li === ri).when(bothDec, ln === rn)
      .when(bothCont, ok(l) === ok(r))
      .otherwise(key(l) === key(r))
    val cmp = op match {
      case "=" => when(sameType, eqSame).otherwise(lit(false))
      case "<>" => when(sameType, !eqSame).otherwise(lit(true))
      case "<" => when(!sameType, lt < rt)
        .when(bothInt, li < ri).when(bothDec, ln < rn)
        .when(bothCont, ok(l) < ok(r)).otherwise(key(l) < key(r))
      case "<=" => when(!sameType, lt < rt)
        .when(bothInt, li <= ri).when(bothDec, ln <= rn)
        .when(bothCont, ok(l) <= ok(r)).otherwise(key(l) <= key(r))
      case ">" => when(!sameType, lt > rt)
        .when(bothInt, li > ri).when(bothDec, ln > rn)
        .when(bothCont, ok(l) > ok(r)).otherwise(key(l) > key(r))
      case ">=" => when(!sameType, lt > rt)
        .when(bothInt, li >= ri).when(bothDec, ln >= rn)
        .when(bothCont, ok(l) >= ok(r)).otherwise(key(l) >= key(r))
      case other => throw new IllegalArgumentException(s"not a comparison: $other")
    }
    when(l.isNull || r.isNull, lit(null).cast(BooleanType)).otherwise(cmp)
  }

  /** Arithmetic over variants: numeric⊕numeric stays numeric (int⊕int
    * stays int for +,-,*,%; / is integer division on ints); string+string
    * concatenates; anything else is null — matching agtype_add/sub/…
    * dispatch (reference: agtype_ops.c:145-1049). Result is variant. */
  def arith(op: String, l: Column, r: Column): Column = {
    val bothNum = l.getField("tag") === TagNum && r.getField("tag") === TagNum
    val bothInt = l.getField("i").isNotNull && r.getField("i").isNotNull
    val (li, ri) = (l.getField("i"), r.getField("i"))
    val (lf, rf) = (l.getField("f"), r.getField("f"))
    val (ln, rn) = (l.getField("n"), r.getField("n"))
    // numeric ⊕ {numeric, int} stays exact numeric; numeric ⊕ float
    // falls to float (PG numeric/float8 coercion, ag_float8_supp.c)
    val isFloat: Column => Column = x =>
      x.getField("i").isNull && x.getField("n").isNull
    val decCase = (ln.isNotNull || rn.isNotNull) && !isFloat(l) && !isFloat(r)
    val (ld, rd) = (coalesce(ln, li.cast(NumericType)),
      coalesce(rn, ri.cast(NumericType)))
    val decRes: Column = op match {
      case "+" => ld + rd
      case "-" => ld - rd
      case "*" => ld * rd
      // Spark decimal division under allowPrecisionLoss lands on scale 6
      // for (38,18) operands — NumericDivide keeps the slot's full
      // 18-digit fractional scale like PG numeric division
      case "/" => graft.functions.NumericDivide.div(ld, rd)
      case "%" => ld % rd
      case _ => lit(null).cast(NumericType) // ^ yields float
    }
    val intRes: Column = op match {
      case "+" => li + ri
      case "-" => li - ri
      case "*" => li * ri
      case "/" => call_function("div", li, ri)
      case "%" => li % ri
      case "^" => lit(null).cast(LongType) // power always yields float
      case other => throw new IllegalArgumentException(s"not arithmetic: $other")
    }
    val dblRes: Column = op match {
      case "+" => lf + rf
      case "-" => lf - rf
      case "*" => lf * rf
      case "/" => lf / rf
      case "%" => lf % rf
      case "^" => pow(lf, rf)
      case _ => lit(null).cast(DoubleType)
    }
    val strCase =
      if (op == "+")
        when(l.getField("tag") === TagString && r.getField("tag") === TagString,
          ofString(concat(l.getField("s"), r.getField("s"))))
      else when(lit(false), lit(null).cast(schema))
    when(l.isNull || r.isNull, lit(null).cast(schema))
      .when(bothNum && bothInt && lit(op != "^"), ofLong(intRes))
      .when(bothNum && decCase && lit(op != "^"), ofNumeric(decRes))
      .when(bothNum, ofDouble(dblRes))
      .otherwise(strCase)
  }

  /** Text form of a variant value (AgValue.print fidelity: integers
    * print without a decimal point; containers/entities emit their
    * stored canonical agtype text). */
  def printed(c: Column): Column =
    when(c.isNull, lit(null).cast(StringType))
      .when(c.getField("tag") < TagString, c.getField("c"))
      .when(c.getField("tag") === TagString, c.getField("s"))
      .when(c.getField("tag") === TagBool, c.getField("b").cast(StringType))
      .when(c.getField("i").isNotNull, c.getField("i").cast(StringType))
      .when(c.getField("n").isNotNull,
        concat(decText(c.getField("n")), lit("::numeric")))
      .otherwise(c.getField("f").cast(StringType))

  /** [[printed]] for ::string / toString() casts — numerics render
    * numeric_out-style with NO '::numeric' annotation (the reference's
    * string conversion goes through numeric_out: '2.5', not
    * '2.5::numeric'; the annotation belongs only to agtype_out-style
    * final rendering). */
  def castText(c: Column): Column =
    when(c.isNull, lit(null).cast(StringType))
      .when(c.getField("n").isNotNull, decText(c.getField("n")))
      .otherwise(printed(c))

  /** Natural-scale text of the decimal slot (AgValue.print fidelity:
    * `1.500000000000000000` renders `1.5`, `2.000…` renders `2`). */
  def decText(n: Column): Column =
    regexp_replace(
      regexp_replace(n.cast(StringType), "(\\.\\d*?)0+$", "$1"), "\\.$", "")

  /** [[printed]] for use inside container text: strings double-quoted,
    * SQL null spelled `null` — agtype_out's element form. */
  def printedQuoted(c: Column): Column =
    when(c.isNull, lit("null"))
      .when(c.getField("tag") === TagString,
        concat(lit("\""), c.getField("s"), lit("\"")))
      .otherwise(printed(c))

  /** agtype text of a heterogeneous list: `[1, 2.5, "a", true, null]`. */
  def printedArray(c: Column): Column =
    when(c.isNull, lit(null).cast(StringType))
      .otherwise(concat(lit("["),
        concat_ws(", ", transform(c, printedQuoted(_))), lit("]")))

  /** agtype text of a NATIVELY typed value: scalars print bare at top
    * level (like the engine's scalar output), containers render agtype
    * text with quoted string elements/keys. Used to harmonize UNION
    * branches whose types mix containers and scalars — agtype columns
    * are untyped, so `RETURN [1,2,3] UNION RETURN 1` is legal and both
    * rows print their agtype form. */
  def printedNative(c: Column, dt: DataType): Column = dt match {
    case d if isVariant(d) => printed(c)
    case st: StructType if isEntityStruct(st) => printedEntity(c, st)
    case StringType => c
    case ArrayType(et, _) =>
      when(c.isNull, lit(null).cast(StringType))
        .otherwise(concat(lit("["),
          concat_ws(", ", transform(c, e => quotedNative(e, et))), lit("]")))
    case MapType(_, vt, _) =>
      // keys emit in agtype's deterministic order (length, then lex —
      // reference: agtype.h:326-347) so the text is canonical and text
      // equality agrees with map equality
      when(c.isNull, lit(null).cast(StringType))
        .otherwise(concat(lit("{"),
          concat_ws(", ", transform(array_sort(map_entries(c), keyCmp), e =>
            concat(lit("\""), e.getField("key"), lit("\": "),
              quotedNative(e.getField("value"), vt)))), lit("}")))
    case st: StructType =>
      when(c.isNull, lit(null).cast(StringType))
        .otherwise(printedStructObj(c, st))
    case _ => c.cast(StringType)
  }

  /** agtype object key order: length first, then lexicographic. */
  private val keyCmp: (Column, Column) => Column = (l, r) => {
    val (lk, rk) = (l.getField("key"), r.getField("key"))
    when(length(lk) < length(rk), -1).when(length(lk) > length(rk), 1)
      .when(lk < rk, -1).when(lk > rk, 1).otherwise(0)
  }

  /** A planner entity column: vertex struct (id, label, properties) or
    * edge struct (id, label, start_id, end_id, properties). */
  def isEntityStruct(st: StructType): Boolean =
    st.fieldNames.contains("id") && st.fieldNames.contains("label") &&
      st.fieldNames.contains("properties")

  /** This engine's path value: (nodes, relationships) id arrays. */
  def isPathStruct(st: StructType): Boolean =
    st.fieldNames.sameElements(Array("nodes", "relationships"))

  /** Canonical text of a path struct: the alternating id sequence
    * `[n0, r0, n1, …]::path` — reconstructible, and ordering over it
    * matches the reference's element-wise path compare (entities
    * compare by id). DOCUMENTED DEVIATION: the path struct carries ids
    * only, so a path that enters the variant container slot (e.g. an
    * element of a heterogeneous list) prints id numbers where the
    * reference's agtype_out prints full vertex/edge objects, and
    * indexing into it yields the id integer rather than the entity.
    * Top-level paths never take this route — they render through
    * AgValue.print(AgPath) with full entity text; only the
    * path-inside-container corner differs. */
  def printedPath(c: Column): Column = {
    val nodes = c.getField("nodes")
    val rels = c.getField("relationships")
    val paired = flatten(zip_with(
      slice(nodes, lit(1), size(rels)), rels, (n, r) => array(n, r)))
    val all = concat(paired, slice(nodes, size(nodes), lit(1)))
    when(c.isNull, lit(null).cast(StringType))
      .otherwise(concat(lit("["),
        concat_ws(", ", transform(all, _.cast(StringType))), lit("]::path")))
  }

  /** agtype text of an entity struct — the reference's agtype_out
    * rendering `{"id": N, "label": "L", ...}::vertex|::edge` with keys in
    * agtype object order, length first then lexicographic
    * (reference: agtype.h:326-347; vertex/edge layouts :337-347). */
  def printedEntity(c: Column, st: StructType): Column = {
    val propsTxt = st.fields.find(_.name == "properties").get.dataType match {
      // a property-less label materializes a placeholder struct
      case pst: StructType if pst.fieldNames.sameElements(Array("__empty")) =>
        lit("{}")
      case pst: StructType => printedStructObj(c.getField("properties"), pst)
      case mt: MapType =>
        coalesce(printedNative(c.getField("properties"), mt), lit("{}"))
      case _ => lit("{}")
    }
    val vertexTxt =
      concat(lit("{\"id\": "), c.getField("id").cast(StringType),
        lit(", \"label\": \""), c.getField("label"),
        lit("\", \"properties\": "), propsTxt, lit("}::vertex"))
    val body =
      if (st.fieldNames.contains("start_id")) {
        val edgeTxt =
          concat(lit("{\"id\": "), c.getField("id").cast(StringType),
            lit(", \"label\": \""), c.getField("label"),
            lit("\", \"end_id\": "), c.getField("end_id").cast(StringType),
            lit(", \"start_id\": "), c.getField("start_id").cast(StringType),
            lit(", \"properties\": "), propsTxt, lit("}::edge"))
        // a unified vertex/edge struct (mixed entity list) marks vertex
        // elements with null start_id — dispatch per row
        when(c.getField("start_id").isNotNull, edgeTxt).otherwise(vertexTxt)
      } else vertexTxt
    when(c.isNull, lit(null).cast(StringType)).otherwise(body)
  }

  /** agtype object text of a typed property struct: null-valued fields
    * are absent keys; static field names pre-sorted in agtype key order. */
  private def printedStructObj(c: Column, st: StructType): Column = {
    val fs = st.fields.sortBy(f => (f.name.length, f.name))
    when(c.isNull, lit("null")).otherwise(concat(lit("{"),
      concat_ws(", ", fs.map(f => when(c.getField(f.name).isNotNull,
        concat(lit("\"" + f.name + "\": "),
          quotedNative(c.getField(f.name), f.dataType)))): _*),
      lit("}")))
  }

  /** [[printedNative]] in container-element position: strings quoted,
    * null spelled `null`. */
  private def quotedNative(c: Column, dt: DataType): Column = dt match {
    case d if isVariant(d) => printedQuoted(c)
    case StringType =>
      when(c.isNull, lit("null")).otherwise(concat(lit("\""), c, lit("\"")))
    case ArrayType(_, _) | MapType(_, _, _) =>
      coalesce(printedNative(c, dt), lit("null"))
    case st: StructType if isEntityStruct(st) =>
      coalesce(printedEntity(c, st), lit("null"))
    case st: StructType => printedStructObj(c, st)
    case _ => coalesce(c.cast(StringType), lit("null"))
  }

  /** agtype text of a heterogeeneous object: `{"a": 1, "b": "x"}` — keys
    * in agtype's deterministic order, length first then lexicographic
    * (reference: agtype.h:326-347). */
  def printedMap(c: Column): Column =
    when(c.isNull, lit(null).cast(StringType))
      .otherwise(concat(lit("{"),
        concat_ws(", ", transform(array_sort(map_entries(c), keyCmp), e =>
          concat(lit("\""), e.getField("key"), lit("\": "),
            printedQuoted(e.getField("value"))))), lit("}")))
}
