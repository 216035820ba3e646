package graft.types

import scala.collection.immutable.VectorMap

/** In-memory value domain of the engine — the analogue of the reference's
  * `agtype` (reference: src/include/utils/agtype.h:307-324 for the scalar
  * enum, :435-470 for the in-memory union). A JSON superset with a
  * distinct 64-bit integer type, float8 (with Infinity/-Infinity/NaN
  * literals), arbitrary-precision numeric, graph entities and paths.
  *
  * Used by the Cypher front-end for literals/constant folding and by
  * tests; on the DataFrame side values are represented natively (typed
  * columns / VariantType), this ADT is the semantic reference point.
  */
sealed trait AgValue {
  def typeName: String = this match {
    case AgNull       => "null"
    case _: AgInt     => "integer"
    case _: AgFloat   => "float"
    case _: AgNumeric => "numeric"
    case _: AgString  => "string"
    case _: AgBool    => "boolean"
    case _: AgArray   => "list"
    case _: AgMap     => "map"
    case _: AgVertex  => "vertex"
    case _: AgEdge    => "edge"
    case _: AgPath    => "path"
  }
}

case object AgNull extends AgValue
final case class AgInt(v: Long) extends AgValue
final case class AgFloat(v: Double) extends AgValue
final case class AgNumeric(v: BigDecimal) extends AgValue
final case class AgString(v: String) extends AgValue
final case class AgBool(v: Boolean) extends AgValue
final case class AgArray(items: Vector[AgValue]) extends AgValue
/** String-keyed map; duplicate keys resolve last-wins at build time
  * (reference: uniqueify_agtype_object, agtype.h:485-490). */
final case class AgMap(entries: VectorMap[String, AgValue]) extends AgValue
final case class AgVertex(id: Long, label: String, props: AgMap) extends AgValue
final case class AgEdge(id: Long, label: String, startId: Long, endId: Long, props: AgMap)
    extends AgValue
/** Alternating [v, e, v, e, ..., v]. */
final case class AgPath(elems: Vector[AgValue]) extends AgValue

object AgValue {

  def map(kvs: (String, AgValue)*): AgMap = {
    // last-wins de-duplication, preserving first-position ordering of keys
    var m = VectorMap.empty[String, AgValue]
    kvs.foreach { case (k, v) => m = m.updated(k, v) }
    AgMap(m)
  }

  def array(items: AgValue*): AgArray = AgArray(items.toVector)

  /** Sort priority for cross-type ORDER BY / min / max. Lower sorts first.
    * Mirrors get_type_sort_priority
    * (reference: src/backend/utils/adt/agtype_util.c:271-309):
    * path < edge < vertex < object < array < string < bool < number < null.
    */
  def sortPriority(v: AgValue): Int = v match {
    case _: AgPath    => 0
    case _: AgEdge    => 1
    case _: AgVertex  => 2
    case _: AgMap     => 3
    case _: AgArray   => 4
    case _: AgString  => 5
    case _: AgBool    => 6
    case _: AgInt | _: AgFloat | _: AgNumeric => 7
    case AgNull       => 8
  }

  private def numCompare(a: AgValue, b: AgValue): Int = {
    def toBig(x: AgValue): BigDecimal = x match {
      case AgInt(i)     => BigDecimal(i)
      case AgFloat(f)   => if (f.isNaN || f.isInfinite) BigDecimal(0) else BigDecimal(f)
      case AgNumeric(n) => n
      case _            => sys.error("not a number")
    }
    def nanRank(x: AgValue): Int = x match {
      // float NaN sorts above all other numbers, +Inf below NaN,
      // -Inf below all finite (IEEE total order, matches float8 btree)
      case AgFloat(f) if f.isNaN            => 2
      case AgFloat(f) if f.isPosInfinity    => 1
      case AgFloat(f) if f.isNegInfinity    => -1
      case _                                => 0
    }
    val (ra, rb) = (nanRank(a), nanRank(b))
    if (ra != 0 || rb != 0) Integer.compare(ra, rb)
    else toBig(a).compare(toBig(b))
  }

  /** Total-order comparator across all agtype values, for ORDER BY,
    * DISTINCT, min/max. (reference:
    * compare_agtype_containers_orderability agtype_util.c:333+,
    * agtype_btree_cmp agtype.c:5351.)
    */
  def compare(a: AgValue, b: AgValue): Int = {
    val (pa, pb) = (sortPriority(a), sortPriority(b))
    if (pa != pb) return Integer.compare(pa, pb)
    (a, b) match {
      case (AgNull, AgNull)             => 0
      case (AgString(x), AgString(y))   => x.compareTo(y)
      case (AgBool(x), AgBool(y))       => java.lang.Boolean.compare(x, y)
      case (x, y) if pa == 7            => numCompare(x, y)
      case (AgArray(xs), AgArray(ys)) =>
        val it = xs.iterator.zip(ys.iterator)
        while (it.hasNext) {
          val (x, y) = it.next()
          val c = compare(x, y)
          if (c != 0) return c
        }
        Integer.compare(xs.length, ys.length)
      case (AgMap(xs), AgMap(ys)) =>
        // objects: compare by pair count first, then keys/values in the
        // STORED (sorted) key order — jsonb keeps keys sorted by length
        // then lexicographically, so `{a:1, b:2}` equals `{b:2, a:1}`
        // (reference agtype_util.c:398-470)
        if (xs.size != ys.size) return Integer.compare(xs.size, ys.size)
        def sorted(m: VectorMap[String, AgValue]) =
          m.toSeq.sortBy { case (k, _) => (k.length, k) }
        val it = sorted(xs).iterator.zip(sorted(ys).iterator)
        while (it.hasNext) {
          val ((kx, vx), (ky, vy)) = it.next()
          val kc =
            if (kx.length != ky.length) Integer.compare(kx.length, ky.length)
            else kx.compareTo(ky)
          if (kc != 0) return kc
          val vc = compare(vx, vy)
          if (vc != 0) return vc
        }
        0
      case (x: AgVertex, y: AgVertex) => java.lang.Long.compare(x.id, y.id)
      case (x: AgEdge, y: AgEdge)     => java.lang.Long.compare(x.id, y.id)
      case (AgPath(xs), AgPath(ys))   => compare(AgArray(xs), AgArray(ys))
      case _                          => 0
    }
  }

  /** Cypher comparison (`=`, `<`, ...) — unlike orderability, returns
    * null (None) on cross-type comparisons other than numeric↔numeric
    * (reference: cypher_comparison_aexpr, cypher_nodes.h:337-353).
    */
  def cypherCompare(a: AgValue, b: AgValue): Option[Int] = {
    if (a == AgNull || b == AgNull) return None
    val (pa, pb) = (sortPriority(a), sortPriority(b))
    if (pa != pb) return None
    (a, b) match {
      case _ if pa == 7 =>
        (a, b) match {
          case (AgFloat(x), _) if x.isNaN => None
          case (_, AgFloat(y)) if y.isNaN => None
          case _                          => Some(numCompare(a, b))
        }
      case _ => Some(compare(a, b))
    }
  }

  /** Order-preserving string key: plain (UTF-8/UTF-16 agree on this
    * alphabet) string comparison of two keys has the same sign as
    * [[compare]] whenever compare is non-zero — a flat sort key for
    * arbitrarily nested values, in the spirit of byte-comparable tuple
    * encodings. Cross-rank order comes from the leading rank digit
    * (sortPriority); containers recurse with terminators chosen below
    * any content character; numbers use an exact class-insensitive
    * sign/exponent/mantissa decimal encoding ([[appendNum]]), so
    * compare()==0 pairs produce IDENTICAL keys (1 and 1.0 and
    * 1::numeric share a key) and exactness holds past double precision
    * in every class — key equality is agtype equality. */
  def orderKey(v: AgValue): String = {
    val sb = new StringBuilder
    appendKey(v, sb)
    sb.toString
  }

  private def appendKey(v: AgValue, sb: StringBuilder): Unit = v match {
    case AgPath(elems) =>
      sb.append('0'); elems.foreach(appendKey(_, sb)); sb.append('\u0000')
    case AgEdge(id, _, _, _, _) => sb.append('1'); appendLong(id, sb)
    case AgVertex(id, _, _) => sb.append('2'); appendLong(id, sb)
    case AgMap(m) =>
      // object order: pair count first, then sorted (len, lex) keys and
      // values pairwise (agtype_util.c:398-470)
      sb.append('3'); appendLong(m.size.toLong, sb)
      m.toSeq.sortBy { case (k, _) => (k.length, k) }.foreach { case (k, x) =>
        appendLong(k.length.toLong, sb); appendStr(k, sb); appendKey(x, sb)
      }
    case AgArray(xs) =>
      sb.append('4'); xs.foreach(appendKey(_, sb)); sb.append('\u0000')
    case AgString(s) => sb.append('5'); appendStr(s, sb)
    case AgBool(b) => sb.append('6'); sb.append(if (b) '1' else '0')
    case AgInt(i) => sb.append('7'); appendNum(BigDecimal(i), sb)
    case AgFloat(f) =>
      sb.append('7')
      if (f.isNaN) sb.append('5')
      else if (f.isPosInfinity) sb.append('4')
      else if (f.isNegInfinity) sb.append('0')
      else appendNum(BigDecimal(f), sb)
    case AgNumeric(n) => sb.append('7'); appendNum(n, sb)
    case AgNull => sb.append('8')
  }

  /** Fixed-width monotone hex of a long. */
  private def appendLong(x: Long, sb: StringBuilder): Unit =
    sb.append(f"${x ^ Long.MinValue}%016x")

  /** Terminated, zero-escaped string (' ' content escapes to
    * ' ￿', which sorts after the bare U+0000 terminator). */
  private def appendStr(s: String, sb: StringBuilder): Unit = {
    sb.append(s.replace("\u0000", "\u0000\uffff")); sb.append('\u0000')
  }

  /** Exact, class-insensitive numeric key: a sign rank char (-Inf '0' <
    * negative '1' < zero '2' < positive '3' < +Inf '4' < NaN '5',
    * matching [[numCompare]]'s nanRank), then a fixed-width monotone
    * adjusted-exponent field and the significant digits
    * (9's-complemented for negatives; terminators '!' < '0' for
    * positives, ':' > '9' for negatives so mantissa-prefix pairs order
    * correctly). Equal values of different numeric classes (2, 2.0,
    * 2::numeric) produce identical keys, so key order IS numCompare —
    * cross-class ties stay ties and exactness holds in every class. */
  private def appendNum(n: BigDecimal, sb: StringBuilder): Unit = {
    if (n.signum == 0) { sb.append('2'); return }
    val bd = n.underlying.stripTrailingZeros
    // floor(log10(|n|)): -324..308 for doubles, tighter for int64/decimal
    val adjExp0 = bd.precision - bd.scale - 1
    val adjExp = math.max(-49999, math.min(49999, adjExp0))
    val mant = bd.unscaledValue.abs.toString
    if (n.signum > 0) {
      sb.append('3').append(f"${adjExp + 50000}%05d").append(mant).append('!')
    } else {
      sb.append('1').append(f"${49999 - adjExp}%05d")
      mant.foreach(c => sb.append(('0' + ('9' - c)).toChar))
      sb.append(':')
    }
  }

  /** Text form — JSON superset with int/float fidelity kept
    * (reference: agtype_out / agtype_to_string, agtype.c:418+). */
  def print(v: AgValue): String = v match {
    case AgNull       => "null"
    case AgInt(i)     => i.toString
    case AgFloat(f) =>
      if (f.isNaN) "NaN"
      else if (f.isPosInfinity) "Infinity"
      else if (f.isNegInfinity) "-Infinity"
      else if (f == Math.floor(f) && !f.isInfinite && math.abs(f) < 1e15) s"${f.toLong}.0"
      else f.toString
    case AgNumeric(n) => n.bigDecimal.toPlainString + "::numeric"
    case AgString(s)  => quote(s)
    case AgBool(b)    => b.toString
    case AgArray(xs)  => xs.map(print).mkString("[", ", ", "]")
    case AgMap(m) => m.map { case (k, x) => s"${quote(k)}: ${print(x)}" }.mkString("{", ", ", "}")
    case AgVertex(id, label, props) =>
      s"""{"id": $id, "label": ${quote(label)}, "properties": ${print(props)}}::vertex"""
    case AgEdge(id, label, s, e, props) =>
      s"""{"id": $id, "label": ${quote(label)}, "end_id": $e, "start_id": $s, "properties": ${print(props)}}::edge"""
    case AgPath(elems) => elems.map(print).mkString("[", ", ", "]") + "::path"
  }

  /** Parse the text form back — recursive-descent over the JSON superset
    * (Infinity/-Infinity/NaN, int-vs-float fidelity, ::numeric /
    * ::vertex / ::edge / ::path annotations). Inverse of `print`
    * (reference: parse_agtype, agtype_parser.c:227).
    */
  def parse(input: String): AgValue = {
    val p = new TextParser(input)
    val v = p.value()
    p.skipWs()
    require(p.atEnd, s"trailing input at ${p.pos}: ${input.drop(p.pos).take(20)}")
    v
  }

  private final class TextParser(s: String) {
    var pos = 0
    def atEnd: Boolean = pos >= s.length
    def skipWs(): Unit = while (!atEnd && s.charAt(pos).isWhitespace) pos += 1
    private def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"$msg at $pos: ${s.drop(pos).take(20)}")
    private def eat(tok: String): Unit = {
      if (!s.startsWith(tok, pos)) fail(s"expected $tok")
      pos += tok.length
    }
    private def tryEat(tok: String): Boolean =
      if (s.startsWith(tok, pos)) { pos += tok.length; true } else false

    /** `::numeric` / `::vertex` / `::edge` / `::path` suffix. */
    private def annotated(v: AgValue): AgValue = {
      if (tryEat("::numeric")) v match {
        case AgInt(i) => AgNumeric(BigDecimal(i))
        case AgFloat(f) => AgNumeric(BigDecimal(f))
        case AgString(x) => AgNumeric(BigDecimal(x))
        case _ => fail("::numeric on non-number")
      }
      else if (tryEat("::vertex")) v match {
        case m: AgMap => AgVertex(
          m.entries("id").asInstanceOf[AgInt].v,
          m.entries("label").asInstanceOf[AgString].v,
          m.entries("properties").asInstanceOf[AgMap])
        case _ => fail("::vertex on non-object")
      }
      else if (tryEat("::edge")) v match {
        case m: AgMap => AgEdge(
          m.entries("id").asInstanceOf[AgInt].v,
          m.entries("label").asInstanceOf[AgString].v,
          m.entries("start_id").asInstanceOf[AgInt].v,
          m.entries("end_id").asInstanceOf[AgInt].v,
          m.entries("properties").asInstanceOf[AgMap])
        case _ => fail("::edge on non-object")
      }
      else if (tryEat("::path")) v match {
        case AgArray(xs) => AgPath(xs)
        case _ => fail("::path on non-array")
      }
      else v
    }

    def value(): AgValue = {
      skipWs()
      if (atEnd) fail("unexpected end")
      val v = s.charAt(pos) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => AgString(stringLit())
        case 't' => eat("true"); AgBool(true)
        case 'f' => eat("false"); AgBool(false)
        case 'n' => eat("null"); AgNull
        case 'N' => eat("NaN"); AgFloat(Double.NaN)
        case 'I' => eat("Infinity"); AgFloat(Double.PositiveInfinity)
        case '-' if s.startsWith("-Infinity", pos) =>
          eat("-Infinity"); AgFloat(Double.NegativeInfinity)
        case c if c == '-' || c.isDigit => number()
        case _ => fail("unexpected character")
      }
      annotated(v)
    }

    private def number(): AgValue = {
      val start = pos
      if (tryEat("-")) ()
      while (!atEnd && s.charAt(pos).isDigit) pos += 1
      var isFloat = false
      if (!atEnd && s.charAt(pos) == '.' &&
          // '.' not followed by ':' (annotation) must be a decimal point
          pos + 1 < s.length && s.charAt(pos + 1).isDigit) {
        isFloat = true; pos += 1
        while (!atEnd && s.charAt(pos).isDigit) pos += 1
      }
      if (!atEnd && (s.charAt(pos) == 'e' || s.charAt(pos) == 'E')) {
        isFloat = true; pos += 1
        if (!atEnd && (s.charAt(pos) == '+' || s.charAt(pos) == '-')) pos += 1
        while (!atEnd && s.charAt(pos).isDigit) pos += 1
      }
      val text = s.substring(start, pos)
      if (isFloat) AgFloat(text.toDouble) else AgInt(text.toLong)
    }

    private def stringLit(): String = {
      eat("\"")
      val sb = new StringBuilder
      while (!atEnd && s.charAt(pos) != '"') {
        val c = s.charAt(pos)
        if (c == '\\' && pos + 1 < s.length) {
          s.charAt(pos + 1) match {
            case '"' => sb += '"'
            case '\\' => sb += '\\'
            case '/' => sb += '/'
            case 'n' => sb += '\n'
            case 'r' => sb += '\r'
            case 't' => sb += '\t'
            case 'b' => sb += '\b'
            case 'f' => sb += '\f'
            case 'u' =>
              sb += Integer.parseInt(s.substring(pos + 2, pos + 6), 16).toChar
              pos += 4
            case other => sb += other
          }
          pos += 2
        } else { sb += c; pos += 1 }
      }
      eat("\"")
      sb.toString
    }

    private def identifier(): String = {
      val start = pos
      while (!atEnd && (s.charAt(pos).isLetterOrDigit || s.charAt(pos) == '_')) pos += 1
      if (pos == start) fail("expected map key")
      s.substring(start, pos)
    }

    private def obj(): AgValue = {
      eat("{"); skipWs()
      var entries = Vector.empty[(String, AgValue)]
      if (!tryEat("}")) {
        var done = false
        while (!done) {
          skipWs()
          // Cypher map literals allow unquoted identifier keys
          val k = if (!atEnd && s.charAt(pos) == '"') stringLit() else identifier()
          skipWs(); eat(":")
          entries :+= (k -> value())
          skipWs()
          if (tryEat("}")) done = true else { eat(","); () }
        }
      }
      AgValue.map(entries: _*)
    }

    private def arr(): AgValue = {
      eat("["); skipWs()
      var items = Vector.empty[AgValue]
      if (!tryEat("]")) {
        var done = false
        while (!done) {
          items :+= value()
          skipWs()
          if (tryEat("]")) done = true else { eat(","); () }
        }
      }
      AgArray(items)
    }
  }

  private def quote(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c    => c.toString
    } + "\""
}
