package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Phonetic codes for the fuzzystrmatch interop surface (reference:
  * regress/sql/fuzzystrmatch.sql exercises metaphone(name, 4) and
  * dmetaphone(name) over agtype strings). Both algorithms are
  * re-derived from their published descriptions — Metaphone (Lawrence
  * Philips, Computer Language 7(12), 1990) and Double Metaphone
  * (Philips, C/C++ Users Journal, June 2000) — NOT ported from the
  * extension's C. Golden tests pin the regress expected rows plus
  * canonical published examples.
  */
object Phonetic {

  private def isVowel(c: Char): Boolean =
    c == 'A' || c == 'E' || c == 'I' || c == 'O' || c == 'U'

  /** Original Metaphone, truncated to `maxLen` code letters. Operates
    * on the letters of the input only (non-alphabetic chars dropped),
    * case-insensitive. */
  def metaphone(input: String, maxLen: Int): String = {
    require(maxLen > 0, "output length must be > 0")
    val s = input.toUpperCase.filter(c => c >= 'A' && c <= 'Z')
    if (s.isEmpty) return ""
    val n = s.length
    def at(i: Int): Char = if (i >= 0 && i < n) s.charAt(i) else ' '
    // initial-pair exceptions: AE-, GN-, KN-, PN-, WR- drop the first
    // letter; X- codes as S; WH- codes as W
    var start = 0
    (at(0), at(1)) match {
      case ('A', 'E') | ('G', 'N') | ('K', 'N') | ('P', 'N') | ('W', 'R') =>
        start = 1
      case ('W', 'H') => start = 1 // coded as W by the W rule below
      case _ =>
    }
    val out = new StringBuilder
    var i = start
    while (i < n && out.length < maxLen) {
      val c = at(i)
      val prev = if (i > start) at(i - 1) else ' '
      val next = at(i + 1)
      val next2 = at(i + 2)
      // doubled letters collapse (except C, handled by its own rules)
      if (c == prev && c != 'C') { i += 1 }
      else {
        c match {
          case 'A' | 'E' | 'I' | 'O' | 'U' =>
            if (i == start) out += c
            i += 1
          case 'B' =>
            // final -MB keeps B silent
            if (!(i == n - 1 && prev == 'M')) out += 'B'
            i += 1
          case 'C' =>
            if (prev == 'S' && (next == 'E' || next == 'I' || next == 'Y')) ()
            else if (next == 'I' && next2 == 'A') out += 'X'
            else if (next == 'H') {
              if (prev == 'S') out += 'K' else out += 'X'
            }
            else if (next == 'E' || next == 'I' || next == 'Y') out += 'S'
            else out += 'K'
            i += 1
          case 'D' =>
            if (next == 'G' && (next2 == 'E' || next2 == 'I' || next2 == 'Y'))
              out += 'J'
            else out += 'T'
            i += 1
          case 'F' => out += 'F'; i += 1
          case 'G' =>
            val silent =
              (next == 'H' && !isVowel(next2) && i + 2 < n) || // -GH- not before vowel
              (next == 'H' && i + 1 == n - 1 &&
                !isVowel(at(i - 3)) && at(i - 3) != ' ') || // rough edge: final GH after consonant cluster
              (next == 'N' && (i + 1 == n - 1 ||
                (next2 == 'E' && at(i + 3) == 'D' && i + 3 == n - 1))) // -GN, -GNED
            if (!silent) {
              if (next == 'E' || next == 'I' || next == 'Y') out += 'J'
              else out += 'K'
            }
            i += 1
          case 'H' =>
            // silent after vowel with no following vowel
            if (isVowel(prev) && !isVowel(next)) ()
            else if (prev == 'C' || prev == 'S' || prev == 'P' || prev == 'T' ||
              prev == 'G') () // digraph second letters already coded
            else out += 'H'
            i += 1
          case 'J' => out += 'J'; i += 1
          case 'K' =>
            if (prev != 'C') out += 'K'
            i += 1
          case 'L' => out += 'L'; i += 1
          case 'M' => out += 'M'; i += 1
          case 'N' => out += 'N'; i += 1
          case 'P' =>
            if (next == 'H') { out += 'F'; i += 2 } else { out += 'P'; i += 1 }
          case 'Q' => out += 'K'; i += 1
          case 'R' => out += 'R'; i += 1
          case 'S' =>
            if (next == 'H') { out += 'X'; i += 2 }
            else if (next == 'I' && (next2 == 'O' || next2 == 'A')) { out += 'X'; i += 1 }
            else { out += 'S'; i += 1 }
          case 'T' =>
            if (next == 'I' && (next2 == 'O' || next2 == 'A')) { out += 'X'; i += 1 }
            else if (next == 'H') { out += '0'; i += 2 }
            else if (next == 'C' && next2 == 'H') i += 1 // -TCH-: T silent
            else { out += 'T'; i += 1 }
          case 'V' => out += 'F'; i += 1
          case 'W' =>
            if (isVowel(next)) out += 'W'
            i += 1
          case 'X' => out += 'K'; if (out.length < maxLen) out += 'S'; i += 1
          case 'Y' =>
            if (isVowel(next)) out += 'Y'
            i += 1
          case 'Z' => out += 'S'; i += 1
          case _ => i += 1
        }
      }
    }
    out.toString
  }

  /** Double Metaphone primary (and alternate) codes, 4 letters like the
    * extension's dmetaphone/dmetaphone_alt. */
  def dmetaphone(input: String): String = doubleMetaphone(input)._1
  def dmetaphoneAlt(input: String): String = doubleMetaphone(input)._2

  def doubleMetaphone(input: String): (String, String) = {
    val s = input.toUpperCase.filter(c => (c >= 'A' && c <= 'Z'))
    val n = s.length
    if (n == 0) return ("", "")
    def at(i: Int): Char = if (i >= 0 && i < n) s.charAt(i) else ' '
    def sub(i: Int, len: Int): String =
      if (i < 0 || i >= n) "" else s.substring(i, math.min(n, i + len))
    def anyAt(i: Int, len: Int, opts: String*): Boolean = {
      val x = sub(i, len); opts.contains(x)
    }
    def vow(i: Int): Boolean = {
      val c = at(i)
      c == 'A' || c == 'E' || c == 'I' || c == 'O' || c == 'U' || c == 'Y'
    }
    val slavoGermanic =
      s.contains("W") || s.contains("K") || s.contains("CZ") || s.contains("WITZ")
    val p = new StringBuilder
    val a = new StringBuilder
    def add(pri: String, alt: String = null): Unit = {
      p ++= pri; a ++= (if (alt == null) pri else alt)
    }
    var i = 0
    // initial silent letters
    if (anyAt(0, 2, "GN", "KN", "PN", "WR", "PS")) i = 1
    else if (at(0) == 'X') { add("S"); i = 1 }
    while ((p.length < 4 || a.length < 4) && i < n) {
      at(i) match {
        case 'A' | 'E' | 'I' | 'O' | 'U' | 'Y' =>
          if (i == 0) add("A")
          i += 1
        case 'B' =>
          add("P"); i += (if (at(i + 1) == 'B') 2 else 1)
        case 'C' =>
          if (i > 1 && !vow(i - 2) && anyAt(i - 1, 3, "ACH") &&
              at(i + 2) != 'I' && (at(i + 2) != 'E' ||
                anyAt(i - 2, 6, "BACHER", "MACHER"))) {
            add("K"); i += 2
          } else if (i == 0 && anyAt(0, 6, "CAESAR")) { add("S"); i += 2 }
          else if (anyAt(i, 4, "CHIA")) { add("K"); i += 2 }
          else if (anyAt(i, 2, "CH")) {
            if (i > 0 && anyAt(i, 4, "CHAE")) { add("K", "X"); i += 2 }
            else if (i == 0 &&
                (anyAt(i + 1, 5, "HARAC", "HARIS") ||
                 anyAt(i + 1, 3, "HOR", "HYM", "HIA", "HEM")) &&
                !anyAt(0, 5, "CHORE")) { add("K"); i += 2 }
            else if (anyAt(0, 4, "VAN ", "VON ") || anyAt(0, 3, "SCH") ||
                anyAt(i - 2, 6, "ORCHES", "ARCHIT", "ORCHID") ||
                anyAt(i + 2, 1, "T", "S") ||
                ((anyAt(i - 1, 1, "A", "O", "U", "E") || i == 0) &&
                 anyAt(i + 2, 1, "L", "R", "N", "M", "B", "H", "F", "V", "W", " "))) {
              add("K"); i += 2
            } else {
              if (i > 0) {
                if (anyAt(0, 2, "MC")) add("K") else add("X", "K")
              } else add("X")
              i += 2
            }
          }
          else if (anyAt(i, 2, "CZ") && !anyAt(i - 2, 4, "WICZ")) {
            add("S", "X"); i += 2
          }
          else if (anyAt(i + 1, 3, "CIA")) { add("X"); i += 3 }
          else if (anyAt(i, 2, "CC") && !(i == 1 && at(0) == 'M')) {
            if (anyAt(i + 2, 1, "I", "E", "H") && !anyAt(i + 2, 2, "HU")) {
              if ((i == 1 && at(i - 1) == 'A') ||
                  anyAt(i - 1, 5, "UCCEE", "UCCES")) add("KS")
              else add("X")
              i += 3
            } else { add("K"); i += 2 }
          }
          else if (anyAt(i, 2, "CK", "CG", "CQ")) { add("K"); i += 2 }
          else if (anyAt(i, 2, "CI", "CE", "CY")) {
            if (anyAt(i, 3, "CIO", "CIE", "CIA")) add("S", "X") else add("S")
            i += 2
          }
          else {
            add("K")
            if (anyAt(i + 1, 2, " C", " Q", " G")) i += 3
            else if (anyAt(i + 1, 1, "C", "K", "Q") &&
              !anyAt(i + 1, 2, "CE", "CI")) i += 2
            else i += 1
          }
        case 'D' =>
          if (anyAt(i, 2, "DG")) {
            if (anyAt(i + 2, 1, "I", "E", "Y")) { add("J"); i += 3 }
            else { add("TK"); i += 2 }
          } else if (anyAt(i, 2, "DT", "DD")) { add("T"); i += 2 }
          else { add("T"); i += 1 }
        case 'F' =>
          add("F"); i += (if (at(i + 1) == 'F') 2 else 1)
        case 'G' =>
          if (at(i + 1) == 'H') {
            if (i > 0 && !vow(i - 1)) { add("K"); i += 2 }
            else if (i == 0) {
              if (at(i + 2) == 'I') add("J") else add("K")
              i += 2
            }
            else if ((i > 1 && anyAt(i - 2, 1, "B", "H", "D")) ||
                (i > 2 && anyAt(i - 3, 1, "B", "H", "D")) ||
                (i > 3 && anyAt(i - 4, 1, "B", "H"))) i += 2
            else {
              if (i > 2 && at(i - 1) == 'U' &&
                  anyAt(i - 3, 1, "C", "G", "L", "R", "T")) add("F")
              else if (i > 0 && at(i - 1) != 'I') add("K")
              i += 2
            }
          }
          else if (at(i + 1) == 'N') {
            if (i == 1 && vow(0) && !slavoGermanic) add("KN", "N")
            else if (!anyAt(i + 2, 2, "EY") && at(i + 1) != 'Y' &&
              !slavoGermanic) add("N", "KN")
            else add("KN")
            i += 2
          }
          else if (anyAt(i + 1, 2, "LI") && !slavoGermanic) {
            add("KL", "L"); i += 2
          }
          else if (i == 0 && (at(i + 1) == 'Y' ||
              anyAt(i + 1, 2, "ES", "EP", "EB", "EL", "EY", "IB", "IL", "IN",
                "IE", "EI", "ER"))) { add("K", "J"); i += 2 }
          else if ((anyAt(i + 1, 2, "ER") || at(i + 1) == 'Y') &&
              !anyAt(0, 6, "DANGER", "RANGER", "MANGER") &&
              !anyAt(i - 1, 1, "E", "I") && !anyAt(i - 1, 3, "RGY", "OGY")) {
            add("K", "J"); i += 2
          }
          else if (anyAt(i + 1, 1, "E", "I", "Y") ||
              anyAt(i - 1, 4, "AGGI", "OGGI")) {
            if (anyAt(0, 4, "VAN ", "VON ") || anyAt(0, 3, "SCH") ||
                anyAt(i + 1, 2, "ET")) add("K")
            else if (anyAt(i + 1, 4, "IER ") ||
              (anyAt(i + 1, 3, "IER") && i + 4 == n)) add("J")
            else add("J", "K")
            i += 2
          }
          else { add("K"); i += (if (at(i + 1) == 'G') 2 else 1) }
        case 'H' =>
          if ((i == 0 || vow(i - 1)) && vow(i + 1)) { add("H"); i += 2 }
          else i += 1
        case 'J' =>
          if (anyAt(i, 4, "JOSE") || anyAt(0, 4, "SAN ")) {
            if ((i == 0 && at(i + 4) == ' ') || anyAt(0, 4, "SAN ")) add("H")
            else add("J", "H")
            i += 1
          } else {
            if (i == 0 && !anyAt(i, 4, "JOSE")) add("J", "A")
            else if (vow(i - 1) && !slavoGermanic &&
              (at(i + 1) == 'A' || at(i + 1) == 'O')) add("J", "H")
            else if (i == n - 1) add("J", "")
            else if (!anyAt(i + 1, 1, "L", "T", "K", "S", "N", "M", "B", "Z") &&
              !anyAt(i - 1, 1, "S", "K", "L")) add("J")
            i += (if (at(i + 1) == 'J') 2 else 1)
          }
        case 'K' =>
          add("K"); i += (if (at(i + 1) == 'K') 2 else 1)
        case 'L' =>
          if (at(i + 1) == 'L') {
            // spanish -ILLO/-ILLA/-ALLE with latin endings: L silent in alt
            if ((i == n - 3 && anyAt(i - 1, 4, "ILLO", "ILLA", "ALLE")) ||
                ((anyAt(n - 2, 2, "AS", "OS") || anyAt(n - 1, 1, "A", "O")) &&
                 anyAt(i - 1, 4, "ALLE"))) {
              add("L", ""); i += 2
            } else { add("L"); i += 2 }
          } else { add("L"); i += 1 }
        case 'M' =>
          add("M")
          i += (if (anyAt(i - 1, 3, "UMB") &&
            (i + 1 == n - 1 || anyAt(i + 2, 2, "ER")) || at(i + 1) == 'M') 2
          else 1)
        case 'N' =>
          add("N"); i += (if (at(i + 1) == 'N') 2 else 1)
        case 'P' =>
          if (at(i + 1) == 'H') { add("F"); i += 2 }
          else { add("P"); i += (if (anyAt(i + 1, 1, "P", "B")) 2 else 1) }
        case 'Q' =>
          add("K"); i += (if (at(i + 1) == 'Q') 2 else 1)
        case 'R' =>
          if (i == n - 1 && !slavoGermanic && anyAt(i - 2, 2, "IE") &&
            !anyAt(i - 4, 2, "ME", "MA")) add("", "R")
          else add("R")
          i += (if (at(i + 1) == 'R') 2 else 1)
        case 'S' =>
          if (anyAt(i - 1, 3, "ISL", "YSL")) i += 1
          else if (i == 0 && anyAt(i, 5, "SUGAR")) { add("X", "S"); i += 1 }
          else if (anyAt(i, 2, "SH")) {
            if (anyAt(i + 1, 4, "HEIM", "HOEK", "HOLM", "HOLZ")) add("S")
            else add("X")
            i += 2
          }
          else if (anyAt(i, 3, "SIO", "SIA") || anyAt(i, 4, "SIAN")) {
            if (!slavoGermanic) add("S", "X") else add("S")
            i += 3
          }
          else if ((i == 0 && anyAt(i + 1, 1, "M", "N", "L", "W")) ||
              anyAt(i + 1, 1, "Z")) {
            add("S", "X"); i += (if (anyAt(i + 1, 1, "Z")) 2 else 1)
          }
          else if (anyAt(i, 2, "SC")) {
            if (at(i + 2) == 'H') {
              if (anyAt(i + 3, 2, "OO", "ER", "EN", "UY", "ED", "EM")) {
                if (anyAt(i + 3, 2, "ER", "EN")) add("X", "SK") else add("SK")
                i += 3
              } else {
                if (i == 0 && !vow(3) && at(3) != 'W') add("X", "S")
                else add("X")
                i += 3
              }
            } else if (anyAt(i + 2, 1, "I", "E", "Y")) { add("S"); i += 3 }
            else { add("SK"); i += 3 }
          }
          else {
            if (i == n - 1 && anyAt(i - 2, 2, "AI", "OI")) add("", "S")
            else add("S")
            i += (if (anyAt(i + 1, 1, "S", "Z")) 2 else 1)
          }
        case 'T' =>
          if (anyAt(i, 4, "TION")) { add("X"); i += 3 }
          else if (anyAt(i, 3, "TIA", "TCH")) { add("X"); i += 3 }
          else if (anyAt(i, 2, "TH") || anyAt(i, 3, "TTH")) {
            if (anyAt(i + 2, 2, "OM", "AM") || anyAt(0, 4, "VAN ", "VON ") ||
              anyAt(0, 3, "SCH")) add("T")
            else add("0", "T")
            i += 2
          }
          else { add("T"); i += (if (anyAt(i + 1, 1, "T", "D")) 2 else 1) }
        case 'V' =>
          add("F"); i += (if (at(i + 1) == 'V') 2 else 1)
        case 'W' =>
          if (anyAt(i, 2, "WR")) { add("R"); i += 2 }
          else {
            if (i == 0 && (vow(i + 1) || anyAt(i, 2, "WH"))) {
              if (vow(i + 1)) add("A", "F") else add("A")
            }
            if ((i == n - 1 && vow(i - 1)) ||
                anyAt(i - 1, 5, "EWSKI", "EWSKY", "OWSKI", "OWSKY") ||
                anyAt(0, 3, "SCH")) add("", "F")
            else if (anyAt(i, 4, "WICZ", "WITZ")) { add("TS", "FX"); i += 3 }
            i += 1
          }
        case 'X' =>
          if (!(i == n - 1 && (anyAt(i - 3, 3, "IAU", "EAU") ||
            anyAt(i - 2, 2, "AU", "OU")))) add("KS")
          i += (if (anyAt(i + 1, 1, "C", "X")) 2 else 1)
        case 'Z' =>
          if (at(i + 1) == 'H') { add("J"); i += 2 }
          else {
            if (anyAt(i + 1, 2, "ZO", "ZI", "ZA") ||
              (slavoGermanic && i > 0 && at(i - 1) != 'T')) add("S", "TS")
            else add("S")
            i += (if (at(i + 1) == 'Z') 2 else 1)
          }
        case _ => i += 1
      }
    }
    (p.toString.take(4), a.toString.take(4))
  }
}

/** metaphone(text, maxlen) as a Catalyst expression (static kernel,
  * codegen-friendly like AgOrderKey). */
case class MetaphoneExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType | LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"metaphone expects (string, int), got ${l.simpleString}, ${r.simpleString}")
    }
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "metaphone"
  override def nullSafeEval(t: Any, m: Any): Any = {
    val len = m match { case x: Long => x.toInt; case x: Int => x }
    UTF8String.fromString(Phonetic.metaphone(t.toString, len))
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, m) =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.functions.Phonetic.metaphone($t.toString(), (int) $m));
       """.stripMargin)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MetaphoneExpr =
    copy(left = newLeft, right = newRight)
}

/** dmetaphone / dmetaphone_alt as Catalyst expressions. */
case class DMetaphoneExpr(child: Expression, alt: Boolean)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"dmetaphone expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = if (alt) "dmetaphone_alt" else "dmetaphone"
  override def nullSafeEval(t: Any): Any =
    UTF8String.fromString(
      if (alt) Phonetic.dmetaphoneAlt(t.toString) else Phonetic.dmetaphone(t.toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  ${if (alt) s"graft.functions.Phonetic.dmetaphoneAlt($t.toString())"
      else s"graft.functions.Phonetic.dmetaphone($t.toString())"});
       """.stripMargin)
  override protected def withNewChildInternal(c: Expression): DMetaphoneExpr =
    copy(child = c)
}

object PhoneticColumns {
  def metaphone(text: Column, maxLen: Column): Column =
    ColumnBridge.column(MetaphoneExpr(
      ColumnBridge.expression(text), ColumnBridge.expression(maxLen)))
  def dmetaphone(text: Column): Column =
    ColumnBridge.column(DMetaphoneExpr(ColumnBridge.expression(text), alt = false))
  def dmetaphoneAlt(text: Column): Column =
    ColumnBridge.column(DMetaphoneExpr(ColumnBridge.expression(text), alt = true))
}
