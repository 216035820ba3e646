package graft.cypher

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.cypher.Ast._
import graft.types._

/** Property-based parser fidelity: random expression ASTs are printed
  * with MINIMAL parentheses by a precedence-aware printer that mirrors
  * the grammar's operator ladder (reference: cypher_gram.y precedence
  * declarations), then re-parsed — `parse(print(e)) == e` structurally.
  * This exercises precedence, associativity (left chains, right-assoc
  * `^`, non-assoc comparison chains), postfix binding (property/index/
  * slice/cast/map-projection), string/identifier escaping, and literal
  * lexing (octal guard, trailing-dot floats, big-int numerics) across
  * thousands of machine-built shapes no hand-written suite would cover.
  * Deterministically seeded so failures reproduce.
  */
class ParserPropertySpec extends AnyFunSuite {

  // ---- precedence ladder (must mirror Parser's climbing order) ----
  private val cmpOps = Set("=", "<>", "<", "<=", ">", ">=", "IN",
    "@>", "<@", "@>>", "<<@", "?", "?|", "?&", "<->", "<#>", "<=>", "<+>")
  private val addOps = Set("+", "-", "||", "#>", "#>>", "->", "->>")
  private val mulOps = Set("*", "/", "%")

  private val OR = 1; private val XOR = 2; private val AND = 3
  private val NOTP = 4; private val CMP = 5; private val ADD = 6
  private val MUL = 7; private val POW = 8; private val UNARY = 9
  private val POST = 10; private val ATOM = 11

  private def prec(e: Expr): Int = e match {
    case BinOp("OR", _, _) => OR
    case BinOp("XOR", _, _) => XOR
    case BinOp("AND", _, _) => AND
    case Not(_) => NOTP
    case BinOp(op, _, _) if cmpOps(op) => CMP
    case StringPred(_, _, _) | IsNull(_, _) => CMP
    case BinOp(op, _, _) if addOps(op) => ADD
    case BinOp(op, _, _) if mulOps(op) => MUL
    case BinOp("^", _, _) => POW
    case Neg(_) => UNARY
    case Prop(_, _) | Index(_, _) | Slice(_, _, _) | TypeCast(_, _)
       | MapProjection(_, _) => POST
    case _ => ATOM
  }

  private def identSafe(s: String): Boolean =
    s.nonEmpty && Character.isJavaIdentifierStart(s.head) && s.head != '$' &&
      s.forall(c => Character.isJavaIdentifierPart(c) && c != '$')

  private def bq(s: String): String =
    if (identSafe(s)) s else "`" + s.replace("`", "``") + "`"

  private def str(s: String): String = "'" + s.flatMap {
    case '\\' => "\\\\"
    case '\'' => "\\'"
    case '\n' => "\\n"
    case '\t' => "\\t"
    case '\r' => "\\r"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "'"

  private def lit(v: AgValue): String = v match {
    case AgInt(i) => i.toString // generator keeps these non-negative
    case AgFloat(d) => d.toString
    case AgNumeric(n) => n.toBigInt.toString
    case AgString(s) => str(s)
    case AgBool(b) => b.toString
    case AgNull => "null"
    case other => sys.error(s"unprintable literal $other")
  }

  /** Print `e`, parenthesizing when its precedence is below `min`. */
  private def p(e: Expr, min: Int): String = {
    val raw = e match {
      case Lit(v) => lit(v)
      case Param(n) => "$" + n
      case Var(n) => n
      case Prop(t, k) => s"${postfixTarget(t)}.${bq(k)}"
      case Index(t, i) => s"${postfixTarget(t)}[${p(i, 0)}]"
      case Slice(t, f, to) =>
        s"${postfixTarget(t)}[${f.map(p(_, 0)).getOrElse("")}..${to.map(p(_, 0)).getOrElse("")}]"
      case TypeCast(t, tp) => s"${postfixTarget(t)}::$tp"
      case MapProjection(t, items) =>
        postfixTarget(t) + " {" + items.map {
          case ProjProp(k) => "." + bq(k)
          case ProjAll => ".*"
          case ProjVar(n) => n
          case ProjKeyVal(k, v) => s"${bq(k)}: ${p(v, 0)}"
        }.mkString(", ") + "}"
      case Neg(x) => "-" + p(x, UNARY)
      case Not(x) => "NOT " + p(x, NOTP)
      case IsNull(x, negated) =>
        p(x, CMP + 1) + (if (negated) " IS NOT NULL" else " IS NULL")
      case StringPred(kind, l, r) =>
        val op = kind match {
          case "regex" => "=~"
          case "startsWith" => "STARTS WITH"
          case "endsWith" => "ENDS WITH"
          case "contains" => "CONTAINS"
        }
        s"${p(l, CMP + 1)} $op ${p(r, CMP + 1)}"
      case BinOp(op, l, r) if cmpOps(op) =>
        // comparison chains desugar in the parser: operands must be
        // parenthesized whenever they are comparison-level themselves
        s"${p(l, CMP + 1)} $op ${p(r, CMP + 1)}"
      case BinOp("^", l, r) => // right-associative
        s"${p(l, POW + 1)} ^ ${p(r, POW)}"
      case BinOp(op, l, r) =>
        val lvl = prec(e)
        s"${p(l, lvl)} $op ${p(r, lvl + 1)}"
      case FuncCall(n, args, distinct) =>
        n + "(" + (if (distinct) "DISTINCT " else "") +
          args.map(p(_, 0)).mkString(", ") + ")"
      case CountStar(_) => "count(*)"
      case ListLit(items) => "[" + items.map(p(_, 0)).mkString(", ") + "]"
      case MapLit(entries) => "{" + entries.map { case (k, v) =>
        val key = if (identSafe(k)) k else str(k)
        s"$key: ${p(v, 0)}"
      }.mkString(", ") + "}"
      case CaseExpr(operand, whens, otherwise) =>
        "CASE " + operand.map(o => p(o, 0) + " ").getOrElse("") +
          whens.map { case (c, v) => s"WHEN ${p(c, 0)} THEN ${p(v, 0)}" }
            .mkString(" ") +
          otherwise.map(o => s" ELSE ${p(o, 0)}").getOrElse("") + " END"
      case ListComprehension(v, list, where, proj) =>
        s"[$v IN ${p(list, 0)}" + where.map(w => s" WHERE ${p(w, 0)}").getOrElse("") +
          proj.map(x => s" | ${p(x, 0)}").getOrElse("") + "]"
      case PredicateFn(kind, v, list, where) =>
        s"$kind($v IN ${p(list, 0)} WHERE ${p(where, 0)})"
      case Reduce(acc, init, v, list, body) =>
        s"reduce($acc = ${p(init, 0)}, $v IN ${p(list, 0)} | ${p(body, 0)})"
      case other => sys.error(s"unprintable expr $other")
    }
    if (prec(e) < min) s"($raw)" else raw
  }

  /** Postfix targets bind at POST; numeric literals additionally need
    * parens (`5.k` would lex the dot into a trailing-dot float). */
  private def postfixTarget(t: Expr): String = t match {
    case Lit(AgInt(_)) | Lit(AgFloat(_)) | Lit(AgNumeric(_)) => s"(${p(t, 0)})"
    case _ => p(t, POST)
  }

  // ---- generators ----
  private val varName: Gen[String] = Gen.oneOf("v1", "v2", "a", "b", "foo")
  private val keyName: Gen[String] =
    Gen.oneOf("k1", "k2", "name", "k-x", "weird key", "a`b")
  private val funcName: Gen[String] =
    Gen.oneOf("abs", "size", "tolower", "coalesce", "length")
  private val castType: Gen[String] =
    Gen.oneOf("int", "float", "numeric", "text", "bool")

  private val genStr: Gen[String] =
    Gen.chooseNum(0, 6).flatMap(n => Gen.listOfN(n, Gen.frequency(
      8 -> Gen.alphaNumChar,
      2 -> Gen.oneOf(' ', '_', '\'', '"', '\\', '`', 'é', '\n', '\t'))).map(_.mkString))

  private val genLit: Gen[Expr] = Gen.frequency(
    3 -> Gen.chooseNum(0L, Long.MaxValue).map(i => Lit(AgInt(i))),
    2 -> Gen.chooseNum(0, 8000).map(n => Lit(AgFloat(n / 8.0))),
    1 -> Gen.const(Lit(AgNumeric(BigDecimal("98765432109876543210987654321")))),
    2 -> genStr.map(s => Lit(AgString(s))),
    1 -> Gen.oneOf(Lit(AgBool(true)), Lit(AgBool(false)), Lit(AgNull)))

  private val genAtomNoLit: Gen[Expr] = Gen.frequency(
    3 -> varName.map(Var(_)),
    1 -> Gen.oneOf("p1", "limit0").map(Param(_)),
    1 -> Gen.const(CountStar()))

  private def genExpr(depth: Int): Gen[Expr] =
    if (depth <= 0) Gen.frequency(3 -> genLit, 2 -> genAtomNoLit)
    else Gen.frequency(
      2 -> genLit,
      2 -> genAtomNoLit,
      3 -> (for {
        op <- Gen.oneOf((cmpOps ++ addOps ++ mulOps ++
          Set("AND", "OR", "XOR", "^")).toSeq)
        l <- genExpr(depth - 1); r <- genExpr(depth - 1)
      } yield BinOp(op, l, r)),
      1 -> genExpr(depth - 1).map(Neg(_)),
      1 -> genExpr(depth - 1).map(Not(_)),
      1 -> (for { e <- genExpr(depth - 1); n <- Gen.oneOf(true, false) }
        yield IsNull(e, n)),
      1 -> (for {
        k <- Gen.oneOf("regex", "startsWith", "endsWith", "contains")
        l <- genExpr(depth - 1); r <- genExpr(depth - 1)
      } yield StringPred(k, l, r)),
      1 -> (for { t <- genExpr(depth - 1); k <- keyName } yield Prop(t, k)),
      1 -> (for { t <- genExpr(depth - 1); i <- genExpr(depth - 1) }
        yield Index(t, i)),
      1 -> (for {
        t <- genExpr(depth - 1)
        f <- Gen.option(genExpr(depth - 1)); to <- Gen.option(genExpr(depth - 1))
      } yield Slice(t, f, to)),
      1 -> (for { t <- genExpr(depth - 1); tp <- castType } yield TypeCast(t, tp)),
      1 -> (for {
        n <- funcName; d <- Gen.oneOf(true, false)
        args <- Gen.chooseNum(0, 3).flatMap(k => Gen.listOfN(k, genExpr(depth - 1)))
      } yield FuncCall(n, args, d && args.nonEmpty)),
      1 -> Gen.chooseNum(0, 3)
        .flatMap(n => Gen.listOfN(n, genExpr(depth - 1))).map(ListLit(_)),
      1 -> Gen.chooseNum(0, 3).flatMap(n => Gen.listOfN(n,
          for { k <- keyName; v <- genExpr(depth - 1) } yield (k, v)))
        .map(kvs => MapLit(dedupKeys(kvs))),
      1 -> (for {
        operand <- Gen.option(genExpr(depth - 1))
        nw <- Gen.chooseNum(1, 2)
        whens <- Gen.listOfN(nw,
          for { c <- genExpr(depth - 1); v <- genExpr(depth - 1) } yield (c, v))
        els <- Gen.option(genExpr(depth - 1))
      } yield CaseExpr(operand, whens, els)),
      1 -> (for {
        v <- varName; list <- genExpr(depth - 1)
        w <- Gen.option(genExpr(depth - 1)); pr <- Gen.option(genExpr(depth - 1))
      } yield ListComprehension(v, list, w, pr)),
      1 -> (for {
        k <- Gen.oneOf("all", "any", "none", "single")
        v <- varName; list <- genExpr(depth - 1); w <- genExpr(depth - 1)
      } yield PredicateFn(k, v, list, w)),
      1 -> (for {
        acc <- Gen.const("acc"); init <- genExpr(depth - 1)
        v <- varName; list <- genExpr(depth - 1); body <- genExpr(depth - 1)
      } yield Reduce(acc, init, v, list, body)),
      1 -> (for {
        t <- genExpr(depth - 1)
        items <- Gen.chooseNum(1, 3).flatMap(n => Gen.listOfN(n, Gen.frequency[MapProjItem](
          2 -> keyName.map(ProjProp(_)),
          1 -> Gen.const(ProjAll),
          1 -> varName.map(ProjVar(_)),
          2 -> (for { k <- keyName; v <- genExpr(depth - 1) } yield ProjKeyVal(k, v)))))
      } yield MapProjection(t, items)))

  /** Map literals with duplicate keys keep the LAST entry in agtype;
    * keep generated keys unique so the AST round-trips structurally. */
  private def dedupKeys(kvs: Seq[(String, Expr)]): Seq[(String, Expr)] =
    kvs.groupBy(_._1).map(_._2.last).toSeq.sortBy(_._1)

  private def samples(n: Int, seed: Long): Seq[Expr] =
    (0 until n).map(i =>
      genExpr(4).pureApply(Gen.Parameters.default, Seed(seed + i)))

  test("parse(print(e)) == e for random expression trees (minimal parens)") {
    for (e <- samples(800, seed = 11L)) {
      val text = p(e, 0)
      val parsed =
        try Parser.parseExpression(text)
        catch { case ex: Throwable =>
          fail(s"parse failed on: $text\nAST: $e\n${ex.getMessage}") }
      assert(parsed === e, s"\ntext: $text")
    }
  }

  test("printing is stable: print(parse(print(e))) == print(e)") {
    for (e <- samples(200, seed = 23L)) {
      val text = p(e, 0)
      assert(p(Parser.parseExpression(text), 0) === text)
    }
  }
}
