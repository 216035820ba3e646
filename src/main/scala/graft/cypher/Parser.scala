package graft.cypher

import graft.types._
import Ast._
import Lexer._

/** Recursive-descent parser for the openCypher surface of the reference
  * (grammar inventory: reference src/backend/parser/cypher_gram.y; we
  * re-derive the precedence/shape, not the implementation).
  */
final class Parser(tokens: Vector[Token], input: String) {
  private var pos = 0

  final case class ParseError(msg: String, at: Int)
      extends RuntimeException(s"$msg at offset $at: ...${input.drop(at).take(40)}")

  private def peek: Token = tokens(pos)
  private def next(): Token = { val t = tokens(pos); pos += 1; t }
  private def fail(msg: String): Nothing = throw ParseError(msg, peek.pos)

  private def isKw(t: Token, kw: String): Boolean = t match {
    case Ident(v, _) => v.equalsIgnoreCase(kw)
    case _ => false
  }
  private def atKw(kw: String): Boolean = isKw(peek, kw)
  private def tryKw(kw: String): Boolean = if (atKw(kw)) { pos += 1; true } else false
  private def expectKw(kw: String): Unit = if (!tryKw(kw)) fail(s"expected $kw")
  private def atSym(s: String): Boolean = peek match {
    case Sym(v, _) => v == s
    case _ => false
  }
  private def trySym(s: String): Boolean = if (atSym(s)) { pos += 1; true } else false
  private def expectSym(s: String): Unit = if (!trySym(s)) fail(s"expected '$s'")
  private def ident(): String = next() match {
    case Ident(v, _) => v
    case t => fail("expected identifier")
  }

  /** Require the full input to have been consumed (trailing ';' ok). */
  def expectEnd(): Unit = {
    trySym(";")
    peek match {
      case EOF(_) => ()
      case _ => fail("unexpected input after end of query")
    }
  }

  // ---- entry ------------------------------------------------------------
  def parseQuery(): Query = {
    if (tryKw("EXPLAIN")) {
      // both spellings: EXPLAIN [ANALYZE] [VERBOSE] and the option-list
      // form EXPLAIN (VERBOSE, COSTS OFF, ANALYZE …) — reference
      // grammar cypher_gram.y:376-422
      var analyze = false
      var verbose = false
      if (trySym("(")) {
        var done = false
        while (!done) {
          val opt = ident().toUpperCase
          if (opt == "ANALYZE") analyze = true
          if (opt == "VERBOSE") verbose = true
          // option values (OFF, ON, TRUE, FALSE, …) are consumed and
          // ignored — they tune display detail we don't replicate
          if (!atSym(",") && !atSym(")")) ident()
          if (!trySym(",")) { expectSym(")"); done = true }
        }
      } else {
        analyze = tryKw("ANALYZE")
        verbose = tryKw("VERBOSE")
      }
      return ExplainQuery(parseQuery(), analyze, verbose)
    }
    val first = parseSingleQuery()
    if (atKw("UNION")) {
      var parts = Vector(first)
      // mixed UNION / UNION ALL chains are legal and left-associative
      // (reference: cypher_union.sql:53-65 — 'A UNION ALL B UNION C'
      // dedupes the whole prefix, 'A UNION B UNION ALL C' appends)
      var alls = Vector.empty[Boolean]
      while (tryKw("UNION")) {
        alls :+= tryKw("ALL")
        parts :+= parseSingleQuery()
      }
      UnionQuery(parts, alls)
    } else first
  }

  private def clauseStart: Boolean =
    Seq("MATCH", "OPTIONAL", "RETURN", "WITH", "UNWIND", "CREATE", "SET",
      "REMOVE", "DELETE", "DETACH", "MERGE", "CALL").exists(atKw)

  private def parseSingleQuery(): SingleQuery = {
    val clauses = Vector.newBuilder[Clause]
    var done = false
    while (!done && clauseStart) {
      clauses += parseClause()
      peek match {
        case EOF(_) => done = true
        case _ if atKw("UNION") => done = true
        case _ => ()
      }
    }
    val cs = clauses.result()
    if (cs.isEmpty) fail("expected a clause")
    SingleQuery(cs)
  }

  private def parseClause(): Clause = {
    if (tryKw("OPTIONAL")) { expectKw("MATCH"); parseMatch(optional = true) }
    else if (tryKw("MATCH")) parseMatch(optional = false)
    else if (tryKw("RETURN")) parseReturn()
    else if (tryKw("WITH")) parseWith()
    else if (tryKw("UNWIND")) {
      val e = parseExpr()
      expectKw("AS")
      UnwindClause(e, ident())
    } else if (tryKw("CREATE")) CreateClause(parsePatternList())
    else if (tryKw("SET")) SetClause(parseSetItems())
    else if (tryKw("REMOVE")) {
      val items = Vector.newBuilder[SetItem]
      do {
        val t = parsePostfixExpr()
        items += SetItem(t, Lit(AgNull), "remove")
      } while (trySym(","))
      SetClause(items.result())
    } else if (tryKw("DETACH")) { expectKw("DELETE"); parseDelete(detach = true) }
    else if (tryKw("DELETE")) parseDelete(detach = false)
    else if (tryKw("CALL")) {
      if (trySym("{")) {
        val inner = parseSubqueryClauses()
        val branches = Vector.newBuilder[(Seq[Clause], Boolean)]
        while (tryKw("UNION")) {
          val all = tryKw("ALL")
          branches += ((parseSubqueryClauses(), all))
        }
        expectSym("}")
        return SubqueryCallClause(inner, branches.result())
      }
      var name = ident()
      while (trySym(".")) name = name + "." + ident()
      val args = Vector.newBuilder[Expr]
      if (trySym("(")) {
        if (!atSym(")")) { do args += parseExpr() while (trySym(",")) }
        expectSym(")")
      }
      val yields = Vector.newBuilder[(String, Option[String])]
      var where: Option[Expr] = None
      if (tryKw("YIELD")) {
        do {
          val c = ident()
          val alias = if (tryKw("AS")) Some(ident()) else None
          yields += ((c, alias))
        } while (trySym(","))
        if (tryKw("WHERE")) where = Some(parseExpr())
      }
      CallClause(name.toLowerCase, args.result(), yields.result(), where)
    } else if (tryKw("MERGE")) {
      val pat = parsePathPattern()
      var onCreate = Vector.empty[SetItem]
      var onMatch = Vector.empty[SetItem]
      while (atKw("ON")) {
        expectKw("ON")
        if (tryKw("CREATE")) { expectKw("SET"); onCreate ++= parseSetItems() }
        else if (tryKw("MATCH")) { expectKw("SET"); onMatch ++= parseSetItems() }
        else fail("expected CREATE or MATCH after ON")
      }
      MergeClause(pat, onCreate, onMatch)
    } else fail("expected clause")
  }

  /** Clause list for a brace-delimited subquery: CALL { … }, EXISTS { … },
    * COUNT { … }. A bare pattern start ('(' or a path variable) is sugar
    * for MATCH of that pattern. */
  private def parseSubqueryClauses(): Seq[Clause] = {
    if (atSym("(")) {
      val pats = parsePatternList()
      val where = if (tryKw("WHERE")) Some(parseExpr()) else None
      val head = MatchClause(pats, optional = false, where)
      val rest = Vector.newBuilder[Clause]
      while (clauseStart) rest += parseClause()
      head +: rest.result()
    } else {
      val clauses = Vector.newBuilder[Clause]
      while (clauseStart) clauses += parseClause()
      val cs = clauses.result()
      if (cs.isEmpty) fail("expected a clause in subquery")
      cs
    }
  }

  private def parseDelete(detach: Boolean): DeleteClause = {
    val es = Vector.newBuilder[Expr]
    do es += parseExpr() while (trySym(","))
    DeleteClause(es.result(), detach)
  }

  private def parseSetItems(): Seq[SetItem] = {
    val items = Vector.newBuilder[SetItem]
    do {
      val target = parsePostfixExpr()
      if (trySym("+=")) items += SetItem(target, parseExpr(), "+=")
      else if (trySym("=")) items += SetItem(target, parseExpr(), "=")
      else fail("expected = or += in SET")
    } while (trySym(","))
    items.result()
  }

  private def parseMatch(optional: Boolean): MatchClause = {
    val pats = parsePatternList()
    val where = if (tryKw("WHERE")) Some(parseExpr()) else None
    MatchClause(pats, optional, where)
  }

  private def parsePatternList(): Seq[PathPattern] = {
    val pats = Vector.newBuilder[PathPattern]
    do pats += parsePathPattern() while (trySym(","))
    pats.result()
  }

  private def parsePathPattern(): PathPattern = {
    // p = (...)  |  p = shortestpath((...)...)  |  (...)-[...]-(...)
    var variable: Option[String] = None
    peek match {
      case Ident(v, _) if !v.equalsIgnoreCase("shortestpath") &&
          !v.equalsIgnoreCase("allshortestpaths") =>
        // lookahead for "ident ="
        if (pos + 1 < tokens.length && isSymAt(pos + 1, "=")) {
          variable = Some(ident()); expectSym("=")
        }
      case _ => ()
    }
    var shortest: Option[String] = None
    peek match {
      case Ident(v, _) if v.equalsIgnoreCase("shortestpath") =>
        pos += 1; shortest = Some("shortestpath"); expectSym("(")
      case Ident(v, _) if v.equalsIgnoreCase("allshortestpaths") =>
        pos += 1; shortest = Some("allshortestpaths"); expectSym("(")
      case _ => ()
    }
    val head = parseNodePattern()
    val tail = Vector.newBuilder[(RelPattern, NodePattern)]
    while (atSym("-") || atSym("<-")) {
      val rel = parseRelPattern()
      val node = parseNodePattern()
      tail += ((rel, node))
    }
    if (shortest.isDefined) expectSym(")")
    PathPattern(variable, head, tail.result(), shortest)
  }

  private def isSymAt(p: Int, s: String): Boolean = tokens(p) match {
    case Sym(v, _) => v == s
    case _ => false
  }

  private def parseNodePattern(): NodePattern = {
    expectSym("(")
    var variable: Option[String] = None
    peek match {
      case Ident(v, _) => variable = Some(v); pos += 1
      case _ => ()
    }
    val labels = Vector.newBuilder[String]
    while (trySym(":")) labels += ident()
    val props = if (atSym("{")) Some(parseMapLit()) else None
    expectSym(")")
    NodePattern(variable, labels.result(), props)
  }

  private def parseRelPattern(): RelPattern = {
    // <-[..]-  -[..]->  -[..]-  (and bracket-less -- / --> / <--)
    var direction: Direction = DirBoth
    val leftArrow = trySym("<-")
    if (!leftArrow) expectSym("-")
    var variable: Option[String] = None
    var types = Vector.empty[String]
    var props: Option[MapLit] = None
    var varLength: Option[(Option[Int], Option[Int])] = None
    if (trySym("[")) {
      peek match {
        case Ident(v, _) => variable = Some(v); pos += 1
        case _ => ()
      }
      if (trySym(":")) {
        types :+= ident()
        while (trySym("|")) { trySym(":"); types :+= ident() }
      }
      if (trySym("*")) {
        var lo: Option[Int] = None
        var hi: Option[Int] = None
        peek match {
          case IntLit(v, _) => lo = Some(v.toInt); pos += 1
          case _ => ()
        }
        if (trySym("..")) {
          peek match {
            case IntLit(v, _) => hi = Some(v.toInt); pos += 1
            case _ => ()
          }
        } else hi = lo // *n means exactly n
        varLength = Some((lo, hi))
      }
      if (atSym("{")) props = Some(parseMapLit())
      expectSym("]")
    }
    val rightArrow = trySym("->")
    if (!rightArrow) expectSym("-")
    direction =
      if (leftArrow && rightArrow) DirBoth
      else if (leftArrow) DirIn
      else if (rightArrow) DirOut
      else DirBoth
    RelPattern(variable, types, props, direction, varLength)
  }

  private def parseMapLit(): MapLit = {
    expectSym("{")
    val entries = Vector.newBuilder[(String, Expr)]
    if (!atSym("}")) {
      do {
        val k = next() match {
          case Ident(v, _) => v
          case StrLit(v, _) => v
          case _ => fail("expected map key")
        }
        expectSym(":")
        entries += ((k, parseExpr()))
      } while (trySym(","))
    }
    expectSym("}")
    MapLit(entries.result())
  }

  private def parseReturnItems(): (Seq[ReturnItem], Boolean, Boolean) = {
    val distinct = tryKw("DISTINCT")
    var star = false
    val items = Vector.newBuilder[ReturnItem]
    if (trySym("*")) { star = true; if (trySym(",")) () else return (items.result(), distinct, star) }
    do {
      val e = parseExpr()
      val alias = if (tryKw("AS")) Some(ident()) else None
      items += ReturnItem(e, alias)
    } while (trySym(","))
    (items.result(), distinct, star)
  }

  private def parseOrderSkipLimit(): (Seq[SortItem], Option[Expr], Option[Expr]) = {
    var orderBy = Vector.empty[SortItem]
    if (tryKw("ORDER")) {
      expectKw("BY")
      do {
        val e = parseExpr()
        val asc =
          if (tryKw("DESC") || tryKw("DESCENDING")) false
          else { tryKw("ASC"); tryKw("ASCENDING"); true }
        orderBy :+= SortItem(e, asc)
      } while (trySym(","))
    }
    val skip = if (tryKw("SKIP")) Some(parseExpr()) else None
    val limit = if (tryKw("LIMIT")) Some(parseExpr()) else None
    (orderBy, skip, limit)
  }

  private def parseReturn(): ReturnClause = {
    val (items, distinct, star) = parseReturnItems()
    val (orderBy, skip, limit) = parseOrderSkipLimit()
    ReturnClause(items, distinct, orderBy, skip, limit, star)
  }

  private def parseWith(): WithClause = {
    val (items, distinct, star) = parseReturnItems()
    val (orderBy, skip, limit) = parseOrderSkipLimit()
    val where = if (tryKw("WHERE")) Some(parseExpr()) else None
    WithClause(items, distinct, orderBy, skip, limit, where, star)
  }

  // ---- expressions (precedence climbing) --------------------------------
  def parseExpr(): Expr = parseOr()

  private def parseOr(): Expr = {
    var e = parseXor()
    while (tryKw("OR")) e = BinOp("OR", e, parseXor())
    e
  }
  private def parseXor(): Expr = {
    var e = parseAnd()
    while (tryKw("XOR")) e = BinOp("XOR", e, parseAnd())
    e
  }
  private def parseAnd(): Expr = {
    var e = parseNot()
    while (tryKw("AND")) e = BinOp("AND", e, parseNot())
    e
  }
  private def parseNot(): Expr =
    if (tryKw("NOT")) Not(parseNot()) else parseComparison()

  /** Consume one ordering/equality comparison operator if present.
    * Multi-char symbols first so `<` does not shadow `<=`/`<>`. */
  private def tryCmpOp(): Option[String] =
    if (trySym("<>")) Some("<>")
    else if (trySym("<=")) Some("<=")
    else if (trySym(">=")) Some(">=")
    else if (trySym("=")) Some("=")
    else if (trySym("<")) Some("<")
    else if (trySym(">")) Some(">")
    else None

  private def parseComparison(): Expr = {
    var e = parseAdditive()
    var done = false
    while (!done) {
      tryCmpOp() match {
        case Some(op0) =>
          // chained comparisons (reference: cypher_gram.y chained
          // cypher_comparison_aexpr; regress expr.sql:319-368):
          // `a < b <= c` means (a < b) AND (b <= c), with the middle
          // operand shared. Parentheses break the chain — `(1 = 1) = 1`
          // nests inside parsePrimary and compares cross-type instead.
          var prev = parseAdditive()
          var acc: Expr = BinOp(op0, e, prev)
          var more = tryCmpOp()
          while (more.isDefined) {
            val nxt = parseAdditive()
            acc = BinOp("AND", acc, BinOp(more.get, prev, nxt))
            prev = nxt
            more = tryCmpOp()
          }
          e = acc
        case None =>
      if (trySym("<->")) e = BinOp("<->", e, parseAdditive())
      else if (trySym("<#>")) e = BinOp("<#>", e, parseAdditive())
      else if (trySym("<=>")) e = BinOp("<=>", e, parseAdditive())
      else if (trySym("<+>")) e = BinOp("<+>", e, parseAdditive())
      else if (trySym("@>>")) e = BinOp("@>>", e, parseAdditive())
      else if (trySym("<<@")) e = BinOp("<<@", e, parseAdditive())
      else if (trySym("@>")) e = BinOp("@>", e, parseAdditive())
      else if (trySym("<@")) e = BinOp("<@", e, parseAdditive())
      else if (trySym("?|")) e = BinOp("?|", e, parseAdditive())
      else if (trySym("?&")) e = BinOp("?&", e, parseAdditive())
      else if (trySym("?")) e = BinOp("?", e, parseAdditive())
      else if (trySym("=~")) e = StringPred("regex", e, parseAdditive())
      else if (atKw("STARTS")) { pos += 1; expectKw("WITH"); e = StringPred("startsWith", e, parseAdditive()) }
      else if (atKw("ENDS")) { pos += 1; expectKw("WITH"); e = StringPred("endsWith", e, parseAdditive()) }
      else if (atKw("CONTAINS")) { pos += 1; e = StringPred("contains", e, parseAdditive()) }
      else if (atKw("IN")) { pos += 1; e = BinOp("IN", e, parseAdditive()) }
      else if (atKw("IS")) {
        pos += 1
        val negated = tryKw("NOT")
        expectKw("NULL")
        e = IsNull(e, negated)
      } else done = true
      }
    }
    e
  }

  private def parseAdditive(): Expr = {
    var e = parseMultiplicative()
    var done = false
    while (!done) {
      if (trySym("+")) e = BinOp("+", e, parseMultiplicative())
      else if (trySym("-")) e = BinOp("-", e, parseMultiplicative())
      else if (trySym("||")) e = BinOp("||", e, parseMultiplicative())
      else if (trySym("#>>")) e = BinOp("#>>", e, parseMultiplicative())
      else if (trySym("#>")) e = BinOp("#>", e, parseMultiplicative())
      // jsonb-style accessors surfaced as Cypher operators (the
      // reference keeps them SQL-side; see ExprCompiler "->" case).
      // Pattern arrows never reach here: relationship patterns are
      // consumed by parseRelPattern / the pattern-expression lookahead
      // before additive parsing sees their tokens.
      else if (trySym("->>")) e = BinOp("->>", e, parseMultiplicative())
      else if (trySym("->")) e = BinOp("->", e, parseMultiplicative())
      else done = true
    }
    e
  }
  private def parseMultiplicative(): Expr = {
    var e = parsePower()
    var done = false
    while (!done) {
      if (trySym("*")) e = BinOp("*", e, parsePower())
      else if (trySym("/")) e = BinOp("/", e, parsePower())
      else if (trySym("%")) e = BinOp("%", e, parsePower())
      else done = true
    }
    e
  }
  private def parsePower(): Expr = {
    val base = parseUnary()
    if (trySym("^")) BinOp("^", base, parsePower()) else base
  }
  private def parseUnary(): Expr =
    if (trySym("-")) Neg(parseUnary())
    else if (trySym("+")) parseUnary()
    else parsePostfixExpr()

  private[cypher] def parsePostfixExpr(): Expr = {
    var e = parseAtom()
    var done = false
    while (!done) {
      if (trySym(".")) {
        val key = ident()
        // schema-qualified call: pg_catalog.sqrt(x) / ag_catalog.age_f(x)
        // resolve to the bare function (reference resolves through the
        // ag_catalog search_path, cypher_expr.c:2007)
        e = e match {
          case Var(q) if atSym("(") &&
              (q.equalsIgnoreCase("pg_catalog") || q.equalsIgnoreCase("ag_catalog")) =>
            expectSym("(")
            val distinct = tryKw("DISTINCT")
            val args = Vector.newBuilder[Expr]
            if (!atSym(")")) { do args += parseExpr() while (trySym(",")) }
            expectSym(")")
            FuncCall(key.toLowerCase.stripPrefix("age_"), args.result(), distinct)
          case _ => Prop(e, key)
        }
      }
      else if (trySym("[")) {
        // index or slice
        if (trySym("..")) {
          val to = if (atSym("]")) None else Some(parseExpr())
          expectSym("]")
          e = Slice(e, None, to)
        } else {
          val idx = parseExpr()
          if (trySym("..")) {
            val to = if (atSym("]")) None else Some(parseExpr())
            expectSym("]")
            e = Slice(e, Some(idx), to)
          } else { expectSym("]"); e = Index(e, idx) }
        }
      } else if (atSym(":") && peekAheadIsTypeCast) {
        pos += 1 // ':'
        pos += 1 // ':' (the "::" is lexed as two ':' syms)
        e = TypeCast(e, ident())
      } else if (atSym("{")) e = parseMapProjection(e)
      else done = true
    }
    e
  }

  private def peekAheadIsTypeCast: Boolean =
    isSymAt(pos, ":") && isSymAt(pos + 1, ":")

  /** `m {.k, .*, v, k: e}` — postfix map projection. */
  private def parseMapProjection(target: Expr): Expr = {
    expectSym("{")
    val items = Vector.newBuilder[MapProjItem]
    if (!atSym("}")) {
      do {
        if (trySym(".")) {
          if (trySym("*")) items += ProjAll
          else items += ProjProp(ident())
        } else {
          val key = next() match {
            case Ident(v, _) => v
            case StrLit(v, _) => v
            case _ => fail("expected projection key")
          }
          if (trySym(":")) items += ProjKeyVal(key, parseExpr())
          else items += ProjVar(key)
        }
      } while (trySym(","))
    }
    expectSym("}")
    MapProjection(target, items.result())
  }

  private def parseAtom(): Expr = {
    peek match {
      case IntLit(v, _) => pos += 1; Lit(AgInt(v))
      case FloatLit(v, _) => pos += 1; Lit(AgFloat(v))
      case NumericLit(v, _) => pos += 1; Lit(AgNumeric(v))
      case StrLit(v, _) => pos += 1; Lit(AgString(v))
      case Sym("$", _) => pos += 1; Param(ident())
      case Sym("(", _) =>
        // bare pattern expression `(a)-[:T]->(b)` (boolean in predicate
        // position — reference: regress/sql/pattern_expression.sql) vs
        // parenthesized expression; backtrack on failure
        val save = pos
        val patOpt =
          try {
            val pat = parsePathPattern()
            if (pat.tail.nonEmpty) Some(pat) else { pos = save; None }
          } catch { case _: ParseError => pos = save; None }
        patOpt match {
          case Some(pat) => ExistsPattern(pat)
          case None => pos += 1; val e = parseExpr(); expectSym(")"); e
        }
      case Sym("[", _) =>
        pos += 1
        // list literal or comprehension [x IN list WHERE p | e]
        if (isComprehensionStart) {
          val v = ident(); expectKw("IN")
          val list = parseExpr()
          val where = if (tryKw("WHERE")) Some(parseExpr()) else None
          val proj = if (trySym("|")) Some(parseExpr()) else None
          expectSym("]")
          ListComprehension(v, list, where, proj)
        } else {
          val items = Vector.newBuilder[Expr]
          if (!atSym("]")) { do items += parseExpr() while (trySym(",")) }
          expectSym("]")
          ListLit(items.result())
        }
      case Sym("{", _) => parseMapLit()
      case Ident(v, _) if v.equalsIgnoreCase("CASE") => parseCase()
      case Ident(v, _) if v.equalsIgnoreCase("NOT") => pos += 1; Not(parseComparison())
      case Ident(v, _) if v.equalsIgnoreCase("true") => pos += 1; Lit(AgBool(true))
      case Ident(v, _) if v.equalsIgnoreCase("false") => pos += 1; Lit(AgBool(false))
      case Ident(v, _) if v.equalsIgnoreCase("null") => pos += 1; Lit(AgNull)
      case Ident(v, _) if v.equalsIgnoreCase("EXISTS") =>
        pos += 1
        if (trySym("{")) { // EXISTS { MATCH ... } | EXISTS { (n)-[]->(m) }
          val cs = parseSubqueryClauses(); expectSym("}"); ExistsSubquery(cs)
        } else {
          expectSym("(")
          if (atSym("(")) { // EXISTS((n)-[]->())
            val pat = parsePathPattern(); expectSym(")"); ExistsPattern(pat)
          } else { val e = parseExpr(); expectSym(")"); FuncCall("exists", Seq(e), distinct = false) }
        }
      case Ident(v, _) if v.equalsIgnoreCase("COUNT") && isSymAt(pos + 1, "{") =>
        pos += 2 // COUNT {
        val cs = parseSubqueryClauses(); expectSym("}"); CountSubquery(cs)
      case Ident(v, _) =>
        // function call vs variable
        if (isSymAt(pos + 1, "(")) {
          pos += 2 // ident + '('
          if (v.equalsIgnoreCase("count") && trySym("*")) {
            expectSym(")"); CountStar()
          } else if (v.equalsIgnoreCase("reduce")) {
            val acc = ident(); expectSym("=")
            val init = parseExpr(); expectSym(",")
            val x = ident(); expectKw("IN")
            val list = parseExpr(); expectSym("|")
            val body = parseExpr(); expectSym(")")
            Reduce(acc, init, x, list, body)
          } else if (Seq("all", "any", "none", "single").exists(v.equalsIgnoreCase)) {
            val x = ident(); expectKw("IN")
            val list = parseExpr(); expectKw("WHERE")
            val p = parseExpr(); expectSym(")")
            PredicateFn(v.toLowerCase, x, list, p)
          } else {
            val distinct = tryKw("DISTINCT")
            val args = Vector.newBuilder[Expr]
            if (!atSym(")")) { do args += parseExpr() while (trySym(",")) }
            expectSym(")")
            FuncCall(v.toLowerCase, args.result(), distinct)
          }
        } else { pos += 1; Var(v) }
      case t => fail(s"unexpected token $t")
    }
  }

  private def isComprehensionStart: Boolean = tokens(pos) match {
    case Ident(_, _) => tokens(pos + 1) match {
      case Ident(k, _) => k.equalsIgnoreCase("IN")
      case _ => false
    }
    case _ => false
  }

  private def parseCase(): Expr = {
    expectKw("CASE")
    val operand = if (!atKw("WHEN")) Some(parseExpr()) else None
    val whens = Vector.newBuilder[(Expr, Expr)]
    while (tryKw("WHEN")) {
      val c = parseExpr(); expectKw("THEN")
      whens += ((c, parseExpr()))
    }
    val otherwise = if (tryKw("ELSE")) Some(parseExpr()) else None
    expectKw("END")
    CaseExpr(operand, whens.result(), otherwise)
  }
}

object Parser {
  def parse(query: String): Query = {
    val toks = Lexer.tokenize(query)
    val p = new Parser(toks, query)
    val q = p.parseQuery()
    // a complete parse must consume every token (optional trailing ';'):
    // otherwise 'RETURN 1 x y' silently drops the garbage tail instead
    // of erroring like the reference grammar
    p.expectEnd()
    q
  }
  def parseExpression(e: String): Expr = {
    val toks = Lexer.tokenize(e)
    val p = new Parser(toks, e)
    val x = p.parseExpr()
    p.expectEnd()
    x
  }
}
