package graft.cypher

import graft.types.AgValue

/** Clause/expression AST — the analogue of the reference's parse nodes
  * (reference: src/include/nodes/cypher_nodes.h:78-316). Clauses chain
  * left-to-right, each consuming the previous one's rows — exactly a
  * linear pipeline of DataFrame transformations (SURVEY §2.1).
  */
object Ast {

  // ---- expressions ------------------------------------------------------
  sealed trait Expr
  final case class Lit(v: AgValue) extends Expr
  final case class Param(name: String) extends Expr
  final case class Var(name: String) extends Expr
  final case class Prop(target: Expr, key: String) extends Expr
  /** Binary op: + - * / % ^ = <> < <= > >= AND OR XOR IN */
  final case class BinOp(op: String, lhs: Expr, rhs: Expr) extends Expr
  final case class Neg(e: Expr) extends Expr
  final case class Not(e: Expr) extends Expr
  final case class IsNull(e: Expr, negated: Boolean) extends Expr
  /** STARTS WITH / ENDS WITH / CONTAINS / =~ */
  final case class StringPred(kind: String, lhs: Expr, rhs: Expr) extends Expr
  final case class FuncCall(name: String, args: Seq[Expr], distinct: Boolean) extends Expr
  final case class CountStar(distinct: Boolean = false) extends Expr
  final case class ListLit(items: Seq[Expr]) extends Expr
  final case class MapLit(entries: Seq[(String, Expr)]) extends Expr
  final case class Index(target: Expr, idx: Expr) extends Expr
  final case class Slice(target: Expr, from: Option[Expr], to: Option[Expr]) extends Expr
  final case class CaseExpr(
      operand: Option[Expr],
      whens: Seq[(Expr, Expr)],
      otherwise: Option[Expr]) extends Expr
  /** [x IN list WHERE pred | proj] */
  final case class ListComprehension(
      variable: String, list: Expr, where: Option[Expr], proj: Option[Expr]) extends Expr
  /** all/any/none/single(x IN list WHERE pred) */
  final case class PredicateFn(kind: String, variable: String, list: Expr, where: Expr)
      extends Expr
  /** reduce(acc = init, x IN list | body) */
  final case class Reduce(acc: String, init: Expr, variable: String, list: Expr, body: Expr)
      extends Expr
  /** Map projection `m {.k, .*, v, k: e}` (reference:
    * cypher_map_projection, cypher_nodes.h:214-292; transform
    * cypher_expr.c:902-1016). Later entries override earlier ones. */
  sealed trait MapProjItem
  final case class ProjProp(key: String) extends MapProjItem // .k
  case object ProjAll extends MapProjItem // .*
  final case class ProjVar(name: String) extends MapProjItem // v (k=v=name)
  final case class ProjKeyVal(key: String, value: Expr) extends MapProjItem // k: e
  final case class MapProjection(target: Expr, items: Seq[MapProjItem]) extends Expr

  /** EXISTS { pattern } / EXISTS(prop) handled as FuncCall; pattern form: */
  final case class ExistsPattern(pattern: PathPattern) extends Expr
  /** EXISTS { MATCH ... [WHERE ...] } — full subquery form (reference:
    * transform_cypher_sub_query, cypher_clause.c:4389). */
  final case class ExistsSubquery(clauses: Seq[Clause]) extends Expr
  /** COUNT { MATCH ... } — scalar count subquery (cypher_gram.y:1977-2030). */
  final case class CountSubquery(clauses: Seq[Clause]) extends Expr
  final case class TypeCast(e: Expr, tpe: String) extends Expr

  // ---- patterns ---------------------------------------------------------
  sealed trait Direction
  case object DirOut extends Direction // -[]->
  case object DirIn extends Direction // <-[]-
  case object DirBoth extends Direction // -[]-

  final case class NodePattern(
      variable: Option[String],
      labels: Seq[String],
      props: Option[MapLit])

  final case class RelPattern(
      variable: Option[String],
      types: Seq[String],
      props: Option[MapLit],
      direction: Direction,
      varLength: Option[(Option[Int], Option[Int])]) // *min..max

  final case class PathPattern(
      variable: Option[String],
      head: NodePattern,
      tail: Seq[(RelPattern, NodePattern)],
      shortest: Option[String] = None) // "shortestpath" | "allshortestpaths"

  // ---- clauses ----------------------------------------------------------
  sealed trait Clause
  final case class MatchClause(
      patterns: Seq[PathPattern],
      optional: Boolean,
      where: Option[Expr]) extends Clause
  final case class ReturnItem(expr: Expr, alias: Option[String])
  final case class SortItem(expr: Expr, ascending: Boolean)
  final case class WithClause(
      items: Seq[ReturnItem],
      distinct: Boolean,
      orderBy: Seq[SortItem],
      skip: Option[Expr],
      limit: Option[Expr],
      where: Option[Expr],
      star: Boolean) extends Clause
  final case class ReturnClause(
      items: Seq[ReturnItem],
      distinct: Boolean,
      orderBy: Seq[SortItem],
      skip: Option[Expr],
      limit: Option[Expr],
      star: Boolean) extends Clause
  final case class UnwindClause(list: Expr, alias: String) extends Clause
  final case class CreateClause(patterns: Seq[PathPattern]) extends Clause
  final case class SetItem(target: Expr, value: Expr, op: String) // "=", "+=", "remove"
  final case class SetClause(items: Seq[SetItem]) extends Clause
  final case class DeleteClause(exprs: Seq[Expr], detach: Boolean) extends Clause
  final case class MergeClause(
      pattern: PathPattern,
      onCreate: Seq[SetItem],
      onMatch: Seq[SetItem]) extends Clause

  final case class CallClause(
      name: String,
      args: Seq[Expr],
      yields: Seq[(String, Option[String])], // (column, alias)
      where: Option[Expr]) extends Clause
  /** CALL { subquery } — correlated per-row subquery (reference:
    * subquery_stmt grammar, cypher_gram.y:656-726). */
  /** CALL { A [UNION [ALL] B]* }: `branches` carries the 2nd..nth
    * union arms with their ALL flags (reference: subquery_stmt,
    * cypher_gram.y:656-726 allows a full UNION tree in the braces). */
  final case class SubqueryCallClause(clauses: Seq[Clause],
      branches: Seq[(Seq[Clause], Boolean)] = Nil) extends Clause

  /** Top-down expression transform: `f` returning Some(x) replaces the
    * node (no further descent); None descends into children. Subquery
    * nodes are opaque (their clauses are not walked). */
  def transformExpr(e: Expr)(f: Expr => Option[Expr]): Expr = f(e).getOrElse(e match {
    case BinOp(op, l, r) => BinOp(op, transformExpr(l)(f), transformExpr(r)(f))
    case Neg(x) => Neg(transformExpr(x)(f))
    case Not(x) => Not(transformExpr(x)(f))
    case IsNull(x, n) => IsNull(transformExpr(x)(f), n)
    case StringPred(k, l, r) => StringPred(k, transformExpr(l)(f), transformExpr(r)(f))
    case FuncCall(n, args, d) => FuncCall(n, args.map(transformExpr(_)(f)), d)
    case Prop(t, k) => Prop(transformExpr(t)(f), k)
    case Index(t, i) => Index(transformExpr(t)(f), transformExpr(i)(f))
    case Slice(t, a, b) =>
      Slice(transformExpr(t)(f), a.map(transformExpr(_)(f)), b.map(transformExpr(_)(f)))
    case CaseExpr(op, whens, o) => CaseExpr(op.map(transformExpr(_)(f)),
      whens.map { case (c, v) => (transformExpr(c)(f), transformExpr(v)(f)) },
      o.map(transformExpr(_)(f)))
    case ListLit(items) => ListLit(items.map(transformExpr(_)(f)))
    case MapLit(es) => MapLit(es.map { case (k, v) => (k, transformExpr(v)(f)) })
    case ListComprehension(v, l, w, p) => ListComprehension(v, transformExpr(l)(f),
      w.map(transformExpr(_)(f)), p.map(transformExpr(_)(f)))
    case PredicateFn(k, v, l, w) =>
      PredicateFn(k, v, transformExpr(l)(f), transformExpr(w)(f))
    case Reduce(a, i, v, l, b) =>
      Reduce(a, transformExpr(i)(f), v, transformExpr(l)(f), transformExpr(b)(f))
    case TypeCast(x, t) => TypeCast(transformExpr(x)(f), t)
    case MapProjection(t, items) => MapProjection(transformExpr(t)(f), items.map {
      case ProjKeyVal(k, v) => ProjKeyVal(k, transformExpr(v)(f))
      case other => other
    })
    case other => other
  })

  // ---- query ------------------------------------------------------------
  sealed trait Query
  final case class SingleQuery(clauses: Seq[Clause]) extends Query
  /** `alls(i)` is the connector between parts(i) and parts(i+1):
    * true = UNION ALL, false = UNION (distinct). Mixed chains apply
    * left-associatively (reference: cypher_union.sql:53-65). */
  final case class UnionQuery(parts: Seq[SingleQuery], alls: Seq[Boolean]) extends Query
  /** EXPLAIN [ANALYZE] [VERBOSE] query — plan display, optionally with
    * executed per-operator metrics (reference: cypher_gram.y:376-422,
    * build_explain_query cypher_analyze.c:280). */
  final case class ExplainQuery(inner: Query, analyze: Boolean = false,
      verbose: Boolean = false) extends Query
}
