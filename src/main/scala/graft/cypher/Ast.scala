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
  /** EXISTS { pattern } / EXISTS(prop) handled as FuncCall; pattern form: */
  final case class ExistsPattern(pattern: PathPattern) extends Expr
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

  // ---- query ------------------------------------------------------------
  sealed trait Query
  final case class SingleQuery(clauses: Seq[Clause]) extends Query
  final case class UnionQuery(parts: Seq[SingleQuery], all: Boolean) extends Query
  /** EXPLAIN [query] — plan display (reference: cypher_gram.y:376-422). */
  final case class ExplainQuery(inner: Query) extends Query
}
