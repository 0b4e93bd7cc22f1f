package graft.cypher

/** Cypher 9 abstract syntax. Shapes follow the openCypher grammar; the
  * inventory of expression nodes mirrors the reference's IR surface
  * (reference: okapi-ir/.../ir/api/expr/Expr.scala:86-1330) but is our own
  * definition, sized to what the planner consumes.
  */
object Ast {

  // ---------------------------------------------------------------- values
  sealed trait Expr

  case class Var(name: String) extends Expr
  case class Param(name: String) extends Expr
  case class IntLit(v: Long) extends Expr
  case class FloatLit(v: Double) extends Expr
  case class StringLit(v: String) extends Expr
  case class BoolLit(v: Boolean) extends Expr
  case object NullLit extends Expr
  case class ListLit(items: Seq[Expr]) extends Expr
  case class MapLit(items: Seq[(String, Expr)]) extends Expr

  /** `e.key` — property access (or struct-field access on maps). */
  case class Property(e: Expr, key: String) extends Expr
  /** `n:Label1:Label2` label predicate. */
  case class HasLabels(e: Expr, labels: Seq[String]) extends Expr
  /** `list[i]` */
  case class Index(e: Expr, idx: Expr) extends Expr
  /** `list[from..to]` — either bound may be absent. */
  case class Slice(e: Expr, from: Option[Expr], to: Option[Expr]) extends Expr

  // boolean
  case class Not(e: Expr) extends Expr
  case class And(l: Expr, r: Expr) extends Expr
  case class Or(l: Expr, r: Expr) extends Expr
  case class Xor(l: Expr, r: Expr) extends Expr

  // comparison
  case class Eq(l: Expr, r: Expr) extends Expr
  case class Neq(l: Expr, r: Expr) extends Expr
  case class Lt(l: Expr, r: Expr) extends Expr
  case class Lte(l: Expr, r: Expr) extends Expr
  case class Gt(l: Expr, r: Expr) extends Expr
  case class Gte(l: Expr, r: Expr) extends Expr
  case class IsNull(e: Expr) extends Expr
  case class IsNotNull(e: Expr) extends Expr
  case class In(l: Expr, list: Expr) extends Expr
  case class StartsWith(l: Expr, r: Expr) extends Expr
  case class EndsWith(l: Expr, r: Expr) extends Expr
  case class Contains(l: Expr, r: Expr) extends Expr
  case class RegexMatch(l: Expr, r: Expr) extends Expr

  // arithmetic
  case class Add(l: Expr, r: Expr) extends Expr
  case class Sub(l: Expr, r: Expr) extends Expr
  case class Mul(l: Expr, r: Expr) extends Expr
  case class Div(l: Expr, r: Expr) extends Expr
  case class Mod(l: Expr, r: Expr) extends Expr
  case class Pow(l: Expr, r: Expr) extends Expr
  case class Neg(e: Expr) extends Expr

  /** Function invocation (scalar or aggregating, resolved at compile). */
  case class Func(name: String, distinct: Boolean, args: Seq[Expr]) extends Expr
  case object CountStar extends Expr

  /** CASE — `operand` present for the simple form. */
  case class CaseExpr(operand: Option[Expr], alternatives: Seq[(Expr, Expr)],
      default: Option[Expr]) extends Expr

  // list predicates / comprehensions
  case class ListComprehension(variable: String, list: Expr,
      predicate: Option[Expr], projection: Option[Expr]) extends Expr
  case class Reduce(acc: String, init: Expr, variable: String, list: Expr,
      step: Expr) extends Expr
  /** quantifier ∈ {all, any, none, single} */
  case class Quantified(quantifier: String, variable: String, list: Expr,
      predicate: Expr) extends Expr

  /** `exists((n)-[:T]->(m))` / pattern predicate `WHERE (n)-->(m)` /
    * `EXISTS { MATCH … WHERE … }` — `where` carries the subquery filter. */
  case class PatternPredicate(pattern: PatternPart, negated: Boolean = false,
      where: Option[Expr] = None) extends Expr

  /** pattern comprehension `[(n)-[:R]->(m) WHERE p | expr]` — collects the
    * projection over every match of the pattern, per driving row. */
  case class PatternComprehension(pattern: PatternPart, where: Option[Expr],
      projection: Expr) extends Expr

  /** map projection `n {.prop, key: expr, var, .*}`. */
  sealed trait MapProjItem
  case object AllPropsItem extends MapProjItem
  case class PropItem(key: String) extends MapProjItem
  case class ExprItem(key: String, value: Expr) extends MapProjItem
  case class MapProjection(variable: String, items: Seq[MapProjItem])
      extends Expr

  // ---------------------------------------------------------------- pattern
  sealed trait Direction
  case object Outgoing extends Direction
  case object Incoming extends Direction
  case object Undirected extends Direction

  /** `copyOf`: CONSTRUCT-only `(v COPY OF src)` / `[v COPY OF r]` —
    * a NEW element (fresh id) copying the source's labels/type and
    * properties, unlike CLONE which carries the source id over. */
  case class NodePattern(variable: Option[String], labels: Seq[String],
      properties: Seq[(String, Expr)], copyOf: Option[String] = None)
  case class RelPattern(variable: Option[String], types: Seq[String],
      properties: Seq[(String, Expr)], direction: Direction,
      varLength: Option[(Int, Option[Int])], copyOf: Option[String] = None)

  /** shortestPath(...) / allShortestPaths(...) wrapper mode. */
  sealed trait ShortestMode
  case object ShortestOne extends ShortestMode
  case object ShortestAll extends ShortestMode

  /** A single `(a)-[r]->(b)-...` chain, optionally named `p = ...` and
    * optionally wrapped in shortestPath()/allShortestPaths(). */
  case class PatternPart(pathName: Option[String], start: NodePattern,
      chain: Seq[(RelPattern, NodePattern)],
      shortest: Option[ShortestMode] = None)

  case class Pattern(parts: Seq[PatternPart])

  // ---------------------------------------------------------------- clauses
  sealed trait Clause
  case class MatchClause(optional: Boolean, pattern: Pattern,
      where: Option[Expr]) extends Clause
  case class UnwindClause(expr: Expr, variable: String) extends Clause
  case class ReturnItem(expr: Expr, alias: Option[String], text: String)
  case class SortItem(expr: Expr, ascending: Boolean)
  case class WithClause(distinct: Boolean, items: Seq[ReturnItem],
      star: Boolean, orderBy: Seq[SortItem], skip: Option[Expr],
      limit: Option[Expr], where: Option[Expr]) extends Clause
  case class ReturnClause(distinct: Boolean, items: Seq[ReturnItem],
      star: Boolean, orderBy: Seq[SortItem], skip: Option[Expr],
      limit: Option[Expr]) extends Clause
  /** Reference to a catalog graph: by name, by view invocation
    * (`viewName(arg, ...)`), or — inside a view body — by parameter
    * (`$p`). Mirrors the reference's QualifiedGraphName + view machinery
    * (okapi-ir CypherStatement.scala:64-79). */
  sealed trait GraphRef
  case class GraphByName(name: String) extends GraphRef
  case class GraphParamRef(name: String) extends GraphRef
  /** View invocation: each positional argument is a graph reference
    * (reference grammar) or — extension — a VALUE expression (literal or
    * `$param`), threaded into the view body's parameter scope. */
  case class ViewInvocation(name: String,
      args: Seq[Either[GraphRef, Expr]]) extends GraphRef

  /** Cypher-10-style: `FROM GRAPH name` switches the working graph. */
  case class FromGraphClause(ref: GraphRef) extends Clause
  /** CONSTRUCT — multiple-graph extension (SURVEY §2.5).
    * `clones`: (sourceVar, alias) from `CLONE n [AS m]` (alias = source
    * when no AS). `sets`: (variable, propertyKey, value) from
    * `SET v.k = expr`. */
  case class ConstructClause(clones: Seq[(String, String)],
      news: Seq[PatternPart], onGraphs: Seq[String],
      sets: Seq[(String, String, Expr)] = Seq.empty,
      setLabels: Seq[(String, String)] = Seq.empty) extends Clause
  /** `RETURN GRAPH` — the query's result is the constructed graph. */
  case object ReturnGraphClause extends Clause

  // ---------------------------------------------------------------- query
  case class SingleQuery(clauses: Seq[Clause])
  /** unions: (query, all?) pairs folded left-to-right. */
  case class Query(first: SingleQuery, unions: Seq[(Boolean, SingleQuery)])

  // ------------------------------------------------------------ statements
  /** Top-level Cypher statement: a read/graph query or catalog DDL
    * (reference: okapi-ir/.../api/CypherStatement.scala — CreateGraph,
    * CreateView, DeleteGraph, DeleteView). */
  sealed trait Statement
  case class QueryStatement(query: Query) extends Statement
  /** `CATALOG CREATE GRAPH name { <graph query> }` */
  case class CreateGraphStatement(name: String, inner: Query) extends Statement
  /** `CATALOG CREATE VIEW name($p1, ...) { <graph query over $p1...> }` */
  case class CreateViewStatement(name: String, params: Seq[String],
      inner: Query) extends Statement
  case class DropGraphStatement(name: String) extends Statement
  case class DropViewStatement(name: String) extends Statement
}
