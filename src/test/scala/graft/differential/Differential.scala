package graft.differential

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Randomized differential testing harness (author-blind bug hunting).
  *
  * Generates random small property graphs plus random queries from a
  * constrained Cypher grammar as a generator-owned AST, renders the query
  * text for the engine, and evaluates the SAME AST directly with a naive
  * row-at-a-time interpreter over the in-memory graph model — two
  * independent execution paths whose results must agree. Precedent: the
  * reference's value/type generators
  * (okapi-api/src/test/scala/org/opencypher/okapi/api/value/GenCypherValue.scala,
  * okapi-api/.../types/TypeLawsTest.scala), extended from value generation
  * to full-query differential execution.
  *
  * Grammar surface: MATCH / OPTIONAL MATCH chains (multi-chain clauses,
  * node-var reuse, inline label + property predicates, all three
  * directions, var-length hops incl. zero-length), WITH pipelines
  * (pass-through entities, projections, mid-query aggregation, DISTINCT,
  * WHERE-after-WITH), UNWIND, ternary-logic WHERE trees (AND/OR/XOR/NOT,
  * IS [NOT] NULL, IN lists with nulls, label predicates, cross-family and
  * null-literal comparisons), RETURN with DISTINCT / grouped aggregates
  * (count/sum/avg/min/max/collect ± DISTINCT) / ORDER BY / SKIP / LIMIT.
  *
  * Determinism-by-construction decisions:
  *  - Double property values are dyadic rationals (n/2 with n ≤ 6) so every
  *    sum/avg either engine computes is exact in IEEE double → string-exact
  *    comparison, no epsilon.
  *  - Every node/rel carries a unique `uid`, and whenever SKIP/LIMIT is
  *    generated the ORDER BY covers ALL returned aliases, so any tie group
  *    holds identical rows and every cut yields the same multiset.
  *  - collect() output order is unspecified → those aliases compare as
  *    multisets (elements sorted by canonical rendering on both sides).
  *  - Property keys are type-stable corpus-wide (k,w,uid: integer; s:
  *    string; f: double; b: boolean) so grouping/ordering never hits the
  *    deliberately-divergent cross-family global sort corners; cross-family
  *    COMPARISONS are still generated (small p) because `=`/`<>` have
  *    defined Cypher semantics (false/true) across families.
  */
object Model {

  final case class MNode(id: Long, labels: Set[String], props: Map[String, Any])
  final case class MRel(id: Long, src: Long, dst: Long, typ: String,
      props: Map[String, Any])

  final case class MGraph(nodes: Vector[MNode], rels: Vector[MRel]) {
    // by-id lookup (NOT positional): a CONSTRUCTed subgraph keeps the
    // original ids but not the original positions
    private lazy val byId: Map[Long, MNode] = nodes.map(n => n.id -> n).toMap
    def node(id: Long): MNode = byId(id)
    def toCreate: String = {
      val sb = new StringBuilder
      nodes.foreach { n =>
        val lbl = n.labels.toSeq.sorted.map(":" + _).mkString
        sb ++= s"CREATE (v${n.id}$lbl ${renderPropMap(n.props)})\n"
      }
      rels.foreach { r =>
        sb ++= s"CREATE (v${r.src})-[:${r.typ} ${renderPropMap(r.props)}]->(v${r.dst})\n"
      }
      sb.toString
    }
  }

  def renderLit(v: Any): String = v match {
    case null => "null"
    case l: Long => l.toString
    case d: Double => d.toString // dyadic values round-trip exactly
    case s: String => s"'$s'" // corpus strings are [a-z]+, no escaping
    case b: Boolean => b.toString
    case d: java.time.LocalDate => s"date('$d')" // ISO round-trips exactly
    case z: MZdt => s"datetime('${z.renderIso}')"
    case p: MPoint =>
      s"point({x: ${p.x}, y: ${p.y}, crs: '${p.crs}'})"
  }

  def renderPropMap(m: Map[String, Any]): String =
    m.toSeq.sortBy(_._1).map { case (k, v) => s"$k: ${renderLit(v)}" }
      .mkString("{", ", ", "}")

  def renderNodeP(np: NodeP, showVar: Boolean): String = {
    val v = if (showVar) np.v else ""
    val lbl = np.label.map(":" + _).getOrElse("")
    val pm = if (np.propEq.isEmpty) "" else " " + renderPropMap(np.propEq)
    s"($v$lbl$pm)"
  }

  def renderRelP(rp: RelP, name: String): String = {
    val typ = rp.typ.map(":" + _).getOrElse("")
    val vl = rp.varLen.map { case (lo, hi) => s"*$lo..$hi" }.getOrElse("")
    val inner = s"[$name$typ$vl]"
    rp.dir match {
      case Out => s"-$inner->"
      case In => s"<-$inner-"
      case Und => s"-$inner-"
    }
  }

  // ------------------------------------------------------------ query AST
  sealed trait Dir
  case object Out extends Dir
  case object In extends Dir
  case object Und extends Dir

  final case class NodeP(v: String, label: Option[String],
      propEq: Map[String, Any])
  final case class RelP(v: String, typ: Option[String], dir: Dir,
      varLen: Option[(Int, Int)] = None)
  final case class Chain(first: NodeP, hops: List[(RelP, NodeP)])
  /** pathVar (single-chain clauses only) names the whole pattern:
    * `MATCH p = (...)-[...]->(...)`; only length(p) consumes it
    */
  final case class MatchC(chains: List[Chain], optional: Boolean,
      where: Option[BE], pathVar: Option[String] = None)

  sealed trait VE
  final case class PropE(v: String, key: String) extends VE
  final case class VarE(v: String, fam: Char) extends VE // projected scalar
  final case class LitE(value: Any) extends VE
  final case class ArithE(op: String, l: VE, r: VE) extends VE
  final case class FnE(fn: String, v: String) extends VE // labels | type
  final case class SizeE(v: String) extends VE // size(varLengthRelList)
  /** searched CASE; all branch values share one type family */
  final case class CaseE(whens: List[(BE, VE)], els: Option[VE]) extends VE
  final case class CoalesceE(args: List[VE]) extends VE
  /** string fns: toUpper | reverse | trim | strSize | left | right |
    * substring | replace — extra args are literals
    */
  final case class StrFnE(fn: String, arg: VE, extra: List[Any]) extends VE
  final case class NumFnE(fn: String, arg: VE) extends VE // abs | sign
  /** a predicate as a boolean VALUE (unknown → null) */
  final case class BoolVE(be: BE) extends VE
  /** a node/rel binding used as a comparison operand (identity equality) */
  final case class EntityE(v: String) extends VE
  /** list literal; elemFam 'L' | 'S' | 'X' (mixed L+S, engine-tagged) */
  final case class ListLitE(elems: List[VE], elemFam: Char) extends VE
  /** list subscript: 0-based, negative from the end, out-of-range → null */
  final case class IdxE(list: VE, idx: VE) extends VE
  /** list slice `l[f..t]`: to-exclusive, negatives from the end, clamped */
  final case class SliceE(list: VE, from: Option[VE], to: Option[VE])
    extends VE
  final case class HeadLastE(fn: String, list: VE) extends VE // head | last
  final case class ListSizeE(list: VE) extends VE
  final case class RangeE(lo: Long, hi: Long, step: Option[Long]) extends VE
  /** list comprehension `[v IN list WHERE w | p]`; ef = ELEMENT family of
    * the source list ('L'|'S'); result element family is family(proj)
    * when proj is set, else ef
    */
  final case class ListCompE(v: String, list: VE, where: Option[BE],
      proj: Option[VE], ef: Char) extends VE
  /** size([(anchor)-[:T]->(x) | 1]) — counting pattern comprehension;
    * inner vars are fresh, outerVars are bound in the enclosing scope
    */
  final case class PatCompSizeE(chain: Chain, outerVars: Set[String])
    extends VE
  /** length(p) over a named path (relationship count; null on a failed
    * OPTIONAL MATCH)
    */
  final case class PathLenE(p: String) extends VE
  /** `[pnv IN nodes(p) | pnv.uid]` — the node sequence of a named path
    * projected to uids (deterministic path order, family 'M')
    */
  final case class PathNodesUidsE(p: String) extends VE
  /** size(relationships(p)) — rel count via the rel-list surface */
  final case class PathRelsSizeE(p: String) extends VE

  /** the naive binding value of a named path: full node/rel sequences
    * (PathLenE consumes rels.size; PathNodesUidsE walks nodes)
    */
  final case class PathVal(nodes: List[MNode], rels: List[MRel])

  /** map literal `{a: <ve>, b: <ve>}` — family 'P'; entries carry their
    * value family so consumers stay typed
    */
  final case class MapLitE(entries: List[(String, VE, Char)]) extends VE
  /** map projection `v {.k, .s}` over a NODE var — every requested key is
    * present in the result, missing properties as null; a null node (failed
    * OPTIONAL MATCH) projects to null. Engine-verified (Probe41).
    */
  final case class MapProjE(v: String, keys: List[String]) extends VE
  /** `<map>.key` extraction from an inline map (literal or projection) —
    * fam is the extracted value's family
    */
  final case class MapIdxE(m: VE, key: String, fam: Char) extends VE

  /** zoned datetime model value (family 'Z'): UTC instant micros + offset
    * seconds. The grammar generates OFFSET zones only (named zones live in
    * TCK locks); instants are whole minutes and UNIQUE per pool — an
    * instant-equal pair always carries the same offset, so equivalence
    * collapse and ORDER-BY tie groups stay representation-identical. */
  final case class MZdt(inst: Long, off: Int) {
    def renderIso: String = {
      val local = java.time.LocalDateTime.ofEpochSecond(
        inst / 1000000L + off, 0, java.time.ZoneOffset.UTC)
      val base = f"${local.getYear}%04d-${local.getMonthValue}%02d-" +
        f"${local.getDayOfMonth}%02dT${local.getHour}%02d:" +
        f"${local.getMinute}%02d"
      base + graft.plans.ExprCompiler.renderOffsetStr(off)
    }
  }
  /** `.hour/.minute/.epochSeconds/.offsetSeconds` over a zoned datetime —
    * clock accessors read the LOCAL clock, epoch the instant (family 'L') */
  final case class ZdtPartE(part: String, z: VE) extends VE
  /** `<date> ± duration({days: k})` — calendar arithmetic, family 'E' */
  final case class DateArithE(d: VE, plus: Boolean, days: Long) extends VE
  /** `<date>.year|month|day` accessor, family 'L' */
  final case class DatePartE(part: String, d: VE) extends VE
  /** `<zdt> ± duration({months, days, hours})` (round 8) — calendar
    * components on the local clock (offset zones keep their offset),
    * time components on the INSTANT. Family 'Z', but representation-
    * UNSAFE: arithmetic can land two different sources on one instant
    * with different offsets, breaking the pools' instant-equal ⇒
    * representation-identical invariant — so this node only appears
    * where representation is never observed post-collapse: comparison
    * operands and accessor bases, never projections/ORDER BY/min-max. */
  final case class ZdtArithE(z: VE, plus: Boolean, months: Long,
      days: Long, hours: Long) extends VE
  /** `duration.between/inDays/inSeconds(zdt, zdt).part` — family 'L'
    * (round 8): months/days on the first operand's local clocks, the
    * between seconds remainder as an instant difference */
  final case class DurBetweenPartE(fn: String, part: String, a: VE,
      b: VE) extends VE
  /** `datetime(<node>.zs)` — the COLUMN-valued string parse path
    * (round 8). The zs prop stores renderIso of the SAME (inst, off)
    * pool value as zd, so parse results keep the uniqueness invariant
    * and the node is representation-safe anywhere zd is. */
  final case class DtParseE(v: String) extends VE
  /** point model value (family 'G', round 8): crs + coordinates —
    * representation IS identity, so points are safe everywhere */
  final case class MPoint(crs: String, x: Double, y: Double)
  /** `<point>.x|y|crs` accessor (x/y family 'D', crs 'S') */
  final case class PointPartE(part: String, p: VE) extends VE
  /** `distance(a, b)` — euclidean/haversine per crs, null on mismatch;
    * both engines run the same JVM libm, so doubles compare exactly */
  final case class DistanceE(a: VE, b: VE) extends VE

  sealed trait BE
  final case class CmpE(op: String, l: VE, r: VE) extends BE
  final case class IsNullE(e: VE, not: Boolean) extends BE
  final case class InE(e: VE, list: List[Any]) extends BE
  final case class HasLabelE(v: String, label: String) extends BE
  /** STARTS WITH | ENDS WITH | CONTAINS (ternary: null operand → null) */
  final case class StrPredE(op: String, l: VE, r: VE) extends BE
  /** one-chain existence test: `EXISTS { MATCH <chain> }` (block=true) or
    * a bare pattern predicate with anonymous inner elements (block=false).
    * Both lower to (anti-)joins, so both are DEFINITE true/false — a null
    * outer var yields false, never null (the engine follows the
    * reference's ExistsSubQuery relational lowering here; Neo4j's
    * pattern-predicate-on-null → null is a documented divergence).
    * outerVars: chain vars bound in the enclosing scope (rendered by name
    * in the predicate form; everything else is anonymous there).
    */
  final case class ExistsE(chain: Chain, block: Boolean,
      outerVars: Set[String]) extends BE
  /** membership against a list-valued EXPRESSION (ternary; null list →
    * null, empty list → false even for a null needle)
    */
  final case class InVE(x: VE, list: VE) extends BE
  /** all/any/none/single over a list expression, strict ternary */
  final case class QuantBE(q: String, v: String, list: VE, pred: BE)
    extends BE
  final case class AndE(l: BE, r: BE) extends BE
  final case class OrE(l: BE, r: BE) extends BE
  final case class XorE(l: BE, r: BE) extends BE
  final case class NotE(e: BE) extends BE

  sealed trait RetItem { def alias: String }
  final case class ValItem(e: VE, alias: String) extends RetItem
  final case class AggItem(fn: String, arg: Option[VE], distinct: Boolean,
      alias: String) extends RetItem
  /** WITH-only: carry a binding (entity or scalar) through unchanged */
  final case class PassItem(v: String) extends RetItem { def alias: String = v }
  /** WITH-only: rebind an entity under a new name (`WITH n AS m`) */
  final case class AliasItem(v: String, alias: String) extends RetItem

  final case class Ret(distinct: Boolean, items: List[RetItem],
      orderBy: List[(String, Boolean)], skip: Option[Int], limit: Option[Int])

  sealed trait Stage
  final case class SMatch(mc: MatchC) extends Stage
  final case class SUnwind(v: String, list: List[Any]) extends Stage
  /** UNWIND of a bound list variable (a WITH projection or collect alias) */
  final case class SUnwindVar(v: String, src: String) extends Stage
  /** a WITH ORDER BY key: the item alias, optionally ordering on its
    * `.uid` property — the portable total order for a passed entity
    * (engine ids and model ids number independently; uids are shared).
    * `pre` marks an UNPROJECTED entity var from the input scope (legal in
    * a plain non-DISTINCT, non-aggregating WITH: ORDER BY sees both
    * scopes — the engine's combined-header path, round 7c). Cut
    * determinism holds because pre keys are always followed by keys over
    * every projected item: full-key ties project to identical rows. */
  final case class WithOrd(alias: String, uid: Boolean, asc: Boolean,
      pre: Boolean = false)
  final case class SWith(distinct: Boolean, items: List[RetItem],
      where: Option[BE], orderBy: List[WithOrd] = Nil,
      skip: Option[Int] = None, limit: Option[Int] = None) extends Stage
  /** CONSTRUCT CLONE over matched vars: switches the working graph to the
    * constructed one and RESETS the binding table (reference consecutive-
    * construction semantics, Probe42). Cloned rels always travel with both
    * endpoint node vars — the engine materializes property-less endpoints
    * otherwise (Probe41), a corner the grammar avoids by construction.
    * cloneRels entries are (relVar, srcNodeVar, dstNodeVar). */
  final case class SConstruct(cloneNodes: List[String],
      cloneRels: List[(String, String, String)],
      newRels: List[(String, String, String, Option[Long])] = Nil,
      /** (newVar, srcVar): `NEW (newVar COPY OF srcVar)` — a fresh-id
        * per-row copy of the matched node (round 7). */
      copyNodes: List[(String, String)] = Nil,
      /** render cloneRels as bound-rel NEW patterns
        * (`NEW (sv)-[rv]->(dv)`, the implicit-clone form) instead of a
        * CLONE list — identical semantics, different engine path. */
      relCloneAsNew: Boolean = false,
      /** (copyVar, label): `SET copyVar: Label` — extra label merged
        * into the copy's label set (round 8). Copies only: fresh ids
        * keep the dedup semantics unambiguous. */
      copyLabels: List[(String, String)] = Nil)
    extends Stage
  // newRels: (srcVar, relType, dstVar, w-literal) — one NEW edge PER
  // BINDING ROW (engine-verified, Probe46: duplicate rows create
  // duplicate edges), endpoints drawn from the cloned node set or a
  // COPY OF target

  final case class Query(stages: List[Stage], ret: Ret,
      unions: List[(Boolean, Query)] = Nil,
      /** driving-table correlation (round 7): (columns with family,
        * rows). Not rendered — the runner passes a real DataFrame to the
        * engine's drivingTable entry point; the naive evaluator seeds its
        * binding table with the rows. Main body only (no unions). */
      driving: Option[(List[(String, Char)], List[List[Any]])] = None) {

    private def referencedVars: Set[String] = {
      val b = Set.newBuilder[String]
      def ve(e: VE): Unit = e match {
        case PropE(v, _) => b += v
        case VarE(v, _) => b += v
        case FnE(_, v) => b += v
        case SizeE(v) => b += v
        case ArithE(_, l, r) => ve(l); ve(r)
        case CaseE(whens, els) =>
          whens.foreach { case (c, x) => be(c); ve(x) }; els.foreach(ve)
        case CoalesceE(args) => args.foreach(ve)
        case StrFnE(_, a, _) => ve(a)
        case NumFnE(_, a) => ve(a)
        case BoolVE(x) => be(x)
        case EntityE(v) => b += v
        case ListLitE(es, _) => es.foreach(ve)
        case IdxE(l, i) => ve(l); ve(i)
        case SliceE(l, f, t) => ve(l); f.foreach(ve); t.foreach(ve)
        case HeadLastE(_, l) => ve(l)
        case ListSizeE(l) => ve(l)
        case RangeE(_, _, _) =>
        case ListCompE(_, l, w, p, _) => ve(l); w.foreach(be); p.foreach(ve)
        case PatCompSizeE(_, outer) => b ++= outer
        case PathLenE(p) => b += p
        case PathNodesUidsE(p) => b += p
        case PathRelsSizeE(p) => b += p
        case MapLitE(entries) => entries.foreach { case (_, e, _) => ve(e) }
        case MapProjE(v, _) => b += v
        case MapIdxE(m, _, _) => ve(m)
        case DateArithE(d, _, _) => ve(d)
        case DatePartE(_, d) => ve(d)
        case ZdtPartE(_, z) => ve(z)
        case ZdtArithE(z, _, _, _, _) => ve(z)
        case DurBetweenPartE(_, _, x, y) => ve(x); ve(y)
        case DtParseE(v) => b += v
        case PointPartE(_, pe) => ve(pe)
        case DistanceE(x, y) => ve(x); ve(y)
        case LitE(_) =>
      }
      def be(e: BE): Unit = e match {
        case ExistsE(_, _, outer) => b ++= outer
        case InVE(x, l) => ve(x); ve(l)
        case QuantBE(_, _, l, p) => ve(l); be(p)
        case CmpE(_, l, r) => ve(l); ve(r)
        case IsNullE(x, _) => ve(x)
        case InE(x, _) => ve(x)
        case HasLabelE(v, _) => b += v
        case StrPredE(_, l, r) => ve(l); ve(r)
        case AndE(l, r) => be(l); be(r)
        case OrE(l, r) => be(l); be(r)
        case XorE(l, r) => be(l); be(r)
        case NotE(x) => be(x)
      }
      stages.foreach {
        case SMatch(mc) => mc.where.foreach(be)
        case SWith(_, items, where, ord, _, _) =>
          items.foreach {
            case ValItem(e, _) => ve(e)
            case AggItem(_, a, _, _) => a.foreach(ve)
            case PassItem(v) => b += v
            case AliasItem(v, _) => b += v
          }
          // pre (unprojected input-scope) sort keys reference their var
          ord.foreach(o => if (o.pre) b += o.alias)
          where.foreach(be)
        case SUnwindVar(_, src) => b += src
        case sc: SConstruct =>
          b ++= sc.cloneNodes
          sc.cloneRels.foreach { case (rv, sv, dv) => b += rv; b += sv; b += dv }
          sc.newRels.foreach { case (sv, _, dv, _) => b += sv; b += dv }
          sc.copyNodes.foreach { case (_, sv) => b += sv }
        case _ =>
      }
      ret.items.foreach {
        case ValItem(e, _) => ve(e)
        case AggItem(_, a, _, _) => a.foreach(ve)
        case PassItem(v) => b += v
        case AliasItem(v, _) => b += v
      }
      b.result()
    }

    private def renderVE(e: VE): String = e match {
      case PropE(v, k) => s"$v.$k"
      case VarE(v, _) => v
      case LitE(x) => renderLit(x)
      case ArithE(op, l, r) => s"(${renderVE(l)} $op ${renderVE(r)})"
      case FnE(fn, v) => s"$fn($v)"
      case SizeE(v) => s"size($v)"
      case CaseE(whens, els) =>
        "(CASE " + whens.map { case (c, v) =>
          s"WHEN ${renderBE(c)} THEN ${renderVE(v)}"
        }.mkString(" ") +
          els.map(e => s" ELSE ${renderVE(e)}").getOrElse("") + " END)"
      case CoalesceE(args) =>
        args.map(renderVE).mkString("coalesce(", ", ", ")")
      case StrFnE(fn, a, extra) =>
        val name = if (fn == "strSize") "size" else fn
        (renderVE(a) :: extra.map(renderLit)).mkString(s"$name(", ", ", ")")
      case NumFnE(fn, a) => s"$fn(${renderVE(a)})"
      case BoolVE(x) => renderBE(x)
      case EntityE(v) => v
      case ListLitE(es, _) => es.map(renderVE).mkString("[", ", ", "]")
      // list-valued operands are always atoms or postfix chains (variable,
      // list literal, range() call, slice), so direct subscripting parses
      case IdxE(l, i) => s"${renderVE(l)}[${renderVE(i)}]"
      case SliceE(l, f, t) =>
        s"${renderVE(l)}[${f.map(renderVE).getOrElse("")}.." +
          s"${t.map(renderVE).getOrElse("")}]"
      case HeadLastE(fn, l) => s"$fn(${renderVE(l)})"
      case ListSizeE(l) => s"size(${renderVE(l)})"
      case RangeE(lo, hi, step) =>
        step.map(s => s"range($lo, $hi, $s)").getOrElse(s"range($lo, $hi)")
      case ListCompE(v, l, w, p, _) =>
        s"[$v IN ${renderVE(l)}" +
          w.map(x => s" WHERE ${renderBE(x)}").getOrElse("") +
          p.map(x => s" | ${renderVE(x)}").getOrElse("") + "]"
      case PatCompSizeE(chain, outer) =>
        val cs = renderNodeP(chain.first, outer(chain.first.v)) +
          chain.hops.map { case (rp, np) =>
            renderRelP(rp, "") + renderNodeP(np, outer(np.v))
          }.mkString
        s"size([$cs | 1])"
      case PathLenE(p) => s"length($p)"
      case PathNodesUidsE(p) => s"[pnv IN nodes($p) | pnv.uid]"
      case PathRelsSizeE(p) => s"size(relationships($p))"
      case MapLitE(entries) => entries.map { case (k, e, _) =>
        s"$k: ${renderVE(e)}"
      }.mkString("{", ", ", "}")
      case MapProjE(v, keys) =>
        keys.map("." + _).mkString(s"$v {", ", ", "}")
      case MapIdxE(m, key, _) => s"${renderVE(m)}.$key"
      case DateArithE(d, plus, days) =>
        s"(${renderVE(d)} ${if (plus) "+" else "-"} duration({days: $days}))"
      case DatePartE(part, d) => s"${renderVE(d)}.$part"
      case ZdtPartE(part, z) => s"${renderVE(z)}.$part"
      case ZdtArithE(z, plus, mo, d, h) =>
        val comps = List("months" -> mo, "days" -> d, "hours" -> h)
          .filter(_._2 != 0)
        val body =
          if (comps.isEmpty) "{hours: 0}"
          else comps.map { case (k, v) => s"$k: $v" }
            .mkString("{", ", ", "}")
        s"(${renderVE(z)} ${if (plus) "+" else "-"} duration($body))"
      case DurBetweenPartE(fn, part, x, y) =>
        s"duration.$fn(${renderVE(x)}, ${renderVE(y)}).$part"
      case DtParseE(v) => s"datetime($v.zs)"
      case PointPartE(part, pe) => s"${renderVE(pe)}.$part"
      case DistanceE(x, y) =>
        s"distance(${renderVE(x)}, ${renderVE(y)})"
    }

    private def renderBE(e: BE): String = e match {
      case CmpE(op, l, r) => s"(${renderVE(l)} $op ${renderVE(r)})"
      case IsNullE(x, false) => s"(${renderVE(x)} IS NULL)"
      case IsNullE(x, true) => s"(${renderVE(x)} IS NOT NULL)"
      case InE(x, xs) =>
        s"(${renderVE(x)} IN ${xs.map(renderLit).mkString("[", ", ", "]")})"
      case HasLabelE(v, l) => s"($v:$l)"
      case StrPredE(op, l, r) => s"(${renderVE(l)} $op ${renderVE(r)})"
      case InVE(x, l) => s"(${renderVE(x)} IN ${renderVE(l)})"
      case QuantBE(q, v, l, p) =>
        s"$q($v IN ${renderVE(l)} WHERE ${renderBE(p)})"
      case ExistsE(chain, block, outer) =>
        def show(v: String) = block || outer(v)
        val cs = renderNodeP(chain.first, show(chain.first.v)) +
          chain.hops.map { case (rp, np) =>
            renderRelP(rp, "") + renderNodeP(np, show(np.v))
          }.mkString
        if (block) s"EXISTS { MATCH $cs }" else s"($cs)"
      case AndE(l, r) => s"(${renderBE(l)} AND ${renderBE(r)})"
      case OrE(l, r) => s"(${renderBE(l)} OR ${renderBE(r)})"
      case XorE(l, r) => s"(${renderBE(l)} XOR ${renderBE(r)})"
      case NotE(x) => s"(NOT ${renderBE(x)})"
    }

    private def renderItems(items: List[RetItem]): String =
      items.map {
        case PassItem(v) => v
        case AliasItem(v, a) => s"$v AS $a"
        case ValItem(e, a) => s"${renderVE(e)} AS $a"
        case AggItem("count*", _, _, a) => s"count(*) AS $a"
        case AggItem(fn, arg, d, a) =>
          val dd = if (d) "DISTINCT " else ""
          s"$fn($dd${renderVE(arg.get)}) AS $a"
      }.mkString(", ")

    def render: String = {
      val refd = referencedVars
      def chain(c: Chain): String =
        renderNodeP(c.first, showVar = true) + c.hops.map { case (r, n) =>
          renderRelP(r, if (refd(r.v)) r.v else "") +
            renderNodeP(n, showVar = true)
        }.mkString
      val sb = new StringBuilder
      stages.foreach {
        case SMatch(mc) =>
          if (mc.optional) sb ++= "OPTIONAL "
          sb ++= "MATCH " + mc.pathVar.map(p => s"$p = ").getOrElse("") +
            mc.chains.map(chain).mkString(", ") + "\n"
          mc.where.foreach(w => sb ++= "WHERE " + renderBE(w) + "\n")
        case SUnwind(v, list) =>
          sb ++= s"UNWIND ${list.map(renderLit).mkString("[", ", ", "]")} AS $v\n"
        case SUnwindVar(v, src) =>
          sb ++= s"UNWIND $src AS $v\n"
        case SWith(d, items, where, ord, skip, limit) =>
          sb ++= "WITH " + (if (d) "DISTINCT " else "") + renderItems(items) + "\n"
          if (ord.nonEmpty)
            sb ++= "ORDER BY " + ord.map { o =>
              s"${o.alias}${if (o.uid) ".uid" else ""} " +
                (if (o.asc) "ASC" else "DESC")
            }.mkString(", ") + "\n"
          skip.foreach(n => sb ++= s"SKIP $n\n")
          limit.foreach(n => sb ++= s"LIMIT $n\n")
          where.foreach(w => sb ++= "WHERE " + renderBE(w) + "\n")
        case sc: SConstruct =>
          val cloneRelList = if (sc.relCloneAsNew) Nil else sc.cloneRels
          val names = (sc.cloneNodes ++ cloneRelList.flatMap {
            case (rv, sv, dv) => List(sv, rv, dv) }).distinct
          sb ++= "CONSTRUCT"
          if (names.nonEmpty) sb ++= " CLONE " + names.mkString(", ")
          if (sc.relCloneAsNew) sc.cloneRels.foreach { case (rv, sv, dv) =>
            sb ++= s" NEW ($sv)-[$rv]->($dv)" }
          sc.copyNodes.foreach { case (nv, sv) =>
            sb ++= s" NEW ($nv COPY OF $sv)" }
          sc.newRels.foreach { case (sv, typ, dv, w) =>
            val props = w.map(v => s" {w: $v}").getOrElse("")
            sb ++= s" NEW ($sv)-[:$typ$props]->($dv)"
          }
          sc.copyLabels.foreach { case (v, l) => sb ++= s" SET $v: $l" }
          sb ++= "\n"
      }
      sb ++= "RETURN "
      if (ret.distinct) sb ++= "DISTINCT "
      sb ++= renderItems(ret.items)
      if (ret.orderBy.nonEmpty)
        sb ++= "\nORDER BY " + ret.orderBy.map { case (a, asc) =>
          s"$a ${if (asc) "ASC" else "DESC"}"
        }.mkString(", ")
      ret.skip.foreach(n => sb ++= s"\nSKIP $n")
      ret.limit.foreach(n => sb ++= s"\nLIMIT $n")
      unions.foreach { case (all, sub) =>
        sb ++= (if (all) "\nUNION ALL\n" else "\nUNION\n") + sub.render
      }
      sb.toString
    }

    /** aliases whose values are lists with unspecified element order */
    def multisetAliases: Set[String] = ret.items.collect {
      case AggItem("collect", _, _, a) => a
    }.toSet

    /** sum() aliases compare numerically (Long 0 ≡ 0.0): a columnar engine
      * types the EMPTY sum by the column's type, and when the property is
      * statically absent from every matched label-combo table the column
      * is a typeless null literal → integer 0, while a present-but-all-null
      * double column sums to 0.0 (differential cases 679/987; Neo4j's
      * dynamically-typed sum returns integer 0 for empty input — a
      * documented representation divergence, not a value divergence)
      */
    def sumAliases: Set[String] = {
      // sums computed in a WITH carry their typed empty-zero corner into
      // any RETURN item that re-projects the alias directly (hunt 11618)
      val withSums: Set[String] = stages.flatMap {
        case SWith(_, items, _, _, _, _) => items.collect {
          case AggItem("sum", _, _, a) => a
        }
        case _ => Nil
      }.toSet
      // ANY numeric item referencing a with-sum alias inherits the corner
      // — not just a bare re-projection: abs(w0a0) wraps it (hunt 38418)
      def refs(x: Any): Set[String] = x match {
        case VarE(v, _) => Set(v)
        case s: Seq[_] => s.iterator.flatMap(refs).toSet
        case o: Option[_] => o.iterator.flatMap(refs).toSet
        case p: Product => p.productIterator.flatMap(refs).toSet
        case _ => Set.empty
      }
      ret.items.collect {
        case AggItem("sum", _, _, a) => a
        case AggItem(fn, arg, _, a) if fn != "collect" &&
          arg.exists(e => refs(e).exists(withSums)) => a
        case ValItem(e, a) if refs(e).exists(withSums) && {
          val f = NaiveEvalFamilies.family(e)
          f == 'L' || f == 'D'
        } => a
      }.toSet ++ unions.flatMap(_._2.sumAliases)
    }

    private def itemFam(it: RetItem): Char = it match {
      case ValItem(e, _) => NaiveEvalFamilies.family(e)
      case AggItem(fn, arg, _, _) => fn match {
        case "count*" | "count" => 'L'
        case "avg" => 'D'
        case _ => arg.map(NaiveEvalFamilies.family).getOrElse('L')
      }
      case _ => 'X'
    }

    /** union aliases with ANY numeric side compare numerically: the
      * engine widens Long→Double whenever a branch's STATIC column type
      * is double — including a statically-absent property (NullType)
      * wrapped in a numeric fn (hunt 20365), which the value-level family
      * model cannot see — and cross-family tagged columns normalize
      * numbers to the float tag
      */
    def unionNumAliases: Set[String] =
      if (unions.isEmpty) Set.empty
      else {
        val bodies = this :: unions.map(_._2)
        ret.items.map(_.alias).filter { a =>
          val fams = bodies.flatMap(_.ret.items.find(_.alias == a))
            .map(itemFam)
          fams.exists(f => f == 'L' || f == 'D')
        }.toSet
      }
  }
}

/** Naive row-at-a-time reference interpreter over the graph model. Written
  * deliberately in the most direct style possible (nested loops over
  * Vectors, ternary logic as Option[Boolean]) so it shares nothing with the
  * DataFrame planner it checks.
  */
object NaiveEval {
  import Model._

  type Binding = Map[String, Any] // MNode | MRel | List[MRel] | scalar | null

  // ---- value equality (Cypher): numbers cross-type numeric, cross-family
  // equality is definite false, null is unknown
  def valueEq(a: Any, b: Any): Option[Boolean] = (a, b) match {
    case (null, _) | (_, null) => None
    case (x: MNode, y: MNode) => Some(x.id == y.id) // identity equality
    case (x: MRel, y: MRel) => Some(x.id == y.id)
    case (x: Long, y: Long) => Some(x == y)
    case (x: Long, y: Double) => Some(x.toDouble == y)
    case (x: Double, y: Long) => Some(x == y.toDouble)
    case (x: Double, y: Double) => Some(x == y)
    case (x: String, y: String) => Some(x == y)
    case (x: Boolean, y: Boolean) => Some(x == y)
    case (x: java.time.LocalDate, y: java.time.LocalDate) => Some(x == y)
    case (x: MZdt, y: MZdt) => Some(x.inst == y.inst) // instant equality
    case (x: MPoint, y: MPoint) => Some(x == y) // component equality
    case (x: List[_], y: List[_]) =>
      if (x.size != y.size) Some(false)
      else {
        val elems = x.zip(y).map { case (xe, ye) => valueEq(xe, ye) }
        if (elems.forall(_.contains(true))) Some(true)
        else if (elems.exists(_.contains(false))) Some(false)
        else None
      }
    // maps compare STRUCT-STYLE (engine/reference semantics, Probe42):
    // binary per-key comparison where null values are ordinary values —
    // {k: null} = {k: null} is TRUE and {k: null} <> {k: 1} is definite
    // TRUE (Neo4j's ternary map equality would yield null for both; a
    // documented columnar-representation divergence, same family as the
    // reference's struct-backed maps)
    case (x: Map[_, _], y: Map[_, _]) =>
      val xm = x.asInstanceOf[Map[String, Any]]
      val ym = y.asInstanceOf[Map[String, Any]]
      if (xm.keySet != ym.keySet) Some(false)
      else Some(xm.forall { case (k, v) =>
        val w = ym(k)
        if (v == null || w == null) v == null && w == null
        else valueEq(v, w).contains(true)
      })
    case _ => Some(false)
  }

  // ---- ordering comparisons: only within a family (numbers cross-type);
  // anything else (including lists — compound values) is unknown
  def valueCmp(a: Any, b: Any): Option[Int] = (a, b) match {
    case (null, _) | (_, null) => None
    case (x: Long, y: Long) => Some(java.lang.Long.compare(x, y))
    case (x: Long, y: Double) => Some(java.lang.Double.compare(x.toDouble, y))
    case (x: Double, y: Long) => Some(java.lang.Double.compare(x, y.toDouble))
    case (x: Double, y: Double) => Some(java.lang.Double.compare(x, y))
    case (x: String, y: String) => Some(x.compareTo(y))
    case (x: Boolean, y: Boolean) => Some(java.lang.Boolean.compare(x, y))
    case (x: java.time.LocalDate, y: java.time.LocalDate) =>
      Some(x.compareTo(y))
    case (x: MZdt, y: MZdt) => Some(java.lang.Long.compare(x.inst, y.inst))
    case _ => None
  }

  /** grouping / DISTINCT key: numeric equivalence (1 ≡ 1.0), entities by id */
  def normKey(v: Any): Any = v match {
    case l: Long => l.toDouble
    case n: MNode => ("node", n.id)
    case r: MRel => ("rel", r.id)
    case z: MZdt => ("zdt", z.inst) // instant equivalence
    case xs: List[_] => xs.map(normKey)
    case m: Map[_, _] =>
      m.asInstanceOf[Map[String, Any]].toSeq
        .map { case (k, x) => (k, normKey(x)) }.sortBy(_._1)
    case other => other
  }

  def evalV(r: Binding, e: VE): Any = e match {
    case PropE(v, k) => r.getOrElse(v, null) match {
      case null => null
      case n: MNode => n.props.getOrElse(k, null)
      case rel: MRel => rel.props.getOrElse(k, null)
      case _ => null
    }
    case VarE(v, _) => r.getOrElse(v, null)
    case LitE(x) => x
    case FnE("labels", v) => r.getOrElse(v, null) match {
      case n: MNode => n.labels.toList.sorted
      case _ => null
    }
    case FnE("type", v) => r.getOrElse(v, null) match {
      case rel: MRel => rel.typ
      case _ => null
    }
    case FnE(fn, _) => sys.error(s"naive: unknown fn $fn")
    case SizeE(v) => r.getOrElse(v, null) match {
      case xs: List[_] => xs.size.toLong
      case _ => null
    }
    case CaseE(whens, els) =>
      whens.find { case (c, _) => evalB(r, c).contains(true) } match {
        case Some((_, v)) => evalV(r, v)
        case None => els.map(evalV(r, _)).orNull
      }
    case CoalesceE(args) =>
      args.iterator.map(evalV(r, _)).find(_ != null).orNull
    case StrFnE(fn, a, extra) => evalV(r, a) match {
      case s: String => fn match {
        case "toUpper" => s.toUpperCase
        case "reverse" => s.reverse
        case "trim" => s.trim
        case "strSize" => s.length.toLong
        case "left" => s.take(extra.head.asInstanceOf[Long].toInt)
        case "right" => s.takeRight(extra.head.asInstanceOf[Long].toInt)
        case "substring" =>
          val from = extra.head.asInstanceOf[Long].toInt
          extra.drop(1).headOption match {
            case Some(n: Long) => s.drop(from).take(n.toInt)
            case _ => s.drop(from)
          }
        case "replace" =>
          s.replace(extra.head.asInstanceOf[String],
            extra(1).asInstanceOf[String])
      }
      case _ => null
    }
    case NumFnE(fn, a) => evalV(r, a) match {
      case null => null
      case l: Long => fn match {
        case "abs" => math.abs(l)
        case "sign" => java.lang.Long.signum(l).toLong
      }
      case d: Double => fn match {
        case "abs" => math.abs(d)
        case "sign" => math.signum(d).toLong
      }
      case _ => null
    }
    case BoolVE(be) => evalB(r, be).map(Boolean.box).orNull
    case EntityE(v) => r.getOrElse(v, null)
    case ListLitE(es, _) => es.map(evalV(r, _))
    case RangeE(lo, hi, step) =>
      val st = step.getOrElse(1L)
      (lo to hi by st).toList.map(x => x: Any)
    case IdxE(le, ie) => (evalV(r, le), evalV(r, ie)) match {
      case (xs: List[_], i: Long) =>
        val n = xs.size
        val j = if (i < 0) n + i else i
        if (j >= 0 && j < n) xs(j.toInt) else null
      case _ => null
    }
    case SliceE(le, fe, te) => evalV(r, le) match {
      case xs: List[_] =>
        val n = xs.size
        def bound(oe: Option[VE], dflt: Long): Option[Long] = oe match {
          case None => Some(dflt)
          case Some(e) => evalV(r, e) match {
            case l: Long => Some(if (l < 0) n + l else l)
            case _ => None // null (or non-integer) bound → null slice
          }
        }
        (bound(fe, 0L), bound(te, n.toLong)) match {
          case (Some(f0), Some(t0)) =>
            val f = math.max(0L, math.min(f0, n.toLong)).toInt
            val t = math.max(0L, math.min(t0, n.toLong)).toInt
            if (t <= f) Nil else xs.slice(f, t)
          case _ => null
        }
      case _ => null
    }
    case HeadLastE(fn, le) => evalV(r, le) match {
      case xs: List[_] if xs.nonEmpty =>
        if (fn == "head") xs.head else xs.last
      case _ => null // empty or null list
    }
    case ListSizeE(le) => evalV(r, le) match {
      case xs: List[_] => xs.size.toLong
      case _ => null
    }
    case ListCompE(v, le, w, p, _) => evalV(r, le) match {
      case xs: List[_] =>
        xs.filter(x => w.forall(c => evalB(r + (v -> x), c).contains(true)))
          .map(x => p.map(e => evalV(r + (v -> x), e)).getOrElse(x))
      case _ => null
    }
    case PatCompSizeE(chain, _) =>
      NaiveEval.countChainMatches(r, chain).toLong
    case PathLenE(p) => r.getOrElse(p, null) match {
      case pv: PathVal => pv.rels.size.toLong
      case _ => null // failed OPTIONAL MATCH
    }
    case PathNodesUidsE(p) => r.getOrElse(p, null) match {
      case pv: PathVal => pv.nodes.map(_.props.getOrElse("uid", null))
      case _ => null
    }
    case PathRelsSizeE(p) => r.getOrElse(p, null) match {
      case pv: PathVal => pv.rels.size.toLong
      case _ => null
    }
    case MapLitE(entries) =>
      entries.map { case (k, e, _) => k -> evalV(r, e) }.toMap
    case MapProjE(v, keys) => r.getOrElse(v, null) match {
      case n: MNode => keys.map(k => k -> n.props.getOrElse(k, null)).toMap
      case _ => null // failed OPTIONAL MATCH projects to null
    }
    case MapIdxE(m, key, _) => evalV(r, m) match {
      case mm: Map[_, _] =>
        mm.asInstanceOf[Map[String, Any]].getOrElse(key, null)
      case _ => null
    }
    case DateArithE(d, plus, days) => evalV(r, d) match {
      case ld: java.time.LocalDate =>
        if (plus) ld.plusDays(days) else ld.minusDays(days)
      case _ => null
    }
    case ZdtPartE(part, z) => evalV(r, z) match {
      case MZdt(inst, off) =>
        val local = java.time.LocalDateTime.ofEpochSecond(
          inst / 1000000L + off, 0, java.time.ZoneOffset.UTC)
        part match {
          case "hour" => local.getHour.toLong
          case "minute" => local.getMinute.toLong
          case "epochSeconds" => java.lang.Math.floorDiv(inst, 1000000L)
          case "offsetSeconds" => off.toLong
          case other => sys.error(s"naive: unknown zdt part $other")
        }
      case _ => null
    }
    case ZdtArithE(z, plus, mo, d, h) => evalV(r, z) match {
      case MZdt(inst, off) =>
        val sign = if (plus) 1L else -1L
        // calendar components on the local clock (fixed-offset zones:
        // the offset is always re-admitted), hours on the instant
        val local = java.time.LocalDateTime.ofEpochSecond(
          java.lang.Math.floorDiv(inst, 1000000L) + off, 0,
          java.time.ZoneOffset.UTC)
        val l2 = local.plusMonths(sign * mo).plusDays(sign * d)
        val instSec2 = l2.toEpochSecond(java.time.ZoneOffset.UTC) - off +
          sign * h * 3600L
        MZdt(instSec2 * 1000000L, off)
      case _ => null
    }
    case DurBetweenPartE(fn, part, ae, be2) =>
      (evalV(r, ae), evalV(r, be2)) match {
        case (MZdt(i1, o1), MZdt(i2, _)) =>
          // both locals read in the FIRST operand's zone, so for offset
          // zones local differences equal instant differences
          val s1 = java.lang.Math.floorDiv(i1, 1000000L)
          val s2 = java.lang.Math.floorDiv(i2, 1000000L)
          // whole units TRUNCATE toward zero (round 8 — java.time/Neo4j
          // same-sign components; Scala Long division truncates)
          fn match {
            case "inDays" => (s2 - s1) / 86400L
            case "inSeconds" => s2 - s1
            case _ => // between: months on local clocks (Spark
              // months_between incl. its /31 fraction + 8-digit HALF_UP
              // round), then local days, then the INSTANT remainder
              val from = java.time.LocalDateTime.ofEpochSecond(s1 + o1, 0,
                java.time.ZoneOffset.UTC)
              val to = java.time.LocalDateTime.ofEpochSecond(s2 + o1, 0,
                java.time.ZoneOffset.UTC)
              val m = sparkMonthsBetween(to, from).toLong
              val anchor = from.plusMonths(m)
              val remSec = to.toEpochSecond(java.time.ZoneOffset.UTC) -
                anchor.toEpochSecond(java.time.ZoneOffset.UTC)
              val days = remSec / 86400L
              part match {
                case "months" => m
                case "days" => days
                case "seconds" => remSec - days * 86400L
                case other => sys.error(s"naive: unknown part $other")
              }
          }
        case _ => null
      }
    case DtParseE(v) => r.getOrElse(v, null) match {
      case n: MNode => n.props.get("zs") match {
        case Some(s: String) => // independent re-parse (java.time, not
          // the engine's parser) of the renderIso string
          val odt = java.time.OffsetDateTime.parse(s)
          MZdt(odt.toEpochSecond * 1000000L, odt.getOffset.getTotalSeconds)
        case _ => null
      }
      case _ => null
    }
    case PointPartE(part, pe) => evalV(r, pe) match {
      case MPoint(crs, x, y) => part match {
        case "x" => x
        case "y" => y
        case "crs" => crs
        case other => sys.error(s"naive: unknown point part $other")
      }
      case _ => null
    }
    case DistanceE(ae, be3) => (evalV(r, ae), evalV(r, be3)) match {
      case (MPoint(c1, x1, y1), MPoint(c2, x2, y2)) =>
        if (c1 != c2) null
        else if (c1 == "cartesian") {
          val dx = x1 - x2; val dy = y1 - y2
          math.sqrt(dx * dx + dy * dy)
        } else { // haversine, operand order EXACTLY as the engine's
          val lat1 = math.toRadians(y1); val lat2 = math.toRadians(y2)
          val sLat = math.sin(math.toRadians(y2 - y1) / 2)
          val sLon = math.sin(math.toRadians(x2 - x1) / 2)
          val h = sLat * sLat +
            math.cos(lat1) * math.cos(lat2) * sLon * sLon
          math.asin(math.sqrt(h)) * 12756280.0
        }
      case _ => null
    }
    case DatePartE(part, d) => evalV(r, d) match {
      case ld: java.time.LocalDate => part match {
        case "year" => ld.getYear.toLong
        case "month" => ld.getMonthValue.toLong
        case "day" => ld.getDayOfMonth.toLong
      }
      case _ => null
    }
    case ArithE(op, le, re) =>
      (evalV(r, le), evalV(r, re)) match {
        case (null, _) | (_, null) => null
        case (x: String, y: String) if op == "+" => x + y
        case (x: Long, y: Long) => op match {
          case "+" => x + y
          case "-" => x - y
          case "*" => x * y
        }
        case (a, b) =>
          val x = a match { case l: Long => l.toDouble; case d: Double => d }
          val y = b match { case l: Long => l.toDouble; case d: Double => d }
          op match {
            case "+" => x + y
            case "-" => x - y
            case "*" => x * y
          }
      }
  }

  /** Spark DateTimeUtils.monthsBetween semantics (roundOff = true):
    * whole months when the days-of-month match or both are month-last;
    * otherwise a /31-day fraction rounded HALF_UP to 8 digits. The
    * engine's duration.between takes floor() of this. */
  private def sparkMonthsBetween(t1: java.time.LocalDateTime,
      t2: java.time.LocalDateTime): Double = {
    val months = (t1.getYear - t2.getYear) * 12L +
      (t1.getMonthValue - t2.getMonthValue)
    val last1 = t1.getDayOfMonth == t1.toLocalDate.lengthOfMonth
    val last2 = t2.getDayOfMonth == t2.toLocalDate.lengthOfMonth
    if (t1.getDayOfMonth == t2.getDayOfMonth || (last1 && last2))
      months.toDouble
    else {
      val sec1 = (t1.getDayOfMonth - 1) * 86400L +
        t1.toLocalTime.toSecondOfDay
      val sec2 = (t2.getDayOfMonth - 1) * 86400L +
        t2.toLocalTime.toSecondOfDay
      val diff = months + (sec1 - sec2).toDouble / (31L * 86400L)
      BigDecimal(diff).setScale(8, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    }
  }

  def evalB(r: Binding, e: BE): Option[Boolean] = e match {
    case CmpE(op, le, re) =>
      val (a, b) = (evalV(r, le), evalV(r, re))
      op match {
        case "=" => valueEq(a, b)
        case "<>" => valueEq(a, b).map(!_)
        case _ => valueCmp(a, b).map { c =>
          op match {
            case "<" => c < 0
            case "<=" => c <= 0
            case ">" => c > 0
            case ">=" => c >= 0
          }
        }
      }
    case IsNullE(x, not) =>
      val isNull = evalV(r, x) == null
      Some(if (not) !isNull else isNull)
    case InE(x, xs) =>
      if (xs.isEmpty) Some(false)
      else {
        val v = evalV(r, x)
        val elems = xs.map(valueEq(v, _))
        if (elems.exists(_.contains(true))) Some(true)
        else if (elems.exists(_.isEmpty)) None
        else Some(false)
      }
    case HasLabelE(v, l) => r.getOrElse(v, null) match {
      case n: MNode => Some(n.labels.contains(l))
      case null => None
      case _ => Some(false)
    }
    case InVE(xe, le) => evalV(r, le) match {
      case xs: List[_] =>
        if (xs.isEmpty) Some(false) // even for a null needle
        else {
          val v = evalV(r, xe)
          val elems = xs.map(valueEq(v, _))
          if (elems.exists(_.contains(true))) Some(true)
          else if (elems.exists(_.isEmpty)) None
          else Some(false)
        }
      case _ => None // null list
    }
    case StrPredE(op, le, re) => (evalV(r, le), evalV(r, re)) match {
      case (x: String, y: String) => Some(op match {
        case "STARTS WITH" => x.startsWith(y)
        case "ENDS WITH" => x.endsWith(y)
        case "CONTAINS" => x.contains(y)
      })
      case _ => None // null (or non-string) operand → unknown
    }
    case QuantBE(q, v, le, pred) => evalV(r, le) match {
      case xs: List[_] =>
        val outcomes = xs.map(x => evalB(r + (v -> x), pred))
        val trues = outcomes.count(_.contains(true))
        val unknowns = outcomes.count(_.isEmpty)
        q match {
          case "any" =>
            if (trues > 0) Some(true)
            else if (unknowns > 0) None else Some(false)
          case "all" =>
            if (outcomes.exists(_.contains(false))) Some(false)
            else if (unknowns > 0) None else Some(true)
          case "none" =>
            if (trues > 0) Some(false)
            else if (unknowns > 0) None else Some(true)
          case "single" =>
            if (trues >= 2) Some(false)
            else if (unknowns > 0) None else Some(trues == 1)
        }
      case _ => None // null list
    }
    case ExistsE(chain, _, _) =>
      // both forms lower to joins: DEFINITE true/false; a null outer var
      // can never pair → false (never unknown; see the Model scaladoc)
      Some(NaiveEval.matchChainsForExists(r, chain))
    case AndE(l, rr) => (evalB(r, l), evalB(r, rr)) match {
      case (Some(false), _) | (_, Some(false)) => Some(false)
      case (Some(true), Some(true)) => Some(true)
      case _ => None
    }
    case OrE(l, rr) => (evalB(r, l), evalB(r, rr)) match {
      case (Some(true), _) | (_, Some(true)) => Some(true)
      case (Some(false), Some(false)) => Some(false)
      case _ => None
    }
    case XorE(l, rr) => (evalB(r, l), evalB(r, rr)) match {
      case (Some(a), Some(b)) => Some(a ^ b)
      case _ => None
    }
    case NotE(x) => evalB(r, x).map(!_)
  }

  // ------------------------------------------------------- pattern match
  private def nodeOk(n: MNode, np: NodeP): Boolean =
    np.label.forall(n.labels.contains) &&
      np.propEq.forall { case (k, v) =>
        n.props.get(k).exists(pv => valueEq(pv, v).contains(true))
      }

  /** all extensions of `row` matching every chain of one MATCH clause, with
    * relationship uniqueness across the whole clause — including the rels
    * inside var-length paths (rels bound by EARLIER clauses do not
    * participate)
    */
  private def matchChains(g: MGraph, row: Binding,
      chains: List[Chain]): List[Binding] = {
    def oriented(cur: MNode, rel: MRel, dir: Dir): List[MNode] = dir match {
      case Out => if (rel.src == cur.id) List(g.node(rel.dst)) else Nil
      case In => if (rel.dst == cur.id) List(g.node(rel.src)) else Nil
      case Und =>
        // a self-loop is ONE undirected match, not two
        val fwd = if (rel.src == cur.id) List(g.node(rel.dst)) else Nil
        val bwd = if (rel.dst == cur.id && rel.src != rel.dst)
          List(g.node(rel.src)) else Nil
        fwd ++ bwd
    }
    def extendChain(state: (Binding, Set[Long]), chain: Chain)
        : List[(Binding, Set[Long])] = {
      val (row0, used0) = state
      val firstCands: List[MNode] = row0.get(chain.first.v) match {
        case Some(n: MNode) => if (nodeOk(n, chain.first)) List(n) else Nil
        case Some(_) => Nil
        case None => g.nodes.filter(nodeOk(_, chain.first)).toList
      }
      var acc = firstCands.map(n => (row0 + (chain.first.v -> n), used0))
      var prevVar = chain.first.v
      for ((rp, np) <- chain.hops) {
        acc = acc.flatMap { case (r, used) =>
          val cur = r(prevVar).asInstanceOf[MNode]
          def admit(value: Any, relsUsed: List[MRel], nxt: MNode,
              usedNow: Set[Long]): List[(Binding, Set[Long])] =
            if (!nodeOk(nxt, np)) Nil
            else r.get(np.v) match {
              case Some(bound: MNode) if bound.id != nxt.id => Nil
              case Some(_: MNode) | None =>
                List((r + (rp.v -> value) + (np.v -> nxt),
                  usedNow ++ relsUsed.map(_.id)))
              // anything else bound in node position — ESPECIALLY a null
              // from a failed earlier OPTIONAL MATCH — never matches
              // (hunt cases 2957/2984: the old wildcard rebound the null
              // as if the variable were fresh; the ENGINE was right)
              case Some(_) => Nil
            }
          rp.varLen match {
            case None =>
              g.rels.iterator
                .filter(rel => rp.typ.forall(_ == rel.typ) && !used(rel.id))
                .flatMap(rel => oriented(cur, rel, rp.dir)
                  .flatMap(nxt => admit(rel, List(rel), nxt, used)))
                .toList
            case Some((lo, hi)) =>
              // DFS path enumeration with per-clause edge uniqueness
              def paths(at: MNode, usedP: Set[Long],
                  acc0: List[MRel]): List[(List[MRel], MNode)] = {
                val here =
                  if (acc0.size >= lo) List((acc0.reverse, at)) else Nil
                if (acc0.size == hi) here
                else here ++ g.rels.iterator
                  .filter(rel => rp.typ.forall(_ == rel.typ) && !usedP(rel.id))
                  .flatMap(rel => oriented(at, rel, rp.dir)
                    .flatMap(nxt =>
                      paths(nxt, usedP + rel.id, rel :: acc0)))
                  .toList
              }
              paths(cur, used, Nil).flatMap { case (rels, nxt) =>
                admit(rels, rels, nxt, used)
              }
          }
        }
        prevVar = np.v
      }
      acc
    }
    chains.foldLeft(List((row, Set.empty[Long]))) { (accRows, chain) =>
      accRows.flatMap(extendChain(_, chain))
    }.map(_._1)
  }

  private def clauseVars(mc: MatchC): Set[String] =
    mc.chains.flatMap(c =>
      c.first.v :: c.hops.flatMap { case (r, n) => List(r.v, n.v) }).toSet ++
      mc.pathVar

  // the graph of the case being evaluated — set once per run(); lets
  // ExistsE reach pattern matching from inside the (graph-less) evalB
  // signature. ThreadLocal so parallel hunts can evaluate cases
  // concurrently (each case runs start-to-finish on one thread).
  private val curG = new ThreadLocal[MGraph]
  private[differential] def matchChainsForExists(r: Binding,
      chain: Chain): Boolean =
    matchChains(curG.get, r, List(chain)).nonEmpty

  private[differential] def countChainMatches(r: Binding,
      chain: Chain): Int =
    matchChains(curG.get, r, List(chain)).size

  def run(g: MGraph, q: Query): List[List[Any]] = {
    val base = runBody(g, q)
    q.unions.foldLeft(base) { case (acc, (all, sub)) =>
      val combined = acc ++ runBody(g, sub)
      if (all) combined
      else { // UNION dedup by Cypher equivalence (1 ≡ 1.0)
        val seen = scala.collection.mutable.HashSet.empty[Any]
        combined.filter(r => seen.add(r.map(normKey)))
      }
    }
  }

  private def runBody(g: MGraph, q: Query): List[List[Any]] = {
    var curGraph = g
    curG.set(curGraph)
    // a driving table seeds the binding table with its rows (each row
    // binds every column); otherwise the unit table
    var rows: List[Binding] = q.driving match {
      case Some((cols, data)) =>
        data.map(r => cols.map(_._1).zip(r).toMap)
      case None => List(Map.empty)
    }
    // fresh-id counters span ALL construct stages of the query: ids
    // minted by consecutive constructs must be disjoint (the engine's
    // session-global salt guarantee; round-9 consecutive-construct
    // grammar would otherwise collide a construct-2 copy with a cloned
    // construct-1 copy at the same counter value)
    var freshRelId = 10000000L
    var freshNodeId = -10000000L
    q.stages.foreach {
      case sc: SConstruct =>
        // constructed graph: distinct cloned nodes + distinct cloned rels
        // with their (topological) endpoints (rel clones are the same
        // whether written as CLONE or as a bound-rel NEW pattern); COPY OF
        // nodes and NEW edges one PER BINDING ROW (duplicate rows
        // duplicate elements — engine-verified, Probe46); binding table
        // resets to unit
        val nodesB =
          scala.collection.mutable.LinkedHashMap.empty[Long, MNode]
        val relsB = scala.collection.mutable.LinkedHashMap.empty[Long, MRel]
        rows.foreach { r =>
          sc.cloneNodes.foreach { v => r.get(v) match {
            case Some(n: MNode) => nodesB(n.id) = n
            case _ => ()
          } }
          sc.cloneRels.foreach { case (rv, _, _) => r.get(rv) match {
            case Some(rel: MRel) =>
              relsB(rel.id) = rel
              nodesB.getOrElseUpdate(rel.src, curGraph.node(rel.src))
              nodesB.getOrElseUpdate(rel.dst, curGraph.node(rel.dst))
            case _ => ()
          } }
          val copies = scala.collection.mutable.Map.empty[String, MNode]
          sc.copyNodes.foreach { case (nv, sv) => r.get(sv) match {
            case Some(n: MNode) =>
              val extraLbls = sc.copyLabels
                .collect { case (v, l) if v == nv => l }.toSet
              val cp = MNode(freshNodeId, n.labels ++ extraLbls, n.props)
              freshNodeId -= 1
              nodesB(cp.id) = cp
              copies(nv) = cp
            case _ => ()
          } }
          sc.newRels.foreach { case (sv, typ, dv, w) =>
            (r.get(sv).orElse(copies.get(sv)),
              r.get(dv).orElse(copies.get(dv))) match {
              case (Some(sn: MNode), Some(dn: MNode)) =>
                relsB(freshRelId) = MRel(freshRelId, sn.id, dn.id, typ,
                  w.map(v => Map[String, Any]("w" -> v))
                    .getOrElse(Map.empty[String, Any]))
                freshRelId += 1
              case _ => ()
            }
          }
        }
        curGraph = MGraph(nodesB.values.toVector, relsB.values.toVector)
        curG.set(curGraph)
        rows = List(Map.empty)
      case SUnwind(v, list) =>
        rows = rows.flatMap(r => list.map(x => r + (v -> x)))
      case SUnwindVar(v, src) =>
        // UNWIND null / [] → no rows for that binding
        rows = rows.flatMap { r =>
          r.getOrElse(src, null) match {
            case xs: List[_] => xs.map(x => r + (v -> x))
            case null => Nil
            case single => List(r + (v -> single))
          }
        }
      case SMatch(mc) =>
        rows = rows.flatMap { row =>
          val ext0 = matchChains(curGraph, row, mc.chains)
          // a named path binds its full node/rel sequence (PathVal) —
          // BEFORE the clause's own WHERE, which may reference it
          // (hunt 23694). Var-length hops reconstruct their intermediate
          // nodes by walking each rel from the current endpoint.
          val ext = mc.pathVar match {
            case None => ext0
            case Some(p) => ext0.map { r =>
              val chain = mc.chains.head
              var cur = r(chain.first.v).asInstanceOf[MNode]
              val nodes = List.newBuilder[MNode]
              val rels = List.newBuilder[MRel]
              nodes += cur
              chain.hops.foreach { case (rp, np) =>
                def step(rel: MRel): Unit = {
                  cur = curGraph.node(
                    if (rel.src == cur.id) rel.dst else rel.src)
                  rels += rel
                  nodes += cur
                }
                r(rp.v) match {
                  case xs: List[_] => xs.foreach(x => step(x.asInstanceOf[MRel]))
                  case rel: MRel => step(rel)
                  case _ => ()
                }
                cur = r(np.v).asInstanceOf[MNode] // endpoint (walk lands here)
              }
              r + (p -> PathVal(nodes.result(), rels.result()))
            }
          }
          val kept = mc.where match {
            case Some(w) => ext.filter(r => evalB(r, w).contains(true))
            case None => ext
          }
          if (mc.optional && kept.isEmpty) {
            val fresh = clauseVars(mc) -- row.keySet
            List(row ++ fresh.map(_ -> (null: Any)))
          } else kept
        }
      case SWith(d, items, where, ord, skip, limit) =>
        val projected: List[List[Any]] = projectItems(rows, items, d,
          Nil, None, None)
        val aliases = items.map(_.alias)
        // pre (unprojected) sort keys read the INPUT row — only generated
        // for plain projections, where projectItems is 1:1 and in order
        val plain = !d && !items.exists(_.isInstanceOf[AggItem])
        var out: List[(Binding, Binding)] = {
          val outs = projected.map(vals => aliases.zip(vals).toMap)
          if (plain) rows.zip(outs)
          else outs.map((Map.empty[String, Any], _))
        }
        // engine clause order: projection/agg → DISTINCT → ORDER BY →
        // SKIP/LIMIT → WHERE (planProjection then applyWhere, Probe49)
        if (ord.nonEmpty) {
          def key(p: (Binding, Binding), o: WithOrd): Any = {
            val v = (if (o.pre) p._1 else p._2).getOrElse(o.alias, null)
            if (!o.uid) v
            else v match {
              case null => null
              case n: MNode => n.props.getOrElse("uid", null)
              case rel: MRel => rel.props.getOrElse("uid", null)
              case _ => null
            }
          }
          def cmpNullGreatest(a: Any, b: Any): Int = (a, b) match {
            case (null, null) => 0
            case (null, _) => 1
            case (_, null) => -1
            case _ => valueCmp(a, b).getOrElse(0)
          }
          out = out.sortWith { (r1, r2) =>
            var res = 0
            var i = 0
            while (res == 0 && i < ord.length) {
              val o = ord(i)
              val c = cmpNullGreatest(key(r1, o), key(r2, o))
              res = if (o.asc) c else -c
              i += 1
            }
            res < 0
          }
        }
        skip.foreach(n => out = out.drop(n))
        limit.foreach(n => out = out.take(n))
        rows = out.map(_._2)
        where.foreach { w =>
          rows = rows.filter(r => evalB(r, w).contains(true))
        }
    }
    val out = projectItems(rows, q.ret.items, q.ret.distinct,
      q.ret.orderBy, q.ret.skip, q.ret.limit)
    out
  }

  // ----------------------------------------------------------- projection
  private def veFamily(e: VE): Char = NaiveEvalFamilies.family(e)

  private def dedupeByKey(vs: List[Any]): List[Any] = {
    val seen = scala.collection.mutable.HashSet.empty[Any]
    vs.filter(v => seen.add(normKey(v)))
  }

  private def aggValue(fn: String, distinct: Boolean, arg: Option[VE],
      argVals: List[Any], rowCount: Int): Any = fn match {
    case "count*" => rowCount.toLong
    case "count" =>
      val nn = argVals.filter(_ != null)
      (if (distinct) dedupeByKey(nn) else nn).size.toLong
    case "sum" =>
      val nn0 = argVals.filter(_ != null)
      val nn = if (distinct) dedupeByKey(nn0) else nn0
      if (veFamily(arg.get) == 'D')
        nn.map { case d: Double => d; case l: Long => l.toDouble }.sum
      else nn.map(_.asInstanceOf[Long]).sum
    case "avg" =>
      val nn0 = argVals.filter(_ != null)
      val nn = if (distinct) dedupeByKey(nn0) else nn0
      if (nn.isEmpty) null
      else {
        val s = nn.map {
          case d: Double => d; case l: Long => l.toDouble
        }.sum
        s / nn.size
      }
    case "min" | "max" =>
      val nn0 = argVals.filter(_ != null)
      val nn = if (distinct) dedupeByKey(nn0) else nn0
      if (nn.isEmpty) null
      else nn.reduce { (a, b) =>
        val c = valueCmp(a, b).getOrElse(0)
        if (fn == "min") (if (c <= 0) a else b) else (if (c >= 0) a else b)
      }
    case "collect" =>
      val nn = argVals.filter(_ != null)
      if (distinct) dedupeByKey(nn) else nn
  }

  private def itemValue(r: Binding, it: RetItem): Any = it match {
    case ValItem(e, _) => evalV(r, e)
    case PassItem(v) => r.getOrElse(v, null)
    case AliasItem(v, _) => r.getOrElse(v, null)
    case _ => sys.error("unreachable")
  }

  /** shared RETURN/WITH projection: grouping+aggregates OR plain rows, then
    * DISTINCT / ORDER BY / SKIP / LIMIT
    */
  private def projectItems(rows: List[Binding], items: List[RetItem],
      distinct: Boolean, orderBy: List[(String, Boolean)],
      skip: Option[Int], limit: Option[Int]): List[List[Any]] = {
    val hasAgg = items.exists(_.isInstanceOf[AggItem])
    var out: List[List[Any]] =
      if (!hasAgg) rows.map(r => items.map(itemValue(r, _)))
      else {
        val keyItems = items.filter(!_.isInstanceOf[AggItem])
        val groups = scala.collection.mutable.LinkedHashMap
          .empty[List[Any], (List[Any], scala.collection.mutable.ListBuffer[Binding])]
        rows.foreach { r =>
          val raw = keyItems.map(itemValue(r, _))
          val k = raw.map(normKey)
          groups.getOrElseUpdate(k,
            (raw, scala.collection.mutable.ListBuffer.empty))._2 += r
        }
        if (groups.isEmpty && keyItems.isEmpty)
          groups(Nil) = (Nil, scala.collection.mutable.ListBuffer.empty)
        groups.values.toList.map { case (rawKeys, grpRows) =>
          var ki = 0
          items.map {
            case AggItem(fn, arg, d, _) =>
              val argVals = arg.map(a => grpRows.toList.map(evalV(_, a)))
                .getOrElse(Nil)
              aggValue(fn, d, arg, argVals, grpRows.size)
            case _ => val v = rawKeys(ki); ki += 1; v
          }
        }
      }
    if (distinct && !hasAgg) {
      val seen = scala.collection.mutable.HashSet.empty[Any]
      out = out.filter(r => seen.add(r.map(normKey)))
    }
    if (orderBy.nonEmpty) {
      val aliasIdx = items.map(_.alias).zipWithIndex.toMap
      val keys = orderBy.map { case (a, asc) => (aliasIdx(a), asc) }
      // asc = nulls LAST, desc = nulls FIRST (Neo4j / engine semantics:
      // reverse of the null-greatest ascending order)
      // ORDER BY totally orders even values that are NOT '<'-comparable:
      // points sort by their struct encoding (crs, then x, then y) —
      // the engine's Spark struct order (round-8 hunt 139560)
      def orderOnlyCmp(a: Any, b: Any): Int = (a, b) match {
        case (x: MPoint, y: MPoint) =>
          val c = x.crs.compareTo(y.crs)
          if (c != 0) c
          else {
            val cx = java.lang.Double.compare(x.x, y.x)
            if (cx != 0) cx else java.lang.Double.compare(x.y, y.y)
          }
        case _ => 0
      }
      def cmpNullGreatest(a: Any, b: Any): Int = (a, b) match {
        case (null, null) => 0
        case (null, _) => 1
        case (_, null) => -1
        case _ => valueCmp(a, b).getOrElse(orderOnlyCmp(a, b))
      }
      out = out.sortWith { (r1, r2) =>
        var i = 0
        var res = 0
        while (res == 0 && i < keys.length) {
          val (idx, asc) = keys(i)
          val c = cmpNullGreatest(r1(idx), r2(idx))
          res = if (asc) c else -c
          i += 1
        }
        res < 0
      }
    }
    skip.foreach(n => out = out.drop(n))
    limit.foreach(n => out = out.take(n))
    out
  }
}

/** ScalaCheck generators for (graph, query) cases. All generators are total
  * (no suchThat/filter) so pureApply(seed) always yields a case.
  */
object DiffGen {
  import Model._

  private val labels = Vector("A", "B")
  private val relTypes = Vector("T", "S")
  // multi-char values give substring/left/right/replace/CONTAINS real work;
  // all lowercase [a-z]+ (renderLit does no escaping, toUpper stays 1:1)
  private val strVals = Vector("a", "b", "c", "d", "ab", "ba", "abc", "abab")

  // ------------------------------------------------------------- graph
  private def genProps(uid: Long): Gen[Map[String, Any]] = for {
    hasK <- Gen.prob(0.75); k <- Gen.choose(0L, 4L)
    hasS <- Gen.prob(0.6); s <- Gen.oneOf(strVals)
    hasF <- Gen.prob(0.6); fn <- Gen.choose(1, 6)
    hasB <- Gen.prob(0.5); b <- Gen.oneOf(true, false)
    hasD <- Gen.prob(0.5); dOff <- Gen.choose(0L, 40L)
    hasZ <- Gen.prob(0.45)
    hasZS <- Gen.prob(0.35)
    hasPt <- Gen.prob(0.4)
  } yield {
    var m = Map[String, Any]("uid" -> uid)
    if (hasK) m += "k" -> k
    if (hasS) m += "s" -> s
    if (hasF) m += "f" -> (fn * 0.5)
    if (hasB) m += "b" -> b
    if (hasD) m += "d" -> java.time.LocalDate.of(2024, 1, 1).plusDays(dOff)
    // prop-pool zdt: unique instant per node (hour steps from a 2025
    // base, disjoint from the literal pool), offset derived from the
    // instant index — instant-equal ⇒ identical (inst, off)
    if (hasZ) m += "zd" -> MZdt(propZdtBase + uid * 3600000000L,
      zdtOffsets((uid % zdtOffsets.size).toInt))
    // pt: point prop (family 'G', round 8) — coordinates overlap the
    // literal pool so equality comparisons hit both ways
    if (hasPt) m += "pt" -> MPoint(
      if (uid % 3 == 0) "wgs-84" else "cartesian",
      (uid % 3) * 1.5, (uid % 5).toDouble - 2.0)
    // zs: the SAME pool value rendered as an ISO string — the
    // column-valued datetime(n.zs) parse path (round 8); independent
    // presence so missing-prop nulls get hunted too
    if (hasZS) m += "zs" -> MZdt(propZdtBase + uid * 3600000000L,
      zdtOffsets((uid % zdtOffsets.size).toInt)).renderIso
    m
  }
  /** 2025-01-01T00:00Z in epoch micros (zdt prop pool base) */
  private val propZdtBase = 1735689600000000L
  /** 2024-02-01T00:00Z in epoch micros (zdt literal pool base) */
  private val litZdtBase = 1706745600000000L
  private val zdtOffsets = Vector(0, 3600, -7200, 5400, -3600)

  private def genNode(id: Long): Gen[MNode] = for {
    hasA <- Gen.prob(0.6)
    hasB <- Gen.prob(0.4)
    props <- genProps(id)
  } yield MNode(id, Set("A").filter(_ => hasA) ++ Set("B").filter(_ => hasB),
    props)

  private def genRel(id: Long, nNodes: Int): Gen[MRel] = for {
    src <- Gen.choose(0, nNodes - 1)
    dst <- Gen.choose(0, nNodes - 1)
    typ <- Gen.frequency(7 -> Gen.const("T"), 3 -> Gen.const("S"))
    hasW <- Gen.prob(0.8); w <- Gen.choose(0L, 4L)
  } yield MRel(id, src, dst, typ,
    Map[String, Any]("uid" -> (1000L + id)) ++
      (if (hasW) Map[String, Any]("w" -> w) else Map.empty[String, Any]))

  val genGraph: Gen[MGraph] = for {
    nNodes <- Gen.choose(3, 7)
    nodes <- Gen.sequence[Vector[MNode], MNode](
      (0 until nNodes).map(i => genNode(i.toLong)))
    nRels <- Gen.choose(0, 11)
    rels <- Gen.sequence[Vector[MRel], MRel](
      (0 until nRels).map(i => genRel(i.toLong, nNodes)))
  } yield MGraph(nodes, rels)

  // ------------------------------------------------------------- query
  /** valVars: projected/unwound scalars with their type family (list
    * families 'M'/'T' for DETERMINISTICALLY-ordered projected lists);
    * vlVars: var-length rel-list variables (only size() may touch them);
    * bagVars: collect()-produced lists whose element ORDER is unspecified —
    * only order-insensitive consumers may touch them (size, IN's list
    * side, UNWIND)
    */
  private final case class Ctx(nodeVars: List[String], relVars: List[String],
      valVars: List[(String, Char)], vlVars: List[String],
      bagVars: List[(String, Char)] = Nil,
      pathVars: List[String] = Nil)
  private val emptyCtx = Ctx(Nil, Nil, Nil, Nil)

  /** list expression OR an unordered collect-list var, for consumers that
    * don't observe element order
    */
  private def genListOrBag(ctx: Ctx, listFam: Char): Gen[VE] = {
    val bags = ctx.bagVars.collect {
      case (v, f) if f == listFam => VarE(v, f): VE
    }
    if (bags.isEmpty) genListVE(ctx, listFam)
    else Gen.frequency(6 -> genListVE(ctx, listFam), 4 -> Gen.oneOf(bags))
  }

  private def keysOf(ctx: Ctx, fam: Char): List[(String, String)] = {
    val nk = fam match {
      case 'L' => List("uid", "k")
      case 'S' => List("s")
      case 'D' => List("f")
      case 'B' => List("b")
      case 'E' => List("d")
      case 'Z' => List("zd")
      case 'G' => List("pt")
    }
    val rk = fam match {
      case 'L' => List("uid", "w")
      case _ => Nil
    }
    ctx.nodeVars.flatMap(v => nk.map(v -> _)) ++
      ctx.relVars.flatMap(v => rk.map(v -> _))
  }

  private def genLit(fam: Char): Gen[Any] = fam match {
    case 'L' => Gen.frequency(
      3 -> Gen.choose(0L, 4L), 1 -> Gen.choose(0L, 12L),
      1 -> Gen.choose(1000L, 1010L))
    case 'S' => Gen.oneOf(strVals)
    case 'D' => Gen.choose(1, 6).map(_ * 0.5)
    case 'B' => Gen.oneOf(true, false)
    case 'E' => Gen.choose(0L, 40L).map(
      java.time.LocalDate.of(2024, 1, 1).plusDays(_))
    // literal-pool zdt: minute steps from a 2024 base (disjoint from the
    // prop pool); offset derived from the step so instant-equal literal
    // pairs (which = / DISTINCT want) are representation-identical
    case 'Z' => Gen.choose(0L, 30L).map(k =>
      MZdt(litZdtBase + k * 60000000L, zdtOffsets((k % zdtOffsets.size).toInt)))
    // literal points overlap the prop pool's coordinate grid
    case 'G' => for {
      crs <- Gen.oneOf("cartesian", "wgs-84")
      xi <- Gen.choose(0L, 2L); yi <- Gen.choose(0L, 4L)
    } yield MPoint(crs, xi * 1.5, yi.toDouble - 2.0)
  }

  private def genValueVE(ctx: Ctx, fam: Char): Gen[VE] = {
    val props = keysOf(ctx, fam)
    val leafs = props.map { case (v, k) => PropE(v, k): VE } ++
      ctx.valVars.collect { case (v, f) if f == fam => VarE(v, f): VE } ++
      (if (fam == 'L') ctx.vlVars.map(SizeE(_): VE) ++
        ctx.pathVars.map(PathLenE(_): VE) ++
        ctx.pathVars.map(PathRelsSizeE(_): VE) else Nil) ++
      // column-valued datetime(n.zs) parses are representation-safe
      // anywhere a zd prop is (same pool value) — round 8
      (if (fam == 'Z') ctx.nodeVars.map(DtParseE(_): VE) else Nil)
    if (leafs.isEmpty) genLit(fam).map(LitE)
    else Gen.frequency(
      7 -> Gen.oneOf(leafs),
      3 -> genLit(fam).map(LitE))
  }

  private def genArith(ctx: Ctx): Gen[VE] = for {
    fam <- Gen.frequency(5 -> Gen.const('L'), 3 -> Gen.const('D'),
      2 -> Gen.const('S'))
    op <- if (fam == 'S') Gen.const("+") else Gen.oneOf("+", "-", "*")
    l <- genValueVE(ctx, fam)
    // numeric mixes Long/Double sides sometimes
    rf <- if (fam == 'D') Gen.frequency(7 -> Gen.const('D'), 3 -> Gen.const('L'))
    else Gen.const(fam)
    r <- genValueVE(ctx, rf)
  } yield ArithE(op, l, r)

  private def genStrFnE(ctx: Ctx): Gen[VE] = for {
    arg <- genValueVE(ctx, 'S')
    fn <- Gen.oneOf("toUpper", "reverse", "trim", "left", "right",
      "substring", "replace")
    n1 <- Gen.choose(0L, 4L)
    twoArg <- Gen.prob(0.6)
    n2 <- Gen.choose(0L, 3L)
    needle <- Gen.oneOf(strVals)
    rep <- Gen.oneOf("", "x", "yz")
  } yield fn match {
    case "left" | "right" => StrFnE(fn, arg, List(n1))
    case "substring" =>
      StrFnE(fn, arg, if (twoArg) List(n1, n2) else List(n1))
    case "replace" => StrFnE(fn, arg, List(needle, rep))
    case other => StrFnE(other, arg, Nil)
  }

  private def genDateArith(ctx: Ctx): Gen[VE] = for {
    d <- genValueVE(ctx, 'E')
    plus <- Gen.oneOf(true, false)
    days <- Gen.choose(0L, 15L)
  } yield DateArithE(d, plus, days)

  private def genDatePart(ctx: Ctx): Gen[VE] = for {
    d <- genValueVE(ctx, 'E')
    part <-Gen.oneOf("year", "month", "day")
  } yield DatePartE(part, d)

  private def genZdtArith(ctx: Ctx): Gen[VE] = for {
    z <- genValueVE(ctx, 'Z')
    plus <- Gen.oneOf(true, false)
    mo <- Gen.frequency(6 -> Gen.const(0L), 4 -> Gen.choose(1L, 3L))
    d <- Gen.frequency(4 -> Gen.const(0L), 6 -> Gen.choose(1L, 20L))
    h <- Gen.frequency(4 -> Gen.const(0L), 6 -> Gen.choose(1L, 40L))
  } yield ZdtArithE(z, plus, mo, d, h)

  private def genZdtPart(ctx: Ctx): Gen[VE] = for {
    // accessor bases include ± duration arithmetic (read per row, so the
    // representation-collision caveat doesn't bite)
    z <- Gen.frequency(6 -> genValueVE(ctx, 'Z'), 4 -> genZdtArith(ctx))
    part <- Gen.oneOf("hour", "minute", "epochSeconds", "offsetSeconds")
  } yield ZdtPartE(part, z)

  private def genPointPart(ctx: Ctx, fam: Char): Gen[VE] = for {
    pe <- genValueVE(ctx, 'G')
    part <- if (fam == 'S') Gen.const("crs") else Gen.oneOf("x", "y")
  } yield PointPartE(part, pe)

  private def genDistance(ctx: Ctx): Gen[VE] = for {
    a <- genValueVE(ctx, 'G')
    b <- genValueVE(ctx, 'G')
  } yield DistanceE(a, b)

  private def genDurBetween(ctx: Ctx): Gen[VE] = for {
    fn <- Gen.frequency(5 -> Gen.const("between"),
      3 -> Gen.const("inDays"), 2 -> Gen.const("inSeconds"))
    a <- genValueVE(ctx, 'Z')
    b <- genValueVE(ctx, 'Z')
    part <- fn match {
      case "between" => Gen.oneOf("months", "days", "seconds")
      case "inDays" => Gen.const("days")
      case _ => Gen.const("seconds")
    }
  } yield DurBetweenPartE(fn, part, a, b)

  private def genNumFnE(ctx: Ctx, resultFam: Char): Gen[VE] = for {
    // sign always yields integer; abs preserves its argument family
    p <- if (resultFam == 'D') Gen.const(("abs", 'D'))
    else Gen.oneOf(("abs", 'L'), ("sign", 'L'), ("sign", 'D'))
    neg <- Gen.prob(0.4) // corpus numbers are non-negative; force some
    x <- genValueVE(ctx, p._2)
    l <- genLit(p._2)
  } yield NumFnE(p._1, if (neg) ArithE("-", LitE(l), x) else x)

  /** searched CASE with same-family branch values; conditions are plain
    * comparison / IS NULL leafs (never rich — bounds the recursion)
    */
  private def genCaseE(ctx: Ctx, fam: Char): Gen[VE] = for {
    n <- Gen.frequency(6 -> Gen.const(1), 4 -> Gen.const(2))
    // round 7: EXISTS/pattern predicates as CASE conditions (genExistsE
    // builds chains directly — no recursion back through genLeaf)
    conds <- Gen.listOfN(n, Gen.frequency(
      8 -> genLeafPlain(ctx),
      (if (ctx.nodeVars.nonEmpty) 3 else 0) -> genExistsE(ctx)))
    vals <- Gen.listOfN(n, genValueVE(ctx, fam))
    hasEls <- Gen.prob(0.7) // no ELSE → null
    els <- genValueVE(ctx, fam)
  } yield CaseE(conds.zip(vals), if (hasEls) Some(els) else None)

  private def genCoalesceE(ctx: Ctx, fam: Char): Gen[VE] = for {
    a <- genValueVE(ctx, fam)
    b <- genValueVE(ctx, fam)
  } yield CoalesceE(List(a, b))

  // --------------------------------------------------------------- lists
  private def genListLit(ctx: Ctx, ef: Char): Gen[VE] = for {
    n <- Gen.choose(1, 3)
    elems <- Gen.listOfN(n, Gen.frequency(
      8 -> genValueVE(ctx, ef),
      1 -> Gen.const(LitE(null): VE))) // null elements survive in literals
  } yield ListLitE(elems, ef)

  // ------------------------------------------------------------- maps
  private val nodePropFam =
    Map("uid" -> 'L', "k" -> 'L', "s" -> 'S', "f" -> 'D', "b" -> 'B')
  private def projKeysFor(fam: Char): List[String] =
    nodePropFam.collect { case (k, f) if f == fam => k }.toList.sorted

  private def genMapLit(ctx: Ctx): Gen[VE] = for {
    n <- Gen.choose(1, 3)
    fams <- Gen.listOfN(n, Gen.oneOf('L', 'S', 'D', 'B'))
    ves <- Gen.sequence[List[VE], VE](fams.map(genValueVE(ctx, _)))
  } yield MapLitE(List("a", "b", "c").take(n).lazyZip(ves).lazyZip(fams)
    .map((k, v, f) => (k, v, f)))

  private def genMapProj(ctx: Ctx): Gen[VE] =
    if (ctx.nodeVars.isEmpty) genMapLit(ctx)
    else for {
      v <- Gen.oneOf(ctx.nodeVars)
      n <- Gen.choose(1, 3)
      keys <- Gen.pick(n, List("uid", "k", "s", "f", "b"))
    } yield MapProjE(v, keys.toList.sorted)

  /** map as a RETURN-item value */
  private def genMapVE(ctx: Ctx): Gen[VE] =
    Gen.frequency(5 -> genMapLit(ctx), 5 -> genMapProj(ctx))

  /** scalar extraction `<map>.key` with a known result family */
  private def genMapIdx(ctx: Ctx, fam: Char): Gen[VE] = {
    val litG: Gen[VE] = for {
      extraFam <- Gen.oneOf('L', 'S', 'D', 'B')
      v1 <- genValueVE(ctx, fam)
      v2 <- genValueVE(ctx, extraFam)
      first <- Gen.oneOf(true, false)
    } yield {
      val entries = if (first) List(("a", v1, fam), ("b", v2, extraFam))
      else List(("a", v2, extraFam), ("b", v1, fam))
      MapIdxE(MapLitE(entries), if (first) "a" else "b", fam)
    }
    val projG: Gen[VE] =
      if (ctx.nodeVars.isEmpty || projKeysFor(fam).isEmpty) litG
      else for {
        v <- Gen.oneOf(ctx.nodeVars)
        key <- Gen.oneOf(projKeysFor(fam))
        extra <- Gen.oneOf(nodePropFam.keys.toList.sorted)
      } yield MapIdxE(MapProjE(v, (key :: extra :: Nil).distinct.sorted),
        key, fam)
    Gen.frequency(6 -> litG, 4 -> projG)
  }

  /** struct-style map equality: projection vs literal/projection over the
    * SAME key template (keyset mismatches are trivially false)
    */
  private def genMapEq(ctx: Ctx): Gen[BE] = {
    val projSide: Gen[BE] = for {
      op <- Gen.oneOf("=", "<>")
      v <- Gen.oneOf(ctx.nodeVars)
      n <- Gen.choose(1, 2)
      keys <- Gen.pick(n, List("uid", "k", "s", "f", "b"))
      ks = keys.toList.sorted
      lits <- Gen.sequence[List[VE], VE](
        ks.map(k => genValueVE(ctx, nodePropFam(k))))
      v2 <- Gen.oneOf(ctx.nodeVars)
      litRhs <- Gen.prob(0.6)
    } yield CmpE(op, MapProjE(v, ks),
      if (litRhs) MapLitE(ks.zip(lits).map { case (k, e) =>
        (k, e, nodePropFam(k))
      }) else MapProjE(v2, ks))
    val litSide: Gen[BE] = for {
      op <- Gen.oneOf("=", "<>")
      n <- Gen.choose(1, 2)
      fams <- Gen.listOfN(n, Gen.oneOf('L', 'S', 'D', 'B'))
      ks = List("a", "b").take(n)
      l <- Gen.sequence[List[VE], VE](fams.map(genValueVE(ctx, _)))
      r2 <- Gen.sequence[List[VE], VE](fams.map(genValueVE(ctx, _)))
    } yield CmpE(op,
      MapLitE(ks.lazyZip(l).lazyZip(fams).map((k, v, f) => (k, v, f))),
      MapLitE(ks.lazyZip(r2).lazyZip(fams).map((k, v, f) => (k, v, f))))
    if (ctx.nodeVars.isEmpty) litSide
    else Gen.frequency(6 -> projSide, 4 -> litSide)
  }

  /** mixed L+S list — engine-side this is the tagged-union encoding */
  private def genMixedListLit(ctx: Ctx): Gen[VE] = for {
    a <- genValueVE(ctx, 'L')
    b <- genValueVE(ctx, 'S')
    flip <- Gen.oneOf(true, false)
  } yield ListLitE(if (flip) List(a, b) else List(b, a), 'X')

  private val genRangeE: Gen[VE] = for {
    lo <- Gen.choose(0L, 3L)
    span <- Gen.choose(-1L, 4L) // negative → empty range
    hasStep <- Gen.prob(0.3)
    step <- Gen.oneOf(1L, 2L, 3L)
  } yield RangeE(lo, lo + span, if (hasStep) Some(step) else None)

  /** list-valued expression of family 'M' | 'T' (var / literal / range,
    * optionally sliced)
    */
  private def genListVE(ctx: Ctx, listFam: Char): Gen[VE] = {
    val ef = if (listFam == 'M') 'L' else 'S'
    val vars = ctx.valVars.collect {
      case (v, f) if f == listFam => VarE(v, f): VE
    } ++ (if (listFam == 'M') ctx.pathVars.map(PathNodesUidsE(_): VE)
    else Nil)
    val base: List[(Int, Gen[VE])] =
      (6 -> genListLit(ctx, ef)) ::
        (if (listFam == 'M') List(3 -> genRangeE) else Nil)
    val sliced: Gen[VE] = for {
      b0 <- Gen.frequency(
        ((if (vars.nonEmpty) List(4 -> Gen.oneOf(vars)) else Nil) ++
          base): _*)
      hasFrom <- Gen.prob(0.7); f <- Gen.choose(-2L, 3L)
      hasTo <- Gen.prob(0.7); t <- Gen.choose(-2L, 4L)
    } yield SliceE(b0, if (hasFrom) Some(LitE(f)) else None,
      if (hasTo) Some(LitE(t)) else None)
    // `[lcv IN <base> WHERE cmp | proj]`; proj stays in the REQUESTED
    // element family so the result family is still listFam
    val comprehended: Gen[VE] = for {
      srcEf <- Gen.oneOf('L', 'S')
      b0 <- Gen.frequency(
        (6 -> genListLit(ctx, srcEf)) ::
          (if (srcEf == 'L') List(3 -> genRangeE) else Nil): _*)
      inner = ctx.copy(valVars = ctx.valVars :+ (("lcv", srcEf)))
      hasWhere <- Gen.prob(0.6)
      w <- genCmp(inner)
      hasProj <- Gen.prob(0.7)
      p <- genValueVE(inner, ef)
    } yield {
      // no-projection form only when the source family already matches
      val proj = if (hasProj || srcEf != ef) Some(p) else None
      ListCompE("lcv", b0, if (hasWhere) Some(w) else None, proj, srcEf)
    }
    Gen.frequency(
      ((if (vars.nonEmpty) List(6 -> Gen.oneOf(vars)) else Nil) ++
        base ++ List(2 -> sliced, 2 -> comprehended)): _*)
  }

  private def genIdxVE(ctx: Ctx, listFam: Char): Gen[VE] = for {
    l <- genListVE(ctx, listFam)
    kind <- Gen.frequency(5 -> Gen.const(0), 4 -> Gen.const(1),
      1 -> Gen.const(2))
    litIdx <- Gen.choose(-2L, 4L) // negative + out-of-range on purpose
    varIdx <- genValueVE(ctx, 'L')
  } yield kind match {
    case 0 => IdxE(l, LitE(litIdx))
    case 1 => IdxE(l, varIdx)
    case _ => IdxE(l, LitE(null))
  }

  /** scalar-valued list consumers; resultFam 'L' additionally gets size()
    * over either list family
    */
  private def genListConsumer(ctx: Ctx, resultFam: Char): Gen[VE] = {
    val listFam = if (resultFam == 'L') 'M' else 'T'
    val core = Gen.frequency(
      5 -> genIdxVE(ctx, listFam),
      3 -> genListVE(ctx, listFam).flatMap(l =>
        Gen.oneOf("head", "last").map(HeadLastE(_, l))))
    if (resultFam != 'L') core
    else Gen.frequency(
      7 -> core,
      3 -> Gen.oneOf('M', 'T').flatMap(genListOrBag(ctx, _)).map(ListSizeE))
  }

  /** value expr that may wrap leafs in CASE / coalesce / string / numeric
    * functions; wrapper args stay plain leafs so generation terminates
    */
  /** counting pattern comprehension from a bound node var:
    * size([(anchor)-[:T]->(end) | 1])
    */
  private def genPatCompSize(ctx: Ctx): Gen[VE] =
    if (ctx.nodeVars.isEmpty) Gen.const(LitE(0L))
    else for {
      anchor <- Gen.oneOf(ctx.nodeVars)
      typ <- Gen.frequency(4 -> Gen.const(None),
        6 -> Gen.oneOf(relTypes).map(Some(_)))
      dir <- Gen.frequency(5 -> Gen.const(Out: Dir), 3 -> Gen.const(In: Dir),
        2 -> Gen.const(Und: Dir))
      endBound <- Gen.prob(0.2)
      endVar <- Gen.oneOf(ctx.nodeVars)
      lbl <- Gen.frequency(5 -> Gen.const(None),
        5 -> Gen.oneOf(labels).map(Some(_)))
      hasProp <- Gen.prob(0.25)
      pk <- Gen.oneOf("k", "s")
      pv <- genLit(if (pk == "k") 'L' else 'S')
    } yield {
      val end =
        if (endBound) NodeP(endVar, None, Map.empty)
        else NodeP("pcx", lbl, if (hasProp) Map(pk -> pv) else Map.empty)
      val outer = Set(anchor) ++ (if (endBound) Set(endVar) else Set.empty)
      PatCompSizeE(Chain(NodeP(anchor, None, Map.empty),
        List((RelP("pcr", typ, dir, None), end))), outer)
    }

  private def genRichVE(ctx: Ctx, fam: Char): Gen[VE] = {
    if (NaiveEvalFamilies.isListFam(fam)) return genListVE(ctx, fam)
    val wrapped: List[(Int, Gen[VE])] = fam match {
      case 'S' => List(3 -> genStrFnE(ctx), 2 -> genListConsumer(ctx, 'S'),
        1 -> genMapIdx(ctx, 'S'))
      case 'L' => List(2 -> genNumFnE(ctx, 'L'),
        1 -> genValueVE(ctx, 'S').map(StrFnE("strSize", _, Nil)),
        2 -> genListConsumer(ctx, 'L'),
        1 -> genMapIdx(ctx, 'L'),
        1 -> genDatePart(ctx),
        1 -> genZdtPart(ctx),
        2 -> genDurBetween(ctx),
        (if (ctx.nodeVars.nonEmpty) 2 else 0) -> genPatCompSize(ctx))
      // NOTE: no genDistance here — this pool feeds sum/avg arguments,
      // and accumulating irrational doubles is fp-association-sensitive
      // (engine partial aggregation vs the model's sequential fold —
      // hunt 138026); point x/y stay (the pools are exact halves)
      case 'D' => List(3 -> genNumFnE(ctx, 'D'), 1 -> genMapIdx(ctx, 'D'),
        1 -> genPointPart(ctx, 'D'))
      case 'E' => List(4 -> genDateArith(ctx))
      case 'Z' => Nil // CASE/coalesce below are the only 'Z' wrappers
      case 'G' => Nil // CASE/coalesce below are the only 'G' wrappers
      // a whole predicate as a boolean value (unknown → null)
      case _ => List(3 -> genLeafPlain(ctx).map(BoolVE),
        1 -> genMapIdx(ctx, 'B'))
    }
    Gen.frequency((10 -> genValueVE(ctx, fam)) ::
      (2 -> genCaseE(ctx, fam)) ::
      (1 -> genCoalesceE(ctx, fam)) :: wrapped: _*)
  }

  private def genCmp(ctx: Ctx): Gen[BE] = for {
    fam <- Gen.frequency(5 -> Gen.const('L'), 2 -> Gen.const('S'),
      2 -> Gen.const('D'), 1 -> Gen.const('B'), 1 -> Gen.const('E'),
      2 -> Gen.const('Z'), 1 -> Gen.const('G'))
    op <- if (fam == 'B') Gen.oneOf("=", "<>")
    else Gen.oneOf("=", "<>", "<", "<=", ">", ">=")
    l <- genValueVE(ctx, fam)
    kind0 <- Gen.frequency(88 -> Gen.const(0), 5 -> Gen.const(1),
      4 -> Gen.const(2), 3 -> Gen.const(3))
    // dates/zdts keep same-family comparisons (cross-family temporal
    // equality and numeric arithmetic have no temporal forms); for dates
    // ± duration replaces arith; zdt comparisons lean on ± duration
    // arithmetic (round 8 — the newest engine surface gets the miles)
    zArith <- Gen.prob(0.4)
    kind = if ((fam == 'E' || fam == 'Z') && kind0 == 1) 0
      else if (fam == 'Z' && kind0 == 0 && zArith) 3
      else if (fam == 'G' && kind0 == 3) 0 // no point arithmetic
      else kind0
    dplus <- Gen.oneOf(true, false)
    ddays <- Gen.choose(0L, 15L)
    r <- kind match {
      case 1 =>
        // cross-family: = / <> are definite, orderings are null
        val other = Vector('L', 'S', 'D', 'B').filter(_ != fam)
        Gen.oneOf(other).flatMap(genLit).map(LitE(_): VE)
      case 2 => Gen.const(LitE(null): VE) // null literal: always unknown
      case 3 if fam == 'E' =>
        genValueVE(ctx, 'E').map(DateArithE(_, dplus, ddays): VE)
      case 3 if fam == 'Z' => genZdtArith(ctx) // zdt ± duration (round 8)
      case 3 => genArith(ctx)
      case _ => genValueVE(ctx, fam)
    }
  } yield CmpE(op, l, r)

  /** plain predicate leaf: the variant CASE conditions and BoolVE wrap.
    * Deliberately excludes the rich-comparison and EXISTS arms — those
    * reach back through genRichVE / genLeafPlain and would make generator
    * CONSTRUCTION (not just sampling) infinitely recursive.
    */
  private def genLeafPlain(ctx: Ctx): Gen[BE] = {
    val isNullG: Gen[BE] = for {
      fam <- Gen.oneOf('L', 'S', 'D', 'B', 'E', 'Z', 'G')
      e <- genValueVE(ctx, fam)
      not <- Gen.oneOf(true, false)
    } yield IsNullE(e, not)
    val inG: Gen[BE] = for {
      fam <- Gen.frequency(6 -> Gen.const('L'), 4 -> Gen.const('S'))
      e <- genValueVE(ctx, fam)
      n <- Gen.choose(0, 3)
      xs <- Gen.listOfN(n, Gen.frequency(
        5 -> genLit(fam), 1 -> Gen.const(null: Any)))
    } yield InE(e, xs)
    val hasLabelG: Gen[BE] =
      if (ctx.nodeVars.isEmpty) genCmp(ctx)
      else for {
        v <- Gen.oneOf(ctx.nodeVars)
        l <- Gen.oneOf(labels)
      } yield HasLabelE(v, l)
    val strPredG: Gen[BE] = for {
      op <- Gen.oneOf("STARTS WITH", "ENDS WITH", "CONTAINS")
      l <- Gen.frequency(7 -> genValueVE(ctx, 'S'), 3 -> genStrFnE(ctx))
      r <- Gen.frequency(6 -> genValueVE(ctx, 'S'),
        4 -> Gen.oneOf(strVals).map(LitE(_): VE))
    } yield StrPredE(op, l, r)
    val inVG: Gen[BE] = for {
      listFam <- Gen.frequency(6 -> Gen.const('M'), 4 -> Gen.const('T'))
      x <- genValueVE(ctx, if (listFam == 'M') 'L' else 'S')
      l <- genListOrBag(ctx, listFam)
    } yield InVE(x, l)
    // all/any/none/single over a list; the predicate mostly tests the
    // lambda var against a plain value of its family (order-insensitive,
    // so bags are fair game)
    val quantG: Gen[BE] = for {
      q <- Gen.oneOf("all", "any", "none", "single")
      listFam <- Gen.frequency(6 -> Gen.const('M'), 4 -> Gen.const('T'))
      ef = if (listFam == 'M') 'L' else 'S'
      l <- genListOrBag(ctx, listFam)
      inner = ctx.copy(valVars = ctx.valVars :+ (("qv", ef)))
      op <- if (ef == 'S') Gen.oneOf("=", "<>")
      else Gen.oneOf("=", "<>", "<", "<=", ">", ">=")
      rhs <- Gen.frequency(6 -> genValueVE(ctx, ef),
        4 -> genLit(ef).map(LitE(_): VE))
    } yield QuantBE(q, "qv", l, CmpE(op, VarE("qv", ef), rhs))
    // quantifier over a VAR-LENGTH REL LIST: the lambda var binds each
    // relationship, tested through a property (w is optional → ternary)
    val quantVlG: Gen[BE] =
      if (ctx.vlVars.isEmpty) quantG
      else for {
        q <- Gen.oneOf("all", "any", "none", "single")
        vl <- Gen.oneOf(ctx.vlVars)
        key <- Gen.frequency(6 -> Gen.const("w"), 4 -> Gen.const("uid"))
        op <- Gen.oneOf("=", "<>", "<", "<=", ">", ">=")
        rhs <- genLit('L')
      } yield QuantBE(q, "qv", VarE(vl, 'R'),
        CmpE(op, PropE("qv", key), LitE(rhs)))
    // identity equality between two same-kind entity vars (incl. v = v);
    // a null operand (failed OPTIONAL) → unknown
    val entityEqG: Gen[BE] =
      if (ctx.nodeVars.size < 2 && ctx.relVars.size < 2) genCmp(ctx)
      else for {
        pool <- if (ctx.nodeVars.size >= 2 && ctx.relVars.size >= 2)
          Gen.oneOf(ctx.nodeVars, ctx.relVars)
        else Gen.const(
          if (ctx.nodeVars.size >= 2) ctx.nodeVars else ctx.relVars)
        a <- Gen.oneOf(pool)
        b <- Gen.oneOf(pool)
        op <- Gen.oneOf("=", "<>")
      } yield CmpE(op, EntityE(a), EntityE(b))
    Gen.frequency(6 -> genCmp(ctx), 2 -> isNullG, 2 -> inG, 1 -> hasLabelG,
      2 -> strPredG, 2 -> inVG, 1 -> entityEqG, 2 -> quantG,
      (if (ctx.vlVars.nonEmpty) 4 else 0) -> quantVlG,
      1 -> genMapEq(ctx))
  }

  /** one-hop existence test from a bound node var (block EXISTS or bare
    * pattern predicate); falls back to a comparison when nothing is bound
    */
  private def genExistsE(ctx: Ctx): Gen[BE] =
    if (ctx.nodeVars.isEmpty) genCmp(ctx)
    else for {
      anchor <- Gen.oneOf(ctx.nodeVars)
      block <- Gen.prob(0.5)
      anchorLbl <- Gen.frequency(7 -> Gen.const(None),
        3 -> Gen.oneOf(labels).map(Some(_)))
      typ <- Gen.frequency(4 -> Gen.const(None),
        6 -> Gen.oneOf(relTypes).map(Some(_)))
      dir <- Gen.frequency(5 -> Gen.const(Out: Dir), 3 -> Gen.const(In: Dir),
        2 -> Gen.const(Und: Dir))
      isVl <- Gen.prob(0.15)
      lo <- Gen.oneOf(0, 1)
      span <- Gen.choose(0, 1)
      endBound <- Gen.prob(0.25)
      endVar <- Gen.oneOf(ctx.nodeVars)
      lbl <- Gen.frequency(5 -> Gen.const(None),
        5 -> Gen.oneOf(labels).map(Some(_)))
      hasProp <- Gen.prob(0.3)
      pk <- Gen.oneOf("k", "s")
      pv <- genLit(if (pk == "k") 'L' else 'S')
    } yield {
      // var-length only inside the block form (pattern predicates keep
      // the single-hop shape)
      val vl = if (isVl && block) Some((lo, math.max(lo + span, 1))) else None
      val end =
        if (endBound) NodeP(endVar, None, Map.empty)
        else NodeP("qx", lbl, if (hasProp) Map(pk -> pv) else Map.empty)
      val outer = Set(anchor) ++ (if (endBound) Set(endVar) else Set.empty)
      ExistsE(Chain(NodeP(anchor, anchorLbl, Map.empty),
        List((RelP("qr", typ, dir, vl), end))), block, outer)
    }

  private def genLeaf(ctx: Ctx): Gen[BE] = {
    // a comparison with one function/CASE-wrapped side (genCmp itself
    // stays plain: it seeds CASE conditions, which must not recurse)
    val cmpRichG: Gen[BE] = for {
      fam <- Gen.frequency(4 -> Gen.const('L'), 3 -> Gen.const('S'),
        2 -> Gen.const('D'), 1 -> Gen.const('B'), 1 -> Gen.const('E'),
        1 -> Gen.const('Z'))
      op <- if (fam == 'B') Gen.oneOf("=", "<>")
      else Gen.oneOf("=", "<>", "<", "<=", ">", ">=")
      l <- if (fam == 'D')
        Gen.frequency(7 -> genRichVE(ctx, 'D'), 3 -> genDistance(ctx))
      else genRichVE(ctx, fam)
      r <- Gen.frequency(6 -> genValueVE(ctx, fam), 4 -> genLit(fam).map(LitE))
    } yield CmpE(op, l, r)
    // a tagged (mixed L+S) list element compared against either family —
    // = / <> only (cross-family equality is definite, ordering is not)
    val mixedIdxG: Gen[BE] = for {
      l <- genMixedListLit(ctx)
      idx <- Gen.choose(0L, 2L) // sometimes out of range → null
      fam <- Gen.oneOf('L', 'S')
      rhs <- genValueVE(ctx, fam)
      op <- Gen.oneOf("=", "<>")
    } yield CmpE(op, IdxE(l, LitE(idx)), rhs)
    // distance-join shape (round 10, VERDICT item 7): the planner lowers
    // `distance(a.pt, b.pt) < r` over DISCONNECTED parts to the grid
    // join — target that conjunct form directly (two node-var point
    // properties, constant radius, window/non-window comparators; the
    // occasional non-positive radius exercises the filter fallback)
    val distJoinG: Gen[BE] =
      if (ctx.nodeVars.size < 2) genCmp(ctx)
      else for {
        v1 <- Gen.oneOf(ctx.nodeVars)
        v2 <- Gen.oneOf(ctx.nodeVars.filterNot(_ == v1))
        op <- Gen.oneOf("<", "<=", ">", ">=")
        r <- Gen.frequency(
          6 -> Gen.choose(0.5, 400000.0),
          1 -> Gen.oneOf(0.0, -1.5))
      } yield CmpE(op, DistanceE(PropE(v1, "pt"), PropE(v2, "pt")), LitE(r))
    Gen.frequency(9 -> genLeafPlain(ctx), 2 -> cmpRichG, 2 -> genExistsE(ctx),
      1 -> mixedIdxG, 1 -> distJoinG)
  }

  private def genBE(ctx: Ctx, depth: Int): Gen[BE] =
    if (depth <= 0) genLeaf(ctx)
    else Gen.frequency(
      5 -> genLeaf(ctx),
      1 -> genBE(ctx, depth - 1).map(NotE),
      2 -> Gen.zip(genBE(ctx, depth - 1), genBE(ctx, depth - 1))
        .map { case (a, b) => AndE(a, b) },
      2 -> Gen.zip(genBE(ctx, depth - 1), genBE(ctx, depth - 1))
        .map { case (a, b) => OrE(a, b) },
      1 -> Gen.zip(genBE(ctx, depth - 1), genBE(ctx, depth - 1))
        .map { case (a, b) => XorE(a, b) })

  // one MATCH clause; returns clause + updated ctx + next fresh id
  private def genMatch(ctx0: Ctx, optional: Boolean,
      freshId: Int, vlProb: Double = 0.18): Gen[(MatchC, Ctx, Int)] = {
    var fid = freshId
    def freshNode: String = { val v = s"n$fid"; fid += 1; v }
    def freshRel: String = { val v = s"r$fid"; fid += 1; v }
    def genNodeP(ctx: Ctx, allowReuse: Boolean): Gen[(NodeP, Ctx)] = for {
      reuse <- Gen.prob(if (allowReuse && ctx.nodeVars.nonEmpty) 0.3 else 0.0)
      v <- if (reuse) Gen.oneOf(ctx.nodeVars) else Gen.const(freshNode)
      lbl <- Gen.frequency(5 -> Gen.const(None),
        5 -> Gen.oneOf(labels).map(Some(_)))
      withProp <- Gen.prob(if (reuse) 0.0 else 0.15)
      pk <- Gen.oneOf("k", "s")
      pv <- genLit(if (pk == "k") 'L' else 'S')
    } yield {
      val np = NodeP(v, lbl,
        if (withProp) Map(pk -> pv) else Map.empty)
      val ctx2 = if (ctx.nodeVars.contains(v)) ctx
      else ctx.copy(nodeVars = ctx.nodeVars :+ v)
      (np, ctx2)
    }
    def genChain(ctx: Ctx, allowReuse: Boolean): Gen[(Chain, Ctx)] =
      genNodeP(ctx, allowReuse).flatMap { case (first, ctx1) =>
        Gen.frequency(3 -> Gen.const(0), 5 -> Gen.const(1),
          2 -> Gen.const(2)).flatMap { nHops =>
          def hops(ctx: Ctx, n: Int,
              acc: List[(RelP, NodeP)]): Gen[(List[(RelP, NodeP)], Ctx)] =
            if (n == 0) Gen.const((acc.reverse, ctx))
            else for {
              typ <- Gen.frequency(4 -> Gen.const(None),
                6 -> Gen.oneOf(relTypes).map(Some(_)))
              dir <- Gen.frequency(5 -> Gen.const(Out: Dir),
                3 -> Gen.const(In: Dir), 2 -> Gen.const(Und: Dir))
              isVl <- Gen.prob(vlProb)
              vl <- if (!isVl) Gen.const(None)
              else for {
                lo <- Gen.frequency(1 -> Gen.const(0), 2 -> Gen.const(1),
                  1 -> Gen.const(2))
                span <- Gen.choose(0, 2)
              } yield Some((lo, math.max(lo + span, 1)))
              rv = freshRel
              np <- genNodeP(ctx, allowReuse)
              ctxR = if (vl.isDefined)
                np._2.copy(vlVars = np._2.vlVars :+ rv)
              else np._2.copy(relVars = np._2.relVars :+ rv)
              res <- hops(ctxR, n - 1, (RelP(rv, typ, dir, vl), np._1) :: acc)
            } yield res
          hops(ctx1, nHops, Nil).map { case (hs, ctx2) =>
            (Chain(first, hs), ctx2)
          }
        }
      }
    for {
      twoChains <- Gen.prob(0.2)
      c1 <- genChain(ctx0, allowReuse = true)
      c2 <- if (twoChains) genChain(c1._2, allowReuse = true).map(Some(_))
      else Gen.const(None)
      withPath <- Gen.prob(0.18)
    } yield {
      val ctxN0 = c2.map(_._2).getOrElse(c1._2)
      val chains = c1._1 :: c2.map(_._1).toList
      // a named path binds the single-chain pattern; length(p) is the
      // consumable observable. The name consumes a fresh id of its own —
      // a clause that reuses every var would otherwise repeat it
      // (hunt 25474: "a path name cannot rebind")
      val pathVar =
        if (withPath && chains.size == 1) { val p = s"pth$fid"; fid += 1
          Some(p) } else None
      val ctxN = pathVar.fold(ctxN0)(p =>
        ctxN0.copy(pathVars = ctxN0.pathVars :+ p))
      (MatchC(chains, optional, None, pathVar), ctxN, fid)
    }
  }

  private def genAgg(ctx: Ctx, alias: String): Gen[AggItem] = for {
    fn <- Gen.frequency(25 -> Gen.const("count*"), 15 -> Gen.const("count"),
      15 -> Gen.const("sum"), 10 -> Gen.const("min"),
      10 -> Gen.const("max"), 10 -> Gen.const("avg"),
      10 -> Gen.const("collect"), 5 -> Gen.const("countd"),
      5 -> Gen.const("sumd"), 5 -> Gen.const("collectd"))
    numFam <- Gen.frequency(6 -> Gen.const('L'), 4 -> Gen.const('D'))
    anyFam <- Gen.frequency(4 -> Gen.const('L'), 3 -> Gen.const('S'),
      2 -> Gen.const('D'), 1 -> Gen.const('B'))
    ordFam <- Gen.frequency(4 -> Gen.const('L'), 3 -> Gen.const('S'),
      2 -> Gen.const('D'), 1 -> Gen.const('B'), 1 -> Gen.const('E'),
      1 -> Gen.const('Z'))
    numArg <- genRichVE(ctx, numFam)
    anyArg <- genRichVE(ctx, anyFam)
    ordArg <- genRichVE(ctx, ordFam)
  } yield fn match {
    case "count*" => AggItem("count*", None, distinct = false, alias)
    case "count" => AggItem("count", Some(anyArg), distinct = false, alias)
    case "countd" => AggItem("count", Some(anyArg), distinct = true, alias)
    case "sum" => AggItem("sum", Some(numArg), distinct = false, alias)
    case "sumd" => AggItem("sum", Some(numArg), distinct = true, alias)
    case "avg" => AggItem("avg", Some(numArg), distinct = false, alias)
    case "min" => AggItem("min", Some(ordArg), distinct = false, alias)
    case "max" => AggItem("max", Some(ordArg), distinct = false, alias)
    case "collect" =>
      AggItem("collect", Some(anyArg), distinct = false, alias)
    case "collectd" =>
      AggItem("collect", Some(anyArg), distinct = true, alias)
  }

  /** WITH stage: pass-throughs + projections + optional mid-aggregation +
    * optional WHERE; returns the post-WITH ctx
    */
  private def genWith(ctx: Ctx, idx: Int): Gen[(SWith, Ctx)] = for {
    aggMode <- Gen.prob(0.4)
    // pass through a random non-empty subset of entity vars (node/rel)
    passNodes <- Gen.someOf(ctx.nodeVars)
    passRels <- Gen.someOf(ctx.relVars)
    // some passes become renames (`WITH n AS m`); a few keep BOTH names
    renameFlags <- Gen.listOfN(passNodes.size + passRels.size,
      Gen.frequency(7 -> Gen.const(0), 2 -> Gen.const(1), 1 -> Gen.const(2)))
    // projected scalars (occasionally a deterministically-ordered list)
    nProj <- Gen.frequency(4 -> Gen.const(0), 4 -> Gen.const(1),
      2 -> Gen.const(2))
    projFams <- Gen.listOfN(nProj, Gen.frequency(4 -> Gen.const('L'),
      2 -> Gen.const('S'), 2 -> Gen.const('D'), 1 -> Gen.const('B'),
      1 -> Gen.const('E'), 1 -> Gen.const('Z'), 1 -> Gen.const('M'),
      1 -> Gen.const('T')))
    projVes <- Gen.sequence[List[VE], VE](projFams.map(genRichVE(ctx, _)))
    nAggs <- Gen.frequency(6 -> Gen.const(1), 4 -> Gen.const(2))
    aggs <- Gen.sequence[List[AggItem], AggItem](
      (0 until nAggs).map(i => genAgg(ctx, s"w${idx}a$i")))
    distinct <- if (aggMode) Gen.const(false) else Gen.prob(0.25)
    // mid-query cut (round 7c): WITH ... ORDER BY ... SKIP/LIMIT. Only
    // when EVERY non-agg item is an entity (ordered portably by .uid) or
    // an orderable-family scalar — then the ORDER BY totally orders the
    // WITH output row, so tie groups hold interchangeable rows and any
    // cut is deterministic. Aggregates never need ordering: in aggMode
    // all non-agg items are the group keys, and agg values are functions
    // of the keys.
    cutRoll <- Gen.prob(0.35)
    ordOnlyRoll <- Gen.prob(0.15)
    preOrdRoll <- Gen.prob(0.9)
    preOrdPick <- Gen.choose(0, 7)
    dirRolls <- Gen.listOfN(12, Gen.oneOf(true, false))
    skipRoll <- Gen.frequency(4 -> Gen.const(None),
      6 -> Gen.choose(0, 3).map(Some(_)))
    limitRoll <- Gen.frequency(3 -> Gen.const(None),
      7 -> Gen.choose(0, 4).map(Some(_)))
  } yield {
    // collect() stays ONLY for L/S args — its alias becomes a bagVar
    // (unordered list) that downstream order-insensitive consumers and
    // UNWIND may use; other collects are dropped as before
    val aggs2 = aggs.filter(a => a.fn != "collect" ||
      a.arg.exists(e => NaiveEvalFamilies.family(e) == 'L' ||
        NaiveEvalFamilies.family(e) == 'S'))
    val aggs3 = if (aggMode && aggs2.isEmpty)
      List(AggItem("count*", None, distinct = false, s"w${idx}a0")) else aggs2
    val passes: List[RetItem] =
      (passNodes.toList ++ passRels.toList).zip(renameFlags).zipWithIndex
        .flatMap {
          case ((v, 0), _) => List(PassItem(v): RetItem)
          case ((v, 1), i) => List(AliasItem(v, s"w${idx}e$i"): RetItem)
          case ((v, _), i) =>
            List(PassItem(v): RetItem, AliasItem(v, s"w${idx}e$i"): RetItem)
        }
    val projs = projVes.zipWithIndex.map { case (e, i) =>
      ValItem(e, s"w${idx}p$i"): RetItem
    }
    val items0 = passes ++ projs ++ (if (aggMode) aggs3.map(x => x: RetItem)
    else Nil)
    // WITH needs ≥1 item
    val items = if (items0.isEmpty)
      List(AggItem("count*", None, distinct = false, s"w${idx}a0"))
    else items0
    def srcNode(v: String) = ctx.nodeVars.contains(v)
    def srcRel(v: String) = ctx.relVars.contains(v)
    val ctxN = Ctx(
      nodeVars = items.collect {
        case PassItem(v) if srcNode(v) => v
        case AliasItem(v, a) if srcNode(v) => a
      },
      relVars = items.collect {
        case PassItem(v) if srcRel(v) => v
        case AliasItem(v, a) if srcRel(v) => a
      },
      valVars = items.collect {
        case ValItem(e, a) => (a, NaiveEvalFamilies.family(e))
        case AggItem(fn, arg, _, a) if fn != "collect" =>
          (a, fn match {
            case "count*" | "count" => 'L'
            case "avg" => 'D'
            case _ => arg.map(NaiveEvalFamilies.family).getOrElse('L')
          })
      },
      vlVars = Nil,
      bagVars = items.collect {
        case AggItem("collect", arg, _, a) =>
          (a, if (arg.exists(e => NaiveEvalFamilies.family(e) == 'S')) 'T'
          else 'M')
      })
    val orderableFams = Set('L', 'S', 'D', 'B', 'E', 'Z')
    val nonAgg = items.filterNot(_.isInstanceOf[AggItem])
    val cutEligible = nonAgg.nonEmpty && nonAgg.forall {
      case PassItem(_) | AliasItem(_, _) => true
      case ValItem(e, _) =>
        orderableFams.contains(NaiveEvalFamilies.family(e))
      case _ => false
    }
    val wantOrd = cutEligible && (cutRoll || ordOnlyRoll)
    val ord0: List[WithOrd] =
      if (!wantOrd) Nil
      else nonAgg.zipWithIndex.map { case (it, i) =>
        val isEntity = it match {
          case PassItem(_) | AliasItem(_, _) => true
          case _ => false
        }
        WithOrd(it.alias, uid = isEntity, asc = dirRolls(i % 12))
      }
    // an UNPROJECTED input-scope entity as the leading sort key (plain
    // projections only — ORDER BY sees both scopes in Neo4j; DISTINCT/
    // aggregating projections see only the output scope). Dropped vars
    // only (v ∉ aliases): exercises the engine's combined-header path.
    val aliasSet = items.map(_.alias).toSet
    val preCands =
      (ctx.nodeVars ++ ctx.relVars).filterNot(aliasSet.contains)
    val ord: List[WithOrd] =
      if (ord0.isEmpty || aggMode || distinct || !preOrdRoll ||
          preCands.isEmpty) ord0
      else WithOrd(preCands(preOrdPick % preCands.size), uid = true,
        asc = dirRolls(11), pre = true) :: ord0
    val (sk, lm) =
      if (!(cutEligible && cutRoll) || ord.isEmpty) (None, None)
      else if (skipRoll.isEmpty && limitRoll.isEmpty) (Some(1), None)
      else (skipRoll, limitRoll)
    // WHERE is attached by the caller (it needs the post-WITH ctx)
    (SWith(distinct, items, None, ord, sk, lm), ctxN)
  }

  private def genRet(ctx: Ctx): Gen[Ret] = {
    def genItemVE: Gen[VE] = Gen.frequency(
      6 -> Gen.oneOf('L', 'S', 'D', 'B').flatMap(genRichVE(ctx, _)),
      1 -> genRichVE(ctx, 'E'),
      1 -> genRichVE(ctx, 'Z'),
      1 -> genRichVE(ctx, 'G'),
      1 -> genDistance(ctx),
      2 -> genArith(ctx),
      // raw deterministically-ordered list values (never bags)
      1 -> Gen.oneOf('M', 'T').flatMap(genListVE(ctx, _)),
      1 -> genMapVE(ctx),
      (if (ctx.nodeVars.nonEmpty) 1 else 0) ->
        (if (ctx.nodeVars.nonEmpty)
          Gen.oneOf(ctx.nodeVars).map(FnE("labels", _): VE)
        else Gen.const(LitE(1L): VE)),
      (if (ctx.relVars.nonEmpty) 1 else 0) ->
        (if (ctx.relVars.nonEmpty)
          Gen.oneOf(ctx.relVars).map(FnE("type", _): VE)
        else Gen.const(LitE(1L): VE)))

    for {
      aggMode <- Gen.prob(0.35)
      cut <- Gen.prob(0.25) // SKIP and/or LIMIT
      items <- if (aggMode) for {
        nKeys <- Gen.frequency(3 -> Gen.const(0), 5 -> Gen.const(1),
          2 -> Gen.const(2))
        nAggs <- Gen.frequency(6 -> Gen.const(1), 4 -> Gen.const(2))
        keys <- Gen.listOfN(nKeys,
          Gen.frequency(8 -> Gen.oneOf('L', 'S', 'D', 'B')
            .flatMap(genRichVE(ctx, _)), 2 -> genArith(ctx)))
        aggs <- Gen.sequence[List[AggItem], AggItem](
          (0 until nAggs).map(i => genAgg(ctx, s"a$i")))
      } yield keys.zipWithIndex.map { case (e, i) =>
        ValItem(e, s"g$i"): RetItem
      } ++ aggs
      else for {
        n <- Gen.frequency(3 -> Gen.const(1), 5 -> Gen.const(2),
          2 -> Gen.const(3))
        ves <- Gen.listOfN(n, genItemVE)
      } yield ves.zipWithIndex.map { case (e, i) =>
        ValItem(e, s"c$i"): RetItem
      }
      distinct <- if (aggMode) Gen.const(false) else Gen.prob(0.3)
      // drop unorderable items entirely when a deterministic cut is needed
      items2 = if (!cut) items else items.filter {
        case AggItem("collect", _, _, _) => false
        case ValItem(FnE("labels", _), _) => false
        // compound values are incomparable — no list/map item can order a
        // cut
        case ValItem(e, _) if {
          val f = NaiveEvalFamilies.family(e)
          NaiveEvalFamilies.isListFam(f) || f == 'P'
        } => false
        case _ => true
      } match {
        case Nil => List(AggItem("count*", None, distinct = false, "a0"))
        case xs => xs
      }
      orderable = items2.collect {
        case ValItem(e, a) if (e match {
          case FnE("labels", _) => false
          case _ =>
            val f = NaiveEvalFamilies.family(e)
            !NaiveEvalFamilies.isListFam(f) && f != 'P'
        }) => a
        case AggItem(fn, _, _, a) if fn != "collect" => a
      }
      wantOrder <- Gen.prob(0.45)
      orderBy <- if (cut) {
        // total order: ALL orderable aliases (ties ⇒ identical rows)
        Gen.listOfN(orderable.size, Gen.oneOf(true, false))
          .map(dirs => orderable.zip(dirs))
      } else if (wantOrder && orderable.nonEmpty) for {
        ks <- Gen.someOf(orderable)
        dirs <- Gen.listOfN(ks.size, Gen.oneOf(true, false))
      } yield ks.toList.zip(dirs)
      else Gen.const(Nil: List[(String, Boolean)])
      skip <- if (cut) Gen.frequency(4 -> Gen.const(None),
        6 -> Gen.choose(0, 3).map(Some(_)))
      else Gen.const(None)
      limit <- if (cut) Gen.frequency(3 -> Gen.const(None),
        7 -> Gen.choose(0, 4).map(Some(_)))
      else Gen.const(None)
    } yield {
      val (sk, lm) =
        if (cut && skip.isEmpty && limit.isEmpty) (Some(1), None)
        else (skip, limit)
      Ret(distinct, items2, orderBy, if (cut) sk else None,
        if (cut) lm else None)
    }
  }

  /** a UNION branch: one fresh MATCH (own var ids — separate scope) and a
    * RETURN with the MAIN body's aliases, each item freely re-typed so
    * cross-family unions (tagged columns) arise naturally
    */
  private def genUnionBody(aliases: List[String]): Gen[Query] = for {
    m <- genMatch(emptyCtx, optional = false, 500)
    hasWhere <- Gen.prob(0.4)
    wb <- genBE(m._2, 1)
    aggLast <- Gen.prob(0.25)
    agg <- genAgg(m._2, aliases.last)
    ves <- Gen.sequence[List[VE], VE](
      (if (aggLast) aliases.dropRight(1) else aliases).map(_ =>
        Gen.oneOf('L', 'S', 'D', 'B').flatMap(genRichVE(m._2, _))))
    distinct <- if (aggLast) Gen.const(false) else Gen.prob(0.2)
  } yield {
    val valItems = ves.zip(aliases).map { case (e, a) =>
      ValItem(e, a): RetItem
    }
    // collect has no scalar surface here, and a date/map/list-typed
    // aggregate can't union with the main body's freely-typed column
    // (hunt 46890: max(date - duration) vs min(1))
    val aggUnionSafe = agg.fn != "collect" && !agg.arg.exists { e =>
      val f = NaiveEvalFamilies.family(e)
      f == 'E' || f == 'Z' || f == 'P' || NaiveEvalFamilies.isListFam(f)
    }
    val items =
      if (!aggLast) valItems
      else valItems :+ (if (!aggUnionSafe)
        AggItem("count*", None, distinct = false, aliases.last): RetItem
      else (agg: RetItem))
    Query(
      List(SMatch(m._1.copy(where = if (hasWhere) Some(wb) else None))),
      Ret(distinct, items, Nil, None, None))
  }

  /** (relVar, srcVar, dstVar) for every single-hop (non-var-length) rel
    * of a clause, in chain order — the clonable units of a CONSTRUCT
    */
  private def clonableHops(mc: MatchC): List[(String, String, String)] =
    mc.chains.flatMap { c =>
      var prev = c.first.v
      c.hops.flatMap { case (rp, np) =>
        val out = if (rp.varLen.isEmpty) List((rp.v, prev, np.v)) else Nil
        prev = np.v
        out
      }
    }

  /** One CONSTRUCT block over a bound match: CLONEs, COPY OF, NEW edges,
    * SET labels — shared by the single and CONSECUTIVE construct shapes.
    * `cpVar` names the COPY target uniquely per block. */
  private def genConstructStage(mc: MatchC, cpVar: String)
      : Gen[SConstruct] = for {
    pickRels <- Gen.someOf(clonableHops(mc))
    extraNode <- Gen.prob(0.5)
    wantNew <- Gen.prob(0.4)
    newTyp <- Gen.oneOf("X", "Y")
    si <- Gen.choose(0, 7)
    di <- Gen.choose(0, 7)
    hasW <- Gen.prob(0.5)
    wv <- Gen.choose(0L, 4L)
    wantCopy <- Gen.prob(0.35)
    cpIdx <- Gen.choose(0, 7)
    relAsNew <- Gen.prob(0.35)
    wantSetLbl <- Gen.prob(0.3)
    setLbl <- Gen.oneOf("B", "C")
  } yield {
    val rels = pickRels.toList
    val nodes0 =
      if (extraNode || rels.isEmpty) List(mc.chains.head.first.v) else Nil
    // COPY OF a matched node var (round 7): fresh-id per-row copy
    val copySources = (nodes0 ++ rels.flatMap { case (_, s, d) =>
      List(s, d) }).distinct
    val copies =
      if (wantCopy && copySources.nonEmpty)
        List((cpVar, copySources(cpIdx % copySources.size)))
      else Nil
    // NEW edges draw endpoints from the CLONED node set or a COPY target
    // (the engine materializes implicit property-less endpoints otherwise)
    val avail = copySources ++ copies.map(_._1)
    val newRels =
      if (wantNew && avail.nonEmpty)
        List((avail(si % avail.size), newTyp, avail(di % avail.size),
          if (hasW) Some(wv) else None))
      else Nil
    val copyLbls =
      if (wantSetLbl && copies.nonEmpty) List((copies.head._1, setLbl))
      else Nil
    SConstruct(nodes0, rels, newRels, copies, relAsNew && rels.nonEmpty,
      copyLbls)
  }

  /** MATCH → CONSTRUCT CLONE → MATCH-over-the-constructed-graph → RETURN:
    * the multi-graph block form (reference consecutive construction).
    * Round 9 extensions (VERDICT item 4): the driving match leans on
    * var-length hops (the exact hunt-112827 shape — fresh ids minted
    * after a var-length frontier); with prob 0.35 a SECOND construct
    * follows the middle match (nested/consecutive construction, where
    * cross-construct fresh-id namespaces must stay disjoint — the r8
    * CatalogDDLTests 42-node family). */
  private def genConstructQuery: Gen[Query] = for {
    m1 <- genMatch(emptyCtx, optional = false, 0, vlProb = 0.45)
    w1 <- Gen.prob(0.4)
    where1 <- genBE(m1._2, 1)
    c1 <- genConstructStage(m1._1, "cp0")
    m2 <- genMatch(emptyCtx, optional = false, 300)
    w2 <- Gen.prob(0.5)
    where2 <- genBE(m2._2, 1)
    wantSecond <- Gen.prob(0.35)
    c2 <- genConstructStage(m2._1, "cp1")
    m3 <- genMatch(emptyCtx, optional = false, 600)
    w3 <- Gen.prob(0.5)
    where3 <- genBE(m3._2, 1)
    retTail <- genRet(if (wantSecond) m3._2 else m2._2)
  } yield {
    val mc1 = m1._1.copy(where = if (w1) Some(where1) else None)
    val mc2 = m2._1.copy(where = if (w2) Some(where2) else None)
    if (!wantSecond)
      Query(List(SMatch(mc1), c1, SMatch(mc2)), retTail)
    else {
      val mc3 = m3._1.copy(where = if (w3) Some(where3) else None)
      Query(List(SMatch(mc1), c1, SMatch(mc2), c2, SMatch(mc3)), retTail)
    }
  }

  def genQuery: Gen[Query] = Gen.frequency(
    8 -> genRegularQuery, 2 -> genConstructQuery)

  private def genRegularQuery: Gen[Query] = for {
    // driving-table correlation (round 7): pre-bound value columns the
    // engine receives as an actual DataFrame; takes the lead-UNWIND slot
    hasDriving <- Gen.prob(0.10)
    drivingCols <- Gen.oneOf(List(("d0", 'L')), List(("d0", 'L'), ("d1", 'S')))
    drivingRows <- Gen.choose(2, 4).flatMap(n =>
      Gen.listOfN(n, Gen.sequence[List[Any], Any](drivingCols.map {
        case (_, 'L') => Gen.frequency(
          6 -> Gen.choose(0L, 5L).map(x => x: Any),
          1 -> Gen.const(null: Any))
        case _ => Gen.frequency(
          6 -> Gen.oneOf(strVals).map(x => x: Any),
          1 -> Gen.const(null: Any))
      })))
    hasLead0 <- Gen.prob(0.12)
    hasLead = hasLead0 && !hasDriving
    leadList <- Gen.choose(2, 4).flatMap(n =>
      Gen.listOfN(n, Gen.frequency(6 -> Gen.choose(0L, 5L).map(x => x: Any),
        1 -> Gen.const(null: Any))))
    ctx0 = if (hasDriving) emptyCtx.copy(valVars = drivingCols)
      else if (hasLead) emptyCtx.copy(valVars = List(("u0", 'L')))
      else emptyCtx
    firstOpt <- Gen.prob(0.08)
    m1 <- genMatch(ctx0, optional = firstOpt, 0)
    w1 <- Gen.prob(0.45)
    where1 <- genBE(m1._2, 2)
    // middle section: nothing | second MATCH | WITH [ + MATCH after ]
    midKind <- Gen.frequency(4 -> Gen.const(0), 3 -> Gen.const(1),
      3 -> Gen.const(2))
    m2 <- (if (midKind == 1) for {
      opt0 <- Gen.prob(0.4)
      // a required MATCH cannot follow OPTIONAL MATCH in the same query
      // part (Neo4j rule, planner-enforced): once optional, stay optional
      opt = opt0 || firstOpt
      m <- genMatch(m1._2, optional = opt, m1._3)
      w <- Gen.prob(0.6)
      wb <- genBE(m._2, 2)
    } yield Some((m._1.copy(where = if (w) Some(wb) else None), m._2, m._3))
    else Gen.const(None))
    wth <- (if (midKind == 2) for {
      w <- genWith(m1._2, 0)
      hasWhere <- Gen.prob(0.45)
      wb <- genBE(w._2, 1)
      afterKind <- Gen.frequency(4 -> Gen.const(0), 4 -> Gen.const(1),
        3 -> Gen.const(2)) // nothing | MATCH | UNWIND of a list binding
      m <- genMatch(w._2, optional = false, m1._3)
      mw <- Gen.prob(0.4)
      mwb <- genBE(m._2, 2)
      unwindPick <- Gen.choose(0, 7)
    } yield {
      val sw = w._1.copy(where = if (hasWhere) Some(wb) else None)
      val listCands = w._2.valVars.filter(p =>
        NaiveEvalFamilies.isListFam(p._2)) ++ w._2.bagVars
      if (afterKind == 2 && listCands.nonEmpty) {
        val (src, lf) = listCands(unwindPick % listCands.size)
        val elemFam = if (lf == 'M') 'L' else 'S'
        Some((sw, List(SUnwindVar("u2", src): Stage),
          w._2.copy(valVars = w._2.valVars :+ (("u2", elemFam)))))
      } else if (afterKind == 1)
        Some((sw,
          List(SMatch(m._1.copy(where = if (mw) Some(mwb) else None)): Stage),
          m._2))
      else Some((sw, Nil: List[Stage], w._2))
    }
    else Gen.const(None))
    // nested OPTIONAL MATCH tail (round 7): 0-2 extra OPTIONAL clauses
    // chained on the bound vars — correlation through possibly-null vars
    // from an earlier failed OPTIONAL. Last in the query part, so the
    // "once optional, stay optional" rule holds by construction.
    ctxMid = wth.map(_._3).orElse(m2.map(_._2)).getOrElse(m1._2)
    optTailN <- Gen.frequency(78 -> Gen.const(0), 14 -> Gen.const(1),
      8 -> Gen.const(2))
    ot1 <- genMatch(ctxMid, optional = true, 700)
    otw1 <- Gen.prob(0.5)
    otb1 <- genBE(ot1._2, 1)
    ot2 <- genMatch(ot1._2, optional = true, 800)
    otw2 <- Gen.prob(0.5)
    otb2 <- genBE(ot2._2, 1)
    hasTrailUnwind <- Gen.prob(0.08)
    trailList <- Gen.choose(2, 3).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0L, 5L).map(x => x: Any)))
    ctxPreRet =
      if (optTailN >= 2) ot2._2 else if (optTailN == 1) ot1._2 else ctxMid
    ctxR = if (hasTrailUnwind)
      ctxPreRet.copy(valVars = ctxPreRet.valVars :+ (("u1", 'L')))
    else ctxPreRet
    ret <- genRet(ctxR)
    uni <- {
      // UNION only when the main RETURN is a plain multiset surface:
      // no cut/order (engine scopes them per body), no collect (the
      // multiset-alias bookkeeping is main-body-only), no list/X items
      val ok = !hasDriving && ret.orderBy.isEmpty && ret.skip.isEmpty &&
        ret.limit.isEmpty && ret.items.forall {
          case ValItem(e, _) =>
            val f = NaiveEvalFamilies.family(e)
            // maps ('P') and dates ('E') sit outside the tagged-union
            // encoding cross-family UNION columns take — keep them out
            // of freely-retyped union surfaces
            !NaiveEvalFamilies.isListFam(f) && f != 'X' && f != 'P' &&
              f != 'E' && f != 'Z' && f != 'G'
          case AggItem(fn, arg, _, _) =>
            // min/max over a date column can't union with the branch's
            // freely-retyped numeric aggregate (hunt 32023)
            fn != "collect" && !arg.exists { e =>
              val f = NaiveEvalFamilies.family(e)
              f == 'E' || f == 'Z' || f == 'P' || f == 'G' ||
                NaiveEvalFamilies.isListFam(f)
            }
          case _ => false
        }
      if (!ok) Gen.const(None)
      else Gen.prob(0.15).flatMap { want =>
        if (!want) Gen.const(None: Option[(Boolean, Query)])
        else for {
          all <- Gen.oneOf(true, false)
          body <- genUnionBody(ret.items.map(_.alias))
        } yield Some((all, body))
      }
    }
  } yield {
    val mc1 = m1._1.copy(where = if (w1) Some(where1) else None)
    val stages = List.newBuilder[Stage]
    if (hasLead) stages += SUnwind("u0", leadList)
    stages += SMatch(mc1)
    m2.foreach { case (mc, _, _) => stages += SMatch(mc) }
    wth.foreach { case (sw, after, _) =>
      stages += sw
      after.foreach(stages += _)
    }
    if (optTailN >= 1)
      stages += SMatch(ot1._1.copy(where = if (otw1) Some(otb1) else None))
    if (optTailN >= 2)
      stages += SMatch(ot2._1.copy(where = if (otw2) Some(otb2) else None))
    if (hasTrailUnwind) stages += SUnwind("u1", trailList)
    Query(stages.result(), ret, uni.toList,
      driving = if (hasDriving) Some((drivingCols, drivingRows)) else None)
  }

  val genCase: Gen[(MGraph, Query)] =
    genGraph.flatMap(g => genQuery.map(q => (g, q)))
}

/** static type family of a value expression (shared by generator + naive
  * aggregate typing)
  */
object NaiveEvalFamilies {
  import Model._
  def family(e: VE): Char = e match {
    case PropE(_, "f") => 'D'
    case PropE(_, "s") => 'S'
    case PropE(_, "b") => 'B'
    case PropE(_, "d") => 'E'
    case PropE(_, "zd") => 'Z'
    case PropE(_, "pt") => 'G'
    case PropE(_, _) => 'L'
    case VarE(_, fam) => fam
    case SizeE(_) => 'L'
    case LitE(_: Double) => 'D'
    case LitE(_: String) => 'S'
    case LitE(_: Boolean) => 'B'
    case LitE(_: java.time.LocalDate) => 'E'
    case LitE(_: MZdt) => 'Z'
    case LitE(_: MPoint) => 'G'
    case LitE(_) => 'L'
    case FnE("type", _) => 'S'
    case FnE(_, _) => 'X'
    case ArithE(_, l, r) =>
      val (a, b) = (family(l), family(r))
      if (a == 'S' || b == 'S') 'S' else if (a == 'D' || b == 'D') 'D' else 'L'
    // CASE/coalesce are generated with same-family branches
    case CaseE((_, v) :: _, _) => family(v)
    case CaseE(Nil, els) => els.map(family).getOrElse('L')
    case CoalesceE(args) => family(args.head)
    case StrFnE("strSize", _, _) => 'L'
    case StrFnE(_, _, _) => 'S'
    case NumFnE("sign", _) => 'L'
    case NumFnE(_, arg) => family(arg)
    case BoolVE(_) => 'B'
    // list families: 'M' = list-of-L, 'T' = list-of-S, 'X' = mixed/tagged
    case EntityE(_) => 'X'
    case ListLitE(_, ef) => ef match {
      case 'L' => 'M'; case 'S' => 'T'; case _ => 'X'
    }
    case RangeE(_, _, _) => 'M'
    case SliceE(l, _, _) => family(l)
    case IdxE(l, _) => family(l) match {
      case 'M' => 'L'; case 'T' => 'S'; case _ => 'X'
    }
    case HeadLastE(_, l) => family(l) match {
      case 'M' => 'L'; case 'T' => 'S'; case _ => 'X'
    }
    case ListSizeE(_) => 'L'
    case ListCompE(_, _, _, p, ef) =>
      p.map(family).getOrElse(ef) match { case 'S' => 'T'; case _ => 'M' }
    case PatCompSizeE(_, _) => 'L'
    case PathLenE(_) => 'L'
    case PathNodesUidsE(_) => 'M'
    case PathRelsSizeE(_) => 'L'
    case MapLitE(_) => 'P'
    case MapProjE(_, _) => 'P'
    case MapIdxE(_, _, fam) => fam
    case DateArithE(_, _, _) => 'E'
    case DatePartE(_, _) => 'L'
    case ZdtPartE(_, _) => 'L'
    case ZdtArithE(_, _, _, _, _) => 'Z'
    case DurBetweenPartE(_, _, _, _) => 'L'
    case DtParseE(_) => 'Z'
    case PointPartE("crs", _) => 'S'
    case PointPartE(_, _) => 'D'
    case DistanceE(_, _) => 'D'
  }

  def isListFam(f: Char): Boolean = f == 'M' || f == 'T'
}
