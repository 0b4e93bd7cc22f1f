package graft.plans

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.cypher.Ast._
import graft.graph.{PropertyGraph, ScanNaming}

import scala.collection.immutable.ListMap

/** Compiles a parsed Cypher query straight to a DataFrame plan.
  *
  * Single lowering layer (the reference splits this across logical +
  * relational planners, okapi-logical/.../LogicalPlanner.scala:47 and
  * okapi-relational/.../RelationalPlanner.scala:52; we have exactly one
  * backend so we emit Catalyst-optimizable DataFrame transformations
  * directly — SURVEY §7.1). All graph navigation becomes equi-joins and
  * union-alls; Catalyst + AQE pick physical strategies.
  */
class Planner(spark: SparkSession, params: Map[String, Any],
    catalog: GraphRef => PropertyGraph, initialGraph: PropertyGraph,
    maxVarLength: Int = 10,
    onPersist: DataFrame => Unit = _ => (),
    driving: Option[DataFrame] = None,
    /** called when a one-hop expand of a consolidatable shape — single
      * rel type, unbound dst — found no covering pattern table, with the
      * STORAGE-direction (srcLabels, relType, dstLabels). Sessions use it
      * to materialize hot shapes adaptively (GraftSession
      * `enableAutoConsolidation`). */
    onExpandMiss: (Set[String], String, Set[String]) => Unit =
      (_, _, _) => ()) {

  private val counter = new AtomicLong()
  private def fresh(prefix: String): String =
    s"${prefix}#${counter.incrementAndGet()}"
  private def naming(v: String): ScanNaming = ScanNaming(
    idCol = fresh(s"${v}_id"), srcCol = fresh(s"${v}_src"),
    dstCol = fresh(s"${v}_dst"), typCol = fresh(s"${v}_type"),
    propCol = k => fresh(s"${v}_p_$k"), labelCol = l => fresh(s"${v}_l_$l"))

  case class PState(df: DataFrame, header: Header, isUnit: Boolean = false)

  private def unitState: PState =
    PState(spark.range(1).toDF().select(), Header.empty, isUnit = true)

  /** Initial state for a query: the caller-supplied driving table (each
    * column pre-bound as a value variable, reference:
    * RelationalCypherSession.scala cypherOnGraph's drivingTable) or the
    * one-empty-row unit table. Driving columns are renamed to planner-owned
    * names so scan columns can never collide with user column names. */
  private def startState: PState = driving match {
    case None => unitState
    case Some(df) =>
      val renames = df.columns.toSeq.map(c => c -> fresh(c))
      val projected = df.select(renames.map { case (orig, c) =>
        df(orig).as(c) }: _*)
      val header = Header(ListMap(renames.map { case (orig, c) =>
        orig -> (ValueBinding(c): Binding) }: _*))
      PState(projected, header)
  }

  private def compiler(st: PState) =
    new ExprCompiler(st.header, params, () => st.df)

  /** internal (anonymous) vars are excluded from `*` expansion. */
  private def isInternal(v: String): Boolean = v.startsWith("@")

  // ================================================================ entry
  def plan(q: Query): DataFrame = {
    // a LEADING FROM GRAPH selects the statement's working graph for the
    // WHOLE query: union branches without their own FROM inherit it
    // (they would otherwise silently run against the session's empty
    // ambient graph — found by the round-7 differential catalog mode)
    q.first.clauses.headOption.foreach {
      case FromGraphClause(ref) => ambientGraph = catalog(ref)
      case _ => ()
    }
    val first = planSingle(q.first)
    if (q.unions.isEmpty) return first
    val rest = q.unions.map { case (all, sq) => (all, planSingle(sq)) }
    rest.foreach { case (_, next) =>
      if (first.columns.toSet != next.columns.toSet)
        throw new IllegalArgumentException(
          "All sub queries in a UNION must have the same column names " +
            s"(${first.columns.sorted.mkString(", ")} vs " +
            s"${next.columns.sorted.mkString(", ")})")
    }
    // branches typing a column with different families go through the
    // tagged-union encoding instead of unionByName's crashing cast
    val aligned = graft.plans.ExprCompiler.unionAlignMixed(
      first +: rest.map(_._2))
    var acc = aligned.head
    aligned.tail.zip(rest.map(_._1)).foreach { case (next, all) =>
      val u = acc.unionByName(next)
      acc = if (all) u else unionDistinct(u)
    }
    acc
  }

  /** UNION-distinct dedup. Mixed-family (tagged) columns key on the
    * openCypher EQUIVALENCE struct — 1 and 1.0 are ONE value even though
    * their encodings differ (integer vs float tag) — and keep the
    * lowest-tag representative, so `RETURN 1 UNION RETURN 1.0` collapses
    * to the integer while `RETURN 1 UNION RETURN 'a'` preserves both.
    * Zoned TIMEs key on their instant (equality ignores the offset). */
  private def unionDistinct(u: DataFrame): DataFrame = {
    val comp = new ExprCompiler(Header(ListMap.empty), params, () => u)
    Planner.equivDistinct(u, u.columns.toSeq, comp)
  }

  /** Per-var count of expressions in the current query that read
    * relationship VALUES — the list argument of a comprehension / reduce /
    * quantifier, an UNWIND operand, or a bare projection item. size() is
    * excluded (the id list answers it). Var-length expands materialize a
    * parallel (id, type, props…) struct list for a var iff some demanding
    * expression remains after WHERE-quantifier pushdown (a pushed
    * quantifier evaluates per step and never touches the list). */
  private var relValueDemand: Map[String, Int] = Map.empty

  private def relValueDemandIn(x: Any): Seq[String] = {
    val here = x match {
      case ListComprehension(_, Var(n), _, _) => Seq(n)
      case Reduce(_, _, _, Var(n), _) => Seq(n)
      case Quantified(_, _, Var(n), _) => Seq(n)
      case UnwindClause(Var(n), _) => Seq(n)
      case ReturnItem(Var(n), _, _) => Seq(n)
      // rs[0] / rs[0..2]: the indexed element escapes as a VALUE
      // (rs[0].prop, type(rs[0]) read its fields)
      case Index(Var(n), _) => Seq(n)
      case Slice(Var(n), _, _) => Seq(n)
      case _ => Seq.empty[String]
    }
    val nested = x match {
      case s: Seq[_] => s.iterator.flatMap(relValueDemandIn).toSeq
      case o: Option[_] => o.iterator.flatMap(relValueDemandIn).toSeq
      case p: Product => p.productIterator.flatMap(relValueDemandIn).toSeq
      case _ => Seq.empty[String]
    }
    here ++ nested
  }

  private def countDemand(x: Any): Map[String, Int] =
    relValueDemandIn(x).groupBy(identity).view.mapValues(_.size).toMap

  /** Path vars whose node VALUES are iterated — `[n IN nodes(p) | …]`,
    * `reduce`/quantifiers over nodes(p), `UNWIND nodes(p)`. Interior
    * var-length nodes carry only ids in the unroll, so these paths get an
    * ordered (id, labels, props…) struct list materialized post-match by
    * ONE explode→join→collect pass (not a node-scan join per step).
    * The value is the set of struct fields the demanding lambdas access
    * (None = all): the struct is pruned to them so wide node schemas don't
    * inflate the collect shuffle. */
  private var nodeValueDemand: Map[String, Option[Set[String]]] = Map.empty

  /** struct fields a lambda body reads off its node-typed variable `v`:
    * property keys, "labels" for labels(v); None (= everything) when the
    * value escapes whole (bare `v`, properties(v), keys(v)). */
  private def nodeFieldDemand(v: String, body: Seq[Any]): Option[Set[String]] = {
    var all = false
    val fields = scala.collection.mutable.Set.empty[String]
    def walk(x: Any): Unit = x match {
      case Property(Var(`v`), k) => fields += k
      case Func("labels", _, Seq(Var(`v`))) => fields += "labels"
      case Func("id", _, Seq(Var(`v`))) => () // id is always present
      case Var(`v`) => all = true
      case s: Seq[_] => s.foreach(walk)
      case o: Option[_] => o.foreach(walk)
      case p: Product => p.productIterator.foreach(walk)
      case _ => ()
    }
    body.foreach(walk)
    if (all) None else Some(fields.toSet)
  }

  private def nodeValueDemandIn(x: Any): Seq[(String, Option[Set[String]])] = {
    def pathOf(e: Expr): Option[String] = e match {
      case Func("nodes", _, Seq(Var(p))) => Some(p)
      case _ => None
    }
    val here = x match {
      case ListComprehension(v, l, pred, proj) =>
        pathOf(l).map(_ -> nodeFieldDemand(v, Seq(pred, proj))).toSeq
      case Reduce(_, _, v, l, step) =>
        pathOf(l).map(_ -> nodeFieldDemand(v, Seq(step))).toSeq
      case Quantified(_, v, l, pred) =>
        pathOf(l).map(_ -> nodeFieldDemand(v, Seq(pred))).toSeq
      case UnwindClause(l, _) =>
        // the alias escapes into clause scope — keep every field
        pathOf(l).map(_ -> (None: Option[Set[String]])).toSeq
      // nodes(p)[1] / nodes(p)[0..2]: indexed node values escape whole
      case Index(l, _) =>
        pathOf(l).map(_ -> (None: Option[Set[String]])).toSeq
      case Slice(l, _, _) =>
        pathOf(l).map(_ -> (None: Option[Set[String]])).toSeq
      case _ => Seq.empty
    }
    val nested = x match {
      case s: Seq[_] => s.iterator.flatMap(nodeValueDemandIn).toSeq
      case o: Option[_] => o.iterator.flatMap(nodeValueDemandIn).toSeq
      case p: Product => p.productIterator.flatMap(nodeValueDemandIn).toSeq
      case _ => Seq.empty
    }
    here ++ nested
  }

  private def mergeNodeValueDemand(ds: Seq[(String, Option[Set[String]])])
      : Map[String, Option[Set[String]]] =
    ds.groupBy(_._1).view.mapValues { entries =>
      val sets = entries.map(_._2)
      if (sets.contains(None)) None else Some(sets.flatten.flatten.toSet)
    }.toMap

  /** Pattern node vars bound at exactly one pattern position and never
    * read by any expression (no `*` projection, no startNode/endNode in
    * the query). For these the node-table existence join proves nothing —
    * a valid graph's rel endpoints always exist — so the planner binds
    * the id the rel row already carries: graph-level column pruning.
    * Internal `@…` vars get the same treatment unconditionally. */
  private var singleUsePatternVars: Set[String] = Set.empty

  /** rel vars referenced by startNode()/endNode() anywhere in the query:
    * their endpoints must stay FULL node bindings (id-only anonymous
    * endpoints carry no property columns to resolve against). */
  private var endpointDemandRels: Set[String] = Set.empty

  private def computeSingleUse(clauses: Seq[Clause]): Set[String] = {
    var disable = false
    val epRels = scala.collection.mutable.HashSet.empty[String]
    val exprRefs = scala.collection.mutable.HashSet.empty[String]
    val patDefs = scala.collection.mutable.HashMap.empty[String, Int]
    def walk(x: Any): Unit = x match {
      case Var(n) => exprRefs += n
      case MapProjection(v, items) => exprRefs += v; items.foreach(walk)
      case Func(n, _, args) =>
        // endpoint functions resolve through bound endpoint COLUMNS, which
        // an id-only binding lacks — presence anywhere disables pruning,
        // and the named rel's anonymous endpoints bind full node scans
        if (n == "startnode" || n == "endnode") {
          disable = true
          args.foreach { case Var(r) => epRels += r; case _ => () }
        }
        args.foreach(walk)
      case np: NodePattern =>
        np.variable.foreach(v => patDefs(v) = patDefs.getOrElse(v, 0) + 1)
        np.properties.foreach { case (_, e) => walk(e) }
      case w: WithClause =>
        if (w.star) disable = true
        w.productIterator.foreach(walk)
      case r: ReturnClause =>
        if (r.star) disable = true
        r.productIterator.foreach(walk)
      case c: ConstructClause =>
        c.clones.foreach { case (src, _) => exprRefs += src }
        c.sets.foreach { case (v, _, e) => exprRefs += v; walk(e) }
        c.news.foreach(walk)
      case s: Seq[_] => s.foreach(walk)
      case o: Option[_] => o.foreach(walk)
      case p: Product => p.productIterator.foreach(walk)
      case _ => ()
    }
    clauses.foreach(walk)
    endpointDemandRels = epRels.toSet
    if (disable) Set.empty
    else patDefs.collect { case (v, 1) if !exprRefs(v) => v }.toSet
  }

  /** the query-level working graph: `initialGraph` unless a leading
    * FROM GRAPH re-selected it for the whole statement (see [[plan]]). */
  private var ambientGraph: PropertyGraph = initialGraph

  def planSingle(sq: SingleQuery): DataFrame = {
    relValueDemand = countDemand(sq.clauses)
    nodeValueDemand = mergeNodeValueDemand(nodeValueDemandIn(sq.clauses))
    singleUsePatternVars = computeSingleUse(sq.clauses)
    var graph = ambientGraph
    var state = startState
    var finalDf: Option[DataFrame] = None
    // within one query part, a required MATCH after an OPTIONAL MATCH is
    // invalid (Neo4j rule); a WITH starts a new part and resets the flag
    var sawOptional = false
    sq.clauses.foreach {
      case FromGraphClause(ref) => graph = catalog(ref)
      case m: MatchClause =>
        if (!m.optional && sawOptional) throw new IllegalArgumentException(
          "MATCH cannot follow OPTIONAL MATCH " +
            "(perhaps use a WITH clause between them)")
        if (m.optional) sawOptional = true
        state = planMatch(graph, state, m)
      case UnwindClause(e, v) => state = planUnwind(graph, state, e, v)
      case w: WithClause =>
        sawOptional = false
        state = planProjection(graph, state, w.items, w.star, w.distinct,
          w.orderBy, w.skip, w.limit, isReturn = false)
        w.where.foreach { pred =>
          state = applyWhere(graph, state, pred)
        }
      case r: ReturnClause =>
        val st = planProjection(graph, state, r.items, r.star, r.distinct,
          r.orderBy, r.skip, r.limit, isReturn = true)
        finalDf = Some(finalizeReturn(st, r))
      case c0: ConstructClause =>
        // mid-query CONSTRUCT followed by MATCH … RETURN records: the
        // constructed graph becomes the working graph with a UNIT binding
        // table (a TRAILING construct still needs cypherGraph — caught by
        // the final "must end in RETURN" check)
        val (st2, c) = rewriteConstructComprehensions(graph, state, c0)
        graph = buildGraph(st2, c)
        state = unitState
        // the binding table reset to unit also starts a new query part:
        // a MATCH over the constructed graph is not "after" the earlier
        // OPTIONAL MATCH in Neo4j's clause-order sense
        sawOptional = false
      case ReturnGraphClause =>
        throw new IllegalArgumentException(
          "RETURN GRAPH must be executed via GraftSession.cypherGraph")
    }
    finalDf.getOrElse(throw new IllegalArgumentException(
      "query must end in RETURN"))
  }

  // ============================================================ CONSTRUCT
  /** Plans a graph-returning query: clauses up to CONSTRUCT bind a driving
    * table; CONSTRUCT emits a new [[PropertyGraph]] (reference:
    * ConstructGraphPlanner.scala:52-160, SURVEY §2.5).
    */
  def planGraph(q: Query): PropertyGraph = {
    require(q.unions.isEmpty, "a graph-returning query cannot use UNION")
    relValueDemand = countDemand(q.first.clauses)
    singleUsePatternVars = computeSingleUse(q.first.clauses)
    var graph = initialGraph
    var state = unitState
    var built: Option[PropertyGraph] = None
    var sawOptional = false
    q.first.clauses.foreach {
      case FromGraphClause(ref) => graph = catalog(ref)
      case m: MatchClause =>
        if (!m.optional && sawOptional) throw new IllegalArgumentException(
          "MATCH cannot follow OPTIONAL MATCH " +
            "(perhaps use a WITH clause between them)")
        if (m.optional) sawOptional = true
        state = planMatch(graph, state, m)
      case UnwindClause(e, v) => state = planUnwind(graph, state, e, v)
      case w: WithClause =>
        sawOptional = false
        state = planProjection(graph, state, w.items, w.star, w.distinct,
          w.orderBy, w.skip, w.limit, isReturn = false)
        w.where.foreach { pred => state = applyWhere(graph, state, pred) }
      case c0: ConstructClause =>
        // pattern comprehensions / size(pattern) inside NEW property maps
        // and SET values join their list columns into the driving state
        val (st2, c) = rewriteConstructComprehensions(graph, state, c0)
        // consecutive construction (reference MultipleGraphTests
        // "construct match construct"): the constructed graph becomes the
        // WORKING graph for subsequent MATCH clauses, and the binding
        // table RESETS — CONSTRUCT outputs the graph plus a unit table
        // (reference result.getRecords is None after RETURN GRAPH)
        graph = buildGraph(st2, c)
        built = Some(graph)
        state = unitState
      case ReturnGraphClause =>
        // after CONSTRUCT: no-op (graph already built). Without one,
        // `FROM g RETURN GRAPH` returns the WORKING graph unchanged —
        // the reference's ReturnGraph over the ambient graph; identity
        // views (`VIEW v($g) { FROM $g RETURN GRAPH }`) depend on it
        if (built.isEmpty) built = Some(graph)
      case _: ReturnClause => throw new IllegalArgumentException(
        "a graph-returning query must end in CONSTRUCT [RETURN GRAPH], not RETURN")
    }
    built.getOrElse(
      throw new IllegalArgumentException(
        "graph query needs a CONSTRUCT clause or RETURN GRAPH"))
  }

  /** CLONE = dedup-by-id carry-over of matched entities; NEW = one fresh
    * element per driving row (bound endpoint vars are implicit clones); ON =
    * union in whole catalog graphs. Fresh ids live in the negative Long
    * space — `-1 - (xxhash64(salt, rowKey, rowSeq) >>> 1)` — disjoint from
    * any source id-space tag (positive), and a pure function of the
    * driving ROW so every derived table computes identical ids with no
    * materialization barrier (the reference generates partition-offset
    * ids instead, MorpheusFunctions.scala partitioned_id_assignment —
    * those are NOT stable across re-evaluation, which is exactly hunt
    * 112827).
    */
  private def buildGraph(state0: PState, c: ConstructClause): PropertyGraph = {
    // CLONE src AS alias: the alias names src's binding inside this
    // CONSTRUCT (SET alias.k, NEW patterns referencing the alias)
    val state = state0.copy(header = Header(state0.header.bindings ++
      c.clones.collect { case (src, alias) if alias != src =>
        alias -> state0.header.bindings.getOrElse(src,
          throw new IllegalArgumentException(
            s"CLONE $src AS $alias: `$src` is not bound")) }))
    val nodeTables = scala.collection.mutable.ArrayBuffer.empty[graft.graph.NodeTable]
    val relTables = scala.collection.mutable.ArrayBuffer.empty[graft.graph.RelTable]

    // entities referenced by NEW patterns that are bound → implicit CLONE
    val newPatternVars = c.news.flatMap(p => collectPatternVars(Pattern(Seq(p))))
    // A bound RELATIONSHIP var inside a NEW/CREATE pattern is an implicit
    // CLONE too (reference usage: morpheus-examples yelp
    // Part2_YelpGraphLibrary.scala — `CONSTRUCT CREATE
    // (user1)-[r]->(business)` projects the matched rels into the new
    // graph). The clone keeps the rel's id/type/properties and storage
    // orientation, so the pattern must restate the MATCHED endpoints
    // (either written order); re-attaching to other nodes needs a fresh
    // typed rel instead.
    val implicitRelClones: Seq[(String, String)] = c.news.flatMap { part =>
      var prevVar = part.start.variable
      part.chain.flatMap { case (rel, node) =>
        val out = rel.variable.flatMap { v =>
          state.header.get(v) match {
            case Some(rb: RelBinding) =>
              require(rel.properties.isEmpty,
                s"bound relationship `$v` in CONSTRUCT cannot restate " +
                  s"properties (use SET $v.key = …)")
              require(rel.types.isEmpty,
                s"bound relationship `$v` in CONSTRUCT cannot restate a " +
                  "type (the clone keeps its matched type)")
              val pat = Set(prevVar, node.variable).flatten
              val matched = rb.endpointVars.map(ev => Set(ev._1, ev._2))
              require(matched.contains(pat),
                s"bound relationship `$v` in CONSTRUCT must restate its " +
                  s"matched endpoints, got (${pat.mkString(", ")})")
              Some(v -> v)
            case _ => None
          }
        }
        prevVar = node.variable
        out
      }
    }
    val allClones = c.clones ++ implicitRelClones
    // a cloned relationship cannot exist without its endpoints
    // (reference ConstructGraphPlanner: rel clones pull their endpoint
    // nodes in): endpoint node VARS become implicit clones here; truly
    // anonymous endpoints get bare id-only nodes synthesized below
    val relEndpointVars = allClones.map(_._2).flatMap { v =>
      state.header.get(v) match {
        case Some(rb: RelBinding) =>
          rb.endpointVars.toSeq.flatMap { case (s, d) => Seq(s, d) }
            .filter(ev => state.header.get(ev).exists(_.isInstanceOf[NodeBinding]))
        case _ => Nil
      }
    }
    val cloneVars = (allClones.map(_._2) ++ relEndpointVars ++
      newPatternVars.filter(state.header.contains)).distinct

    val setsByVar: Map[String, Seq[(String, Expr)]] =
      c.sets.groupBy(_._1).view.mapValues(_.map(s => (s._2, s._3))).toMap
    c.sets.foreach { case (v, _, _) =>
      require(cloneVars.contains(v) ||
        c.news.exists(_.start.variable.contains(v)) ||
        c.news.exists(_.chain.exists(_._2.variable.contains(v))),
        s"SET $v.…: `$v` is not cloned or created by this CONSTRUCT")
    }
    // SET v:Label (reference MultipleGraphTests "should set a node
    // label"): extra labels merge into the target's label set — clones,
    // NEW nodes and COPY OF targets alike; node-only
    val labelSetsByVar: Map[String, Set[String]] =
      c.setLabels.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    c.setLabels.foreach { case (v, _) =>
      require(cloneVars.contains(v) ||
        c.news.exists(_.start.variable.contains(v)) ||
        c.news.exists(_.chain.exists(_._2.variable.contains(v))),
        s"SET $v:…: `$v` is not cloned or created by this CONSTRUCT")
      require(!state.header.get(v).exists(_.isInstanceOf[RelBinding]),
        s"SET $v:…: labels can only be set on nodes")
    }

    // SET on cloned vars: materialize the value per driving row and extend
    // the binding's property map BEFORE dedup-by-id
    var cloneState = state
    val setBindings: Map[String, Binding] = cloneVars.flatMap { v =>
      setsByVar.get(v).map { kvs =>
        val extra = kvs.map { case (k2, e) =>
          val cName = fresh(s"set_${v}_$k2".replaceAll("[^A-Za-z0-9_#]", ""))
          cloneState = cloneState.copy(
            df = cloneState.df.withColumn(cName, compiler(cloneState).compile(e)))
          k2 -> cName
        }.toMap
        v -> (state.header(v) match {
          case nb: NodeBinding => nb.copy(propCols = nb.propCols ++ extra)
          case rb: RelBinding => rb.copy(propCols = rb.propCols ++ extra)
          case other => throw new IllegalArgumentException(
            s"SET $v: expected node or relationship, got $other")
        })
      }
    }.toMap

    // Plan-SIZE barrier for the CLONE path (round 10): every clone table
    // is a select over the driving frame, and a downstream MATCH over
    // the derived graph unions k of them — k copies of the driving plan
    // in every planner step. Past `graft.construct.planBarrier` logical
    // nodes, re-root the frame on its lazily-planned RDD lineage
    // (PlanBridge.lazyLineage — a LEAF; no row materialization, stages
    // reused across the tables' actions), so stacked CONSTRUCT → MATCH →
    // CONSTRUCT chains stop compounding per-Dataset analysis cost
    // (differential case 734: the 3rd MATCH planned over 1301-node clone
    // tables for 22-28 s of pure driver time; over leaf tables it is
    // sub-second). The NEW machinery below shares the wrapped frame when
    // no SET column diverged the two.
    val planLimit = graft.pipeline.Dedup.longConf(
      state.df.sparkSession, "graft.construct.planBarrier", "400")
    def overLimit(d: DataFrame): Boolean = planLimit >= 0 && {
      var n = 0
      d.queryExecution.analyzed.foreach(_ => n += 1)
      n > planLimit
    }
    // No nondet guard here, unlike the NEW-path barrier below (ADVICE
    // round 10): that path CHECKPOINTS nondeterministic frames only
    // because freshly-minted ids hash the row content — a re-rolled
    // rand() would re-mint different ids per action. CLONE tables carry
    // the ORIGINAL ids, so a rand()-bearing clone re-evaluating per
    // action is exactly the unwrapped lazy baseline's semantics; the
    // lazy re-root neither adds nor removes that nondeterminism.
    val cloneWasState = cloneState.df eq state.df
    if ((cloneVars.nonEmpty || c.news.nonEmpty) && overLimit(cloneState.df))
      cloneState = cloneState.copy(
        df = org.apache.spark.sql.graftbridge.PlanBridge
          .lazyLineage(cloneState.df))

    cloneVars.foreach { v =>
      setBindings.getOrElse(v, state.header(v)) match {
        case nb: NodeBinding =>
          val extra = labelSetsByVar.getOrElse(v, Set.empty)
          val ts = cloneNodeTables(cloneState, nb)
          nodeTables ++= (if (extra.isEmpty) ts
            else ts.map(t => t.copy(labels = t.labels ++ extra)))
        case rb: RelBinding => relTables ++= cloneRelTables(cloneState, rb)
        case other => throw new IllegalArgumentException(
          s"CLONE $v: expected node or relationship, got $other")
      }
    }
    // anonymous endpoints of cloned rels (no bound node var carries the
    // id column): synthesize bare id-only nodes so the rel is well-formed
    locally {
      val bareCols = cloneVars.flatMap(v =>
        state.header.get(v).collect { case rb: RelBinding =>
          val (sv, dv) = rb.endpointVars.getOrElse(("", ""))
          def covered(ev: String) = cloneVars.contains(ev) &&
            state.header.get(ev).exists(_.isInstanceOf[NodeBinding])
          Seq(rb.srcCol -> covered(sv), rb.dstCol -> covered(dv))
            .collect { case (c2, false) => c2 }
        }).flatten.distinct
      bareCols.foreach { idc =>
        nodeTables += graft.graph.NodeTable(Set.empty,
          cloneState.df.select(col(s"`$idc`"))
            .where(col(s"`$idc`").isNotNull).dropDuplicates(idc),
          idc, Map.empty)
      }
    }

    // NEW: extend the driving table with fresh-id columns first so rels can
    // reference their endpoints' ids from the same row. Start from the
    // clone path's wrapped frame when the two were the same frame (no
    // SET columns diverged them): column names are preserved by the
    // re-root, so the compiled expressions below resolve identically.
    var df = if (cloneWasState) cloneState.df else state.df
    val comp = compiler(state)
    // var → (idCol, labels, props(key → col))
    val created = scala.collection.mutable.LinkedHashMap
      .empty[String, (String, Set[String], Map[String, String])]

    var mintedFreshIds = false
    // Deterministic fresh ids (round 9; removes the hunt-112827
    // materialize-once barrier): every derived node/rel table re-evaluates
    // the driving frame in its own Spark job, so fresh ids must be a pure
    // function of the ROW, never of partition layout or fetch order
    // (monotonically_increasing_id was neither). Scheme:
    //   rowKey = xxhash64(base columns)   (map-typed cols via to_json)
    //   rowSeq = row_number within the rowKey group — disambiguates
    //            byte-identical driving rows (UNWIND [1,1] AS x must NEW
    //            two nodes); which physical duplicate gets which seq is
    //            unobservable, so the derived-table MULTISET is stable.
    //            Ties are ordered by a second independent hash so two
    //            DISTINCT rows colliding in the 64-bit key cannot swap
    //            seqs between jobs (joint collision ~2^-95).
    //   id     = -1 - (xxhash64(salt, rowKey, rowSeq) >>> 1)
    // Ids are negative (disjoint from every positive source id space);
    // the SESSION-global salt makes ids from different constructs —
    // including nested/derived-view constructs whose input graph already
    // carries fresh ids (the r8 CatalogDDLTests 42-node case) — distinct
    // w.h.p. (63-bit birthday). Cost: one hash shuffle of the driving
    // frame, instead of checkpointing the whole frame at 100 TB.
    val baseCols = state.df.columns.toSeq
    def hashSafe(cn: String): Column = {
      def hasMap(t: DataType): Boolean = t match {
        case _: MapType => true
        case s: StructType => s.fields.exists(f => hasMap(f.dataType))
        case a: ArrayType => hasMap(a.elementType)
        case _ => false
      }
      if (hasMap(state.df.schema(cn).dataType)) to_json(col(s"`$cn`"))
      else col(s"`$cn`")
    }
    var rowKeySeq: Option[(String, String)] = None
    def ensureRowKey(): (String, String) = rowKeySeq.getOrElse {
      val kCol = fresh("@rowkey")
      val sCol = fresh("@rowseq")
      val keys = baseCols.map(hashSafe)
      df = df.withColumn(kCol,
        if (keys.isEmpty) lit(42L) else xxhash64(keys: _*))
      val tie = if (keys.isEmpty) lit(0) else hash(keys: _*)
      val w = Window.partitionBy(col(s"`$kCol`")).orderBy(tie)
      df = df.withColumn(sCol, (row_number().over(w) - 1).cast(LongType))
      rowKeySeq = Some((kCol, sCol))
      (kCol, sCol)
    }
    def freshIdCol(prefix: String): String = {
      mintedFreshIds = true
      val (kCol, sCol) = ensureRowKey()
      val salt = Planner.freshIdTag.getAndIncrement()
      val cName = fresh(s"new_${prefix}_id")
      df = df.withColumn(cName, lit(-1L) - shiftrightunsigned(
        xxhash64(lit(salt.toLong), col(s"`$kCol`"), col(s"`$sCol`")), 1))
      cName
    }

    // COPY OF targets: var → (fresh id col, source binding, extra labels
    // from the pattern, extra prop cols from the pattern). Tables are
    // built at the end (after SET merging) via the clone machinery with
    // the id column swapped for the fresh one — labels/type stay
    // per-row-accurate (reference COPY OF semantics: NEW identity,
    // copied labels/type + properties; morpheus-examples yelp Part4
    // `CREATE (newB COPY OF b) SET newB.trendRank = …`).
    val copiedNodes = scala.collection.mutable.LinkedHashMap
      .empty[String, (String, NodeBinding, Set[String], Map[String, String])]
    val copiedRels = scala.collection.mutable.ArrayBuffer
      .empty[(String, RelBinding, String, String, Map[String, String],
        Option[String])]
    // NEW-rel table specs: (type, relIdCol, srcCol, dstCol, propSel) —
    // built only after the driving frame is materialized (see below)
    val newRelSpecs = scala.collection.mutable.ArrayBuffer
      .empty[(String, String, String, String, Seq[(String, String)])]

    def bindNewNode(np: NodePattern): String = {
      val v = np.variable.getOrElse(fresh("@cn"))
      np.copyOf.foreach { srcVar =>
        require(!state.header.contains(v),
          s"COPY OF target `$v` is already bound")
        val nb = state.header.get(srcVar) match {
          case Some(n: NodeBinding) => n
          case other => throw new IllegalArgumentException(
            s"$v COPY OF $srcVar: `$srcVar` is not a bound node " +
              s"(${other.map(_.toString).getOrElse("unbound")})")
        }
        copiedNodes.get(v) match {
          case Some((idCol, _, _, _)) => return idCol
          case None =>
        }
        val idCol = freshIdCol(v.replaceAll("[^A-Za-z0-9_]", ""))
        // a failed-OPTIONAL source row copies nothing
        df = df.withColumn(idCol,
          when(col(s"`${nb.idCol}`").isNotNull, col(s"`$idCol`")))
        val props = np.properties.map { case (k2, e) =>
          val cName = fresh(s"new_${v}_p_$k2".replaceAll("[^A-Za-z0-9_#]", ""))
          df = df.withColumn(cName, comp.compile(e))
          k2 -> cName
        }.toMap
        copiedNodes(v) = (idCol, nb, np.labels.toSet, props)
        return idCol
      }
      // a later bare reference to an earlier COPY OF target in the same
      // CONSTRUCT reuses the copy (NEW (c COPY OF b) NEW (c)-[:X]->(d))
      copiedNodes.get(v).foreach { case (idCol, _, _, _) => return idCol }
      state.header.get(v) match {
        case Some(nb: NodeBinding) => return nb.idCol // implicit clone
        case Some(other) => throw new IllegalArgumentException(
          s"NEW endpoint $v bound to $other, not a node")
        case None =>
      }
      created.get(v) match {
        case Some((idCol, _, _)) => idCol
        case None =>
          val idCol = freshIdCol(v.replaceAll("[^A-Za-z0-9_]", ""))
          val props = np.properties.map { case (k2, e) =>
            val cName = fresh(s"new_${v}_p_$k2".replaceAll("[^A-Za-z0-9_#]", ""))
            df = df.withColumn(cName, comp.compile(e))
            k2 -> cName
          }.toMap
          created(v) = (idCol, np.labels.toSet, props)
          idCol
      }
    }

    c.news.foreach { part =>
      var prevIdCol = bindNewNode(part.start)
      part.chain.foreach { case (rel, node) =>
        if (rel.variable.exists(v =>
            state.header.get(v).exists(_.isInstanceOf[RelBinding]))) {
          // bound rel: already carried over as an implicit CLONE above —
          // advance the chain without creating anything
          prevIdCol = bindNewNode(node)
        } else if (rel.copyOf.isDefined) {
          // [e COPY OF r]: fresh rel id per row; type + properties from
          // the source rel; endpoints from THIS pattern (re-attachment
          // between copies is the point — yelp Part4 copies a business
          // into a new graph with recomputed rels)
          val srcVar = rel.copyOf.get
          val rb = state.header.get(srcVar) match {
            case Some(r: RelBinding) => r
            case other => throw new IllegalArgumentException(
              s"COPY OF $srcVar: `$srcVar` is not a bound relationship " +
                s"(${other.map(_.toString).getOrElse("unbound")})")
          }
          require(rel.varLength.isEmpty,
            "COPY OF relationship cannot be var-length")
          // a single restated type OVERRIDES the copied rel's type
          // (reference MultipleGraphTests "should copy a mean
          // relationship"); more than one is meaningless
          require(rel.types.size <= 1,
            s"COPY OF relationship takes at most one override type, " +
              s"got ${rel.types}")
          val dstIdCol = bindNewNode(node)
          val relIdCol = freshIdCol("r")
          df = df.withColumn(relIdCol,
            when(col(s"`${rb.idCol}`").isNotNull &&
              col(s"`$prevIdCol`").isNotNull &&
              col(s"`$dstIdCol`").isNotNull, col(s"`$relIdCol`")))
          val extraProps = rel.properties.map { case (k2, e) =>
            val cName = fresh(s"new_r_p_$k2".replaceAll("[^A-Za-z0-9_#]", ""))
            df = df.withColumn(cName, comp.compile(e))
            k2 -> cName
          }.toMap
          val (srcC, dstC) = rel.direction match {
            case Incoming => (dstIdCol, prevIdCol)
            case _ => (prevIdCol, dstIdCol)
          }
          copiedRels += ((relIdCol, rb, srcC, dstC, extraProps,
            rel.types.headOption))
          prevIdCol = dstIdCol
        } else {
        require(rel.varLength.isEmpty, "NEW cannot use var-length patterns")
        require(rel.types.size == 1,
          s"NEW relationship needs exactly one type, got ${rel.types}")
        val dstIdCol = bindNewNode(node)
        val relIdCol = freshIdCol("r")
        val relProps = rel.properties.map { case (k2, e) =>
          val cName = fresh(s"new_r_p_$k2".replaceAll("[^A-Za-z0-9_#]", ""))
          df = df.withColumn(cName, comp.compile(e))
          k2 -> cName
        }.toMap
        val (srcC, dstC) = rel.direction match {
          case Incoming => (dstIdCol, prevIdCol)
          case _ => (prevIdCol, dstIdCol)
        }
        val propSel = relProps.toSeq.sortBy(_._1)
        // table derivation is DEFERRED until the frame is final below —
        // deriving here would capture a pre-barrier plan when the
        // nondeterministic-input checkpoint applies
        newRelSpecs += ((rel.types.head, relIdCol, srcC, dstC, propSel))
        prevIdCol = dstIdCol
        }
      }
    }

    // Fresh ids are a pure function of the row (hash scheme above), so
    // derived tables agree with no barrier — EXCEPT when the driving
    // frame itself contains a nondeterministic expression (rand(),
    // randomUUID()): re-evaluation then changes the hashed row content,
    // so materialize once (hunt-112827 discipline) for that rare case.
    val nondetBarrier = mintedFreshIds && {
      val analyzed = state.df.queryExecution.analyzed
      analyzed.exists(_.expressions.exists(_.exists(!_.deterministic)))
    }
    // Plan-SIZE barrier (round 9, differential case 734): consecutive
    // CONSTRUCTs driven by var-length matches stack derived union/window
    // trees, and every downstream Dataset construction re-analyzes a
    // logical plan that grows multiplicatively — a single 3-node case
    // spent 80+ s of pure DRIVER time with zero data cost. Past
    // `graft.construct.planBarrier` logical nodes (default 400, -1
    // disables) materialize the driving frame once: correctness is
    // unchanged either way (ids are deterministic), only the planning
    // cost of everything derived from this graph is bounded. The
    // threshold is far above any hand-written query's driving plan, so
    // typical CONSTRUCTs never pay the materialization.
    val sizeBarrier = {
      val limit = graft.pipeline.Dedup.longConf(state.df.sparkSession,
        "graft.construct.planBarrier", "400")
      limit >= 0 && {
        var n = 0
        df.queryExecution.analyzed.foreach(_ => n += 1)
        n > limit
      }
    }
    // nondet: materialize ONCE (a lazy re-root would re-roll rand() per
    // action). Size: re-root on the lazily-planned RDD lineage instead
    // (round 10) — no row materialization or block storage, every
    // derived table and downstream match then plans against a LEAF, so
    // stacked CONSTRUCTs stop compounding per-Dataset analysis cost
    // (differential case 734: 35 s of driver time at the old eager
    // barrier, see OPTIMIZATION_r10.md).
    if (nondetBarrier) df = Planner.checkpointFrontier(df)
    else if (sizeBarrier)
      df = org.apache.spark.sql.graftbridge.PlanBridge.lazyLineage(df)
    newRelSpecs.foreach { case (tpe, relIdCol, srcC, dstC, propSel) =>
      relTables += graft.graph.RelTable(tpe,
        df.select((Seq(relIdCol, srcC, dstC) ++ propSel.map(_._2))
          .map(cn => col(s"`$cn`")): _*)
          // an OPTIONAL-MATCH null endpoint means no rel for that row
          .where(col(s"`$srcC`").isNotNull && col(s"`$dstC`").isNotNull),
        relIdCol, srcC, dstC, propSel.map { case (k2, cn) => k2 -> cn }.toMap)
    }

    // SET on NEW node vars: additional computed properties
    created.keys.toSeq.foreach { v =>
      setsByVar.get(v).foreach { kvs =>
        val (idCol, labels, props) = created(v)
        val extra = kvs.map { case (k2, e) =>
          val cName = fresh(s"set_${v}_$k2".replaceAll("[^A-Za-z0-9_#]", ""))
          df = df.withColumn(cName, comp.compile(e))
          k2 -> cName
        }.toMap
        created(v) = (idCol, labels, props ++ extra)
      }
    }

    created.foreach { case (v, (idCol, labels, props)) =>
      val propSel = props.toSeq.sortBy(_._1)
      nodeTables += graft.graph.NodeTable(
        labels ++ labelSetsByVar.getOrElse(v, Set.empty),
        df.select((idCol +: propSel.map(_._2)).map(cn => col(s"`$cn`")): _*),
        idCol, propSel.map { case (k2, cn) => k2 -> cn }.toMap)
    }

    // COPY OF tables: the clone machinery with the id column swapped for
    // the fresh one keeps per-row labels/types accurate; pattern + SET
    // properties overlay the copied ones
    copiedNodes.foreach { case (v, (idCol, nb, extraLabels, patProps)) =>
      val setExtras = setsByVar.getOrElse(v, Nil).map { case (k2, e) =>
        val cName = fresh(s"set_${v}_$k2".replaceAll("[^A-Za-z0-9_#]", ""))
        df = df.withColumn(cName, comp.compile(e))
        k2 -> cName
      }.toMap
      val binding = nb.copy(idCol = idCol,
        propCols = nb.propCols ++ patProps ++ setExtras)
      val tbls = cloneNodeTables(state.copy(df = df), binding)
      val allExtra = extraLabels ++ labelSetsByVar.getOrElse(v, Set.empty)
      nodeTables ++= (if (allExtra.isEmpty) tbls
        else tbls.map(t => t.copy(labels = t.labels ++ allExtra)))
    }
    copiedRels.foreach { case (idCol, rb, srcC, dstC, extraProps, typeOv) =>
      val rb1 = typeOv match {
        case Some(t) => // override type: a constant column per copy
          val tc = fresh("copy_type")
          df = df.withColumn(tc, lit(t))
          rb.copy(typCol = tc, types = Set(t))
        case None => rb
      }
      val binding = rb1.copy(idCol = idCol, srcCol = srcC, dstCol = dstC,
        propCols = rb1.propCols ++ extraProps)
      relTables ++= cloneRelTables(
        state.copy(df = df.where(col(s"`$idCol`").isNotNull)), binding)
    }

    // ON graphs union by id-space: a clone of an element that an ON graph
    // already contains keeps its original id, so the combo-level merge
    // dedups it (clone tables listed first → their SET properties win).
    // Reference: ConstructGraphPlanner — clones of ON-graph elements are
    // not re-created.
    val ons = c.onGraphs.map(n => catalog(GraphByName(n)))
    new PropertyGraph(
      mergeNodeTables(nodeTables.toSeq ++ ons.flatMap(_.nodeTables)),
      mergeRelTables(relTables.toSeq ++ ons.flatMap(_.relTables)), spark)
  }

  /** One backing table per label combination (the reference's ScanGraph
    * invariant, ScanGraph.scala:115-143): merge same-combo tables, align
    * property columns, dedup by id — the same entity cloned through two
    * variables must appear once. */
  private def mergeNodeTables(tables: Seq[graft.graph.NodeTable])
      : Seq[graft.graph.NodeTable] =
    tables.groupBy(_.labels).toSeq.sortBy(_._1.toSeq.sorted.mkString(","))
      .map { case (labels, ts) =>
        if (ts.size == 1) ts.head
        else {
          val keys = ts.flatMap(_.propCols.keys).distinct.sorted
          val aligned = ts.zipWithIndex.map { case (t, i) =>
            t.df.select(col(s"`${t.idCol}`").cast(LongType).as("_gid") +:
              (keys.map { k => t.propCols.get(k)
                .map(c => col(s"`$c`")).getOrElse(lit(null)).as(s"_p_$k") } :+
                lit(i).as("_prec")): _*)
          }
          // deterministic id-dedup: the EARLIEST table wins (clones with
          // SET precede ON-graph copies of the same element)
          val w = Window.partitionBy(col("_gid")).orderBy(col("_prec"))
          graft.graph.NodeTable(labels,
            aligned.reduce(_ unionByName _)
              .withColumn("_rn", row_number().over(w))
              .where(col("_rn") === 1).drop("_rn", "_prec"),
            "_gid", keys.map(k => k -> s"_p_$k").toMap)
        }
      }

  /** one backing table per relationship type, id-deduped. */
  private def mergeRelTables(tables: Seq[graft.graph.RelTable])
      : Seq[graft.graph.RelTable] =
    tables.groupBy(_.relType).toSeq.sortBy(_._1).map { case (tpe, ts) =>
      if (ts.size == 1) ts.head
      else {
        val keys = ts.flatMap(_.propCols.keys).distinct.sorted
        val aligned = ts.zipWithIndex.map { case (t, i) =>
          t.df.select(Seq(
            col(s"`${t.idCol}`").cast(LongType).as("_gid"),
            col(s"`${t.srcCol}`").cast(LongType).as("_src"),
            col(s"`${t.dstCol}`").cast(LongType).as("_dst")) ++
            keys.map { k => t.propCols.get(k)
              .map(c => col(s"`$c`")).getOrElse(lit(null)).as(s"_p_$k") } :+
            lit(i).as("_prec"): _*)
        }
        val w = Window.partitionBy(col("_gid")).orderBy(col("_prec"))
        graft.graph.RelTable(tpe,
          aligned.reduce(_ unionByName _)
            .withColumn("_rn", row_number().over(w))
            .where(col("_rn") === 1).drop("_rn", "_prec"),
          "_gid", "_src", "_dst", keys.map(k => k -> s"_p_$k").toMap)
      }
    }

  /** Cloned node var → one element table per distinct label combination
    * (label columns are data, the table layout needs them static — a tiny
    * driver-side distinct over ≤2^labels boolean columns). */
  private def cloneNodeTables(state: PState, nb: NodeBinding)
      : Seq[graft.graph.NodeTable] = {
    val propSel = nb.propCols.toSeq.sortBy(_._1)
    def table(labels: Set[String], filtered: DataFrame) =
      graft.graph.NodeTable(labels,
        filtered.select((nb.idCol +: propSel.map(_._2)).map(cn => col(s"`$cn`")): _*)
          // a null id is an OPTIONAL-MATCH non-match, not an element
          .where(col(s"`${nb.idCol}`").isNotNull)
          .dropDuplicates(nb.idCol),
        nb.idCol, propSel.map { case (k, cn) => k -> cn }.toMap)

    if (nb.labelCols.isEmpty) return Seq(table(nb.labels, state.df))
    // fast path: when the pattern pins every possible label (single-combo
    // scan), the combination is static — no distinct job needed
    if (nb.labels == nb.labelCols.keySet) return Seq(table(nb.labels, state.df))
    val lblSel = nb.labelCols.toSeq.sortBy(_._1)
    // schema-scale driver collect: bounded by distinct label combos, and
    // guarded so a mis-modeled graph (labels used as data) fails loudly
    // instead of materializing millions of rows on the driver
    val maxCombos = 10000
    val combos = state.df
      .select(lblSel.map { case (_, cn) => col(s"`$cn`") }: _*).distinct()
      .limit(maxCombos + 1).collect()
    require(combos.length <= maxCombos,
      s"CONSTRUCT CLONE: > $maxCombos distinct label combinations — " +
        "label columns look like data, not schema")
    combos.toSeq.map { row =>
      val labels = lblSel.zipWithIndex.collect {
        case ((l, _), i) if !row.isNullAt(i) && row.getBoolean(i) => l
      }.toSet
      val cond = lblSel.zipWithIndex.map { case ((_, cn), i) =>
        if (!row.isNullAt(i) && row.getBoolean(i)) col(s"`$cn`") === lit(true)
        else !(col(s"`$cn`") <=> lit(true))
      }.reduce(_ && _)
      table(labels, state.df.where(cond))
    }
  }

  /** Cloned rel var → one table per relationship type present. */
  private def cloneRelTables(state: PState, rb: RelBinding)
      : Seq[graft.graph.RelTable] = {
    val propSel = rb.propCols.toSeq.sortBy(_._1)
    val maxTypes = 10000
    val types: Seq[String] =
      if (rb.types.nonEmpty) rb.types.toSeq.sorted
      else {
        val t = state.df.select(col(s"`${rb.typCol}`")).distinct()
          .limit(maxTypes + 1).collect().map(_.getString(0)).toSeq.sorted
        require(t.length <= maxTypes,
          s"CONSTRUCT CLONE: > $maxTypes distinct relationship types — " +
            "the type column looks like data, not schema")
        t
      }
    types.map { t =>
      graft.graph.RelTable(t,
        state.df.where(col(s"`${rb.typCol}`") === lit(t))
          .select((Seq(rb.idCol, rb.srcCol, rb.dstCol) ++ propSel.map(_._2))
            .map(cn => col(s"`$cn`")): _*)
          .dropDuplicates(rb.idCol),
        rb.idCol, rb.srcCol, rb.dstCol,
        propSel.map { case (k, cn) => k -> cn }.toMap)
    }
  }

  // ================================================================ MATCH
  /** per-MATCH context: relationship id columns for uniqueness filtering. */
  private case class RelId(col: String, isList: Boolean, types: Set[String])

  def planMatch(graph: PropertyGraph, state: PState, m: MatchClause): PState = {
    m.pattern.parts.foreach { p =>
      (p.start +: p.chain.map(_._2)).foreach(np => require(np.copyOf.isEmpty,
        "COPY OF is only valid in CONSTRUCT NEW/CREATE patterns"))
      p.chain.foreach { case (r, _) => require(r.copyOf.isEmpty,
        "COPY OF is only valid in CONSTRUCT NEW/CREATE patterns") }
    }
    if (m.optional) return planOptionalMatch(graph, state, m)
    // WHERE quantifiers over a var-length rel list of THIS pattern push
    // into the unroll (per-step filters / counters) when their predicate
    // reads only the quantified relationship and already-bound outer vars
    val varLenVars = m.pattern.parts.flatMap(_.chain.collect {
      case (r, _) if r.varLength.isDefined && r.variable.isDefined =>
        r.variable.get
    }).toSet
    val conjuncts = m.where.map(splitAnds).getOrElse(Seq.empty)
    val (pushed, rest) = conjuncts.partition {
      case Quantified(q, v, Var(rs), pred) if varLenVars(rs) &&
          Set("all", "any", "none", "single")(q) =>
        (freeExprVars(pred) - v).forall(state.header.contains)
      case _ => false
    }
    val quantMap: Map[String, Seq[Quantified]] =
      pushed.collect { case q @ Quantified(_, _, Var(rs), _) => rs -> q }
        .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    // struct lists are needed only for demand NOT satisfied by pushdown
    // (count just the pushed quantifier itself — demand nested inside its
    // predicate still needs values at step-evaluation time)
    val pushedCounts = pushed
      .collect { case Quantified(_, _, Var(rs), _) => rs }
      .groupBy(identity).view.mapValues(_.size).toMap
    val structVars = relValueDemand.collect {
      case (v, n) if n > pushedCounts.getOrElse(v, 0) => v
    }.toSet

    // a rel variable may appear ONCE per MATCH (Neo4j SyntaxException);
    // reuse of a PREVIOUSLY bound rel pins endpoints (expandWithBoundRel)
    val relVarsHere = m.pattern.parts.flatMap(_.chain.flatMap(_._1.variable))
    relVarsHere.groupBy(identity).collect { case (v, vs) if vs.size > 1 => v }
      .headOption.foreach(v => throw new IllegalArgumentException(
        s"cannot use the same relationship variable '$v' for multiple " +
          "pattern elements in one MATCH"))

    // WHERE equalities binding a pattern node's property to an
    // already-bound value (params resolved earlier; driving-table columns,
    // WITH-projected values) make that node as selective as an inline
    // prop map — count them into the part-reversal score so the chain
    // anchors there and the equality plans as an equi-join instead of a
    // post-cross filter (matters when the bound side is a driving table:
    // an unanchored chain would cross every driving row with the scan)
    val whereBonus: Map[String, Int] = conjuncts.collect {
      case Eq(Property(Var(v), _), e)
        if freeExprVars(e).forall(state.header.contains) => v
      case Eq(e, Property(Var(v), _))
        if freeExprVars(e).forall(state.header.contains) => v
    }.groupBy(identity).view.mapValues(_.size).toMap

    val relIds = scala.collection.mutable.ArrayBuffer.empty[RelId]
    // WHERE conjuncts not pushed as quantifiers: planPart drains any that
    // become answerable BEFORE a var-length expansion — the deep frontier
    // route localCheckpoints per depth, and Catalyst cannot push a filter
    // below a checkpoint, so an anchor (`WHERE c.c_custkey = 1`) must
    // shrink the SEED there instead of filtering the full closure after
    val pendingWhere = scala.collection.mutable.ArrayBuffer(rest: _*)
    var st = state
    orderParts(m.pattern.parts, state).foreach { part =>
      st = planPartViaDistanceJoin(graph, st, part, relIds, quantMap,
        structVars, whereBonus, pendingWhere)
        .getOrElse(planPart(graph, st, part, relIds, quantMap, structVars,
          whereBonus, pendingWhere)) }
    st = applyRelUniqueness(st, relIds.toSeq)
    pendingWhere.reduceOption(And.apply).foreach { pred =>
      st = applyWhere(graph, st, pred) }
    st
  }

  /** Disconnected-pattern distance rewrite: `MATCH (a:X), (b:Y) WHERE
    * distance(a.p, b.p) < $r` would otherwise plan as crossJoin + filter
    * (BroadcastNestedLoop — O(|L|·|R|) at any scale). When the upcoming
    * part shares NO variable with the already-planned state but a pending
    * WHERE conjunct `distance(ea, eb) < r` (or `<=`, or the flipped
    * `r > distance(...)` forms) splits across the two sides with a
    * CONSTANT radius, plan the part in isolation and combine through the
    * grid-bucketed [[graft.operators.DistanceJoin.gridJoinPoints]] —
    * the same recognize-and-lower the planner relies on for id-equality →
    * hash join, applied to the one predicate shape Catalyst cannot turn
    * into an equi-join itself. The grid is a strict SUPERSET prefilter
    * keyed by (crs, cell); the ORIGINAL conjunct is re-applied on the
    * joined frame, so strict-vs-inclusive bounds, crs-mismatch → null and
    * null-coordinate semantics are byte-identical to the filter form.
    * wgs-84 rows ride 1-D latitude bands (see gridJoinPoints scaladoc);
    * cartesian rows the full 2-D grid. Non-window shapes (`=`, `>=`,
    * vary-by-row radius, distance on connected patterns) keep the plain
    * filter plan. */
  private def planPartViaDistanceJoin(graph: PropertyGraph, state: PState,
      part: PatternPart, relIds: scala.collection.mutable.ArrayBuffer[RelId],
      quantMap: Map[String, Seq[Quantified]], structVars: Set[String],
      whereBonus: Map[String, Int],
      pendingWhere: scala.collection.mutable.ArrayBuffer[Expr])
      : Option[PState] = {
    if (state.isUnit || pendingWhere.isEmpty) return None
    val partVars = (part.start.variable.toSeq ++ part.chain.flatMap {
      case (r, n) => r.variable.toSeq ++ n.variable.toSeq }).toSet
    if (partVars.isEmpty || partVars.exists(state.header.contains))
      return None // connected → the normal expand/value-join machinery
    // inline property expressions reading outer vars pin the part to the
    // state frame — isolated planning would leave them unresolved
    val outerPropRefs = freeExprVars(
      part.start.properties.map(_._2) ++ part.chain.flatMap { case (r, n) =>
        r.properties.map(_._2) ++ n.properties.map(_._2) }) -- partVars
    if (outerPropRefs.nonEmpty) return None
    val stVars = state.header.vars.toSet

    def isDist(n: String): Boolean = {
      val l = n.toLowerCase; l == "distance" || l == "point.distance"
    }
    // (state-side expr, part-side expr, radius expr, original conjunct)
    def shape(c: Expr): Option[(Expr, Expr, Expr)] = c match {
      case Lt(Func(n, false, Seq(ea, eb)), r) if isDist(n) => orient(ea, eb, r)
      case Lte(Func(n, false, Seq(ea, eb)), r) if isDist(n) => orient(ea, eb, r)
      case Gt(r, Func(n, false, Seq(ea, eb))) if isDist(n) => orient(ea, eb, r)
      case Gte(r, Func(n, false, Seq(ea, eb))) if isDist(n) => orient(ea, eb, r)
      case _ => None
    }
    def orient(ea: Expr, eb: Expr, r: Expr): Option[(Expr, Expr, Expr)] = {
      if (freeExprVars(r).nonEmpty) return None // row-varying radius
      val (va, vb) = (freeExprVars(ea), freeExprVars(eb))
      if (va.nonEmpty && va.subsetOf(stVars) &&
        vb.nonEmpty && vb.subsetOf(partVars)) Some((ea, eb, r))
      else if (vb.nonEmpty && vb.subsetOf(stVars) &&
        va.nonEmpty && va.subsetOf(partVars)) Some((eb, ea, r))
      else None
    }
    val hit = pendingWhere.iterator.map(c => c -> shape(c)).collectFirst {
      case (c, Some(t)) => (c, t) }
    hit.flatMap { case (conjunct, (stExpr, partExpr, rExpr)) =>
      // radius must be a positive finite constant, known at plan time —
      // and DETERMINISTIC (round 10): the grid is built from ONE
      // plan-time evaluation, so a rand()-valued radius would make the
      // cell prefilter a non-superset of the per-row predicate; bail to
      // the plain filter plan for those.
      val radius =
        try {
          val rc = new ExprCompiler(Header.empty, params, () => unitState.df)
            .compile(rExpr).cast(DoubleType)
          if (!org.apache.spark.sql.graftbridge.ColumnBridge
            .expression(rc).deterministic) return None
          val row = spark.range(1).select(rc).head()
          if (row.isNullAt(0)) return None else row.getDouble(0)
        } catch { case scala.util.control.NonFatal(_) => return None }
      if (!(radius > 0) || radius.isInfinite) return None
      // both sides must be point-typed (else fall through: the plain
      // filter path raises the typed distance() argument error)
      def pointTyped(st2: PState, e: Expr): Boolean =
        compiler(st2).typeOf(e) match {
          case s: StructType =>
            s.fieldNames.sameElements(Array("@crs", "px", "py"))
          case _ => false
        }
      if (!pointTyped(state, stExpr)) return None
      // planPart mutates the shared relIds/pendingWhere buffers; snapshot
      // them so a bail here leaves the fallback path's inputs untouched
      // (a duplicate RelId for the same column would self-filter to zero
      // rows, and a conjunct drained into the discarded isolated frame
      // would silently vanish)
      val relIdsMark = relIds.length
      val pendingSnapshot = pendingWhere.toList
      val ps = planPart(graph, unitState, part, relIds, quantMap,
        structVars, whereBonus, pendingWhere)
      if (!pointTyped(ps, partExpr)) {
        relIds.remove(relIdsMark, relIds.length - relIdsMark)
        pendingWhere.clear()
        pendingWhere ++= pendingSnapshot
        return None
      }
      // Bind each side's point STRUCT as a real column before bucketing
      // (round 10): gridJoinPoints reads the point ~20 times (9 grid
      // cells × 3 struct fields + null guards), and a compiled point
      // expression carries the full null-guard CASE tree — inlining it
      // per reference blew the plan up ~20× (measured: 1.7 s of pure
      // Catalyst analysis per c42 planning, and a join condition the
      // size of a page). An attribute reference is O(1) to analyze and
      // lets codegen evaluate the point once per row.
      val lPt = fresh("@dj_lpt"); val rPt = fresh("@dj_rpt")
      val lDf = state.df.withColumn(lPt, compiler(state).compile(stExpr))
      val rDf = ps.df.withColumn(rPt, compiler(ps).compile(partExpr))
      val joined = graft.operators.DistanceJoin.gridJoinPoints(
        lDf, rDf, col(s"`$lPt`"), col(s"`$rPt`"), radius)
      val combined = PState(joined,
        Header(state.header.bindings ++ ps.header.bindings))
      pendingWhere -= conjunct
      // Exact predicate over the BOUND struct columns (the same values
      // the conjunct's point expressions produce per row — they ARE the
      // compiled expressions, projected once) with the shared distance
      // formula: re-compiling the conjunct would re-inline both point
      // trees into the join condition, which every downstream action
      // re-analyzes. Strictness follows the conjunct's comparator; the
      // radius is the plan-time constant (deterministic, checked above).
      val distC = ExprCompiler.pointDistance(col(s"`$lPt`"), col(s"`$rPt`"))
      val exact = conjunct match {
        case Lte(_, _) | Gte(_, _) => distC <= lit(radius)
        case _ => distC < lit(radius)
      }
      Some(combined.copy(df = combined.df.where(exact).drop(lPt, rPt)))
    }
  }

  /** a conjunct safe to apply as a plain row filter (no subquery planning
    * needed): free of pattern predicates/comprehensions. */
  private def plainConjunct(e: Any): Boolean = e match {
    case _: PatternPredicate | _: PatternComprehension => false
    case s: Seq[_] => s.forall(plainConjunct)
    case o: Option[_] => o.forall(plainConjunct)
    case p: Product => p.productIterator.forall(plainConjunct)
    case _ => true
  }

  /** Cross-part twin of [[maybeReversePart]]: plan the parts of one MATCH
    * selective-first — a part anchored on an already-bound var or a
    * labeled/prop-constrained node bounds every later part's join input,
    * where written order can materialize an unconstrained scan's full
    * cartesian before the selective part ever filters it. Greedy: pick the
    * best ELIGIBLE part (inline prop expressions may read vars of
    * earlier-written parts — those must already be planned), rebind, and
    * repeat; ties keep written order. The earliest-written remaining part
    * is always eligible, so the loop cannot stall. */
  private def orderParts(parts: Seq[PatternPart], state: PState)
      : Seq[PatternPart] = {
    if (parts.size <= 1) return parts
    def patternVars(p: PatternPart): Set[String] =
      (p.start.variable.toSeq ++ p.chain.flatMap { case (r, n) =>
        r.variable.toSeq ++ n.variable.toSeq }).toSet
    def propRefs(p: PatternPart): Set[String] =
      freeExprVars(p.start.properties.map(_._2) ++ p.chain.flatMap {
        case (r, n) => r.properties.map(_._2) ++ n.properties.map(_._2) })
    def nodeScore(np: NodePattern, bound: Set[String]): Int =
      if (np.variable.exists(bound)) 1000000
      else np.labels.size * 2 + np.properties.size * 3
    def partScore(p: PatternPart, bound: Set[String]): Int =
      (p.start +: p.chain.map(_._2)).map(nodeScore(_, bound)).max
    var bound = state.header.vars.toSet
    val remaining = scala.collection.mutable.ArrayBuffer(parts: _*)
    val out = scala.collection.mutable.ArrayBuffer.empty[PatternPart]
    while (remaining.nonEmpty) {
      val eligible = remaining.filter(p =>
        (propRefs(p) -- patternVars(p)).forall(bound))
      val pick =
        if (eligible.isEmpty) remaining.head // defensive; see scaladoc
        else eligible.maxBy(p => partScore(p, bound))
      remaining -= pick
      out += pick
      bound ++= patternVars(pick)
    }
    out.toSeq
  }

  /** Cypher demands pairwise-distinct relationships within one MATCH
    * (relationship isomorphism). Reference does this per var-length expand
    * (VarLengthExpandPlanner.scala:178); we apply it across the clause. */
  private def applyRelUniqueness(st: PState, relIds: Seq[RelId]): PState = {
    val conds = for {
      i <- relIds.indices; j <- (i + 1) until relIds.size
      a = relIds(i); b = relIds(j)
      if a.types.isEmpty || b.types.isEmpty || (a.types & b.types).nonEmpty
    } yield (a, b) match {
      case (RelId(x, false, _), RelId(y, false, _)) =>
        !(col(s"`$x`") <=> col(s"`$y`"))
      case (RelId(x, true, _), RelId(y, false, _)) =>
        !coalesce(array_contains(col(s"`$x`"), col(s"`$y`")), lit(false))
      case (RelId(x, false, _), RelId(y, true, _)) =>
        !coalesce(array_contains(col(s"`$y`"), col(s"`$x`")), lit(false))
      case (RelId(x, true, _), RelId(y, true, _)) =>
        !coalesce(arrays_overlap(col(s"`$x`"), col(s"`$y`")), lit(false))
    }
    if (conds.isEmpty) st else st.copy(df = st.df.where(conds.reduce(_ && _)))
  }

  /** Selectivity-driven part reversal: `(a)-->(b:L {k: v})` plans from the
    * constrained end. The first scan bounds every intermediate join's
    * cardinality, so anchoring a k-hop chain at an unconstrained node costs
    * |V|·fanout^k rows where the selective anchor costs |σ(V)|·fanout^k —
    * at 100 TB that is the whole game. Already-bound vars are the strongest
    * anchor (score ∞): an exists-subquery whose shared var sits at the
    * WRITTEN end now correlates immediately instead of joining last.
    * Skipped for named paths / shortestPath (positional order is
    * observable) and for var-length rels bound to a variable (the rel
    * LIST order is observable). Reference plans strictly in written order
    * (LogicalPlanner.scala); this is a deliberate improvement. */
  private[graft] def maybeReversePart(part: PatternPart, state: PState,
      whereBonus: Map[String, Int] = Map.empty): PatternPart = {
    if (part.pathName.isDefined || part.shortest.isDefined ||
        part.chain.isEmpty ||
        part.chain.exists { case (r, _) =>
          r.varLength.isDefined && r.variable.isDefined })
      return part
    def score(np: NodePattern): Int =
      if (np.variable.exists(state.header.contains)) Int.MaxValue
      else np.labels.size * 2 + np.properties.size * 3 +
        np.variable.map(whereBonus.getOrElse(_, 0)).getOrElse(0) * 3
    if (score(part.chain.last._2) <= score(part.start)) return part
    def flip(r: RelPattern): RelPattern = r.direction match {
      case Outgoing => r.copy(direction = Incoming)
      case Incoming => r.copy(direction = Outgoing)
      case Undirected => r
    }
    val nodes = part.start +: part.chain.map(_._2) // n0..nk
    val rels = part.chain.map(_._1)                // r1..rk (ri: n(i-1)-ni)
    val revChain = rels.indices.reverse.map(i => (flip(rels(i)), nodes(i)))
    part.copy(start = nodes.last, chain = revChain)
  }

  private def planPart(graph: PropertyGraph, state: PState, part0: PatternPart,
      relIds: scala.collection.mutable.ArrayBuffer[RelId],
      quantPreds: Map[String, Seq[Quantified]] = Map.empty,
      structVars: Set[String] = Set.empty,
      whereBonus: Map[String, Int] = Map.empty,
      pendingWhere: scala.collection.mutable.ArrayBuffer[Expr] =
        scala.collection.mutable.ArrayBuffer.empty): PState = {
    val part = maybeReversePart(part0, state, whereBonus)
    val propPreds = scala.collection.mutable.ArrayBuffer.empty[Expr]
    // named path (`p = ...`): record node vars and rel segments in order
    val named = part.pathName.isDefined
    val pathNodes = scala.collection.mutable.ArrayBuffer.empty[String]
    val pathSegs = scala.collection.mutable.ArrayBuffer.empty[PathSeg]
    var lastVarList: Option[String] = None

    def nodeVarName(np: NodePattern): String =
      np.variable.getOrElse(fresh("@n"))

    // start node — a fresh start whose first hop is covered by a
    // materialized triplet binds src+rel+dst from ONE scan (zero joins);
    // otherwise scan the node table
    val startVar = nodeVarName(part.start)
    if (named) pathNodes += startVar
    var rest = part.chain
    var prevVar = startVar
    var freshSrcPending = false
    var st = {
      val viaTriplet =
        if (!state.header.contains(startVar) && rest.nonEmpty &&
            rest.head._1.varLength.isEmpty) {
          val (rel0, node0) = rest.head
          val relVar0 = rel0.variable.getOrElse(fresh("@r"))
          val dstVar0 = nodeVarName(node0)
          expandOneViaTriplet(graph, state, startVar, relVar0, rel0,
            dstVar0, node0, Some(part.start), propPreds)
            .orElse(expandOneViaNodeRel(graph, state, startVar, relVar0,
              rel0, dstVar0, node0, Some(part.start), propPreds)).map { st2 =>
            relIds += RelId(st2.header(relVar0).asInstanceOf[RelBinding].idCol,
              isList = false, types = rel0.types.toSet)
            if (named) {
              pathSegs += SingleSeg(
                st2.header(relVar0).asInstanceOf[RelBinding].idCol)
              pathNodes += dstVar0
            }
            prevVar = dstVar0
            rest = rest.tail
            st2
          }
        } else None
      viaTriplet.getOrElse {
        // unconstrained single-use start of a one-hop-able chain: defer
        // binding — the first expand drives from the rel scan and binds
        // the src id the rel row carries (no node scan at all)
        if (!named && part.shortest.isEmpty &&
            !state.header.contains(startVar) &&
            rest.nonEmpty && rest.head._1.varLength.isEmpty &&
            part.start.labels.isEmpty && part.start.properties.isEmpty &&
            !rest.head._1.variable.exists(endpointDemandRels) &&
            (isInternal(startVar) || singleUsePatternVars(startVar))) {
          freshSrcPending = true
          state
        } else bindNode(graph, state, startVar, part.start, propPreds)
      }
    }

    // chain
    rest.foreach { case (rel, node) =>
      val relVar = rel.variable.getOrElse(fresh("@r"))
      val dstVar = nodeVarName(node)
      st = rel.varLength match {
        case None =>
          val st1 = expandOne(graph, st, prevVar, relVar, rel, dstVar, node,
            propPreds, freshSrc = freshSrcPending)
          freshSrcPending = false
          // record the pattern's endpoint vars so startNode(r).prop /
          // endNode(r).prop resolve to bound node columns (storage order
          // for directed matches, written order + per-row id test for
          // undirected — see ExprCompiler endpoint-property case)
          val rb1 = st1.header(relVar).asInstanceOf[RelBinding]
          val eps = rel.direction match {
            case Incoming => (dstVar, prevVar)
            case _ => (prevVar, dstVar)
          }
          val st2 = st1.copy(header = st1.header +
            (relVar -> rb1.copy(endpointVars = Some(eps),
              oriented = rel.direction != Undirected)))
          relIds += RelId(rb1.idCol,
            isList = false,
            types = if (rel.types.isEmpty) Set.empty else rel.types.toSet)
          if (named)
            pathSegs += SingleSeg(rb1.idCol)
          st2
        case Some((lo, hi)) =>
          // materialization barrier ahead: the deep route localCheckpoints
          // every depth and Catalyst cannot push a filter below a
          // checkpoint — drain every already-answerable plain WHERE
          // conjunct NOW so the expansion seeds only qualifying rows
          // (an unanchored seed computes the graph's full transitive
          // closure before the filter ever runs)
          if (pendingWhere.nonEmpty) {
            val (ready, notReady) = pendingWhere.partition(p =>
              plainConjunct(p) &&
                freeExprVars(p).forall(st.header.contains))
            if (ready.nonEmpty) {
              st = ready.foldLeft(st)((s, p) =>
                s.copy(df = s.df.where(compiler(s).compile(p))))
              pendingWhere.clear()
              pendingWhere ++= notReady
            }
          }
          val innerCol = if (named) Some(fresh(s"${relVar}_inner")) else None
          val st2 = expandVarLength(graph, st, prevVar, relVar, rel, dstVar,
            node, lo, hi.getOrElse(maxVarLength), propPreds, innerCol,
            quants = quantPreds.getOrElse(relVar, Seq.empty),
            needStructs = rel.variable.exists(structVars))
          val listCol = st2.header(relVar).asInstanceOf[RelListBinding].col
          relIds += RelId(listCol, isList = true,
            types = if (rel.types.isEmpty) Set.empty else rel.types.toSet)
          innerCol.foreach(ic => pathSegs += VarSeg(listCol, ic))
          lastVarList = Some(listCol)
          st2
      }
      if (named) pathNodes += dstVar
      prevVar = dstVar
    }

    // inline property predicates ({k: v} maps) + label predicates on bound vars
    val preShortest = propPreds.foldLeft(st) { (s, pred) =>
      s.copy(df = s.df.where(compiler(s).compile(pred)))
    }
    // shortestPath()/allShortestPaths() (extension beyond the reference):
    // keep, per (start, end) pair, only the minimum-length paths. One
    // window shuffle keyed by the endpoint ids — the grouping any shortest
    // path formulation needs; the var-length expand above bounds search
    // depth. shortestPath picks ONE deterministic winner per pair
    // (tie-break: lexicographically smallest rel-id list).
    val filtered = part.shortest match {
      case None => preShortest
      case Some(mode) =>
        require(part.chain.size == 1 && part.chain.head._1.varLength.isDefined,
          "shortestPath() requires a single var-length relationship pattern")
        val listC = col(s"`${lastVarList.get}`")
        val srcId = col(
          s"`${preShortest.header(startVar).asInstanceOf[NodeBinding].idCol}`")
        val dstId = col(
          s"`${preShortest.header(prevVar).asInstanceOf[NodeBinding].idCol}`")
        val lenC = size(listC)
        val df = mode match {
          case ShortestAll =>
            val minC = fresh("@minlen")
            preShortest.df
              .withColumn(minC, min(lenC).over(Window.partitionBy(srcId, dstId)))
              .where(lenC === col(s"`$minC`")).drop(minC)
          case ShortestOne =>
            val rnC = fresh("@rn")
            preShortest.df
              .withColumn(rnC, row_number().over(
                Window.partitionBy(srcId, dstId).orderBy(lenC.asc, listC.asc)))
              .where(col(s"`$rnC`") === 1).drop(rnC)
        }
        preShortest.copy(df = df)
    }
    part.pathName match {
      case Some(pn) =>
        if (filtered.header.get(pn).isDefined)
          throw new IllegalArgumentException(
            s"Variable `$pn` already declared; a path name cannot rebind")
        val nodeIds = pathNodes.toSeq.map(v =>
          filtered.header(v).asInstanceOf[NodeBinding].idCol)
        val bound = filtered.copy(header = filtered.header +
          (pn -> PathBinding(nodeIds, pathSegs.toSeq)))
        nodeValueDemand.get(pn) match {
          case Some(fields) =>
            // rel types traversed by this path — the schema-pattern
            // registry prunes the node-value lookup to combos reachable
            // via them (an untyped rel disables pruning). A zero-length
            // lower bound (*0..) puts the START node in nodes(p) without
            // traversing any rel, so its compatible combos must stay in
            // the scan even when not rel-reachable.
            val relTypes =
              if (part.chain.exists(_._1.types.isEmpty)) Set.empty[String]
              else part.chain.flatMap(_._1.types).toSet
            val combos = {
              val viaRel = graph.reachableCombos(relTypes)
              if (part.chain.exists(_._1.varLength.exists(_._1 == 0))) {
                val startLabels = filtered.header(startVar) match {
                  case nb: NodeBinding => nb.labels
                  case _ => Set.empty[String]
                }
                viaRel.map(_ ++ graph.nodeTables.map(_.labels)
                  .filter(startLabels.subsetOf(_)))
              } else viaRel
            }
            enrichPathNodeValues(graph, bound, pn, fields, combos)
          case None => bound
        }
      case None => filtered
    }
  }

  /** Attach an ordered node-VALUE struct list for a named path whose
    * nodes(p) is iterated with value semantics (see [[nodeValueDemand]]).
    * Shape: add a row id, posexplode the path's node-id list, join the
    * canonical node scan once, collect back ordered by position. One
    * narrow (rowid, pos, id) shuffle + one id-keyed join regardless of
    * path length — vs a node-scan join per unrolled step. */
  private def enrichPathNodeValues(graph: PropertyGraph, state: PState,
      pv: String, fields: Option[Set[String]],
      combos: Option[Set[Set[String]]] = None): PState = {
    val pb = state.header(pv) match {
      case p: PathBinding if p.nodeValsCol.isEmpty => p
      case _ => return state
    }
    // every path node is an endpoint of a traversed rel (the caller adds
    // start-compatible combos for zero-length bounds): when the graph
    // declares schema patterns, scan only the reachable label combos
    val scan = graph.nodeScan(Set.empty, naming(s"@${pv}_nv"), combos)
    val wantLabels = fields.forall(_.contains("labels"))
    val lblPart: Seq[Column] = if (!wantLabels) Seq.empty else {
      val lblEntries = scan.labelCols.toSeq.sortBy(_._1).map { case (l, c) =>
        when(col(s"`$c`"), lit(l)) }
      Seq((if (lblEntries.isEmpty) array().cast(ArrayType(StringType, false))
      else filter(array(lblEntries: _*), x => x.isNotNull)).as("labels"))
    }
    // prune to the property keys the demanding lambdas read: wide node
    // schemas would otherwise inflate the collect shuffle with dead fields
    val keptProps = scan.propCols.toSeq.sortBy(_._1).collect {
      case (k, c) if fields.forall(_.contains(k)) => col(s"`$c`").as(k) }
    val nStruct = struct(
      col(s"`${scan.idCol}`").as("id") +: (lblPart ++ keptProps): _*)
    val nid = fresh(s"@${pv}_nvid")
    val lookup = scan.df.select(col(s"`${scan.idCol}`").as(nid),
      nStruct.as("@nval"))
    val rid = fresh(s"@${pv}_rid")
    // the match result is read twice (explode side + join-back side):
    // cache it once so the pattern's joins don't re-execute
    val base = cacheShared(state.df.withColumn(rid,
      monotonically_increasing_id()))
    val valsCol = fresh(s"${pv}_nodevals")
    val collected = base
      .select(col(s"`$rid`"),
        posexplode(ExprCompiler.pathNodes(pb)).as(Seq("@pos", "@pnid")))
      .join(lookup, col("@pnid") === col(s"`$nid`"), "left")
      .groupBy(col(s"`$rid`"))
      .agg(transform(
        array_sort(collect_list(struct(col("@pos").as("p"),
          col("@nval").as("v")))),
        x => x.getField("v")).as(valsCol))
    // null path (OPTIONAL non-match): pathNodes is null → no exploded rows
    // → left join-back yields a null list, matching null semantics
    val joined = base.join(collected, Seq(rid), "left_outer")
      .drop(rid)
    state.copy(df = joined,
      header = state.header + (pv -> pb.copy(nodeValsCol = Some(valsCol))))
  }

  /** Label combinations an expand TARGET can have per the graph's
    * schema-pattern registry: the storage-dst side for an Outgoing
    * traversal, storage-src for Incoming, both for Undirected. None
    * (no pruning) for untyped rels or registry-less graphs. At scale
    * this keeps an unlabeled expand target from unioning EVERY node
    * table — only combos a declared pattern can reach are scanned. */
  private def reachableTargetCombos(graph: PropertyGraph, rel: RelPattern)
      : Option[Set[Set[String]]] =
    if (rel.types.isEmpty) None
    else rel.direction match {
      case Outgoing => graph.reachableDstCombos(rel.types.toSet)
      case Incoming => graph.reachableSrcCombos(rel.types.toSet)
      case Undirected => graph.reachableCombos(rel.types.toSet)
    }

  /** bind a node pattern's variable: scan + cross/filter as appropriate. */
  private def bindNode(graph: PropertyGraph, state: PState, v: String,
      np: NodePattern, propPreds: scala.collection.mutable.ArrayBuffer[Expr])
      : PState = {
    np.properties.foreach { case (k, e) => propPreds += Eq(Property(Var(v), k), e) }
    state.header.get(v) match {
      case Some(nb: NodeBinding) =>
        if (np.labels.nonEmpty) propPreds += HasLabels(Var(v), np.labels)
        // a null binding (failed earlier OPTIONAL MATCH) never matches a
        // pattern: re-matching a bound var drops its null rows. Chains
        // WITH hops already enforce this through the expansion equi-join;
        // the bare zero-hop chain `(n0)` has no join to do it (hunt case
        // 13380). On non-nullable id columns Catalyst prunes the filter.
        state.copy(df = state.df.where(col(s"`${nb.idCol}`").isNotNull))
      case Some(other) =>
        throw new IllegalArgumentException(s"$v already bound to $other, not a node")
      case None =>
        val scan = graph.nodeScan(np.labels.toSet, naming(v))
        val binding = NodeBinding(scan.idCol, scan.labelCols, scan.propCols,
          np.labels.toSet)
        val df =
          if (state.isUnit) scan.df
          else state.df.crossJoin(scan.df)
        PState(df, state.header + (v -> binding))
    }
  }

  /** one-hop expand: (prev)-[rel]->(dst); handles Expand and ExpandInto
    * (reference lowering: RelationalPlanner.scala:130-189). */
  /** Pattern element over an ALREADY-BOUND relationship variable: the
    * element pins its endpoints to the bound rel's storage src/dst (a
    * relationship has definite start/end nodes no matter how it was first
    * matched) and checks the declared types — no new rel scan. Unbound
    * endpoints join their node scan on the pinned id; Catalyst folds the
    * id-equality filters into hash joins. */
  private def expandWithBoundRel(graph: PropertyGraph, state: PState,
      srcVar: String, relVar: String, rb: RelBinding, rel: RelPattern,
      dstVar: String, dstNp: NodePattern,
      propPreds: scala.collection.mutable.ArrayBuffer[Expr]): PState = {
    if (rel.varLength.isDefined) throw new IllegalArgumentException(
      s"relationship variable '$relVar' is already bound; bound " +
        "relationships are not supported in var-length patterns")
    rel.properties.foreach { case (k, e) =>
      propPreds += Eq(Property(Var(relVar), k), e) }
    var df = state.df
    var header = state.header
    if (rel.types.nonEmpty && !rb.types.subsetOf(rel.types.toSet))
      df = df.where(col(s"`${rb.typCol}`").isin(rel.types: _*))
    def endpoint(v: String, np: NodePattern): Column = header.get(v) match {
      case Some(nb: NodeBinding) =>
        if (np.labels.nonEmpty) propPreds += HasLabels(Var(v), np.labels)
        np.properties.foreach { case (k, e) =>
          propPreds += Eq(Property(Var(v), k), e) }
        col(s"`${nb.idCol}`")
      case Some(other) => throw new IllegalArgumentException(
        s"$v bound to $other, not a node")
      case None =>
        val scan = graph.nodeScan(np.labels.toSet, naming(v))
        np.properties.foreach { case (k, e) =>
          propPreds += Eq(Property(Var(v), k), e) }
        header = header +
          (v -> NodeBinding(scan.idCol, scan.labelCols, scan.propCols,
            np.labels.toSet))
        df = df.crossJoin(scan.df) // the id equality below becomes the join
        col(s"`${scan.idCol}`")
    }
    val srcId = endpoint(srcVar, NodePattern(Some(srcVar), Nil, Seq.empty))
    val dstId = endpoint(dstVar, dstNp)
    val fwd = srcId === col(s"`${rb.srcCol}`") &&
      dstId === col(s"`${rb.dstCol}`")
    val bwd = srcId === col(s"`${rb.dstCol}`") &&
      dstId === col(s"`${rb.srcCol}`")
    val cond = rel.direction match {
      case Outgoing => fwd
      case Incoming => bwd
      case Undirected => fwd || bwd
    }
    PState(df.where(cond), header)
  }

  private def expandOne(graph: PropertyGraph, state: PState, srcVar: String,
      relVar: String, rel: RelPattern, dstVar: String, dstNp: NodePattern,
      propPreds: scala.collection.mutable.ArrayBuffer[Expr],
      freshSrc: Boolean = false): PState = {
    // A bound relationship variable reused in a pattern element denotes
    // THAT relationship: the element constrains its endpoints/type
    // instead of scanning anew (TCK "using a bound relationship").
    state.header.get(relVar) match {
      case Some(rb: RelBinding) =>
        return expandWithBoundRel(graph, state, srcVar, relVar, rb, rel,
          dstVar, dstNp, propPreds)
      case Some(_: RelListBinding) => throw new IllegalArgumentException(
        s"relationship list variable '$relVar' cannot rebind in a pattern")
      case Some(other) => throw new IllegalArgumentException(
        s"Variable `$relVar` already bound to $other; " +
          "cannot reuse it as a relationship")
      case None => ()
    }
    if (!freshSrc) {
      expandOneViaTriplet(graph, state, srcVar, relVar, rel, dstVar, dstNp,
        freshSrcNp = None, propPreds)
        .orElse(expandOneViaNodeRel(graph, state, srcVar, relVar, rel, dstVar,
          dstNp, freshSrcNp = None, propPreds)) match {
        case Some(st) => return st
        case None =>
          // consolidatable shape with no covering pattern table: report it
          // in storage direction so a session can materialize hot shapes
          if (rel.types.size == 1 && state.header.get(dstVar).isEmpty)
            (rel.direction, state.header.get(srcVar)) match {
              case (Outgoing, Some(nb: NodeBinding)) =>
                onExpandMiss(nb.labels, rel.types.head, dstNp.labels.toSet)
              case (Incoming, Some(nb: NodeBinding)) =>
                onExpandMiss(dstNp.labels.toSet, rel.types.head, nb.labels)
              case _ => ()
            }
      }
    }
    rel.properties.foreach { case (k, e) =>
      propPreds += Eq(Property(Var(relVar), k), e) }

    val (relDf, rb, travSrc, travDst) = orientedRelScan(graph, rel, relVar)
    // freshSrc: the chain starts at an unconstrained single-use node — the
    // rel scan itself drives, and the src binds to the id it carries
    // (no node scan, no join; see singleUsePatternVars)
    val (base, srcAdd) =
      if (freshSrc) {
        val idc = fresh(s"${srcVar}_id")
        val b = (if (state.isUnit) relDf else state.df.crossJoin(relDf))
          .withColumnRenamed(travSrc, idc)
        (b, Some(srcVar ->
          (NodeBinding(idc, Map.empty, Map.empty, Set.empty): Binding)))
      } else {
        val srcId =
          col(s"`${state.header(srcVar).asInstanceOf[NodeBinding].idCol}`")
        (state.df.join(relDf, srcId === col(s"`$travSrc`"), "inner"), None)
      }
    def hdr(h: Header): Header = srcAdd.fold(h)(h + _)

    state.header.get(dstVar) match {
      case Some(dstB: NodeBinding) => // ExpandInto: rel joins on BOTH endpoints
        if (dstNp.labels.nonEmpty) propPreds += HasLabels(Var(dstVar), dstNp.labels)
        dstNp.properties.foreach { case (k, e) =>
          propPreds += Eq(Property(Var(dstVar), k), e) }
        val df = base
          .where(col(s"`${dstB.idCol}`") === col(s"`$travDst`"))
          .drop(travSrc, travDst)
        PState(df, hdr(state.header + (relVar -> rb)))
      case Some(other) =>
        throw new IllegalArgumentException(s"$dstVar bound to $other, not a node")
      case None =>
        // unconstrained target never read again: in a valid property graph
        // every relationship endpoint exists, so the all-node-tables
        // existence join proves nothing — bind the node as an id carried
        // by the rel (reference guarantees endpoint presence via ScanGraph
        // validation, ScanGraph.scala:115-143)
        if (dstNp.labels.isEmpty && dstNp.properties.isEmpty &&
            !endpointDemandRels(relVar) &&
            (isInternal(dstVar) || singleUsePatternVars(dstVar))) {
          val idc = fresh(s"${dstVar}_id")
          val df = base.withColumnRenamed(travDst, idc).drop(travSrc)
          return PState(df, hdr(state.header + (relVar -> rb) +
            (dstVar -> NodeBinding(idc, Map.empty, Map.empty, Set.empty))))
        }
        // schema-pattern pruning: only node tables reachable as this
        // rel's target are unioned (an unlabeled dst would otherwise
        // scan every node table)
        val scan = graph.nodeScan(dstNp.labels.toSet, naming(dstVar),
          reachableTargetCombos(graph, rel))
        dstNp.properties.foreach { case (k, e) =>
          propPreds += Eq(Property(Var(dstVar), k), e) }
        val dstB = NodeBinding(scan.idCol, scan.labelCols, scan.propCols,
          dstNp.labels.toSet)
        val df = base
          .join(scan.df, col(s"`$travDst`") === col(s"`${scan.idCol}`"), "inner")
          .drop(travSrc, travDst)
        PState(df, hdr(state.header + (relVar -> rb) + (dstVar -> dstB)))
    }
  }

  /** Scan-consolidated one-hop expand over a registered [[TripletTable]]:
    * rel + dst node come from ONE materialized table, so the expand is a
    * single probe join against the driving rows instead of rel-join +
    * node-join (reference: LogicalOptimizer.scala:67-134
    * replaceScansWithRecognizedPatterns). Applies when the rel has exactly
    * one type, dst is unbound, and the graph provides a covering triplet
    * in the traversal direction. */
  private def expandOneViaTriplet(graph: PropertyGraph, state: PState,
      srcVar: String, relVar: String, rel: RelPattern, dstVar: String,
      dstNp: NodePattern, freshSrcNp: Option[NodePattern],
      propPreds: scala.collection.mutable.ArrayBuffer[Expr])
      : Option[PState] = {
    if (rel.types.size != 1 || state.header.get(dstVar).nonEmpty) return None
    // bound src: the triplet's labels may be a subset of the guarantee;
    // fresh src: exact equality, because the triplet replaces the scan
    val (srcLabels, srcExact) = freshSrcNp match {
      case Some(np) => (np.labels.toSet, true)
      case None => state.header.get(srcVar) match {
        case Some(nb: NodeBinding) => (nb.labels, false)
        case _ => return None
      }
    }
    def srcCovers(tl: Set[String]) =
      if (srcExact) tl == srcLabels else tl.subsetOf(srcLabels)
    val dstRequired = dstNp.labels.toSet
    val relType = rel.types.head

    // (src)-[:T]->(new) reads the triplet forward; (src)<-[:T]-(new)
    // reads it backward (the triplet's src side becomes the new node);
    // undirected unions both orientations of ONE symmetric table
    def findFwd = graph.tripletTables.find(t => t.relType == relType &&
      srcCovers(t.srcLabels) && t.dstLabels == dstRequired)
    def findBwd = graph.tripletTables.find(t => t.relType == relType &&
      srcCovers(t.dstLabels) && t.srcLabels == dstRequired)
    val hits: Seq[(graft.graph.TripletTable, Boolean)] = rel.direction match {
      case Outgoing => findFwd.map(_ -> true).toSeq
      case Incoming => findBwd.map(_ -> false).toSeq
      case Undirected => (findFwd, findBwd) match {
        case (Some(f), Some(b)) if f == b => Seq(f -> true, f -> false)
        case _ => Seq.empty
      }
    }
    if (hits.isEmpty) return None

    rel.properties.foreach { case (k, e) =>
      propPreds += Eq(Property(Var(relVar), k), e) }
    dstNp.properties.foreach { case (k, e) =>
      propPreds += Eq(Property(Var(dstVar), k), e) }
    freshSrcNp.foreach(_.properties.foreach { case (k, e) =>
      propPreds += Eq(Property(Var(srcVar), k), e) })

    val rn = naming(relVar); val dn = naming(dstVar)
    val sn = naming(srcVar)
    val joinKeyCol = fresh(s"${relVar}_probekey")

    // output column names are fixed ONCE (the naming functions mint fresh
    // names per call), so the undirected orientation pair unions cleanly;
    // for a symmetric table both sides carry the same label/prop keys
    val t0 = hits.head._1
    val (h0LabelCols, h0PropCols) =
      if (hits.head._2) (t0.dstLabelCols, t0.dstPropCols)
      else (t0.srcLabelCols, t0.srcPropCols)
    val relProps = t0.relPropCols.map { case (k, _) => k -> rn.propCol(k) }
    val nodeLabels = h0LabelCols.map { case (l, _) => l -> dn.labelCol(l) }
    val nodeProps = h0PropCols.map { case (k, _) => k -> dn.propCol(k) }
    val srcNames: Option[(Map[String, String], Map[String, String])] =
      freshSrcNp.map { _ =>
        val (sLabelCols, sPropCols) =
          if (hits.head._2) (t0.srcLabelCols, t0.srcPropCols)
          else (t0.dstLabelCols, t0.dstPropCols)
        (sLabelCols.map { case (l, _) => l -> sn.labelCol(l) },
          sPropCols.map { case (k, _) => k -> sn.propCol(k) })
      }

    def probeFor(t: graft.graph.TripletTable, forward: Boolean): DataFrame = {
      val (newIdSrcCol, newLabelCols, newPropCols) =
        if (forward) (t.dstIdCol, t.dstLabelCols, t.dstPropCols)
        else (t.srcIdCol, t.srcLabelCols, t.srcPropCols)
      // storage direction is always src→dst regardless of traversal
      var sel: Seq[Column] =
        Seq(col(s"`${t.relIdCol}`").as(rn.idCol),
          col(s"`${t.srcIdCol}`").as(rn.srcCol),
          col(s"`${t.dstIdCol}`").as(rn.dstCol),
          lit(t.relType).as(rn.typCol),
          col(s"`$newIdSrcCol`").as(dn.idCol),
          col(s"`${if (forward) t.srcIdCol else t.dstIdCol}`").as(joinKeyCol)) ++
        t.relPropCols.toSeq.map { case (k, c) =>
          col(s"`$c`").as(relProps(k)) } ++
        newLabelCols.toSeq.map { case (l, c) =>
          col(s"`$c`").as(nodeLabels(l)) } ++
        newPropCols.toSeq.map { case (k, c) =>
          col(s"`$c`").as(nodeProps(k)) }

      // fresh src: its node binding also comes from the triplet scan
      srcNames.foreach { case (sLabels, sProps) =>
        val (sIdCol, sLabelCols, sPropCols) =
          if (forward) (t.srcIdCol, t.srcLabelCols, t.srcPropCols)
          else (t.dstIdCol, t.dstLabelCols, t.dstPropCols)
        sel = sel ++ (col(s"`$sIdCol`").as(sn.idCol) +:
          (sLabelCols.toSeq.map { case (l, c) => col(s"`$c`").as(sLabels(l)) } ++
            sPropCols.toSeq.map { case (k, c) => col(s"`$c`").as(sProps(k)) }))
      }
      // the undirected orientation pair (two hits over one symmetric
      // table): a self-loop appears identically in both — keep only the
      // forward copy (same rule as orientedRelScan)
      val noLoop =
        if (!forward && hits.size == 2)
          t.df.where(col(s"`${t.srcIdCol}`") =!= col(s"`${t.dstIdCol}`"))
        else t.df
      noLoop.select(sel: _*)
    }

    val probe = hits.map { case (t, fwd) => probeFor(t, fwd) }
      .reduce(_ unionByName _)
    val srcBindingOpt: Option[NodeBinding] = srcNames.map {
      case (sLabels, sProps) => NodeBinding(sn.idCol, sLabels, sProps, srcLabels)
    }

    val df = srcBindingOpt match {
      case Some(_) =>
        val p = probe.drop(joinKeyCol)
        if (state.isUnit) p else state.df.crossJoin(p)
      case None =>
        val srcId =
          col(s"`${state.header(srcVar).asInstanceOf[NodeBinding].idCol}`")
        state.df.join(probe, srcId === col(s"`$joinKeyCol`"), "inner")
          .drop(joinKeyCol)
    }

    val rb = RelBinding(rn.idCol, rn.srcCol, rn.dstCol, rn.typCol,
      relProps, Set(relType))
    val dstB = NodeBinding(dn.idCol, nodeLabels, nodeProps, dstRequired)
    val header0 = srcBindingOpt.fold(state.header)(sb =>
      state.header + (srcVar -> sb))
    Some(PState(df, header0 + (relVar -> rb) + (dstVar -> dstB)))
  }

  /** Scan-consolidated one-hop expand over a registered [[NodeRelTable]]
    * (reference: NodeRelPattern, okapi-api Pattern.scala:159-176). Two
    * covered shapes:
    *  - pattern START (`freshSrcNp` defined): source node + rel bind from
    *    the table in one scan; the target is joined afterwards (or, for an
    *    anonymous unconstrained target, carried as the far-end id — the
    *    whole hop then costs ZERO joins);
    *  - MID-CHAIN fresh target: rel + target node bind from the table with
    *    a single probe join against the driving rows.
    * Tried after [[expandOneViaTriplet]]: a covering triplet consolidates
    * both endpoints and is strictly stronger. */
  private def expandOneViaNodeRel(graph: PropertyGraph, state: PState,
      srcVar: String, relVar: String, rel: RelPattern, dstVar: String,
      dstNp: NodePattern, freshSrcNp: Option[NodePattern],
      propPreds: scala.collection.mutable.ArrayBuffer[Expr])
      : Option[PState] = {
    if (rel.types.size != 1 || rel.direction == Undirected) return None
    if (state.header.get(dstVar).nonEmpty) return None
    val relType = rel.types.head

    def relSelect(t: graft.graph.NodeRelTable, rn: ScanNaming)
        : (Seq[Column], Map[String, String]) = {
      val relProps = t.relPropCols.map { case (k, _) => k -> rn.propCol(k) }
      (Seq(col(s"`${t.relIdCol}`").as(rn.idCol),
        col(s"`${t.srcIdCol}`").as(rn.srcCol),
        col(s"`${t.dstIdCol}`").as(rn.dstCol),
        lit(t.relType).as(rn.typCol)) ++
        t.relPropCols.toSeq.map { case (k, c) => col(s"`$c`").as(relProps(k)) },
        relProps)
    }

    freshSrcNp match {
      case Some(srcNp) =>
        // the attached node must sit on the traversal-SOURCE side of the
        // stored rel: (n)-[:T]->(x) reads a nodeOnSrc table, (n)<-[:T]-(x)
        // a nodeOnDst one. Exact label equality — the table replaces the scan.
        val wantOnSrc = rel.direction == Outgoing
        graph.nodeRelTables.find(t => t.relType == relType &&
          t.nodeOnSrc == wantOnSrc &&
          t.nodeLabels == srcNp.labels.toSet).map { t =>
          // fully-labeled shape half-covered here (dst still joins its
          // scan): keep reporting it so a HOT shape promotes to a full
          // triplet — the table lookup order makes the triplet win then
          if (srcNp.labels.nonEmpty && dstNp.labels.nonEmpty) {
            if (rel.direction == Outgoing)
              onExpandMiss(srcNp.labels.toSet, relType, dstNp.labels.toSet)
            else onExpandMiss(dstNp.labels.toSet, relType, srcNp.labels.toSet)
          }
          srcNp.properties.foreach { case (k, e) =>
            propPreds += Eq(Property(Var(srcVar), k), e) }
          rel.properties.foreach { case (k, e) =>
            propPreds += Eq(Property(Var(relVar), k), e) }
          val rn = naming(relVar); val sn = naming(srcVar)
          val (relCols, relProps) = relSelect(t, rn)
          val srcLabels = t.nodeLabelCols.map { case (l, _) => l -> sn.labelCol(l) }
          val srcProps = t.nodePropCols.map { case (k, _) => k -> sn.propCol(k) }
          val nodeIdSrcCol = if (wantOnSrc) t.srcIdCol else t.dstIdCol
          val farIdSrcCol = if (wantOnSrc) t.dstIdCol else t.srcIdCol
          val farCol = fresh(s"${dstVar}_far")
          val sel = relCols ++ Seq(
            col(s"`$nodeIdSrcCol`").as(sn.idCol),
            col(s"`$farIdSrcCol`").as(farCol)) ++
            t.nodeLabelCols.toSeq.map { case (l, c) =>
              col(s"`$c`").as(srcLabels(l)) } ++
            t.nodePropCols.toSeq.map { case (k, c) =>
              col(s"`$c`").as(srcProps(k)) }
          val scanDf = t.df.select(sel: _*)
          val srcB = NodeBinding(sn.idCol, srcLabels, srcProps,
            srcNp.labels.toSet)
          val rb = RelBinding(rn.idCol, rn.srcCol, rn.dstCol, rn.typCol,
            relProps, Set(relType))
          val (hopDf, dstB) =
            if (dstNp.labels.isEmpty && dstNp.properties.isEmpty &&
                !endpointDemandRels(relVar) &&
                (isInternal(dstVar) || singleUsePatternVars(dstVar))) {
              val idc = fresh(s"${dstVar}_id")
              (scanDf.withColumnRenamed(farCol, idc),
                NodeBinding(idc, Map.empty, Map.empty, Set.empty))
            } else {
              dstNp.properties.foreach { case (k, e) =>
                propPreds += Eq(Property(Var(dstVar), k), e) }
              val scan = graph.nodeScan(dstNp.labels.toSet, naming(dstVar),
                reachableTargetCombos(graph, rel))
              (scanDf.join(scan.df,
                col(s"`$farCol`") === col(s"`${scan.idCol}`"), "inner")
                .drop(farCol),
                NodeBinding(scan.idCol, scan.labelCols, scan.propCols,
                  dstNp.labels.toSet))
            }
          val df = if (state.isUnit) hopDf else state.df.crossJoin(hopDf)
          PState(df, state.header + (srcVar -> srcB) + (relVar -> rb) +
            (dstVar -> dstB))
        }
      case None =>
        state.header.get(srcVar) match {
          case Some(srcB: NodeBinding) =>
            // fresh target binds from a table whose node sits on the
            // traversal-TARGET side: -[:T]->(m) wants nodeOnDst,
            // <-[:T]-(m) wants nodeOnSrc
            val wantOnSrc = rel.direction == Incoming
            graph.nodeRelTables.find(t => t.relType == relType &&
              t.nodeOnSrc == wantOnSrc &&
              t.nodeLabels == dstNp.labels.toSet).map { t =>
              // labeled bound src answered via the dst-side node-rel: a
              // triplet additionally absorbs the SRC scan at pattern
              // starts — report so hot fully-labeled shapes promote
              if (srcB.labels.nonEmpty && dstNp.labels.nonEmpty) {
                if (rel.direction == Outgoing)
                  onExpandMiss(srcB.labels, relType, dstNp.labels.toSet)
                else onExpandMiss(dstNp.labels.toSet, relType, srcB.labels)
              }
              rel.properties.foreach { case (k, e) =>
                propPreds += Eq(Property(Var(relVar), k), e) }
              dstNp.properties.foreach { case (k, e) =>
                propPreds += Eq(Property(Var(dstVar), k), e) }
              val rn = naming(relVar); val dn = naming(dstVar)
              val (relCols, relProps) = relSelect(t, rn)
              val dstLabels = t.nodeLabelCols.map { case (l, _) =>
                l -> dn.labelCol(l) }
              val dstProps = t.nodePropCols.map { case (k, _) =>
                k -> dn.propCol(k) }
              val nodeIdSrcCol = if (wantOnSrc) t.srcIdCol else t.dstIdCol
              val nearIdSrcCol = if (wantOnSrc) t.dstIdCol else t.srcIdCol
              val probeKey = fresh(s"${relVar}_probekey")
              val sel = relCols ++ Seq(
                col(s"`$nodeIdSrcCol`").as(dn.idCol),
                col(s"`$nearIdSrcCol`").as(probeKey)) ++
                t.nodeLabelCols.toSeq.map { case (l, c) =>
                  col(s"`$c`").as(dstLabels(l)) } ++
                t.nodePropCols.toSeq.map { case (k, c) =>
                  col(s"`$c`").as(dstProps(k)) }
              val probe = t.df.select(sel: _*)
              val df = state.df.join(probe,
                col(s"`${srcB.idCol}`") === col(s"`$probeKey`"), "inner")
                .drop(probeKey)
              val rb = RelBinding(rn.idCol, rn.srcCol, rn.dstCol, rn.typCol,
                relProps, Set(relType))
              val dstB = NodeBinding(dn.idCol, dstLabels, dstProps,
                dstNp.labels.toSet)
              PState(df, state.header + (relVar -> rb) + (dstVar -> dstB))
            }
          case _ => None
        }
    }
  }

  /** Shared-subtree cache insertion (reference: RelationalOptimizer.scala:
    * 35-92 counts duplicate subtrees and persists the highest shared one).
    * Applied wherever this planner emits a plan that reads the SAME
    * DataFrame twice: undirected scans (union of both orientations),
    * var-length unrolling, and the seed+join-back shape of optional /
    * exists / comprehension subqueries. MEMORY_AND_DISK: spills rather
    * than recomputes; Spark's CacheManager dedups by canonicalized plan,
    * so repeated queries over the same scan share one materialization. */
  private def cacheShared(df: DataFrame): DataFrame =
    if (df.storageLevel != org.apache.spark.storage.StorageLevel.NONE) df
    else {
      val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      onPersist(p)
      p
    }

  /** rel scan with traversal orientation columns. Storage src/dst stay in
    * the binding (startNode/endNode return storage direction); traversal
    * uses trav columns, which the caller drops. Undirected = union of both
    * orientations (reference: RelationalPlanner.scala:154-164) over ONE
    * cached scan. */
  private def orientedRelScan(graph: PropertyGraph, rel: RelPattern,
      relVar: String): (DataFrame, RelBinding, String, String) = {
    val scan = graph.relScan(rel.types, naming(relVar))
    val rb = RelBinding(scan.idCol, scan.srcCol, scan.dstCol, scan.typCol,
      scan.propCols, scan.types)
    val travSrc = fresh(s"${relVar}_tsrc")
    val travDst = fresh(s"${relVar}_tdst")
    val base =
      if (rel.direction == Undirected) cacheShared(scan.df) else scan.df
    val df = rel.direction match {
      case Outgoing => base
        .withColumn(travSrc, col(s"`${scan.srcCol}`"))
        .withColumn(travDst, col(s"`${scan.dstCol}`"))
      case Incoming => base
        .withColumn(travSrc, col(s"`${scan.dstCol}`"))
        .withColumn(travDst, col(s"`${scan.srcCol}`"))
      case Undirected =>
        // a SELF-LOOP's two orientations are the same (r, src, dst)
        // binding — keep only the forward copy or the loop matches twice
        // (Neo4j "matches an undirected cyclic relationship": one row)
        base.withColumn(travSrc, col(s"`${scan.srcCol}`"))
          .withColumn(travDst, col(s"`${scan.dstCol}`"))
          .unionByName(base
            .where(col(s"`${scan.srcCol}`") =!= col(s"`${scan.dstCol}`"))
            .withColumn(travSrc, col(s"`${scan.dstCol}`"))
            .withColumn(travDst, col(s"`${scan.srcCol}`")))
    }
    (df, rb, travSrc, travDst)
  }

  /** `[*lo..hi]` — unrolled union over path lengths with per-path edge
    * uniqueness and a rel-id-list binding (reference strategy:
    * VarLengthExpandPlanner.scala; ours unions aligned branches). */
  private def expandVarLength(graph: PropertyGraph, state: PState,
      srcVar: String, relVar: String, rel: RelPattern, dstVar: String,
      dstNp: NodePattern, lo: Int, hi: Int,
      propPreds: scala.collection.mutable.ArrayBuffer[Expr],
      innerCol: Option[String] = None,
      quants: Seq[Quantified] = Seq.empty,
      needStructs: Boolean = false): PState = {
    // Neo4j: "Bound relationships not allowed in variable length
    // expressions" — a silent rebind would ignore the bound rel entirely
    if (!isInternal(relVar) && state.header.contains(relVar))
      throw new IllegalArgumentException(
        s"bound relationship variable '$relVar' is not allowed in a " +
          "variable length pattern")
    require(lo >= 0 && hi >= lo, s"invalid var-length bounds [*$lo..$hi]")
    require(hi <= 1000, s"var-length upper bound $hi too large (cap 1000)")

    // WHERE-position quantifiers over this rel-list variable, pushed into
    // the unroll (reference: VarLengthExpandPlanner applies rel predicates
    // per step; Neo4j pushes all-rel predicates into the traversal):
    //  - all:    every step must be definitively true  → per-step filter
    //  - none:   every step must be definitively false → per-step filter
    //    (a null predicate poisons the quantifier to null, which a WHERE
    //    drops — so only definitive steps survive)
    //  - any:    ≥1 definitively-true step → counter across steps
    //  - single: exactly 1 true and 0 nulls → true+null counters
    val stepFilterQuants = quants.filter(q =>
      q.quantifier == "all" || q.quantifier == "none")
    val countedQuants: Seq[(Quantified, String, Option[String])] =
      quants.filter(q => q.quantifier == "any" || q.quantifier == "single")
        .zipWithIndex.map { case (q, i) =>
          (q, fresh(s"${relVar}_qt$i"),
            if (q.quantifier == "single") Some(fresh(s"${relVar}_qn$i"))
            else None)
        }
    val cntColNames = countedQuants.flatMap { case (_, t, n) => t +: n.toSeq }

    val srcB = state.header(srcVar).asInstanceOf[NodeBinding]
    val dstBound = state.header.get(dstVar).map {
      case nb: NodeBinding => nb
      case other => throw new IllegalArgumentException(
        s"$dstVar bound to $other, not a node")
    }

    // canonical output: state cols + list col + (dst binding cols if new)
    val listCol = fresh(s"${relVar}_ids")
    // relationship-VALUE list on demand (planner demand analysis): a
    // parallel array of (id, type, props…) structs so lambdas over the
    // variable read properties; the id list stays the uniqueness/path
    // currency. Cast to one explicit type so every branch unions cleanly.
    val structCol = if (needStructs) Some(fresh(s"${relVar}_rels")) else None
    // schema-pattern pruning for the unbound dst: only combos reachable
    // as the traversal's target are unioned. A zero-length lower bound
    // makes dst == src, so src-compatible combos must stay in the scan
    // (they need not be rel-reachable).
    val dstCombos: Option[Set[Set[String]]] = {
      val viaRel = reachableTargetCombos(graph, rel)
      if (lo == 0)
        viaRel.map(_ ++ graph.nodeTables.map(_.labels)
          .filter(srcB.labels.subsetOf(_)))
      else viaRel
    }
    val dstScan0 =
      if (dstBound.isEmpty)
        Some(graph.nodeScan(dstNp.labels.toSet, naming(dstVar), dstCombos))
      else None
    val dstB = dstBound.getOrElse {
      val s0 = dstScan0.get
      NodeBinding(s0.idCol, s0.labelCols, s0.propCols, dstNp.labels.toSet)
    }
    val outCols: Seq[String] =
      state.header.columns ++ (listCol +: (structCol.toSeq ++ innerCol.toSeq)) ++
        (if (dstBound.isEmpty) dstB.columns else Seq.empty) ++ cntColNames

    // named-path support: interior node ids per branch (dst of every step
    // but the last) as an extra list column
    def withInner(df: DataFrame, ids: Seq[Column]): DataFrame =
      innerCol match {
        case Some(c) if ids.nonEmpty => df.withColumn(c, array(ids: _*))
        case Some(c) =>
          df.withColumn(c, array().cast(ArrayType(LongType, false)))
        case None => df
      }

    // One physical relationship scan shared by every unrolled step: the
    // plan references it 1+2+…+k times, so persist once (the reference's
    // shared-subtree Cache pass, RelationalOptimizer.scala:35-92) and give
    // each step a fresh-named projection over the SAME DataFrame object —
    // its InMemoryRelation lineage makes every step a cache read.
    val baseScan = graph.relScan(rel.types, naming(relVar))

    // An inline {k: v} map holds at EVERY step, so when its values are
    // self-contained (no variable references — literals/params), filter
    // the scan BEFORE persisting: Catalyst cannot push predicates below
    // an InMemoryRelation, so filtering first shrinks the cache itself
    // and every unrolled join probes only qualifying edges.
    def referencesVars(e: Expr): Boolean = e match {
      case Var(_) => true
      case _: MapProjection => true // references its variable by name
      case _ =>
        var found = false
        mapChildren(e) { c => if (referencesVars(c)) found = true; c }
        found
    }
    val prefilterProps =
      rel.properties.nonEmpty && rel.properties.forall(p => !referencesVars(p._2))
    val scanDf =
      if (prefilterProps) {
        val hdr = Header(ListMap(relVar -> RelBinding(baseScan.idCol,
          baseScan.srcCol, baseScan.dstCol, baseScan.typCol,
          baseScan.propCols, baseScan.types)))
        val comp = new ExprCompiler(hdr, params, () => baseScan.df)
        rel.properties.foldLeft(baseScan.df) { case (d, (k2, e)) =>
          d.where(comp.compile(Eq(Property(Var(relVar), k2), e))) }
      } else baseScan.df
    // Column pruning must reach the CACHE, not just its reads (round 11,
    // guide §6): the shared scan used to persist EVERY rel property
    // column while the unroll only reads the keys the pushed quantifiers
    // / per-step predicates / inline property map mention — none at all
    // for a bare `[:T*1..2]` hop. Prune the cached projection to those
    // keys (rel-VALUE demand keeps everything): c30's 12-prop lineitem
    // edge cache drops to l_quantity + the id/src/dst/type spine.
    // Conservative: ANY Property(_, key) anywhere in a pushed predicate
    // keeps `key`, so per-step compiles can never miss a column.
    val keptProps: Map[String, String] =
      if (needStructs) baseScan.propCols
      else {
        val keys = scala.collection.mutable.Set[String]()
        def collect(e: Expr): Unit = e match {
          case Property(inner, k) => keys += k; collect(inner)
          case other => mapChildren(other) { c => collect(c); c }
        }
        quants.foreach(q => collect(q.predicate))
        propPreds.foreach(collect)
        rel.properties.foreach { case (k, v) => keys += k; collect(v) }
        baseScan.propCols.filter { case (k, _) => keys.contains(k) }
      }
    val prunedDf =
      if (keptProps.size == baseScan.propCols.size) scanDf
      else scanDf.select(
        (Seq(baseScan.idCol, baseScan.srcCol, baseScan.dstCol,
          baseScan.typCol) ++ keptProps.values.toSeq)
          .map(c => col(s"`$c`")): _*)
    val baseDf =
      if (hi - math.max(lo, 1) >= 1 || hi >= 2) cacheShared(prunedDf)
      else prunedDf

    def orientedStep(rel2: RelPattern, rv: String)
        : (DataFrame, RelBinding, String, String) = {
      val id = fresh(s"${rv}_id"); val src = fresh(s"${rv}_src")
      val dst = fresh(s"${rv}_dst"); val typ = fresh(s"${rv}_type")
      val propRename = keptProps.map { case (k2, _) =>
        k2 -> fresh(s"${rv}_p_$k2") }
      val sel: Seq[Column] = Seq(
        col(s"`${baseScan.idCol}`").as(id), col(s"`${baseScan.srcCol}`").as(src),
        col(s"`${baseScan.dstCol}`").as(dst), col(s"`${baseScan.typCol}`").as(typ)) ++
        keptProps.toSeq.map { case (k2, c) =>
          col(s"`$c`").as(propRename(k2)) }
      val rb = RelBinding(id, src, dst, typ, propRename, baseScan.types)
      val tSrc = fresh(s"${rv}_tsrc"); val tDst = fresh(s"${rv}_tdst")
      // ONE select per orientation (round 10): each withColumn was a
      // full Dataset construction — O(plan size) of Catalyst analysis —
      // and the unroll calls this per step per branch.
      val fwdEnds = Seq(col(s"`${baseScan.srcCol}`").as(tSrc),
        col(s"`${baseScan.dstCol}`").as(tDst))
      val bwdEnds = Seq(col(s"`${baseScan.dstCol}`").as(tSrc),
        col(s"`${baseScan.srcCol}`").as(tDst))
      val oriented = rel2.direction match {
        case Outgoing => baseDf.select(sel ++ fwdEnds: _*)
        case Incoming => baseDf.select(sel ++ bwdEnds: _*)
        case Undirected => baseDf.select(sel ++ fwdEnds: _*)
          // self-loops: both orientations are the same binding — forward
          // copy only (same rule as orientedRelScan)
          .unionByName(baseDf
            .where(col(s"`${baseScan.srcCol}`") =!= col(s"`${baseScan.dstCol}`"))
            .select(sel ++ bwdEnds: _*))
      }
      (oriented, rb, tSrc, tDst)
    }

    val relStructType = StructType(
      StructField("id", LongType) +:
        StructField("type", StringType) +:
        keptProps.toSeq.sortBy(_._1).map { case (k, c) =>
          StructField(k, baseScan.df.schema(c).dataType) })

    // zero traversed steps / branch prefix: every counter starts at 0 and
    // the value list (when demanded) starts empty. One withColumns call —
    // per-column withColumn chains each re-analyze the whole plan.
    def withCnt0(df: DataFrame): DataFrame = {
      val cols: Seq[(String, Column)] =
        cntColNames.map(_ -> lit(0L)) ++
          structCol.map(_ -> array().cast(ArrayType(relStructType))).toSeq
      if (cols.isEmpty) df
      else df.withColumns(cols.toMap)
    }

    def branch(k: Int): DataFrame = {
      if (k == 0) {
        // zero-length: dst == src. No relationship is traversed, so an
        // inline rel property map is vacuously satisfied (openCypher;
        // reference: VarLengthExpandPlanner lower-bound-0 case).
        dstBound match {
          case Some(b) =>
            withInner(withCnt0(state.df
              .where(col(s"`${srcB.idCol}`") === col(s"`${b.idCol}`"))
              .withColumn(listCol, array().cast(ArrayType(LongType, false)))),
              Seq.empty)
              .select(outCols.map(c => col(s"`$c`")): _*)
          case None =>
            // join the dst node scan on id equality so dst carries its FULL
            // property/label set — copying the (label-restricted) src scan's
            // columns would null out properties the node actually has.
            val s0 = dstScan0.get
            withInner(withCnt0(state.df
              .join(s0.df, col(s"`${srcB.idCol}`") === col(s"`${s0.idCol}`"),
                "inner")
              .withColumn(listCol, array().cast(ArrayType(LongType, false)))),
              Seq.empty)
              .select(outCols.map(c => col(s"`$c`")): _*)
        }
      } else {
        // Batched Dataset construction (round 10): the k-step unroll
        // previously interleaved a where/withColumn per predicate per
        // step, each a full Catalyst analysis of the growing join tree —
        // the dominant driver cost on stacked var-length queries
        // (differential case 734). Joins still chain one per step (they
        // must), but ALL predicates collect into one where() and ALL
        // derived columns into one withColumns() at the end; the
        // optimizer pushes them back down, so the executed plan is
        // unchanged.
        var df = state.df
        var prevOut: Column = col(s"`${srcB.idCol}`")
        val stepIds = scala.collection.mutable.ArrayBuffer.empty[String]
        val stepDsts = scala.collection.mutable.ArrayBuffer.empty[String]
        val stepStructs = scala.collection.mutable.ArrayBuffer.empty[Column]
        val preds = scala.collection.mutable.ArrayBuffer.empty[Column]
        var cntAcc: Seq[Column] = countedQuants.flatMap { case (_, _, n) =>
          lit(0L) +: n.map(_ => lit(0L)).toSeq }
        (1 to k).foreach { _ =>
          val (relDf, rb2, tSrc, tDst) = orientedStep(rel, relVar)
          df = df.join(relDf, prevOut === col(s"`$tSrc`"), "inner")
          stepDsts += tDst
          // inline {k: v} property map applies to EVERY traversed step
          // (reference: VarLengthExpandPlanner.scala:107-135). Already
          // folded into the cached scan when self-contained; otherwise
          // compiled against this step's rel binding. (Filters are
          // deferred to one where(); the compiler probe only reads the
          // schema, which filters don't change.)
          if (rel.properties.nonEmpty && !prefilterProps) {
            val stepHeader = state.header + (relVar -> rb2)
            val probeDf = df
            val stepComp = new ExprCompiler(stepHeader, params, () => probeDf)
            rel.properties.foreach { case (k2, e) =>
              preds += stepComp.compile(Eq(Property(Var(relVar), k2), e))
            }
          }
          // pushed WHERE quantifiers: evaluate against this step's binding
          def stepPred(q: Quantified): Column = {
            val probeDf = df
            new ExprCompiler(state.header + (q.variable -> rb2), params,
              () => probeDf).compile(q.predicate)
          }
          stepFilterQuants.foreach { q =>
            val p = stepPred(q)
            preds += (
              if (q.quantifier == "all") p <=> lit(true)
              else p <=> lit(false)) // none
          }
          if (countedQuants.nonEmpty) {
            var i = 0
            cntAcc = countedQuants.flatMap { case (q, _, n) =>
              val p = stepPred(q)
              val t = cntAcc(i) +
                when(p <=> lit(true), lit(1L)).otherwise(lit(0L))
              val rest = n.map { _ =>
                val nn = cntAcc(i + 1) +
                  when(p.isNull, lit(1L)).otherwise(lit(0L))
                nn
              }.toSeq
              i += 1 + rest.size
              t +: rest
            }
          }
          if (structCol.isDefined)
            stepStructs += struct(
              col(s"`${rb2.idCol}`").as("id") +:
                col(s"`${rb2.typCol}`").as("type") +:
                rb2.propCols.toSeq.sortBy(_._1).map { case (k2, c) =>
                  col(s"`$c`").as(k2) }: _*)
          stepIds += rb2.idCol
          prevOut = col(s"`$tDst`")
        }
        // per-path edge uniqueness
        for (i <- stepIds.indices; j <- (i + 1) until stepIds.size)
          preds += (col(s"`${stepIds(i)}`") =!= col(s"`${stepIds(j)}`"))
        if (preds.nonEmpty) df = df.where(preds.reduce(_ && _))
        val derived: Seq[(String, Column)] =
          Seq(listCol -> array(stepIds.toSeq.map(c => col(s"`$c`")): _*)) ++
            structCol.map(c => c ->
              array(stepStructs.toSeq: _*).cast(ArrayType(relStructType))) ++
            cntColNames.zip(cntAcc)
        df = df.withColumns(derived.toMap)
        df = withInner(df,
          stepDsts.toSeq.dropRight(1).map(c => col(s"`$c`")))
        // terminal node
        dstBound match {
          case Some(b) =>
            df.where(prevOut === col(s"`${b.idCol}`"))
              .select(outCols.map(c => col(s"`$c`")): _*)
          case None =>
            // same schema-pattern pruning as dstScan0 (k ≥ 1 branches:
            // dst is always rel-reachable, no zero-length union needed —
            // but keep dstCombos so columns line up with the binding)
            val scanK = graph.nodeScan(dstNp.labels.toSet, naming(dstVar),
              dstCombos)
            val joined = df.join(scanK.df, prevOut === col(s"`${scanK.idCol}`"), "inner")
            // rename this branch's dst cols to the canonical dst col names
            val renames: Seq[(String, String)] =
              (scanK.idCol -> dstB.idCol) +:
                (dstB.labelCols.toSeq.map { case (l, c) => scanK.labelCols(l) -> c } ++
                  dstB.propCols.toSeq.map { case (p, c) => scanK.propCols(p) -> c })
            val renameMap = renames.toMap
            val sel = outCols.map { c =>
              val srcCol = renames.collectFirst { case (from, to) if to == c => from }
                .getOrElse(c)
              col(s"`$srcCol`").as(c)
            }
            joined.select(sel: _*)
        }
      }
    }

    // Deep traversals (hi > unrollCap) route to an ITERATIVE frontier
    // loop instead of the unroll: the unroll builds O(hi²) joins into ONE
    // plan (branch k re-derives steps 1..k), which explodes Catalyst
    // analysis time past ~30 steps; the iterative route materializes the
    // frontier once per depth (localCheckpoint truncates lineage so the
    // per-step plan stays constant-size) and stops EARLY when the frontier
    // empties — `[*1..50]` on a 4-node chain does 4 steps, not 50.
    // NOT GraphX Pregel: Cypher var-length semantics are trail
    // enumeration (one row per edge-distinct path), which a
    // message-aggregation BFS cannot express without carrying full path
    // state per vertex — the same work with a worse plan. The frontier
    // loop IS distributed BFS, with paths as first-class rows.
    val unrollCap = 30

    def iterativeUnion(): DataFrame = {
      val posCol = fresh(s"${relVar}_pos")
      val dstsCol = innerCol.map(_ => fresh(s"${relVar}_dsts"))
      val frontierCols: Seq[String] =
        state.header.columns ++ Seq(listCol) ++ structCol.toSeq ++
          dstsCol.toSeq ++ cntColNames :+ posCol

      var frontier: DataFrame = {
        var d = state.df
          .withColumn(listCol, array().cast(ArrayType(LongType, false)))
          .withColumn(posCol, col(s"`${srcB.idCol}`"))
        d = cntColNames.foldLeft(d)((dd, c) => dd.withColumn(c, lit(0L)))
        structCol.foreach { c =>
          d = d.withColumn(c, array().cast(ArrayType(relStructType))) }
        dstsCol.foreach { c =>
          d = d.withColumn(c, array().cast(ArrayType(LongType, false))) }
        d.select(frontierCols.map(c => col(s"`$c`")): _*)
      }

      // terminal handling for one emitted depth (same semantics as the
      // unroll's branch(k) tail, over the running frontier columns)
      def emitDepth(fr: DataFrame): DataFrame = {
        val withInnerDf = innerCol match {
          case Some(c) =>
            val ds = col(s"`${dstsCol.get}`")
            fr.withColumn(c, slice(ds, lit(1), size(ds) - lit(1)))
          case None => fr
        }
        dstBound match {
          case Some(b) =>
            withInnerDf
              .where(col(s"`$posCol`") === col(s"`${b.idCol}`"))
              .select(outCols.map(c => col(s"`$c`")): _*)
          case None =>
            val scanK = graph.nodeScan(dstNp.labels.toSet, naming(dstVar),
              dstCombos)
            val joined = withInnerDf.join(scanK.df,
              col(s"`$posCol`") === col(s"`${scanK.idCol}`"), "inner")
            val renames: Seq[(String, String)] =
              (scanK.idCol -> dstB.idCol) +:
                (dstB.labelCols.toSeq.map { case (l, c) =>
                  scanK.labelCols(l) -> c } ++
                  dstB.propCols.toSeq.map { case (p, c) =>
                    scanK.propCols(p) -> c })
            val sel = outCols.map { c =>
              val srcCol = renames.collectFirst {
                case (from, to) if to == c => from }.getOrElse(c)
              col(s"`$srcCol`").as(c)
            }
            joined.select(sel: _*)
        }
      }

      val acc = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
      if (lo == 0) acc += branch(0)
      var k = 1
      var exhausted = false
      while (k <= hi && !exhausted) {
        val (relDf, rb2, tSrc, tDst) = orientedStep(rel, relVar)
        // one join + one where + one select per depth (round 10): the
        // same batching as branch(k) — each interleaved where/withColumn
        // was a full analysis of the frontier plan.
        val joined = frontier
          .join(relDf, col(s"`$posCol`") === col(s"`$tSrc`"), "inner")
        // per-path edge uniqueness against the running id list
        val preds = scala.collection.mutable.ArrayBuffer[Column](
          !array_contains(col(s"`$listCol`"), col(s"`${rb2.idCol}`")))
        if (rel.properties.nonEmpty && !prefilterProps) {
          val stepHeader = state.header + (relVar -> rb2)
          val stepComp = new ExprCompiler(stepHeader, params, () => joined)
          rel.properties.foreach { case (k2, e) =>
            preds += stepComp.compile(Eq(Property(Var(relVar), k2), e))
          }
        }
        def stepPred(q: Quantified): Column =
          new ExprCompiler(state.header + (q.variable -> rb2), params,
            () => joined).compile(q.predicate)
        stepFilterQuants.foreach { q =>
          val p = stepPred(q)
          preds += (
            if (q.quantifier == "all") p <=> lit(true)
            else p <=> lit(false)) // none
        }
        val updated: Map[String, Column] = {
          val cnt = countedQuants.flatMap { case (q, t, n) =>
            val p = stepPred(q)
            (t -> (col(s"`$t`") +
              when(p <=> lit(true), lit(1L)).otherwise(lit(0L)))) +:
              n.map { nn => nn -> (col(s"`$nn`") +
                when(p.isNull, lit(1L)).otherwise(lit(0L))) }.toSeq
          }
          val st = structCol.map { c =>
            val s2 = struct(
              col(s"`${rb2.idCol}`").as("id") +:
                col(s"`${rb2.typCol}`").as("type") +:
                rb2.propCols.toSeq.sortBy(_._1).map { case (k2, cc) =>
                  col(s"`$cc`").as(k2) }: _*)
            c -> concat(col(s"`$c`"), array(s2).cast(ArrayType(relStructType)))
          }
          val lst = Seq(listCol ->
            concat(col(s"`$listCol`"), array(col(s"`${rb2.idCol}`"))))
          val dsts = dstsCol.map(c =>
            c -> concat(col(s"`$c`"), array(col(s"`$tDst`")))).toSeq
          val pos = Seq(posCol -> col(s"`$tDst`"))
          (cnt ++ st ++ lst ++ dsts ++ pos).toMap
        }
        val df = joined.where(preds.reduce(_ && _))
          .select(frontierCols.map(c =>
            updated.getOrElse(c, col(s"`$c`")).as(c)): _*)
        // materialize + truncate lineage: the next step's plan starts from
        // this checkpoint, so plan size is constant in depth.
        frontier = Planner.checkpointFrontier(df)
        if (k >= math.max(lo, 1)) acc += emitDepth(frontier)
        exhausted = frontier.isEmpty
        k += 1
      }
      if (acc.isEmpty)
        // frontier exhausted before lo (and no zero branch): no rows —
        // borrow branch(1)'s frame for the canonical outCols schema
        branch(1).limit(0)
      else acc.reduce(_ unionByName _)
    }

    val lo1 = math.max(lo, 0)
    val unioned =
      if (hi <= unrollCap) (lo1 to hi).map(branch).reduce(_ unionByName _)
      else iterativeUnion()
    // counted quantifiers decide per path, across all branch lengths
    val quantFiltered = countedQuants.foldLeft(unioned) {
      case (d, (q, t, n)) =>
        val kept = q.quantifier match {
          case "any" => d.where(col(s"`$t`") >= 1)
          case "single" => // exactly one true and no null verdicts
            d.where(col(s"`$t`") === 1 && col(s"`${n.get}`") === 0)
        }
        kept.drop(t +: n.toSeq: _*)
    }
    // a BOUND dst var joins back on id only — its pattern labels must
    // still hold (expandOne pushes the same predicate for ExpandInto,
    // :1172; found by differential case 321: the label on the second
    // occurrence in MATCH (n)-[*2..4]-(n:A) was dropped when n was bound
    // by an earlier clause, so chain reversal could not rescue it)
    if (dstBound.isDefined && dstNp.labels.nonEmpty)
      propPreds += HasLabels(Var(dstVar), dstNp.labels)
    dstNp.properties.foreach { case (k, e) =>
      propPreds += Eq(Property(Var(dstVar), k), e) }
    PState(quantFiltered,
      state.header + (relVar -> RelListBinding(listCol,
        if (rel.types.isEmpty) Set.empty else rel.types.toSet, structCol,
        innerCol)) +
        (dstVar -> dstB))
  }

  // ===================================================== OPTIONAL / WHERE
  /** OPTIONAL MATCH: plan rhs from the distinct projection of shared vars,
    * rename its copies, left-outer join back (reference recipe:
    * RelationalPlanner.planOptional :298-329). */
  private def planOptionalMatch(graph: PropertyGraph, state: PState,
      m: MatchClause): PState = {
    val shared = correlatedVars(state, m.pattern.parts, m.where.toSeq)

    if (state.isUnit || shared.isEmpty) {
      val rhs = planMatch(graph, unitState, m.copy(optional = false))
      // left-outer on constant condition keeps lhs rows: a non-matching
      // OPTIONAL MATCH yields one all-null row — also when it is the FIRST
      // clause (openCypher: the unit table has exactly one empty row).
      val df = state.df.join(rhs.df, lit(true), "left_outer")
      return PState(df, Header(state.header.bindings ++ rhs.header.bindings))
    }

    // the lhs is read twice (seed projection + join-back): cache it once
    val lhsDf = cacheShared(state.df)
    // seed rhs with the distinct shared bindings, trimmed to the columns
    // the optional pattern actually references (id-width distinct)
    val sharedBindings = shared.map(v => v ->
      trimmedSeedBinding(v, state.header(v), m.pattern.parts, m.where.toSeq))
    val seedCols = sharedBindings.flatMap(_._2.columns).distinct
    val seedDf = lhsDf.select(seedCols.map(c => col(s"`$c`")): _*).distinct()
    val entityShared = collectPatternVars(m.pattern).filter(state.header.contains)
    val rhs =
      if (entityShared.nonEmpty || varLengthReadsOuter(state, m.pattern)) {
        // entity-correlated: the pattern starts FROM the bound ids — seed
        // the match so expansion probes only the seed's rows
        val seed = PState(seedDf, Header(ListMap(sharedBindings: _*)))
        planMatch(graph, seed, m.copy(optional = false))
      } else {
        // value-only correlation: plan the pattern once from the unit
        // state, then bring the seed into scope ABOVE it and filter —
        // Catalyst folds the correlated equalities into hash joins
        // instead of a seed×scan product under the pattern
        planValueCorrelated(graph, state, seedDf, sharedBindings,
          m.pattern, m.where)
      }

    // a named path over ALREADY-BOUND elements would share only the outer
    // row's non-null columns, making a miss invisible to the path null
    // guard — give every path bound by this optional a presence marker:
    // lit(true) on the matched side, null after the left-outer join
    // (differential hunt 31400)
    val pathPresence = rhs.header.bindings.collect {
      case (v, _: PathBinding) if !state.header.contains(v) =>
        v -> fresh("@pathpresent")
    }
    val rhs2 =
      if (pathPresence.isEmpty) rhs
      else PState(
        pathPresence.foldLeft(rhs.df) { case (df, (_, c)) =>
          df.withColumn(c, lit(true)) },
        Header(rhs.header.bindings.map {
          case (v, pb: PathBinding) if pathPresence.contains(v) =>
            v -> pb.copy(presenceCol = Some(pathPresence(v)))
          case other => other
        }))

    // rename ALL seed-visible columns in rhs to fresh names before joining
    val renameMap = seedCols.map(c => c -> fresh("opt")).toMap
    val rhsDf = renameMap.foldLeft(rhs2.df) { case (df, (from, to)) =>
      df.withColumnRenamed(from, to) }

    // join back NULL-SAFELY on the shared bindings' id/value columns: a
    // shared var can be null (bound by an earlier non-matching OPTIONAL
    // MATCH), and the rhs evaluated its pattern + WHERE under exactly
    // that null seed row — e.g. `OPTIONAL MATCH (n) WHERE r.uid IS NULL`
    // with null r must multiply by every matching n (differential case
    // 443). A null entity still never matches a PATTERN (expansion joins
    // on id equality inside the rhs); only the seed pairing is null-safe.
    val joinCond = seedPairCond(lhsDf, sharedBindings.flatMap { case (_, b) =>
      bindingIdCols(b).map(idc => idc -> renameMap(idc)) })

    val joined = lhsDf.join(rhsDf, joinCond, "left_outer")
      .drop(renameMap.values.toSeq.map(c => c): _*)

    // header: lhs bindings + rhs-new bindings (shared vars stay lhs-bound)
    val newBindings = rhs2.header.bindings.filterNot { case (v, _) =>
      state.header.contains(v) }
    PState(joined, Header(state.header.bindings ++ newBindings))
  }

  private def collectPatternVars(p: Pattern): Seq[String] =
    p.parts.flatMap { part =>
      (part.start.variable.toSeq ++
        part.chain.flatMap { case (r, n) => r.variable.toSeq ++ n.variable.toSeq })
    }.distinct

  /** Every `Var` name mentioned anywhere inside an AST fragment (generic
    * product walk). Over-approximates — locally-bound comprehension vars
    * are included — which is safe for correlation detection: it can only
    * widen a subquery seed, never miss a correlated outer variable. */
  private def freeExprVars(e: Any): Set[String] = e match {
    case Var(n) => Set(n)
    // pattern elements inside an embedded PatternPredicate /
    // PatternComprehension name their variables as plain strings, not
    // Var nodes — without these cases a correlation that exists ONLY
    // through the pattern (`OPTIONAL MATCH (n1) WHERE EXISTS {
    // (n0)<-[]-(n1) }`) is invisible, and the clause wrongly plans as
    // uncorrelated / a global existence test (differential cases
    // 6277/6326/7536)
    case np: NodePattern =>
      np.variable.toSet ++ np.productIterator.flatMap(freeExprVars)
    case rp: RelPattern =>
      rp.variable.toSet ++ rp.productIterator.flatMap(freeExprVars)
    // map projection names its subject as a plain string too — without
    // this a correlation reaching the outer scope ONLY through
    // `n {.k, ...}` is invisible and the optional plans uncorrelated
    // (differential hunts 32530/32463/32408, same class as 6277)
    case mp: MapProjection =>
      Set(mp.variable) ++ mp.productIterator.flatMap(freeExprVars)
    case s: Seq[_] => s.iterator.flatMap(freeExprVars).toSet
    case o: Option[_] => o.iterator.flatMap(freeExprVars).toSet
    case m: Map[_, _] => m.valuesIterator.flatMap(freeExprVars).toSet
    case p: Product => p.productIterator.flatMap(freeExprVars).toSet
    case _ => Set.empty
  }

  /** Inline `{k: expr}` property-map expressions of a pattern (where
    * outer-scope value vars may appear, e.g. `({key: outer})`). */
  private def patternPropExprs(parts: Seq[PatternPart]): Seq[Expr] =
    parts.flatMap { part =>
      part.start.properties.map(_._2) ++ part.chain.flatMap { case (r, n) =>
        r.properties.map(_._2) ++ n.properties.map(_._2) }
    }

  /** Correlation set for a subquery (optional match / pattern predicate):
    * bound pattern vars PLUS outer value vars referenced from the WHERE or
    * inline property maps — openCypher lets those predicates read the
    * enclosing scope (e.g. `WITH 5 AS x OPTIONAL MATCH (b) WHERE b.y = x`,
    * or a driving-table column). Pattern vars come first so entity-shaped
    * bindings seed before plain values. */
  private def correlatedVars(state: PState, parts: Seq[PatternPart],
      where: Seq[Expr]): Seq[String] = {
    val patVars = parts.flatMap(p => collectPatternVars(Pattern(Seq(p)))).distinct
    val exprVars = (where ++ patternPropExprs(parts)).flatMap(freeExprVars)
    (patVars ++ exprVars.filterNot(patVars.contains)).distinct
      .filter(state.header.contains)
  }

  /** Moves inline property equalities that reference outer-scope variables
    * out of the pattern into WHERE conjuncts (`(q {city: town})` →
    * `(q) WHERE q.city = town`, anonymous elements get internal names), so
    * a value-only-correlated subquery pattern can be planned once from the
    * unit state and equi-joined to its seed — the correlated equality then
    * sits ABOVE the pattern plan where Catalyst folds cross+filter into a
    * hash join, instead of a seed×scan product below it. Var-length
    * relationships keep their maps (per-step semantics; callers fall back
    * to seed-first planning for those). */
  private def desugarOuterProps(state: PState, pattern: Pattern,
      where: Option[Expr]): (Pattern, Option[Expr]) = {
    val conj = scala.collection.mutable.Buffer.empty[Expr]
    def outer(e: Expr) = freeExprVars(e).exists(state.header.contains)
    def doNode(np: NodePattern): NodePattern = {
      val (mv, keep) = np.properties.partition(p => outer(p._2))
      if (mv.isEmpty) np
      else {
        val v = np.variable.getOrElse(fresh("@corr"))
        mv.foreach { case (k, e) => conj += Eq(Property(Var(v), k), e) }
        np.copy(variable = Some(v), properties = keep)
      }
    }
    def doRel(rp: RelPattern): RelPattern =
      if (rp.varLength.isDefined) rp
      else {
        val (mv, keep) = rp.properties.partition(p => outer(p._2))
        if (mv.isEmpty) rp
        else {
          val v = rp.variable.getOrElse(fresh("@corr"))
          mv.foreach { case (k, e) => conj += Eq(Property(Var(v), k), e) }
          rp.copy(variable = Some(v), properties = keep)
        }
      }
    val parts2 = pattern.parts.map(p => p.copy(
      start = doNode(p.start),
      chain = p.chain.map { case (r, n) => (doRel(r), doNode(n)) }))
    val w2 = (where.toSeq ++ conj).reduceOption(And.apply)
    (Pattern(parts2), w2)
  }

  /** Plans a value-only-correlated subquery: the pattern plans once from
    * the unit state WITH its outer-free WHERE conjuncts (so rel-list
    * quantifier pushdown and pattern predicates engage below the seed
    * join), the distinct seed values cross in above it (Catalyst folds
    * the correlated equalities into hash joins), and only the conjuncts
    * that read the outer scope evaluate after the seed is in scope. */
  /** Null-safe seed-pairing condition over (lhsCol, renamedRhsCol) pairs.
    * VOID (NullType) columns pair VACUOUSLY — they are null on every row
    * of both sides, and Spark 4.1.2's join execution silently matches
    * NOTHING on a `void <=> void` key even though the expression alone
    * evaluates true (differential hunt 92400: an `UNWIND [null, null]`
    * correlation var made every correlated OPTIONAL MATCH row miss). */
  private def seedPairCond(lhs: DataFrame,
      pairs: Seq[(String, String)]): Column =
    pairs.map { case (a, b) =>
      if (lhs.schema(a).dataType == NullType) lit(true)
      else col(s"`$a`") <=> col(s"`$b`")
    }.reduce(_ && _)

  private def planValueCorrelated(graph: PropertyGraph, state: PState,
      seedDf: DataFrame, sharedBindings: Seq[(String, Binding)],
      pattern: Pattern, where: Option[Expr]): PState = {
    val (pat2, where2) = desugarOuterProps(state, pattern, where)
    val outerVars = state.header.vars.toSet
    val (outerPreds, local) = where2.map(splitAnds).getOrElse(Seq.empty)
      .partition(c => freeExprVars(c).intersect(outerVars).nonEmpty)
    val r0 = planMatch(graph, unitState,
      MatchClause(optional = false, pat2, local.reduceOption(And.apply)))
    val crossed = PState(r0.df.crossJoin(seedDf),
      Header(r0.header.bindings ++ ListMap(sharedBindings: _*)))
    outerPreds.reduceOption(And.apply)
      .map(w => applyWhere(graph, crossed, w)).getOrElse(crossed)
  }

  /** True when a var-length relationship's inline property map reads the
    * outer scope — the one correlated shape that must keep seed-first
    * planning (per-step props can't be desugared to a WHERE). */
  private def varLengthReadsOuter(state: PState, pattern: Pattern): Boolean =
    pattern.parts.exists(_.chain.exists { case (r, _) =>
      r.varLength.isDefined &&
        r.properties.exists(p => freeExprVars(p._2).exists(state.header.contains))
    })

  /** Which columns of shared variable `v` a subquery actually reads —
    * (needAll, property keys, labels). Seeding an exists/optional/
    * comprehension subplan with ONLY these (plus the id, which is always
    * kept) makes the seed's distinct shuffle id-width instead of
    * full-scan-width; at 100 TB that is the difference between shuffling
    * 8 bytes/row and the whole row. Conservative: any reference we can't
    * prove id-only (bare `v` in an unknown function, a shared rel var)
    * keeps every column. */
  private def referencedKeys(v: String, parts: Seq[PatternPart],
      exprs: Seq[Expr]): (Boolean, Set[String], Set[String]) = {
    var needAll = false
    val props = scala.collection.mutable.Set.empty[String]
    val labels = scala.collection.mutable.Set.empty[String]

    def walkPart(p: PatternPart): Unit = {
      def np(n: NodePattern): Unit = {
        if (n.variable.contains(v)) {
          labels ++= n.labels
          n.properties.foreach { case (k, _) => props += k }
        }
        n.properties.foreach { case (_, e) => walk(e) }
      }
      np(p.start)
      p.chain.foreach { case (r, n) =>
        if (r.variable.contains(v)) needAll = true // shared rel var: keep all
        r.properties.foreach { case (_, e) => walk(e) }
        np(n)
      }
    }
    def walk(e: Expr): Unit = e match {
      case Property(Var(`v`), k) => props += k
      case HasLabels(Var(`v`), ls) => labels ++= ls
      case Func("id", _, Seq(Var(`v`))) => ()
      case Var(`v`) => needAll = true
      // map projection references its variable by NAME, not as a child
      // Expr — without this case `v {.x}` would silently over-trim
      case MapProjection(v2, items) =>
        if (v2 == v) needAll = true
        items.foreach { case ExprItem(_, x) => walk(x); case _ => () }
      case PatternPredicate(p, _, w) => walkPart(p); w.foreach(walk)
      case PatternComprehension(p, w, proj) =>
        walkPart(p); w.foreach(walk); walk(proj)
      case other => mapChildren(other) { c => walk(c); c }
    }
    parts.foreach(walkPart); exprs.foreach(walk)
    (needAll, props.toSet, labels.toSet)
  }

  /** seed binding restricted to the columns the subquery references. */
  private def trimmedSeedBinding(v: String, b: Binding,
      parts: Seq[PatternPart], exprs: Seq[Expr]): Binding = {
    val (needAll, props, labels) = referencedKeys(v, parts, exprs)
    if (needAll) b
    else b match {
      case nb: NodeBinding => nb.copy(
        labelCols = nb.labelCols.view.filterKeys(labels).toMap,
        propCols = nb.propCols.view.filterKeys(props).toMap)
      case rb: RelBinding =>
        rb.copy(propCols = rb.propCols.view.filterKeys(props).toMap)
      case other => other
    }
  }

  /** WHERE: splits conjuncts; pattern predicates become semi/anti joins
    * (reference: ExistsSubQuery lowering, RelationalPlanner.scala:224-246),
    * the rest compile to a Column filter. */
  def applyWhere(graph: PropertyGraph, state: PState, pred: Expr): PState = {
    val conjuncts = splitAnds(pred)
    var st = state
    conjuncts.foreach {
      case PatternPredicate(part, neg, where) =>
        st = planPatternPredicate(graph, st, part, anti = neg, where = where)
      case Not(PatternPredicate(part, neg, where)) =>
        st = planPatternPredicate(graph, st, part, anti = !neg, where = where)
      case other =>
        val (st2, rewritten) = rewriteComprehensions(graph, st, Seq(other))
        val comp = compiler(st2)
        val c = comp.compile(rewritten.head)
        // a predicate whose static type is VOID (e.g. a property no
        // element carries) drops every row per ternary logic; Spark
        // rejects a VOID filter outright, so cast it to boolean
        val cb =
          if (comp.typeOf(rewritten.head) == NullType) c.cast(BooleanType)
          else c
        st = st2.copy(df = st2.df.where(cb))
    }
    st
  }

  private def splitAnds(e: Expr): Seq[Expr] = e match {
    case And(l, r) => splitAnds(l) ++ splitAnds(r)
    case other => Seq(other)
  }

  private def planPatternPredicate(graph: PropertyGraph, state: PState,
      part: PatternPart, anti: Boolean,
      where: Option[Expr] = None): PState = {
    val shared = correlatedVars(state, Seq(part), where.toSeq)
    // no bound variable: a GLOBAL existence test, identical for every row —
    // plan the pattern once from unit state, reduce to 0/1 rows, and
    // broadcast-semi/anti join on true (no per-row work, no correlation)
    if (shared.isEmpty) {
      val sub = planMatch(graph, unitState,
        MatchClause(optional = false, Pattern(Seq(part)), where))
      val probeCol = fresh("exg")
      val nonEmpty = broadcast(sub.df.limit(1).select(lit(1).as(probeCol)))
      return state.copy(df = state.df.join(nonEmpty, lit(true),
        if (anti) "left_anti" else "left_semi"))
    }

    // the driving table is read twice (seed + semi/anti join): cache once;
    // seed bindings trim to the columns the subquery references
    val lhsDf = cacheShared(state.df)
    val sharedBindings = shared.map(v => v ->
      trimmedSeedBinding(v, state.header(v), Seq(part), where.toSeq))
    val seedCols = sharedBindings.flatMap(_._2.columns).distinct
    val seedDf = lhsDf.select(seedCols.map(c => col(s"`$c`")): _*).distinct()
    val entityShared =
      collectPatternVars(Pattern(Seq(part))).filter(state.header.contains)
    val rhs =
      if (entityShared.nonEmpty ||
          varLengthReadsOuter(state, Pattern(Seq(part)))) {
        val seed = PState(seedDf, Header(ListMap(sharedBindings: _*)))
        planMatch(graph, seed,
          MatchClause(optional = false, Pattern(Seq(part)), where))
      } else {
        // value-only correlation: pattern planned once, seed equi-joined
        // above it (see planOptionalMatch)
        planValueCorrelated(graph, state, seedDf, sharedBindings,
          Pattern(Seq(part)), where)
      }

    val renameMap = seedCols.map(c => c -> fresh("ex")).toMap
    val rhsDf = renameMap.foldLeft(rhs.df) { case (df, (from, to)) =>
      df.withColumnRenamed(from, to) }
      .select(renameMap.values.toSeq.map(c => col(s"`$c`")): _*)
      .distinct()

    // null-safe: a shared var can be null (earlier non-matching OPTIONAL
    // MATCH) and the subquery evaluated under exactly that null seed —
    // `EXISTS { (n) WHERE r.uid IS NULL }` with null r is true (same
    // reasoning as planOptionalMatch's join-back)
    val joinCond = seedPairCond(state.df,
      sharedBindings.flatMap { case (_, b) =>
        bindingIdCols(b).map(idc => idc -> renameMap(idc)) })

    val joined = state.df.join(rhsDf, joinCond,
      if (anti) "left_anti" else "left_semi")
    state.copy(df = joined)
  }

  // ============================================== pattern comprehensions
  /** Rewrites every [[PatternComprehension]] (and `size(pattern)`) in
    * `exprs` into a planned sub-match: seed from the distinct shared
    * bindings, match the pattern, collect the projection per seed id,
    * left-join the list column back (missing → empty list). The reference
    * reaches the same shape through its exists-subquery machinery
    * (extractSubqueryFromPatternExpression + RelationalPlanner:224). */
  /** rewrite comprehensions inside CONSTRUCT's NEW property maps and SET
    * values (same seeded-subquery lowering as projection items). */
  private def rewriteConstructComprehensions(graph: PropertyGraph,
      state0: PState, c: ConstructClause): (PState, ConstructClause) = {
    var st = state0
    def rw(e: Expr): Expr = {
      val (s2, out) = rewriteComprehensions(graph, st, Seq(e))
      st = s2; out.head
    }
    def rwProps(ps: Seq[(String, Expr)]) = ps.map { case (k, e) => k -> rw(e) }
    def rwNode(np: NodePattern) = np.copy(properties = rwProps(np.properties))
    val news = c.news.map(p => p.copy(
      start = rwNode(p.start),
      chain = p.chain.map { case (r, n) =>
        r.copy(properties = rwProps(r.properties)) -> rwNode(n) }))
    val sets = c.sets.map { case (v, k, e) => (v, k, rw(e)) }
    (st, c.copy(news = news, sets = sets))
  }

  private def rewriteComprehensions(graph: PropertyGraph, state0: PState,
      exprs: Seq[Expr]): (PState, Seq[Expr]) = {
    var st = state0
    def walk(x: Expr): Expr = x match {
      case pc: PatternComprehension =>
        val (st2, v) = planPatternComprehension(graph, st, pc)
        st = st2
        Var(v)
      // size((n)-[:T]->()) — degree counting via a bare pattern argument
      case Func("size", d, Seq(PatternPredicate(part, false, w))) =>
        walk(Func("size", d, Seq(PatternComprehension(part, w, IntLit(1)))))
      // pattern predicate used as a VALUE (RETURN exists(...), CASE, …) —
      // WHERE-position predicates are intercepted by applyWhere first and
      // keep their semi/anti-join plan; only nested uses reach here
      case PatternPredicate(part, neg, w) =>
        val sz = walk(Func("size", distinct = false,
          Seq(PatternComprehension(part, w, IntLit(1)))))
        if (neg) Lte(sz, IntLit(0)) else Gt(sz, IntLit(0))
      case other => mapChildren(other)(walk)
    }
    val out = exprs.map(walk)
    (st, out)
  }

  private def mapChildren(e: Expr)(f: Expr => Expr): Expr = e match {
    case Not(x) => Not(f(x))
    case And(l, r) => And(f(l), f(r))
    case Or(l, r) => Or(f(l), f(r))
    case Xor(l, r) => Xor(f(l), f(r))
    case Eq(l, r) => Eq(f(l), f(r))
    case Neq(l, r) => Neq(f(l), f(r))
    case Lt(l, r) => Lt(f(l), f(r))
    case Lte(l, r) => Lte(f(l), f(r))
    case Gt(l, r) => Gt(f(l), f(r))
    case Gte(l, r) => Gte(f(l), f(r))
    case IsNull(x) => IsNull(f(x))
    case IsNotNull(x) => IsNotNull(f(x))
    case In(l, r) => In(f(l), f(r))
    case StartsWith(l, r) => StartsWith(f(l), f(r))
    case EndsWith(l, r) => EndsWith(f(l), f(r))
    case Contains(l, r) => Contains(f(l), f(r))
    case RegexMatch(l, r) => RegexMatch(f(l), f(r))
    case Add(l, r) => Add(f(l), f(r))
    case Sub(l, r) => Sub(f(l), f(r))
    case Mul(l, r) => Mul(f(l), f(r))
    case Div(l, r) => Div(f(l), f(r))
    case Mod(l, r) => Mod(f(l), f(r))
    case Pow(l, r) => Pow(f(l), f(r))
    case Neg(x) => Neg(f(x))
    case Func(n, d, args) => Func(n, d, args.map(f))
    case ListLit(items) => ListLit(items.map(f))
    case MapLit(items) => MapLit(items.map { case (k, v) => (k, f(v)) })
    case Property(b, k) => Property(f(b), k)
    case HasLabels(b, ls) => HasLabels(f(b), ls)
    case Index(b, i) => Index(f(b), f(i))
    case Slice(b, from, to) => Slice(f(b), from.map(f), to.map(f))
    case CaseExpr(op, alts, d) =>
      CaseExpr(op.map(f), alts.map { case (w, t) => (f(w), f(t)) }, d.map(f))
    case ListComprehension(v, l, p, pr) =>
      ListComprehension(v, f(l), p.map(f), pr.map(f))
    case Reduce(a, i, v, l, s) => Reduce(a, f(i), v, f(l), f(s))
    case Quantified(q, v, l, p) => Quantified(q, v, f(l), f(p))
    case MapProjection(v, items) => MapProjection(v, items.map {
      case ExprItem(k, x) => ExprItem(k, f(x))
      case other => other
    })
    case leaf => leaf
  }

  /** every physical column that constitutes a binding's identity — a path
    * has several (its node ids and per-segment rel id / id-list columns),
    * everything else has one
    */
  private def bindingIdCols(b: Binding): Seq[String] = b match {
    case nb: NodeBinding => Seq(nb.idCol)
    case rb: RelBinding => Seq(rb.idCol)
    case ValueBinding(c) => Seq(c)
    case rl: RelListBinding => Seq(rl.col)
    case pb: PathBinding =>
      pb.nodeIdCols ++ pb.segs.map {
        case SingleSeg(r) => r
        case VarSeg(l, _) => l
      } ++ pb.presenceCol // identity includes the optional-miss marker
  }

  private def planPatternComprehension(graph: PropertyGraph, state: PState,
      pc: PatternComprehension): (PState, String) = {
    val shared = correlatedVars(state, Seq(pc.pattern),
      pc.where.toSeq :+ pc.projection)
    // no bound variable (`RETURN [(:A)-->(b) | b.x]`, global exists(...)):
    // the list is the same for every outer row — plan the pattern once,
    // aggregate to a single row (empty input → empty list), broadcast
    // cross-join it onto the outer state
    if (shared.isEmpty) {
      val sub = planMatch(graph, unitState,
        MatchClause(optional = false, Pattern(Seq(pc.pattern)), pc.where))
      val itemCol = fresh("pc_item")
      val rhsDf = sub.df.withColumn(itemCol,
        compiler(sub).compile(pc.projection))
      val outCol = fresh("pc_list")
      val agged = rhsDf.agg(collect_list(col(s"`$itemCol`")).as(outCol))
      val joined = state.df.crossJoin(broadcast(agged))
      val v = fresh("@pc")
      return (PState(joined, state.header + (v -> ValueBinding(outCol))), v)
    }
    val sharedBindings = shared.map(v => v -> state.header(v))
    val seedCols = sharedBindings.flatMap(_._2.columns).distinct
    val seedDf = state.df.select(seedCols.map(c => col(s"`$c`")): _*).distinct()
    val entityShared =
      collectPatternVars(Pattern(Seq(pc.pattern))).filter(state.header.contains)
    val rhs =
      if (entityShared.nonEmpty ||
          varLengthReadsOuter(state, Pattern(Seq(pc.pattern)))) {
        val seed = PState(seedDf, Header(ListMap(sharedBindings: _*)))
        planMatch(graph, seed,
          MatchClause(optional = false, Pattern(Seq(pc.pattern)), pc.where))
      } else {
        // value-only correlation: pattern planned once, seed equi-joined
        // above it (see planOptionalMatch)
        planValueCorrelated(graph, state, seedDf, sharedBindings,
          Pattern(Seq(pc.pattern)), pc.where)
      }

    val itemCol = fresh("pc_item")
    val rhsDf = rhs.df.withColumn(itemCol, compiler(rhs).compile(pc.projection))
    val keyCols = sharedBindings.flatMap(x => bindingIdCols(x._2)).distinct
    val outCol = fresh("pc_list")
    val agged = rhsDf.groupBy(keyCols.map(c => col(s"`$c`")): _*)
      .agg(collect_list(col(s"`$itemCol`")).as(outCol))
    val listType = agged.schema(outCol).dataType

    val renames = keyCols.map(c => c -> fresh("pck")).toMap
    val aggRenamed = renames.foldLeft(agged) { case (d, (from, to)) =>
      d.withColumnRenamed(from, to) }
    // null-safe for the same reason as planOptionalMatch's join-back: a
    // shared var may be null from an earlier OPTIONAL MATCH, and the
    // comprehension evaluated under that null seed row
    val cond = seedPairCond(state.df, keyCols.map(c => c -> renames(c)))
    val joined = state.df.join(aggRenamed, cond, "left_outer")
      .drop(renames.values.toSeq: _*)
      .withColumn(outCol, coalesce(col(s"`$outCol`"), array().cast(listType)))

    val v = fresh("@pc")
    (PState(joined, state.header + (v -> ValueBinding(outCol))), v)
  }

  // =========================================================== projection
  private def planUnwind(graph: PropertyGraph, state0: PState, e0: Expr,
      v: String): PState = {
    val (state, rewritten) = rewriteComprehensions(graph, state0, Seq(e0))
    val comp = compiler(state)
    val newCol = fresh(s"${v}_val")
    // UNWIND null produces no rows (openCypher), not a type error.
    // typeOf's NullType is ALSO its analysis-error fallback, so first
    // force analysis of the operand: a malformed list (e.g. a nested
    // heterogeneous list Spark can't type) must surface its error here,
    // not silently plan as zero rows.
    if (comp.typeOf(rewritten.head) == NullType) {
      state.df.select(comp.compileList(rewritten.head)).schema
      val df = state.df.where(lit(false)).withColumn(newCol, lit(null))
      return PState(df, state.header + (v -> ValueBinding(newCol)))
    }
    // list-position compile: UNWIND nodes(p) explodes node VALUES
    val c = comp.compileList(rewritten.head)
    val df = state.df.select(
      state.header.columns.map(cn => col(s"`$cn`")) :+ explode(c).as(newCol): _*)
    PState(df, state.header + (v -> ValueBinding(newCol)))
  }

  /** SKIP/LIMIT take any statically evaluable integer expression
    * (openCypher allows e.g. `LIMIT 1 + toInteger($p)`): fold literals,
    * parameters, and integer arithmetic over them at plan time. */
  private def evalStaticInt(e: Expr): Long = e match {
    case IntLit(v) => v
    case Param(n) => params(n) match {
      case i: Int => i.toLong
      case l: Long => l
      case other => throw new IllegalArgumentException(
        s"SKIP/LIMIT parameter must be integer, got $other")
    }
    case Add(l, r) => evalStaticInt(l) + evalStaticInt(r)
    case Sub(l, r) => evalStaticInt(l) - evalStaticInt(r)
    case Mul(l, r) => evalStaticInt(l) * evalStaticInt(r)
    case Div(l, r) => evalStaticInt(l) / evalStaticInt(r)
    case Mod(l, r) => evalStaticInt(l) % evalStaticInt(r)
    case Neg(x) => -evalStaticInt(x)
    // variable-free numeric functions (TCK SkipLimitAcceptance — on the
    // reference's failing_blacklist; supported here): LIMIT
    // toInteger(ceil(1.7)) etc.
    // toInteger over a literal numeric string (Neo4j semantics)
    case Func("tointeger", _, Seq(StringLit(s))) =>
      try s.trim.toDouble.toLong catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"SKIP/LIMIT toInteger('$s'): not a numeric string") }
    case Func("tointeger", _, Seq(a)) => evalStaticNum(a).toLong
    case Func("ceil", _, Seq(a)) => math.ceil(evalStaticNum(a)).toLong
    case Func("floor", _, Seq(a)) => math.floor(evalStaticNum(a)).toLong
    case Func("round", _, Seq(a)) => math.round(evalStaticNum(a))
    case Func("abs", _, Seq(a)) => math.abs(evalStaticNum(a)).toLong
    case other => throw new IllegalArgumentException(
      s"SKIP/LIMIT must be a static integer expression, got $other")
  }

  private def evalStaticNum(e: Expr): Double = e match {
    case FloatLit(v) => v
    case IntLit(v) => v.toDouble
    case Neg(x) => -evalStaticNum(x)
    case Param(n) => params(n) match {
      case i: Int => i.toDouble
      case l: Long => l.toDouble
      case d: Double => d
      case other => throw new IllegalArgumentException(
        s"SKIP/LIMIT parameter must be numeric, got $other")
    }
    case Add(l, r) => evalStaticNum(l) + evalStaticNum(r)
    case Sub(l, r) => evalStaticNum(l) - evalStaticNum(r)
    case Mul(l, r) => evalStaticNum(l) * evalStaticNum(r)
    case Div(l, r) => evalStaticNum(l) / evalStaticNum(r)
    case Func("ceil", _, Seq(a)) => math.ceil(evalStaticNum(a))
    case Func("floor", _, Seq(a)) => math.floor(evalStaticNum(a))
    case Func("abs", _, Seq(a)) => math.abs(evalStaticNum(a))
    case Func("tointeger", _, Seq(a)) => evalStaticNum(a).toLong.toDouble
    case other => evalStaticInt(other).toDouble
  }

  private case class OutItem(name: String, expr: Expr, binding: Binding)

  def planProjection(graph: PropertyGraph, state0: PState,
      items0: Seq[ReturnItem], star: Boolean,
      distinct: Boolean, orderBy: Seq[SortItem], skip: Option[Expr],
      limit: Option[Expr], isReturn: Boolean): PState = {
    val starItems =
      if (!star) Seq.empty
      else state0.header.vars.filterNot(isInternal).map(v =>
        ReturnItem(Var(v), None, v))
    val preItems = starItems ++ items0
    require(preItems.nonEmpty, "empty projection")
    // Neo4j: expressions in WITH must be aliased (bare variables exempt)
    if (!isReturn) items0.foreach { i =>
      if (i.alias.isEmpty && !i.expr.isInstanceOf[Var])
        throw new IllegalArgumentException(
          s"expression in WITH must be aliased (use AS): ${i.text}")
    }

    // pattern comprehensions (in items AND sort keys) join their list
    // columns into the state first
    val (state, rewrittenAll) = rewriteComprehensions(graph, state0,
      preItems.map(_.expr) ++ orderBy.map(_.expr))
    val (rewritten, sortRewritten) = rewrittenAll.splitAt(preItems.size)
    val items = preItems.zip(rewritten).map { case (i, e) => i.copy(expr = e) }
    val orderBy2 = orderBy.zip(sortRewritten).map { case (s, e) =>
      s.copy(expr = e) }

    val comp = compiler(state)
    // a sort-key aggregate is legal only when the projection itself
    // aggregates (`RETURN k, count(*) ORDER BY sum(x)` — the hidden sort
    // aggregate is added in planAggregation); over a NON-aggregating
    // projection it would silently change the query's cardinality, so
    // Neo4j (and the reference, which links Neo4j's front end) reject it
    // (probe batch 50)
    val hasAgg = items.exists(i => comp.containsAggregate(i.expr))
    if (!hasAgg && orderBy2.exists(si => comp.containsAggregate(si.expr)))
      throw new IllegalArgumentException(
        "Cannot use aggregation in ORDER BY if there are no aggregate " +
          "expressions in the preceding RETURN/WITH")

    if (hasAgg) planAggregation(state, items, distinct, orderBy2, skip, limit)
    else planSimpleProjection(state, items, distinct, orderBy2, skip, limit)
  }

  private def outName(i: ReturnItem): String = i.alias.getOrElse(i.text)

  private def planSimpleProjection(state: PState, items: Seq[ReturnItem],
      distinct: Boolean, orderBy: Seq[SortItem], skip: Option[Expr],
      limit: Option[Expr]): PState = {
    val comp = compiler(state)
    requireDistinctAliases(items)

    // each item → binding in the NEW header (entity bindings pass through)
    var df = state.df
    val newBindings: Seq[(String, Binding)] = items.map { i =>
      i.expr match {
        case Var(v) if state.header.contains(v) =>
          outName(i) -> state.header(v)
        case e =>
          val c = fresh(s"proj_${outName(i).take(20).replaceAll("[^A-Za-z0-9_]", "_")}")
          df = df.withColumn(c, comp.compile(e))
          outName(i) -> ValueBinding(c)
      }
    }
    val newHeader = Header(ListMap(newBindings: _*))

    if (distinct) {
      // DISTINCT on projected values, then order/skip/limit over new header.
      // Mixed-family (tagged) columns dedupe by openCypher EQUIVALENCE —
      // 1 and 1.0 are one value (lowest-tag representative kept); zoned
      // TIMEs dedupe by instant (offset is presentation, not identity).
      df = df.select(newHeader.columns.map(c => col(s"`$c`")): _*)
      df = Planner.equivDistinct(df, newHeader.columns, comp)
      val ordered = applyOrder(df, newHeader, orderBy, state)
      val sliced = applySkipLimit(ordered, skip, limit)
      PState(sliced, newHeader)
    } else {
      // order may reference pre-projection vars too: combined header
      val combined = Header(state.header.bindings ++ newHeader.bindings)
      val ordered = applyOrder(df, combined, orderBy, state)
      val sliced = applySkipLimit(ordered, skip, limit)
      PState(sliced.select(newHeader.columns.map(c => col(s"`$c`")): _*), newHeader)
    }
  }

  private def planAggregation(state: PState, items: Seq[ReturnItem],
      distinct: Boolean, orderBy: Seq[SortItem], skip: Option[Expr],
      limit: Option[Expr]): PState = {
    val comp = compiler(state)
    requireDistinctAliases(items)
    val (aggItems, keyItems) = items.partition(i => comp.containsAggregate(i.expr))

    var df = state.df
    // group keys: entity vars keep all their columns (reference groups by
    // every owned column, SparkTable.scala:134-159); other exprs materialize
    val keyBindings: Seq[(String, Binding)] = keyItems.map { i =>
      i.expr match {
        case Var(v) if state.header.contains(v) => outName(i) -> state.header(v)
        case e =>
          val c = fresh(s"key_${outName(i).take(20).replaceAll("[^A-Za-z0-9_]", "_")}")
          df = df.withColumn(c, comp.compile(e))
          outName(i) -> ValueBinding(c)
      }
    }
    val groupCols = keyBindings.flatMap(_._2.columns).distinct

    // IMPLICIT grouping keys (Neo4j: `RETURN n.v + count(*)` groups by
    // n.v): the maximal non-aggregate subtrees of aggregating items that
    // reference row variables group the aggregation — compiled as
    // grouping EXPRESSIONS so the item's shell (compiled identically)
    // resolves against them by semantic equality.
    def referencesRowVars(e: Expr): Boolean = e match {
      case Var(n) => state.header.contains(n)
      case _ =>
        var found = false
        mapChildren(e) { c => if (referencesRowVars(c)) found = true; c }
        found
    }
    def nonAggSubtrees(e: Expr): Seq[Expr] =
      if (comp.isAggregate(e)) Seq.empty
      else if (!comp.containsAggregate(e))
        if (referencesRowVars(e)) Seq(e) else Seq.empty
      else {
        val out = scala.collection.mutable.ArrayBuffer.empty[Expr]
        mapChildren(e) { c => out ++= nonAggSubtrees(c); c }
        out.toSeq
      }
    val implicitKeys: Seq[Column] =
      aggItems.flatMap(i => nonAggSubtrees(i.expr)).distinct
        .map(e => comp.compile(e))

    val aggCols: Seq[(String, Column)] = aggItems.map { i =>
      val c = fresh(s"agg_${outName(i).take(20).replaceAll("[^A-Za-z0-9_]", "_")}")
      c -> comp.compileAggregate(i.expr).as(c)
    }
    val aggBindings: Seq[(String, Binding)] = aggItems.zip(aggCols).map {
      case (i, (c, _)) => outName(i) -> ValueBinding(c) }

    // ORDER BY over an (un-aliased) aggregate or key expression: rewrite the
    // sort expression to the projected item's output column when it matches
    // structurally (`ORDER BY count(*)` after `RETURN n, count(*)`); an
    // aggregate that is NOT projected gets a hidden agg column, sorted on
    // and dropped after the slice (openCypher allows both shapes).
    val hiddenAggs = scala.collection.mutable.ArrayBuffer.empty[(String, Column)]
    val orderBy2 = orderBy.map { si =>
      items.find(i => i.expr == si.expr || i.alias.contains(si.expr match {
        case Var(n) => n; case _ => ""
      })) match {
        case Some(i) => si.copy(expr = Var(outName(i)))
        case None if comp.containsAggregate(si.expr) =>
          val c = fresh("sortagg")
          hiddenAggs += c -> comp.compileAggregate(si.expr).as(c)
          si.copy(expr = Var(c))
        case None => si
      }
    }

    val allAggCols = aggCols ++ hiddenAggs
    // mixed-family (tagged) group keys group by openCypher EQUIVALENCE
    // (1 and 1.0 are one group, lowest-tag representative kept); zoned
    // TIME keys group by instant (smallest-offset representative)
    val equivKeys = groupCols.flatMap { c =>
      Planner.equivKeyRepr(comp, df.schema(c).dataType, col(s"`$c`"))
        .map(c -> _)
    }.toMap
    val agged =
      if (groupCols.isEmpty && implicitKeys.isEmpty)
        df.agg(allAggCols.head._2, allAggCols.tail.map(_._2): _*)
      else if (equivKeys.isEmpty) {
        val out0 = df
          .groupBy(groupCols.map(c => col(s"`$c`")) ++ implicitKeys: _*)
          .agg(allAggCols.head._2, allAggCols.tail.map(_._2): _*)
        // implicit grouping expressions are not output columns
        if (implicitKeys.isEmpty) out0
        else out0.select((groupCols ++ allAggCols.map(_._1))
          .map(c => col(s"`$c`")): _*)
      }
      else {
        val keyCols = groupCols.map { c =>
          equivKeys.get(c).map(_._1).getOrElse(col(s"`$c`"))
        } ++ implicitKeys
        // representatives get FRESH output names: aliasing min_by back to
        // the source column's own name makes any sibling aggregate that
        // reads that column resolve it as a LATERAL alias — Spark rejects
        // with LATERAL_COLUMN_ALIAS_IN_AGGREGATE_FUNC (hunt 110538: a
        // zoned-datetime group key + an aggregate whose argument reads it)
        val reprNames = groupCols.filter(equivKeys.contains)
          .map(c => c -> fresh("repr")).toMap
        val reprs = groupCols.filter(equivKeys.contains).map(c =>
          min_by(col(s"`$c`"), equivKeys(c)._2).as(reprNames(c)))
        val allAgg = reprs ++ allAggCols.map(_._2)
        df.groupBy(keyCols: _*)
          .agg(allAgg.head, allAgg.tail: _*)
          .select((groupCols.map(c => reprNames.get(c)
            .map(r => col(s"`$r`").as(c)).getOrElse(col(s"`$c`"))) ++
            allAggCols.map { case (c, _) => col(s"`$c`") }): _*)
      }

    // restore item order in the header
    val ordered = items.map { i =>
      val name = outName(i)
      (keyBindings ++ aggBindings).find(_._1 == name).get
    }
    val newHeader = Header(ListMap(ordered: _*))
    val orderHeader = Header(newHeader.bindings ++
      hiddenAggs.map { case (c, _) => c -> ValueBinding(c) })
    var out = agged
    if (distinct) out = out.dropDuplicates(newHeader.columns)
    val sorted = applyOrder(out, orderHeader, orderBy2, PState(out, orderHeader))
    val sliced = applySkipLimit(sorted, skip, limit)
    val finalDf =
      if (hiddenAggs.isEmpty) sliced
      else sliced.select(newHeader.columns.map(c => col(s"`$c`")): _*)
    PState(finalDf, newHeader)
  }

  /** Neo4j rejects duplicate output column names (ColumnNameConflict);
    * silently letting the last one win would drop data. */
  private def requireDistinctAliases(items: Seq[ReturnItem]): Unit = {
    val names = items.map(outName)
    names.diff(names.distinct).distinct.headOption.foreach(n =>
      throw new IllegalArgumentException(
        s"multiple result columns with the same name `$n` are not supported"))
  }

  private def applyOrder(df: DataFrame, header: Header,
      orderBy: Seq[SortItem], typeState: PState): DataFrame = {
    if (orderBy.isEmpty) return df
    val comp = new ExprCompiler(header, params, () => df)
    val cols = orderBy.map { si =>
      val c0 = comp.compile(si.expr)
      // mixed-family (tagged) values sort by the CIP global sort order,
      // not the encoding struct's field order
      val c = comp.typeOf(si.expr) match {
        case st: StructType
            if st.fieldNames.sameElements(Array("@k", "i", "f", "s", "b")) =>
          comp.mixedOrderKey(c0, nullsLargest = true)
        // lists: Spark sorts null ELEMENTS first, the CIP total order
        // puts null after every value — route through the wrapped key
        case at: ArrayType if comp.arrayNeedsOrderKey(at) =>
          comp.arrayOrderKey(c0, at)
        // durations are not orderable in Cypher (month lengths vary) —
        // a typed error, not Spark's raw INVALID_ORDERING_TYPE
        case CalendarIntervalType =>
          throw new IllegalArgumentException(
            "ORDER BY over durations: durations are not orderable " +
              "(month lengths vary)")
        case _ => c0
      }
      // openCypher: null is the LARGEST value — last under ASC, first
      // under DESC (Spark's desc default is nulls-last, which diverges)
      if (si.ascending) c.asc_nulls_last else c.desc_nulls_first
    }
    df.orderBy(cols: _*)
  }

  private def applySkipLimit(df: DataFrame, skip: Option[Expr],
      limit: Option[Expr]): DataFrame = {
    def nonNeg(kind: String, e: Expr): Int = {
      val v = evalStaticInt(e)
      if (v < 0) throw new IllegalArgumentException(
        s"$kind must be a non-negative integer, got $v")
      v.toInt
    }
    val skipped = skip.map(e => df.offset(nonNeg("SKIP", e))).getOrElse(df)
    limit.map(e => skipped.limit(nonNeg("LIMIT", e))).getOrElse(skipped)
  }

  /** RETURN: map bindings to user-facing columns. Entities render as a
    * struct of id + properties (records stay a plain DataFrame, SURVEY §1.1
    * item 4). */
  private def finalizeReturn(state: PState, r: ReturnClause): DataFrame = {
    val cols = state.header.bindings.toSeq.map { case (name, b) =>
      (b match {
        case ValueBinding(c) => col(s"`$c`")
        case nb: NodeBinding =>
          val props = nb.propCols.toSeq.sortBy(_._1).map { case (k, c) =>
            col(s"`$c`").as(k) }
          val lbls = nb.labelCols.toSeq.sortBy(_._1).map { case (l, c) =>
            when(col(s"`$c`"), lit(l)) }
          val labelArr =
            if (lbls.isEmpty) array().cast(ArrayType(StringType))
            else filter(array(lbls: _*), x => x.isNotNull)
          when(col(s"`${nb.idCol}`").isNotNull,
            struct((col(s"`${nb.idCol}`").as("@id") +: labelArr.as("@labels") +: props): _*))
        case rb: RelBinding =>
          val props = rb.propCols.toSeq.sortBy(_._1).map { case (k, c) =>
            col(s"`$c`").as(k) }
          when(col(s"`${rb.idCol}`").isNotNull,
            struct((col(s"`${rb.idCol}`").as("@id") +: col(s"`${rb.srcCol}`").as("@src") +:
              col(s"`${rb.dstCol}`").as("@dst") +: col(s"`${rb.typCol}`").as("@type") +:
              props): _*))
        case rl: RelListBinding => col(s"`${rl.col}`")
        case pb: PathBinding => ExprCompiler.pathStruct(pb)
      }).as(name)
    }
    state.df.select(cols: _*)
  }
}

object Planner {
  /** session-global CONSTRUCT fresh-id namespace counter (see
    * freshIdCol): consecutive/nested constructs mint ids from distinct
    * 2^56 sub-spaces so a construct over an already-constructed graph
    * never collides with inherited fresh ids */
  private[plans] val freshIdTag = new java.util.concurrent.atomic.AtomicInteger(0)

  /** (dedup key, representative-preference key) for columns whose
    * equivalence differs from their raw encoding: mixed-family tagged
    * structs (equivalence struct, lowest-tag representative) and zoned
    * TIME structs (instant key, smallest-offset representative). None →
    * the raw column IS its own key. */
  private[plans] def equivKeyRepr(comp: ExprCompiler, t: DataType,
      c: Column): Option[(Column, Column)] =
    if (comp.isMixedTagged(t)) Some((comp.mixedEquivKey(c), comp.mixedReprKey(c)))
    else if (comp.isZonedTime(t)) Some((comp.zonedInstantKey(c), comp.zonedReprKey(c)))
    else if (comp.isZonedDatetime(t))
      Some((comp.zonedDtInstantKey(c), comp.zonedDtReprKey(c)))
    else None

  /** DISTINCT over `names` (the frame's exact columns) by openCypher
    * equivalence: plain dropDuplicates unless some column needs an
    * equivalence key, in which case group by the keys and keep a
    * deterministic representative per group. */
  private[plans] def equivDistinct(df: DataFrame, names: Seq[String],
      comp: ExprCompiler): DataFrame = {
    val keyed = names.flatMap { c =>
      equivKeyRepr(comp, df.schema(c).dataType, col(s"`$c`"))
        .map(c -> _)
    }.toMap
    if (keyed.isEmpty) df.dropDuplicates()
    else {
      val keyCols = names.map(c =>
        keyed.get(c).map(_._1).getOrElse(col(s"`$c`")))
      val reprs = names.filter(keyed.contains).map(c =>
        min_by(col(s"`$c`"), keyed(c)._2).as(c))
      df.groupBy(keyCols: _*).agg(reprs.head, reprs.tail: _*)
        .select(names.map(c => col(s"`$c`")): _*)
    }
  }

  /** Spark conf key: when set to a directory (HDFS/S3-compatible URI),
    * the deep var-length frontier loop routes its per-depth lineage
    * truncation through a RELIABLE checkpoint instead of the default
    * `localCheckpoint`. Local checkpoints are executor-resident — fast,
    * but a lost executor kills a long traversal; on a 1000-executor
    * cluster running hours-long 100 TB traversals, set this. */
  val CheckpointDirKey = "graft.checkpoint.dir"

  // setCheckpointDir qualifies the path (scheme + authority), so compare
  // against the raw value we last applied rather than the resolved one
  @volatile private var appliedCkptDir: Option[String] = None

  /** Lineage-truncating per-depth materialization for the iterative
    * frontier loop: reliable `checkpoint(eager)` when
    * [[CheckpointDirKey]] is set, executor-resident `localCheckpoint`
    * otherwise. */
  private[plans] def checkpointFrontier(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(CheckpointDirKey).filter(_.nonEmpty) match {
      case Some(dir) =>
        if (!appliedCkptDir.contains(dir)) synchronized {
          if (!appliedCkptDir.contains(dir)) {
            spark.sparkContext.setCheckpointDir(dir)
            appliedCkptDir = Some(dir)
          }
        }
        df.checkpoint(eager = true)
      case None => df.localCheckpoint()
    }
  }
}
