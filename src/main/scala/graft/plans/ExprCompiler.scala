package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.cypher.Ast._

/** Cypher expression → Catalyst Column (analogue of the reference's
  * SparkSQLExprMapper.scala:90, re-derived over public functions._ only —
  * Spark's ternary boolean logic and null-propagating comparisons line up
  * with Cypher's, so no CaseWhen wrapping layer is needed for the ops used
  * here; see SURVEY §2.3).
  *
  * @param probe used to resolve expression types at plan time (driver-side
  *              schema-only analysis; never triggers a job).
  */
class ExprCompiler(header: Header, params: Map[String, Any],
    probe: () => DataFrame, lambdaEnv: Map[String, Column] = Map.empty,
    lambdaTypes: Map[String, DataType] = Map.empty,
    aggCtx: Boolean = false) {

  private def sub(env: Map[String, Column],
      types: Map[String, DataType] = Map.empty) =
    new ExprCompiler(header, params, probe, lambdaEnv ++ env,
      lambdaTypes ++ types, aggCtx)

  /** Schema-only probe twin: an EMPTY LocalRelation with the probe
    * frame's schema. Every type probe analyzes `select(expr)` —
    * against the live frame that analysis walks the WHOLE logical plan,
    * and after consecutive CONSTRUCTs + var-length unrolls (derived
    * union/window trees) a single 3-node differential case spent 80+
    * SECONDS of driver time in repeated O(plan-size) analyses (case 734,
    * round 9). Resolution only needs the OUTPUT attributes, which the
    * leaf twin carries — typing cost drops to O(schema + expr). Compiled
    * columns resolve by NAME, so the twin's fresh expression ids are
    * irrelevant; `Dataset.schema` is already computed on the live frame,
    * so building the twin triggers no extra analysis of it. */
  private lazy val probeSchemaOnly: DataFrame = {
    val df = probe()
    df.sparkSession.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      df.schema)
  }

  /** a comprehension/reduce/quantifier body cannot aggregate — the lambda
    * runs per element, not over a group (Neo4j rejects the shape) */
  private def noAggInLambda(e: Expr): Unit =
    if (containsAggregate(e)) throw new IllegalArgumentException(
      "Invalid use of aggregating function inside a list " +
        "comprehension / reduce / quantifier body")

  /** plan-time type resolution via schema-only analysis. Inside lambda
    * scopes (list comprehensions, reduce, quantifiers) the lambda variable
    * can't be probed against the input directly — probe with a null
    * literal cast to the element type recorded at lambda entry (NullType
    * when unknown, which routes operators to their default behavior). */
  def typeOf(e: Expr): DataType =
    try {
      val stand = lambdaEnv.keysIterator.map { n =>
        n -> lambdaTypes.get(n).map(t => lit(null).cast(t))
          .getOrElse(lit(null))
      }.toMap
      val tc =
        if (stand.isEmpty) this
        else new ExprCompiler(header, params, probe, stand, lambdaTypes,
          aggCtx)
      probeSchemaOnly.select(tc.compile(e)).schema.head.dataType
    } catch { case _: Exception => NullType }

  /** element type of a list-typed expression (NullType when unknown). */
  private def elemTypeOf(list: Expr): DataType = typeOf(list) match {
    case ArrayType(t, _) => t
    case _ => NullType
  }

  /** the materialized node-VALUE list column for `nodes(p)`, when the
    * planner enriched path `p` (demand analysis). */
  private def nodeValsOf(e: Expr): Option[String] = e match {
    case Func("nodes", _, Seq(arg)) => pathBindingOf(arg).flatMap(_.nodeValsCol)
    case _ => None
  }

  /** compile an expression in LIST position (lambda list arg, UNWIND
    * operand): `nodes(p)` iterated as a list yields node values when
    * materialized; everywhere else it stays the id list. */
  def compileList(e: Expr): Column =
    nodeValsOf(e).map(c => col(s"`$c`")).getOrElse(compile(e))

  private def listElemType(list: Expr): DataType = nodeValsOf(list) match {
    case Some(c) => typeOfCol(c) match {
      case ArrayType(t, _) => t
      case _ => NullType
    }
    case None => elemTypeOf(list)
  }

  /** sum over a NullType child (unknowable property on an empty scan):
    * Cypher's sum of no values is integer 0, so anchor the child at LONG —
    * otherwise Spark types the empty sum as double and 0.0 comes back. */
  private def sumChild(e: Expr): Column = {
    val c = compile(e)
    if (typeOf(e) == NullType) c.cast(LongType) else c
  }

  /** result type of an aggregate column (schema-only global-agg probe). */
  private def typeOfAgg(c: Column): DataType =
    try probeSchemaOnly.select(c).schema.head.dataType
    catch { case _: Exception => LongType }

  private def isIntegral(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  private def isIntervalType(t: DataType): Boolean = t match {
    case _: DayTimeIntervalType | _: YearMonthIntervalType => true
    case t2 => t2 == org.apache.spark.sql.types.CalendarIntervalType
  }

  def litAny(v: Any): Column = v match {
    case null => lit(null)
    case s: Seq[_] => array(s.map(litAny): _*)
    case m: Map[_, _] =>
      struct(m.toSeq.map { case (k, x) => litAny(x).as(k.toString) }: _*)
    case other => lit(other)
  }

  def compile(e: Expr): Column = e match {
    // aggregate context: a direct aggregate call compiles to its aggregate
    // Column; every scalar shell around it (arithmetic, CASE, list
    // comprehension over collect(...), reduce, any function) falls through
    // to the ordinary cases below — Spark accepts scalar expressions over
    // aggregate functions inside agg().
    case e0 if aggCtx && isAggregate(e0) => compileAggCall(e0)
    // outside an aggregating projection (WHERE, lambda bodies, pattern
    // predicates) an aggregate call is invalid, not "unsupported" —
    // Neo4j: "Invalid use of aggregating function in this context"
    case e0 if !aggCtx && isAggregate(e0) =>
      val n = e0 match { case Func(f, _, _) => s"$f()"; case _ => "count(*)" }
      throw new IllegalArgumentException(
        s"Invalid use of aggregating function $n in this context " +
          "(aggregates are only allowed in RETURN/WITH projections)")
    case Var(n) if lambdaEnv.contains(n) => lambdaEnv(n)
    case Var(n) => header(n) match {
      case ValueBinding(c) => col(s"`$c`")
      case nb: NodeBinding => col(s"`${nb.idCol}`")
      case rb: RelBinding => col(s"`${rb.idCol}`")
      // value semantics when the unroll materialized (id, type, props…)
      // structs (planner demand analysis); id list otherwise
      case rl: RelListBinding =>
        rl.structCol.map(c => col(s"`$c`")).getOrElse(col(s"`${rl.col}`"))
      case pb: PathBinding => ExprCompiler.pathStruct(pb)
    }
    case Param(n) => litAny(params.getOrElse(n,
      throw new IllegalArgumentException(s"missing parameter $$$n")))
    case IntLit(v) => lit(v)
    case FloatLit(v) => lit(v)
    case StringLit(v) => lit(v)
    case BoolLit(v) => lit(v)
    case NullLit => lit(null)
    case ListLit(items) =>
      val types = items.map(typeOf)
      if (isMixedAtomicList(types))
        array(items.zip(types).map { case (e, t) => toMixed(compile(e), t) }: _*)
      else if (isMixedListOfLists(types))
        // one nesting level deeper (probe batch 50): a literal list of
        // atomic LISTS whose element families differ ([[1], ['a']])
        // promotes every inner element to the tagged encoding, making
        // the outer array uniform (array<array<mixed>> — the same value
        // type slices/tails of a mixed list already produce)
        array(items.zip(types).map {
          // an already-tagged inner list passes through unchanged
          case (e, ArrayType(et, _)) if isMixedStruct(et) => compile(e)
          case (e, ArrayType(et, _)) =>
            transform(compile(e), x => toMixed(x, et))
          case (e, _) => // null item: a null list of mixed elements
            compile(e).cast(ArrayType(mixedStructType))
        }: _*)
      else {
        // non-atomic mixes (a map next to an integer, a list next to a
        // temporal) have no tagged encoding — a typed error beats the raw
        // Spark DATA_DIFF_TYPES failure. The reference also rejects these
        // (TCK "Handling property access on the Any type" sits on its
        // failure_reporting_blacklist).
        val fams = types.filterNot(_ == NullType).map(family).distinct
        if (fams.size > 1)
          throw new IllegalArgumentException(
            "cannot build a list mixing " + fams.mkString("/") +
              " values: heterogeneous lists are supported over atomic " +
              "values only (integer/float/string/boolean)")
        array(items.map(compile): _*)
      }
    case MapLit(items) => struct(items.map { case (k, v) => compile(v).as(k) }: _*)

    case Property(Var(n), key) if !lambdaEnv.contains(n) => header(n) match {
      case nb: NodeBinding =>
        nb.propCols.get(key).map(c => col(s"`$c`")).getOrElse(lit(null))
      case rb: RelBinding =>
        rb.propCols.get(key).map(c => col(s"`$c`")).getOrElse(lit(null))
      case ValueBinding(c) => typeOfCol(c) match {
        case NullType => lit(null) // null.prop is null, not a type error
        case t => extractField(col(s"`$c`"), key, t)
      }
      case _: RelListBinding =>
        throw new IllegalArgumentException(
          s"property access on var-length relationship list `$n`")
      case _: PathBinding =>
        throw new IllegalArgumentException(s"property access on path `$n`")
    }
    // startNode(r).prop / endNode(r).prop: resolve to the bound endpoint
    // node's property columns — no join. Directed matches pick statically
    // (endpointVars is storage order); undirected matches test the stored
    // src id per row against the left endpoint.
    case Property(Func(fn, _, Seq(Var(r))), key)
        if Set("startnode", "endnode")(fn.toLowerCase) &&
          !lambdaEnv.contains(r) &&
          header.get(r).exists(_.isInstanceOf[RelBinding]) =>
      val rb = header(r).asInstanceOf[RelBinding]
      val wantSrc = fn.toLowerCase == "startnode"
      // guard against id-only endpoint bindings (anonymous-target
      // optimizations): only trust a binding that carries property columns
      def fullNode(v: String): Boolean = header.get(v) match {
        case Some(nb: NodeBinding) => nb.propCols.nonEmpty
        case _ => false
      }
      def nodeProp(v: String): Column = compile(Property(Var(v), key))
      rb.endpointVars match {
        case Some((l, rr)) if rb.oriented && fullNode(if (wantSrc) l else rr) =>
          nodeProp(if (wantSrc) l else rr)
        case Some((l, rr)) if !rb.oriented && fullNode(l) && fullNode(rr) =>
          val anchor = col(s"`${if (wantSrc) rb.srcCol else rb.dstCol}`")
          val lId = header(l).asInstanceOf[NodeBinding].idCol
          when(anchor === col(s"`$lId`"), nodeProp(l)).otherwise(nodeProp(rr))
        case _ => throw new IllegalArgumentException(
          s"${if (wantSrc) "startNode" else "endNode"}($r).$key needs the " +
            "relationship's endpoint nodes in scope")
      }

    case Property(b, key) =>
      typeOf(b) match {
        // null.prop is null, not a type error — but typeOf ALSO returns
        // NullType as its analysis-error fallback, so force compilation
        // of the base first: an unsupported function / malformed operand
        // must surface its real error, not silently read as null
        // (Probe45: time('..').hour returned null with time() unsupported)
        case NullType => compile(b); lit(null)
        // a key absent from a struct value (e.g. a property the node/rel
        // type never carries) is null per openCypher, not an analysis
        // error — but TIME-encoding structs dispatch accessors by NAME
        // (.hour is not a field), so they must reach extractField
        case st: StructType if !isLocalTimeStruct(st) &&
          !isZonedTimeStruct(st) && !isZonedDtStruct(st) &&
          !isPointStruct(st) && !st.fieldNames.contains(key) =>
          lit(null)
        case t => extractField(compile(b), key, t)
      }

    case HasLabels(b, labels) => b match {
      case Var(n) => header(n) match {
        case nb: NodeBinding =>
          val pred = labels.map(l => nb.labelCols.get(l).map(c => col(s"`$c`"))
            .getOrElse(lit(false))).reduce(_ && _)
          // a null node (failed OPTIONAL MATCH) has no labels to test:
          // null, not false — Neo4j `null:Label` is null. Matters even
          // for statically-absent labels, where pred is lit(false)
          // (differential hunt 69716).
          when(col(s"`${nb.idCol}`").isNull, lit(null).cast(BooleanType))
            .otherwise(pred)
        case _ => lit(false)
      }
      // label predicate over a null value is null, not false (reference
      // NullTests "null:FOO"; same rule as the bound-var branch above)
      case e if typeOf(e) == NullType => lit(null).cast(BooleanType)
      case _ => lit(false)
    }

    // dynamic property access on an entity: n['name'] / n[keyVar]
    // (Neo4j dynamic property lookup). Literal keys resolve statically
    // to the property column; dynamic keys compile to a key-dispatch
    // CASE over the binding's columns — same-family values widen via the
    // lattice, mixed families fall back to the tagged-union encoding.
    case Index(Var(n), k) if !lambdaEnv.contains(n) &&
        header.get(n).exists(b =>
          b.isInstanceOf[NodeBinding] || b.isInstanceOf[RelBinding]) =>
      val props: Map[String, String] = header(n) match {
        case nb: NodeBinding => nb.propCols
        case rb: RelBinding => rb.propCols
        case _ => Map.empty
      }
      k match {
        case StringLit(key) =>
          props.get(key).map(c => col(s"`$c`")).getOrElse(lit(null))
        case NullLit => lit(null)
        case _ =>
          // Neo4j raises a type error when an entity is indexed with a
          // statically non-string key (n[0], n[1.5]) — mirror the strict
          // list-index check instead of silently compiling a CASE that
          // never matches.
          typeOf(k) match {
            case NullType | StringType =>
            case other => throw new IllegalArgumentException(
              s"entity property key must be a string, got $other " +
                "(Neo4j: cannot access an entity property with a " +
                "non-string key)")
          }
          val kc = compile(k)
          val sorted = props.toSeq.sortBy(_._1)
          val types = sorted.map { case (_, c) => typeOfCol(c) }
          val families = types.filterNot(_ == NullType).map(family).distinct
          if (sorted.isEmpty) lit(null)
          else if (families.size <= 1) {
            val target = types.reduce(graft.graph.SparkTypes.widen)
            sorted.foldRight(lit(null).cast(target)) {
              case ((key, c), acc) =>
                when(kc === lit(key), col(s"`$c`").cast(target))
                  .otherwise(acc)
            }
          } else {
            sorted.zip(types).foldRight(
              toMixed(lit(null), NullType)) { case (((key, c), t), acc) =>
              when(kc === lit(key), toMixed(col(s"`$c`"), t)).otherwise(acc)
            }
          }
      }

    case Index(b, i) =>
      // list position: nodes(p)[i] indexes the materialized VALUE list
      val c = compileList(b)
      val t = typeOf(b)
      t match {
        case NullType => lit(null) // null[k] is null, not a type error
        case t2 @ (_: MapType | _: StructType) if !isMixedStruct(t2) =>
          typeOf(i) match {
            case StringType | NullType => ()
            case other => throw new IllegalArgumentException(
              s"map index must be a string, got $other " +
                "(Neo4j: cannot index a map with a non-string)")
          }
          extractFieldDyn(c, compile(i), i, t2)
        // a scalar base is not indexable at all (TCK ExpressionAcceptance
        // "Fail at runtime when trying to index something which is not a
        // map or collection") — typed error, not a raw DATATYPE_MISMATCH
        case other @ (BooleanType | StringType | BinaryType | DateType |
            TimestampType | TimestampNTZType | _: NumericType) =>
          throw new IllegalArgumentException(
            s"cannot index into a value of type ${other.simpleString} " +
              "(expected a list or map)")
        case _ =>
          typeOf(i) match {
            case NullType | ByteType | ShortType | IntegerType | LongType =>
            case other => throw new IllegalArgumentException(
              s"list index must be an integer, got $other " +
                "(Neo4j: cannot index a list with a non-integer)")
          }
          staticListSelect(b, staticIntOf(i)).getOrElse {
            val idx = compile(i)
            // Cypher lists are 0-based; element_at is 1-based with
            // negative indices counting from the end (matches Cypher's
            // l[-1]). try_: out-of-bounds is null in Cypher, not an ANSI
            // error.
            try_element_at(c,
              when(idx >= 0, idx + 1).otherwise(idx).cast(IntegerType))
          }
      }
    case Slice(b, from, to) =>
      val c = compileList(b) // list position, like Index
      val n = size(c).cast(LongType)
      val f0 = from.map(compile).getOrElse(lit(0L))
      val t0 = to.map(compile).getOrElse(n)
      // Cypher: negative indices count from the end, clamped at 0
      val f = when(f0 < 0, greatest(n + f0, lit(0L))).otherwise(f0)
      val t = when(t0 < 0, greatest(n + t0, lit(0L))).otherwise(t0)
      // a null bound nulls the whole slice (greatest() would swallow the
      // null and yield [] instead)
      when(f0.isNull || t0.isNull, lit(null)).otherwise(
        slice(c, (f + 1).cast(IntegerType),
          greatest(t - f, lit(0)).cast(IntegerType)))

    case Not(x) =>
      typeOf(x) match {
        // a definitely-non-boolean operand is a type error, not an ANSI
        // cast failure (mixed/tagged values dispatch at runtime)
        case StringType | DateType | TimestampType | TimestampNTZType |
            (_: NumericType) | (_: ArrayType) | (_: MapType) =>
          throw new IllegalArgumentException(
            s"Type mismatch: NOT expects a Boolean, got ${typeOf(x)}")
        case _ => ()
      }
      !compile(x)
    case And(l, r) => compile(l) && compile(r)
    case Or(l, r) => compile(l) || compile(r)
    case Xor(l, r) =>
      val (a, b) = (compile(l), compile(r))
      (a && !b) || (!a && b)

    // comparisons: openCypher cross-type-family semantics (equality of
    // incomparable values is false, ordering is null — never a cast
    // error; Spark under ANSI would throw on e.g. 'a' < 1)
    case Eq(l, r) => compileCmp(l, r, _ === _, mismatch = Some(false))
    case Neq(l, r) => compileCmp(l, r, _ =!= _, mismatch = Some(true))
    case Lt(l, r) => compileCmp(l, r, _ < _, mismatch = None, ordering = true)
    case Lte(l, r) => compileCmp(l, r, _ <= _, mismatch = None, ordering = true)
    case Gt(l, r) => compileCmp(l, r, _ > _, mismatch = None, ordering = true)
    case Gte(l, r) => compileCmp(l, r, _ >= _, mismatch = None, ordering = true)
    case IsNull(x) => compile(x).isNull
    case IsNotNull(x) => compile(x).isNotNull
    case In(x, list) => compileIn(x, list)
    // STARTS WITH / ENDS WITH / CONTAINS are null on NON-STRING operands
    // (openCypher StartsWithAcceptance — a reference failing_blacklist
    // area): Spark would implicitly cast (1 STARTS WITH '1' → true,
    // true ENDS WITH 'e' → true), so guard on the static type; a
    // runtime-typed mixed operand dispatches on its tag (string field
    // when @k=3, null otherwise).
    case StartsWith(l, r) =>
      strPred(l, r, (a, b) => a.startsWith(b))
    case EndsWith(l, r) =>
      strPred(l, r, (a, b) => a.endsWith(b))
    case Contains(l, r) =>
      strPred(l, r, (a, b) => a.contains(b))
    // Cypher `=~` matches the WHOLE string (Matcher.matches); Spark's
    // regexp_like is a partial match (Matcher.find). Anchor with a
    // non-capturing group — constant-folded for literal patterns, and
    // inline flags like (?i) keep working inside the group. \A..\z, not
    // ^..$: under find(), $ also matches before a final line terminator,
    // so 'abc\n' =~ 'abc' would wrongly return true.
    case RegexMatch(l, r) =>
      regexp_like(compile(l),
        concat(lit("\\A(?:"), compile(r).cast(StringType), lit(")\\z")))

    case Add(l, r) =>
      val (lc, rc) = (compile(l), compile(r))
      def isInstantA(t: DataType): Boolean = t == DateType ||
        t == TimestampType || t == TimestampNTZType ||
        isZonedDtStruct(t) || isLocalTimeStruct(t) || isZonedTimeStruct(t)
      (typeOf(l), typeOf(r)) match {
        case (StringType, _) | (_, StringType) =>
          concat(lc.cast(StringType), rc.cast(StringType))
        // adding two temporal instants (or points) is meaningless —
        // typed error instead of a raw Spark analysis failure (round 8)
        case (tl, tr) if isInstantA(tl) && isInstantA(tr) =>
          throw new IllegalArgumentException(
            "temporal instants cannot be added — add a duration instead")
        case (tl, tr) if isPointStruct(tl) || isPointStruct(tr) =>
          throw new IllegalArgumentException(
            "points do not support arithmetic — use distance(a, b)")
        case (_: ArrayType, _: ArrayType) => concat(lc, rc)
        // element append/prepend: a NULL operand nulls the whole result
        // (Cypher ternary logic; Spark's concat only propagates null for
        // the array side, and array(null) would smuggle it in as a value)
        case (_: ArrayType, _) =>
          when(rc.isNull, lit(null)).otherwise(concat(lc, array(rc)))
        case (_, _: ArrayType) =>
          when(lc.isNull, lit(null)).otherwise(concat(array(lc), rc))
        // a statically-absent temporal operand (NullType literal) nulls
        // the arithmetic — Spark's coercion would otherwise try casting
        // TIMESTAMP to VOID and fail analysis (differential hunt 32015)
        case (NullType, t) if t == CalendarIntervalType ||
          isIntervalType(t) || t == DateType || t == TimestampType ||
          t == TimestampNTZType => lit(null)
        case (t, NullType) if t == CalendarIntervalType ||
          isIntervalType(t) || t == DateType || t == TimestampType ||
          t == TimestampNTZType => lit(null)
        // Cypher: Date + Duration = Date with sub-day components IGNORED
        // (Neo4j temporal arithmetic) — Spark raises on adding a
        // micros-bearing calendar interval to a date, so apply the
        // month/day components directly
        case (DateType, CalendarIntervalType) => dateAddInterval(lc, rc, 1)
        case (CalendarIntervalType, DateType) => dateAddInterval(rc, lc, 1)
        // TIME/LOCALTIME ± duration: only the duration's TIME components
        // apply, wrapping within the day (Neo4j)
        case (t, CalendarIntervalType) if isLocalTimeStruct(t) ||
          isZonedTimeStruct(t) => timeAddInterval(lc, rc, 1, t)
        case (CalendarIntervalType, t) if isLocalTimeStruct(t) ||
          isZonedTimeStruct(t) => timeAddInterval(rc, lc, 1, t)
        // zoned datetime ± duration: local-clock arithmetic in the
        // value's zone, offset re-resolved (DST-correct for named zones)
        case (t, CalendarIntervalType) if isZonedDtStruct(t) =>
          zonedDtAddInterval(lc, rc, 1)
        case (CalendarIntervalType, t) if isZonedDtStruct(t) =>
          zonedDtAddInterval(rc, lc, 1)
        case (t, NullType) if isZonedDtStruct(t) => lit(null)
        case (NullType, t) if isZonedDtStruct(t) => lit(null)
        // Spark widens date+interval to timestamp, so cast back
        case (DateType, t) if isIntervalType(t) => (lc + rc).cast(DateType)
        case (t, DateType) if isIntervalType(t) => (lc + rc).cast(DateType)
        case _ => lc + rc
      }
    case Sub(l, r) =>
      val (lc, rc) = (compile(l), compile(r))
      def isInstant(t: DataType): Boolean = t == DateType ||
        t == TimestampType || t == TimestampNTZType ||
        isZonedDtStruct(t) || isLocalTimeStruct(t) || isZonedTimeStruct(t)
      (typeOf(l), typeOf(r)) match {
        // temporal instants cannot be subtracted (Neo4j: use
        // duration.between) — previously date - date silently produced
        // a Spark day-time interval while zoned types crashed analysis
        case (tl, tr) if isInstant(tl) && isInstant(tr) =>
          throw new IllegalArgumentException(
            "temporal instants cannot be subtracted — use " +
              "duration.between(a, b) / duration.inDays / " +
              "duration.inSeconds")
        case (tl, tr) if isPointStruct(tl) || isPointStruct(tr) =>
          throw new IllegalArgumentException(
            "points do not support arithmetic — use distance(a, b)")
        // see Add: NullType ± temporal must stay null, not a cast error
        case (NullType, t) if t == CalendarIntervalType ||
          isIntervalType(t) || t == DateType || t == TimestampType ||
          t == TimestampNTZType => lit(null)
        case (t, NullType) if t == CalendarIntervalType ||
          isIntervalType(t) || t == DateType || t == TimestampType ||
          t == TimestampNTZType => lit(null)
        case (DateType, CalendarIntervalType) => dateAddInterval(lc, rc, -1)
        case (t, CalendarIntervalType) if isLocalTimeStruct(t) ||
          isZonedTimeStruct(t) => timeAddInterval(lc, rc, -1, t)
        case (t, CalendarIntervalType) if isZonedDtStruct(t) =>
          zonedDtAddInterval(lc, rc, -1)
        case (t, NullType) if isZonedDtStruct(t) => lit(null)
        case (NullType, t) if isZonedDtStruct(t) => lit(null)
        case (DateType, t) if isIntervalType(t) => (lc - rc).cast(DateType)
        case _ => lc - rc
      }
    // duration * k and duration / k (Neo4j temporal-amount scaling;
    // reference SparkSQLExprMapper handles these via CalendarInterval
    // arithmetic). Spark multiplies/divides ANSI intervals natively.
    case Mul(l, r) if isIntervalType(typeOf(l)) || isIntervalType(typeOf(r)) =>
      val (ic, kc) =
        if (isIntervalType(typeOf(l))) (compile(l), compile(r))
        else (compile(r), compile(l))
      ic * kc
    case Div(l, r) if isIntervalType(typeOf(l)) => compile(l) / compile(r)
    case Mul(l, r) => compile(l) * compile(r)
    case Div(l, r) =>
      val (lc, rc) = (compile(l), compile(r))
      if (isIntegral(typeOf(l)) && isIntegral(typeOf(r)))
        // Cypher int/int truncates toward zero. SQL `div` (IntegralDivide)
        // is exact on the full Long range — the double round-trip loses
        // exactness above 2^53 — and raises on /0 under ANSI mode,
        // matching Cypher's "/ by zero" runtime error.
        graft.functions.VectorFunctions.integral_divide(
          lc.cast(LongType), rc.cast(LongType))
      else if (typeOf(l).isInstanceOf[DecimalType] ||
          typeOf(r).isInstanceOf[DecimalType])
        lc / rc // decimal-exact path (bigdecimal() lattice)
      else ieeeDiv(lc, rc)
    case Mod(l, r) =>
      val (lc, rc) = (compile(l), compile(r))
      if (isIntegral(typeOf(l)) && isIntegral(typeOf(r)))
        lc % rc // ANSI raises on % 0 — matches Cypher's runtime error
      else {
        // IEEE remainder: float % 0.0 is NaN in Cypher/Java, where
        // Spark's ANSI mode would raise — branch the zero divisor away.
        // A null dividend still propagates null (not NaN): check it
        // inside the zero-divisor branch, like ieeeDiv does.
        val rd = rc.cast(DoubleType)
        val ld = lc.cast(DoubleType)
        when(rd === 0.0,
          when(ld.isNull, lit(null).cast(DoubleType))
            .otherwise(lit(Double.NaN)))
          .otherwise(ld % rd)
      }
    case Pow(l, r) => pow(compile(l), compile(r))
    case Neg(x) => negate(compile(x))

    case CaseExpr(operand, alts, default) =>
      // Cypher CASE branches may return DIFFERENT types ('one' vs v):
      // when atomic result families mix, each branch wraps into the
      // tagged-union encoding (same representation as mixed lists)
      val resultTypes = (alts.map(t => typeOf(t._2)) ++
        default.map(typeOf)).toList
      val mixed = isMixedAtomicList(resultTypes)
      def res(e: Expr): Column =
        if (mixed) toMixed(compile(e), typeOf(e)) else compile(e)
      val branches = operand match {
        case Some(op) => alts.map { case (w, t) => (compile(Eq(op, w)), res(t)) }
        case None => alts.map { case (w, t) =>
          // a NullType condition (literal null, unknowable property) is
          // simply "not true" — cast so CaseWhen's boolean check passes
          val c = compile(w)
          val cond = if (typeOf(w) == NullType) c.cast(BooleanType) else c
          (cond, res(t))
        }
      }
      val first = when(branches.head._1, branches.head._2)
      val chained = branches.tail.foldLeft(first) { case (acc, (c, v)) => acc.when(c, v) }
      default.map(d => chained.otherwise(res(d))).getOrElse(chained)

    case ListComprehension(_, list, _, _) if typeOf(list) == NullType =>
      lit(null) // [x IN null | ...] is null, not a type error
    case ListComprehension(v, list, pred, proj) =>
      pred.foreach(noAggInLambda); proj.foreach(noAggInLambda)
      val base = compileList(list)
      val et = Map(v -> listElemType(list))
      val filtered = pred match {
        case Some(p) => filter(base, x => sub(Map(v -> x), et).compile(p))
        case None => base
      }
      proj match {
        case Some(pr) => transform(filtered, x => sub(Map(v -> x), et).compile(pr))
        case None => filtered
      }

    case Reduce(_, _, _, list, _) if typeOf(list) == NullType => lit(null)
    case Reduce(acc, init, v, list, step) =>
      noAggInLambda(step)
      val ts = Map(acc -> typeOf(init), v -> listElemType(list))
      aggregate(compileList(list), compile(init),
        (a, x) => sub(Map(acc -> a, v -> x), ts).compile(step))

    case Quantified(_, _, list, _) if typeOf(list) == NullType =>
      lit(null).cast(BooleanType)
    case Quantified(q, v, list, pred) =>
      noAggInLambda(pred)
      val c = compileList(list)
      val et = Map(v -> listElemType(list))
      def p(x: Column) = sub(Map(v -> x), et).compile(pred)
      q match {
        case "all" => forall(c, p)
        case "any" => exists(c, p)
        case "none" => !exists(c, p)
        case "single" =>
          // strict ternary: ≥2 definite matches → false regardless of
          // unknowns; any unknown otherwise → the count itself is unknown
          // (filter alone would drop null predicates and over-commit)
          val trues = size(filter(c, x => coalesce(p(x), lit(false))))
          val unknowns = size(filter(c, x => p(x).isNull))
          when(trues >= 2, lit(false))
            .when(unknowns > 0, lit(null).cast(BooleanType))
            .otherwise(trues === 1)
      }

    case MapProjection(v, items) =>
      // later entries override earlier ones (openCypher semantics)
      val entries = scala.collection.mutable.LinkedHashMap.empty[String, Column]
      def allProps: Seq[(String, String)] = header(v) match {
        case nb: NodeBinding => nb.propCols.toSeq.sortBy(_._1)
        case rb: RelBinding => rb.propCols.toSeq.sortBy(_._1)
        case _ => throw new IllegalArgumentException(
          s"map projection `$v {.*}` needs an entity variable")
      }
      items.foreach {
        case AllPropsItem =>
          allProps.foreach { case (k, c) => entries(k) = col(s"`$c`") }
        case PropItem(k) => entries(k) = compile(Property(Var(v), k))
        case ExprItem(k, e) => entries(k) = compile(e)
      }
      require(entries.nonEmpty, s"empty map projection on `$v`")
      // projecting a null entity/map yields null, not a map of nulls
      val isNullV = header.get(v) match {
        case Some(nb: NodeBinding) if !lambdaEnv.contains(v) =>
          col(s"`${nb.idCol}`").isNull
        case Some(rb: RelBinding) if !lambdaEnv.contains(v) =>
          col(s"`${rb.idCol}`").isNull
        case _ => compile(Var(v)).isNull
      }
      when(isNullV, lit(null))
        .otherwise(struct(entries.toSeq.map { case (k, c) => c.as(k) }: _*))

    case CountStar =>
      throw new IllegalArgumentException("count(*) is only valid as an aggregate")
    case _: PatternPredicate =>
      throw new IllegalArgumentException(
        "pattern predicate must be planned as a subquery (planner bug)")
    case _: PatternComprehension =>
      throw new IllegalArgumentException(
        "pattern comprehension must be planned as a sub-match (planner bug)")

    case f: Func => compileFunction(f)
  }

  // ------------------------------------------------------------ functions
  private def typeOfCol(c: String): DataType =
    try probeSchemaOnly.select(col(s"`$c`")).schema.head.dataType
    catch { case _: Exception => NullType }

  /** `.key` access: struct/map field lookup, or — when the base is a
    * temporal value — a property-style accessor (`d.year`, `ts.minute`,
    * `dur.days`; reference TemporalUdfs.scala:93-158). */
  private def extractField(c: Column, key: String, baseType: DataType): Column =
    baseType match {
      case DateType | TimestampType | TimestampNTZType =>
        temporalAccessor(c, key)
      case _: DayTimeIntervalType | _: YearMonthIntervalType =>
        durationAccessor(c, key, baseType)
      case CalendarIntervalType => calendarIntervalAccessor(c, key)
      case st: StructType if isLocalTimeStruct(st) =>
        localTimeAccessor(c, key)
      case st: StructType if isZonedTimeStruct(st) =>
        zonedTimeAccessor(c, key)
      case st: StructType if isZonedDtStruct(st) =>
        zonedDtAccessor(c, key)
      case st: StructType if isPointStruct(st) =>
        pointAccessor(c, key)
      // a key the (closed) struct schema lacks is null in Cypher, not a
      // FIELD_NOT_FOUND analysis error
      case st: StructType if !st.fieldNames.contains(key) => lit(null)
      // property access on an atomic value is a type error (TCK
      // SemanticErrorAcceptance "Failing when performing property access
      // on a non-map"), not a raw INVALID_EXTRACT_BASE_FIELD_TYPE failure
      case t @ (BooleanType | StringType | BinaryType | _: NumericType) =>
        throw new IllegalArgumentException(
          s"property access on a value of type ${t.simpleString} " +
            "(expected a node, relationship, map or temporal value)")
      case _ => c.getField(key) // struct/map lookup
    }

  private def temporalAccessor(c: Column, key: String): Column =
    key.toLowerCase match {
      case "year" => year(c).cast(LongType)
      case "quarter" => quarter(c).cast(LongType)
      case "month" => month(c).cast(LongType)
      case "week" => weekofyear(c).cast(LongType)
      case "day" => dayofmonth(c).cast(LongType)
      case "ordinalday" => dayofyear(c).cast(LongType)
      case "dayofweek" | "weekday" =>
        // ISO: Monday = 1 … Sunday = 7 (Spark's dayofweek: Sunday = 1)
        (pmod(dayofweek(c) + lit(5), lit(7)) + 1).cast(LongType)
      case "hour" => hour(c).cast(LongType)
      case "minute" => minute(c).cast(LongType)
      case "second" => second(c).cast(LongType)
      case "millisecond" =>
        (date_part(lit("SECOND"), c) * 1000 % 1000).cast(LongType)
      case "microsecond" => // full sub-second value in µs (Neo4j form)
        (date_part(lit("SECOND"), c) * 1000000 % 1000000).cast(LongType)
      case "nanosecond" => // timestamps carry µs precision → µs * 1000
        (date_part(lit("SECOND"), c) * 1000000 % 1000000).cast(LongType) * 1000
      case "weekyear" =>
        // ISO week-based year = the year of this week's THURSDAY
        // (weekofyear is already ISO, so the pair stays consistent:
        // 2019-12-30 → week 1 of weekYear 2020)
        val isoDow = pmod(dayofweek(c.cast(DateType)) + lit(5), lit(7)) + 1
        year(date_add(c.cast(DateType), lit(4) - isoDow)).cast(LongType)
      case "epochseconds" => unix_timestamp(c.cast(TimestampType))
      case "epochmillis" => unix_millis(c.cast(TimestampType))
      case other => throw new IllegalArgumentException(
        s"unknown temporal accessor .$other")
    }

  /** month-bearing durations (CalendarIntervalType): `.months` is the
    * TOTAL month count (Neo4j normalizes years into months —
    * reference Duration.scala stores (months, days, seconds, nanos)). */
  private def calendarIntervalAccessor(c: Column, key: String): Column =
    durationParts(c, key, CalendarIntervalType)

  private def durationAccessor(c: Column, key: String, t: DataType): Column =
    durationParts(c, key, t)

  /** Duration component accessors with Neo4j/reference semantics
    * (TemporalUdfs.scala:118-142): the month group (`years`, `quarters`,
    * `months`) and the day count are per-group totals; the time accessors
    * (`hours`, `minutes`, `seconds`, `milliseconds`, `microseconds`) are
    * CUMULATIVE totals of the seconds group — duration({seconds: 90})
    * has .seconds = 90 and .minutes = 1 — and the `...OfX` forms are the
    * mixed-radix digits (secondsOfMinute = 30). Each Spark interval type
    * carries a subset of Neo4j's (months, days, seconds) groups; accessors
    * outside the carried set read 0 (date_part would throw for them):
    * CalendarIntervalType stores the raw triple (read directly — its
    * date_part FOLDS whole days out of the microsecond field, which is
    * not Neo4j's view), YearMonthIntervalType is months-only,
    * DayTimeIntervalType is total-microsecond storage whose whole days
    * surface in the DAY digit (documented divergence: a pure-time
    * construction ≥ 24h cannot be told apart from a days construction
    * once encoded — ReferenceParitySpec). */
  private def durationParts(c: Column, key: String, t: DataType): Column = {
    import graft.functions.IntervalFunctions._
    def p(unit: String) = date_part(lit(unit), c)
    val zero = lit(0L)
    val (monthsT, daysT, microsT): (Column, Column, Column) = t match {
      case CalendarIntervalType =>
        (intervalMonths(c), intervalDays(c), intervalMicros(c))
      case _: YearMonthIntervalType =>
        (p("YEAR").cast(LongType) * 12 + p("MONTH").cast(LongType), zero, zero)
      case _ => // DayTimeIntervalType
        (zero, p("DAY").cast(LongType),
          (p("HOUR").cast(LongType) * 3600 +
            p("MINUTE").cast(LongType) * 60) * 1000000L +
            (p("SECOND") * 1000000L).cast(LongType))
    }
    // `/` on longs is double division; the Long cast truncates toward
    // zero, matching Neo4j's component truncation for negative durations
    def div(x: Column, k: Long) = (x / lit(k)).cast(LongType)
    key.toLowerCase match {
      case "years" => div(monthsT, 12)
      case "quarters" => div(monthsT, 3)
      case "months" => monthsT
      case "monthsofyear" => monthsT % 12
      case "monthsofquarter" => monthsT % 3
      case "weeks" => div(daysT, 7)
      case "days" => daysT
      case "daysofweek" => daysT % 7
      case "hours" => div(microsT, 3600000000L)
      case "minutes" => div(microsT, 60000000L)
      case "seconds" => div(microsT, 1000000L)
      case "milliseconds" => div(microsT, 1000L)
      case "microseconds" => microsT
      case "minutesofhour" => div(microsT, 60000000L) % 60
      case "secondsofminute" => div(microsT, 1000000L) % 60
      case "millisecondsofsecond" => div(microsT, 1000L) % 1000
      case "microsecondsofsecond" => microsT % 1000000L
      case other => throw new IllegalArgumentException(
        s"unknown duration accessor .$other on $t")
    }
  }

  private def extractFieldDyn(c: Column, key: Column, keyExpr: Expr,
      baseType: DataType): Column =
    (keyExpr, baseType) match {
      // missing key on a (closed) struct schema is null, not an error
      case (StringLit(s), st: StructType) =>
        if (st.fieldNames.contains(s)) c.getField(s) else lit(null)
      case (StringLit(s), _) => c.getField(s)
      // dynamic key on a struct: dispatch over the (closed) field set —
      // element_at only works on maps/arrays, and an unknown key is null
      case (_, st: StructType) =>
        st.fieldNames.foldLeft(lit(null)) { (acc, f) =>
          when(key === lit(f), c.getField(f)).otherwise(acc)
        }
      case _ => try_element_at(c, key)
    }

  /** scalar function dispatch (SURVEY §2.3 inventory). */
  /** openCypher comparability family: values from different families are
    * never equal (`1 = 'a'` → false) and never ordered (`'a' < 1` → null);
    * numeric widths/date-vs-timestamp compare within their family. */
  /** conversion functions take atomic values only: entities, lists and
    * maps are a type error in both the reference (okapi ToInteger/
    * ToFloat/ToBoolean signatures, Expr.scala:758-796) and Neo4j — not
    * a silent id-cast or a raw CAST_WITHOUT_SUGGESTION failure. */
  private def convInputGuard(fn: String, arg: Expr): Unit = {
    entityKindOf(arg).foreach { kind =>
      throw new IllegalArgumentException(
        s"Invalid input for $fn(): expected an atomic value, got $kind")
    }
    typeOf(arg) match {
      case t @ (_: ArrayType | _: MapType) =>
        throw new IllegalArgumentException(
          s"Invalid input for $fn(): expected an atomic value, " +
            s"got ${t.simpleString}")
      case st: StructType if !isMixedStruct(st) =>
        throw new IllegalArgumentException(
          s"Invalid input for $fn(): expected an atomic value, " +
            "got a map/entity")
      case _ => ()
    }
  }

  /** the entity kind of a bare entity-bound variable argument, for
    * argument-type checks — an entity var otherwise compiles to its id
    * column, so a plain typeOf check cannot tell a node from a BIGINT. */
  private def entityKindOf(e: Expr): Option[String] = e match {
    case Var(n) if !lambdaEnv.contains(n) => header.get(n) collect {
      case _: NodeBinding => "a node"
      case _: RelBinding => "a relationship"
      case _: PathBinding => "a path"
      case _: RelListBinding => "a var-length relationship list"
    }
    case _ => None
  }

  private def family(t: DataType): String = t match {
    case _: NumericType => "num"
    case StringType => "str"
    case BooleanType => "bool"
    case DateType | TimestampType | TimestampNTZType => "temporal"
    case _: ArrayType => "array"
    case _: StructType | _: MapType => "map"
    case t2 if isIntervalType(t2) => "interval"
    case NullType => "null"
    case _ => "other"
  }

  // ------------------------------------------------ heterogeneous lists
  // Spark arrays are homogeneous; the reference's binary-encoded
  // CypherList (okapi-api CypherValue.scala:255-340) accepts mixed-type
  // lists. Mixed ATOMIC list literals compile to a tagged-union struct
  // array instead: @k = family tag (0 null, 1 integer, 2 float,
  // 3 string, 4 boolean), one typed field per family. Comparisons and
  // membership dispatch on the tag, so `[1,'a'][0] = 1` is true and
  // `'a' IN [1,'a']` is true with real typed semantics. Mixed-vs-mixed
  // equality compares numbers ACROSS the int/float tags (as doubles —
  // exactness above 2^53 is the remaining documented limit); mixed
  // ordering comparisons are comparability (cross-family → null) while
  // ORDER BY/min/max use the CIP global sort order (mixedOrderKey).

  /** per-row guard: a negative argument raises (Neo4j string functions
    * error on negative start/length where Spark would count from the
    * end or return ''). One comparison per row, stays in codegen. */
  private def negGuard(c: Column, msg: String): Column =
    when(c < 0, raise_error(lit(msg)).cast(LongType)).otherwise(c)

  /** compile-time value of an integer index expression. AST literals
    * (and negation/params over them) resolve directly; anything else
    * falls back to the ColumnNode literal check — Column DSL functions
    * build Unresolved nodes, so only plain lit() folds there. */
  private def staticIntOf(e: Expr): Option[Long] = e match {
    case IntLit(v) => Some(v)
    case Neg(x) => staticIntOf(x).map(v => -v)
    case Param(n) => params.get(n) match {
      case Some(v: Int) => Some(v.toLong)
      case Some(v: Long) => Some(v)
      case Some(v: java.lang.Integer) => Some(v.longValue())
      case Some(v: java.lang.Long) => Some(v)
      case _ => None
    }
    case _ =>
      org.apache.spark.sql.graftbridge.ColumnBridge.staticValue(compile(e)) match {
        case Some(n: java.lang.Byte) => Some(n.longValue())
        case Some(n: java.lang.Short) => Some(n.longValue())
        case Some(n: java.lang.Integer) => Some(n.longValue())
        case Some(n: java.lang.Long) => Some(n)
        case _ => None
      }
  }

  /** Static selection from a LIST LITERAL at a compile-time-known index:
    * compiles straight to the chosen element (no array is ever built).
    * Besides skipping the CreateArray, this dodges a Spark codegen defect
    * (observed on 4.1.2, judge round-5 finding): ElementAt with a
    * foldable in-bounds ordinal over a CreateArray whose selected element
    * is non-nullable computes `nullable = false`, yet its doGenCode still
    * emits the out-of-bounds `isNull = true` guard — referencing an
    * isNull variable that is then never declared because nullSafeCodeGen
    * replaced it with FalseLiteral. janino rejects the generated class
    * ("isNull_x is not an rvalue") and every row through the shape pays
    * the silent interpreted-projection fallback.
    *
    * The element is cast to the list's unified element type so static and
    * dynamic indexing agree (numeric lists widen to double, mixed atomic
    * families take the tagged-union struct). Out-of-bounds is null, like
    * try_element_at.
    *
    * Error semantics: Cypher evaluates the whole list literal before
    * indexing, so a raising NON-selected element (`[1/0, 2][1]`) must
    * still raise. The fast path is therefore restricted to lists whose
    * non-selected elements provably cannot raise; anything else builds
    * the full array and selects through a non-foldable ordinal
    * ([[graft.functions.OpaqueOrdinal]]) — which also keeps the shape
    * out of the ElementAt foldable-ordinal codegen defect. */
  private def staticListSelect(b: Expr, idx: Option[Long]): Option[Column] =
    (b, idx) match {
      case (ListLit(items), Some(v)) =>
        val n = items.length
        val j = if (v < 0) v + n else v
        val et = elemTypeOf(b)
        val forced = items.zipWithIndex.exists { case (e, k) =>
          k != j && !cannotRaise(e) }
        if (forced) {
          // evaluate every element (a raising sibling raises, as Cypher
          // requires), then select; an out-of-bounds static index maps to
          // the always-out-of-bounds positive ordinal n+1 → null
          val ord = if (j < 0 || j >= n) n + 1 else j.toInt + 1
          Some(try_element_at(compileList(b),
            graft.functions.VectorFunctions.opaque_ordinal(ord)))
        } else if (j < 0 || j >= n) Some(if (et == NullType) lit(null)
          else lit(null).cast(et))
        else {
          val types = items.map(typeOf)
          val sel =
            if (isMixedAtomicList(types))
              toMixed(compile(items(j.toInt)), types(j.toInt))
            else if (isMixedListOfLists(types)) types(j.toInt) match {
              // same promotion the full-array path applies: the selected
              // inner list's elements take the tagged encoding (an
              // already-tagged inner list passes through)
              case ArrayType(ict, _) if isMixedStruct(ict) =>
                compile(items(j.toInt))
              case ArrayType(ict, _) =>
                transform(compile(items(j.toInt)), x => toMixed(x, ict))
              case _ => lit(null).cast(ArrayType(mixedStructType))
            }
            else compile(items(j.toInt))
          Some(if (et == NullType) sel else sel.cast(et))
        }
      case _ => None
    }

  /** Conservative "this expression can never raise at runtime"
    * whitelist, used to keep the [[staticListSelect]] fast path honest:
    * literals, variables, parameters, property access, and containers of
    * the same. Anything arithmetic (`/`, `%` raise on zero, functions may
    * raise typed errors) is treated as potentially raising. */
  private def cannotRaise(e: Expr): Boolean = e match {
    case _: IntLit | _: FloatLit | _: StringLit | _: BoolLit | NullLit |
         _: Param | _: Var => true
    case Property(base, _) => cannotRaise(base)
    case ListLit(xs) => xs.forall(cannotRaise)
    case MapLit(xs) => xs.forall(kv => cannotRaise(kv._2))
    case _ => false
  }

  /** STARTS WITH / ENDS WITH / CONTAINS operand handling: strings apply
    * `op`, mixed-tagged values dispatch on the tag at runtime, any other
    * family (or NullType) is null — never Spark's implicit cast. */
  private def strPred(l: Expr, r: Expr,
      op: (Column, Column) => Column): Column = {
    def side(e: Expr): Option[Column] = typeOf(e) match {
      case StringType => Some(compile(e))
      case st: StructType if isMixedStruct(st) =>
        val c = compile(e)
        Some(when(c.getField("@k") === 3, c.getField("s"))
          .otherwise(lit(null).cast(StringType)))
      case NullType => Some(lit(null).cast(StringType))
      case _ => None // statically non-string → whole predicate is null
    }
    (side(l), side(r)) match {
      case (Some(lc), Some(rc)) => op(lc, rc)
      case _ => lit(null).cast(BooleanType)
    }
  }

  // ---- TIME / LOCALTIME (Neo4j temporal types Spark lacks): encoded as
  // single-purpose structs — localtime = {"@lt": micros-of-day},
  // time = {"@zt": micros-of-day at UTC, "off": offset seconds}. Struct
  // equality/ordering on "@lt"/"@zt" gives instant-based comparison
  // (times with different offsets but one instant are EQUAL, per CIP);
  // accessors render the LOCAL clock. Both are scalar encodings like the
  // mixed-union struct — orderable, groupable, distinct-able.
  private val localTimeFields = Array("@lt")
  private val zonedTimeFields = Array("@zt", "off")
  private def isLocalTimeStruct(t: DataType): Boolean = t match {
    case st: StructType => st.fieldNames.sameElements(localTimeFields)
    case _ => false
  }
  private def isZonedTimeStruct(t: DataType): Boolean = t match {
    case st: StructType => st.fieldNames.sameElements(zonedTimeFields)
    case _ => false
  }
  // ---- ZONED DATETIME (probe batch 53): the fifth temporal type gets
  // the same treatment TIME got in round 6 — a single-purpose struct
  // {"@zdt": UTC instant (TimestampType), "off": offset seconds AT that
  // instant, "zid": zone id string ("Z", "+02:00", or a region like
  // "Europe/Berlin")}. Equality/ordering/grouping use the instant;
  // accessors read the LOCAL clock (instant + off); calendar arithmetic
  // is evaluated in the value's zone so named zones cross DST correctly.
  // localdatetime stays TIMESTAMP_NTZ — a DIFFERENT Cypher type.
  private val zonedDtFields = Array("@zdt", "off", "zid")
  private def isZonedDtStruct(t: DataType): Boolean = t match {
    case st: StructType => st.fieldNames.sameElements(zonedDtFields)
    case _ => false
  }
  private[plans] def isZonedDatetime(t: DataType): Boolean = isZonedDtStruct(t)
  private[plans] def zonedDtInstantKey(c: Column): Column = c.getField("@zdt")
  private[plans] def zonedDtReprKey(c: Column): Column =
    struct(c.getField("off"), c.getField("zid"))
  /** a null instant nulls the WHOLE value — without the guard, derived
    * zdts over null rows (null prop ± duration, truncate of a failed
    * OPTIONAL, …) would come back as a non-null struct of null fields,
    * making IS NULL false (round-8 differential family) */
  private def mkZonedDt(ts: Column, off: Column, zid: Column): Column =
    when(ts.isNull, lit(null).cast(StructType(Seq(
      StructField("@zdt", TimestampType), StructField("off", IntegerType),
      StructField("zid", StringType)))))
      .otherwise(struct(ts.as("@zdt"), off.cast(IntegerType).as("off"),
        zid.cast(StringType).as("zid")))
  /** UTC micros-of-day of a timestamp instant (sessions pin UTC) */
  private def instantMicrosOfDay(ts: Column): Column =
    (hour(ts).cast(LongType) * 3600L + minute(ts).cast(LongType) * 60L +
      second(ts).cast(LongType)) * 1000000L +
      (date_part(lit("SECOND"), ts) * 1000000 % 1000000).cast(LongType)

  /** the value's local wall clock as a session-UTC timestamp */
  private def zonedDtLocal(c: Column): Column =
    c.getField("@zdt") + make_interval(lit(0), lit(0), lit(0), lit(0),
      lit(0), lit(0), c.getField("off").cast(DecimalType(18, 6)))
  /** offset seconds of `zid` at instant `ts` (zone rules lookup) */
  private def zoneOffsetAt(ts: Column, zid: Column): Column =
    (unix_timestamp(from_utc_timestamp(ts, zid)) - unix_timestamp(ts))
      .cast(IntegerType)
  private def secondsInterval(secs: Column): Column =
    make_interval(lit(0), lit(0), lit(0), lit(0), lit(0), lit(0),
      secs.cast(DecimalType(18, 6)))
  /** resolve a local wall clock in `zid` to an instant, PREFERRING
    * `prefOff` (the value's pre-arithmetic offset) when the zone rules
    * admit it at that local time — java.time `ZonedDateTime.ofLocal`'s
    * retain-offset rule, which Neo4j inherits: across a DST fall-back
    * overlap a value keeps its original side of the transition instead
    * of snapping to the zone default. Gaps (and any local time where the
    * preferred offset is invalid) fall through to `to_utc_timestamp`'s
    * zone-rule resolution. */
  private def localToInstant(local: Column, zid: Column,
      prefOff: Column): Column = {
    val cand = local - secondsInterval(prefOff)
    when(zoneOffsetAt(cand, zid) === prefOff.cast(IntegerType), cand)
      .otherwise(to_utc_timestamp(local, zid))
  }
  /** datetime ± duration, java.time/Neo4j semantics: the CALENDAR
    * components (months, days) apply to the LOCAL clock in the value's
    * zone (a +P1D across a DST gap keeps the wall time and shifts the
    * offset), resolving ambiguous results with the original offset
    * preferred; the TIME components (micros) then add to the resulting
    * INSTANT as exact elapsed time — so duration({hours: 1}) across a
    * fall-back overlap lands one elapsed hour later (02:30+02:00 →
    * 02:30+01:00 in Berlin), where a local-clock add would skip the
    * repeated hour, and duration({hours: 24}) diverges from
    * duration({days: 1}) across any transition. */
  private def zonedDtAddInterval(dtC: Column, ivC: Column,
      sign: Int): Column = {
    import graft.functions.IntervalFunctions._
    val zid = dtC.getField("zid")
    val m = (intervalMonths(ivC) * sign).cast(IntegerType)
    val d = (intervalDays(ivC) * sign).cast(IntegerType)
    val us = intervalMicros(ivC) * sign
    val local = from_utc_timestamp(dtC.getField("@zdt"), zid)
    val localMD = local + make_interval(lit(0), m, lit(0), d, lit(0),
      lit(0), lit(java.math.BigDecimal.ZERO))
    val instMD = localToInstant(localMD, zid, dtC.getField("off"))
    val inst2 = instMD +
      secondsInterval(us.cast(DecimalType(27, 6)) / 1000000)
    mkZonedDt(inst2, zoneOffsetAt(inst2, zid), zid)
  }
  private def zonedDtAccessor(c: Column, key: String): Column = {
    val off = c.getField("off").cast(LongType)
    key.toLowerCase match {
      case "offset" => renderOffset(off)
      case "offsetminutes" => off / 60L
      case "offsetseconds" => off
      case "timezone" => c.getField("zid")
      // epoch accessors read the INSTANT, clock accessors the local time
      case "epochmillis" | "epochseconds" =>
        temporalAccessor(c.getField("@zdt"), key)
      case other => temporalAccessor(zonedDtLocal(c), other)
    }
  }
  /** a zone id that is NOT a plain offset renders as a [zone] suffix */
  private def zidIsNamed(zid: Column): Column =
    !(zid === "Z" || zid.rlike("^[+-]"))
  private val dayMicros = 86400000000L

  // ---- POINT (round 8): the last Cypher value type — the reference
  // documents it UNSUPPORTED (cypher-cypher9-features.adoc:36-54).
  // Encoded as a single-purpose struct {"@crs": "cartesian"|"wgs-84",
  // "px": x/longitude, "py": y/latitude} like the temporal encodings:
  // struct equality is component-wise (crs, x, y — Neo4j point
  // equality), grouping/DISTINCT work natively, and ordering
  // comparisons (< etc.) fall into the compound-value null rule
  // (points are not in the CIP comparability table). 2D only; z/height
  // maps raise a typed error.
  private val pointFields = Array("@crs", "px", "py")
  private def isPointStruct(t: DataType): Boolean = t match {
    case st: StructType => st.fieldNames.sameElements(pointFields)
    case _ => false
  }
  private val pointType = StructType(Seq(
    StructField("@crs", StringType), StructField("px", DoubleType),
    StructField("py", DoubleType)))
  /** a null coordinate nulls the whole point (Neo4j) */
  private def mkPoint(crs: Column, x: Column, y: Column): Column =
    when(x.isNull || y.isNull, lit(null).cast(pointType))
      .otherwise(struct(crs.cast(StringType).as("@crs"),
        x.cast(DoubleType).as("px"), y.cast(DoubleType).as("py")))
  private def pointAccessor(c: Column, key: String): Column =
    key.toLowerCase match {
      case "x" => c.getField("px")
      case "y" => c.getField("py")
      case "crs" => c.getField("@crs")
      case "srid" =>
        when(c.isNull, lit(null).cast(LongType))
          .when(c.getField("@crs") === "wgs-84", lit(4326L))
          .otherwise(lit(7203L))
      // geographic names are only available on wgs-84 points (Neo4j
      // raises per row on a cartesian point)
      case "longitude" =>
        when(c.isNull, lit(null).cast(DoubleType))
          .when(c.getField("@crs") === "wgs-84", c.getField("px"))
          .otherwise(raise_error(lit(
            "field 'longitude' is not available on a cartesian point"))
            .cast(DoubleType))
      case "latitude" =>
        when(c.isNull, lit(null).cast(DoubleType))
          .when(c.getField("@crs") === "wgs-84", c.getField("py"))
          .otherwise(raise_error(lit(
            "field 'latitude' is not available on a cartesian point"))
            .cast(DoubleType))
      case other => throw new IllegalArgumentException(
        s"unknown point accessor .$other (expected x, y, crs, srid, " +
          "latitude, longitude)")
    }

  private def timeOfDayAccessor(mic: Column, key: String): Column = {
    def div(x: Column, k: Long) = (x / lit(k)).cast(LongType)
    key.toLowerCase match {
      case "hour" => div(mic, 3600000000L)
      case "minute" => div(mic, 60000000L) % 60
      case "second" => div(mic, 1000000L) % 60
      case "millisecond" => div(mic, 1000L) % 1000
      case "microsecond" => mic % 1000000L
      case "nanosecond" => (mic % 1000000L) * 1000L
      case other => throw new IllegalArgumentException(
        s"unknown time accessor .$other")
    }
  }
  private def localTimeAccessor(c: Column, key: String): Column =
    timeOfDayAccessor(c.getField("@lt"), key)
  private def zonedTimeAccessor(c: Column, key: String): Column = {
    val off = c.getField("off").cast(LongType)
    val localMic = pmod(c.getField("@zt") + off * 1000000L, lit(dayMicros))
    key.toLowerCase match {
      case "offset" => renderOffset(off)
      case "offsetminutes" => off / 60L
      case "offsetseconds" => off
      case "timezone" => renderOffset(off)
      case other => timeOfDayAccessor(localMic, other)
    }
  }
  private def renderOffset(offSec: Column): Column = {
    val a = abs(offSec)
    when(offSec === 0, lit("Z")).otherwise(concat(
      when(offSec < 0, lit("-")).otherwise(lit("+")),
      format_string("%02d:%02d", (a / 3600L).cast(LongType),
        ((a % 3600L) / 60L).cast(LongType))))
  }
  /** HH:MM:SS[.fraction] from micros-of-day (fraction trimmed, Neo4j). */
  private def renderTimeOfDay(mic: Column): Column = {
    def div(x: Column, k: Long) = (x / lit(k)).cast(LongType)
    val base = format_string("%02d:%02d:%02d",
      div(mic, 3600000000L), div(mic, 60000000L) % 60,
      div(mic, 1000000L) % 60)
    val frac = mic % 1000000L
    when(frac === 0, base).otherwise(concat(base, lit("."),
      regexp_replace(format_string("%06d", frac), lit("0+$"), lit(""))))
  }
  /** ISO-8601 duration rendering (Neo4j toString(duration)): per-digit
    * mixed radix, zero duration is "PT0S", negatives per digit. */
  private def isoDuration(c: Column): Column = {
    import graft.functions.IntervalFunctions._
    val m = intervalMonths(c); val d = intervalDays(c)
    val us = intervalMicros(c)
    def div(x: Column, k: Long) = (x / lit(k)).cast(LongType)
    def piece(v: Column, suffix: String) =
      when(v =!= 0, concat(v.cast(StringType), lit(suffix)))
        .otherwise(lit(""))
    val y = div(m, 12); val mm = m % 12
    val h = div(us, 3600000000L)
    val mi = div(us, 60000000L) % 60
    val sec = div(us, 1000000L) % 60
    val frac = us % 1000000L
    val secStr =
      when(frac =!= 0, concat(
        when(sec === 0 && frac < 0, lit("-0")).otherwise(sec.cast(StringType)),
        lit("."),
        regexp_replace(format_string("%06d", abs(frac)), lit("0+$"), lit("")),
        lit("S")))
        .when(sec =!= 0, concat(sec.cast(StringType), lit("S")))
        .otherwise(lit(""))
    val datePart = concat(piece(y, "Y"), piece(mm, "M"), piece(d, "D"))
    val timePart = concat(piece(h, "H"), piece(mi, "M"), secStr)
    when(c.isNull, lit(null).cast(StringType)).otherwise(
      when(length(datePart) === 0 && length(timePart) === 0, lit("PT0S"))
        .otherwise(concat(lit("P"), datePart,
          when(length(timePart) === 0, lit(""))
            .otherwise(concat(lit("T"), timePart)))))
  }

  private val mixedFields = Array("@k", "i", "f", "s", "b")
  private def isMixedStruct(t: DataType): Boolean = t match {
    case st: StructType => st.fieldNames.sameElements(mixedFields)
    case _ => false
  }
  /** planner-visible check for the tagged-union encoding */
  private[plans] def isMixedTagged(t: DataType): Boolean = isMixedStruct(t)
  /** openCypher EQUIVALENCE key for grouping/DISTINCT over mixed-family
    * values: equal numbers are ONE group across the int/float tags
    * (1 and 1.0 are equivalent), so the key normalizes numbers to double
    * — this is exactly the CIP order key, whose struct equality coincides
    * with equivalence (nulls rank together at 9). */
  private[plans] def mixedEquivKey(c: Column): Column =
    mixedOrderKey(c, nullsLargest = true)
  /** representative preference within an equivalence group: the lowest
    * tag wins, so DISTINCT over [1.0, 1] deterministically keeps the
    * integer encoding (members differ only in the number tag). */
  private[plans] def mixedReprKey(c: Column): Column = c.getField("@k")
  /** Zoned TIME equality/ordering compare the @zt instant only (per CIP);
    * grouping/DISTINCT must use the same equivalence, not the raw
    * {@zt, off} struct — two equal times with different offsets are ONE
    * group (ADVICE r7). The representative keeps the smallest offset,
    * deterministically. */
  private[plans] def isZonedTime(t: DataType): Boolean = isZonedTimeStruct(t)
  private[plans] def zonedInstantKey(c: Column): Column = c.getField("@zt")
  private[plans] def zonedReprKey(c: Column): Column = c.getField("off")
  /** element type encodable by [[toMixed]] */
  private def isMixedAtomic(t: DataType): Boolean = t match {
    case NullType | StringType | BooleanType => true
    case _: NumericType => true
    case _ => false
  }

  /** items all atomic LISTS (or null) whose element families differ →
    * inner elements take the mixed encoding ([[1], ['a']], probe 50) */
  private def isMixedListOfLists(types: Seq[DataType]): Boolean = {
    val inner = types.collect { case ArrayType(et, _) => et }
    // an inner list that is ALREADY tagged (a mixed literal like
    // [1, 'a'] next to a single-family sibling: [[1, 'a'], [2]]) counts
    // as promoted and forces promotion of the siblings (ADVICE r7)
    inner.size == types.count(_ != NullType) && inner.nonEmpty &&
      inner.forall(et => isMixedAtomic(et) || isMixedStruct(et)) &&
      (inner.exists(isMixedStruct(_)) ||
        inner.filterNot(_ == NullType).map(family).distinct.size > 1)
  }

  private[plans] val mixedStructType: StructType = StructType(Seq(
    StructField("@k", IntegerType), StructField("i", LongType),
    StructField("f", DoubleType), StructField("s", StringType),
    StructField("b", BooleanType)))

  /** atomics of >1 family (nulls don't count) → mixed encoding */
  private def isMixedAtomicList(types: Seq[DataType]): Boolean = {
    val atomic = types.forall {
      case NullType | StringType | BooleanType => true
      case _: NumericType => true
      case _ => false
    }
    atomic && types.filterNot(_ == NullType).map(family).distinct.size > 1
  }
  private def toMixed(c: Column, t: DataType): Column = {
    def n(dt: DataType) = lit(null).cast(dt)
    val (tag, i, f, s, b) = t match {
      case NullType => (lit(0), n(LongType), n(DoubleType), n(StringType), n(BooleanType))
      case t2: NumericType if family(t2) == "num" =>
        t2 match {
          case DoubleType | FloatType | _: DecimalType =>
            (lit(2), n(LongType), c.cast(DoubleType), n(StringType), n(BooleanType))
          case _ =>
            (lit(1), c.cast(LongType), n(DoubleType), n(StringType), n(BooleanType))
        }
      case StringType => (lit(3), n(LongType), n(DoubleType), c, n(BooleanType))
      case BooleanType => (lit(4), n(LongType), n(DoubleType), n(StringType), c)
      case other => throw new IllegalArgumentException(
        s"mixed lists support atomic elements only, got $other")
    }
    struct(when(c.isNull, 0).otherwise(tag).as("@k"), i.as("i"), f.as("f"),
      s.as("s"), b.as("b"))
  }
  /** 3VL comparison between a mixed-tagged element and a concrete value:
    * matching family compares the typed field, null tag/value → null,
    * family mismatch → the caller's `mismatch` constant (false for `=`,
    * TRUE for `<>` — an integer is definitely not a string), ordering
    * (mismatch None) → null. */
  private def mixedCmp(m: Column, v: Column, vt: DataType,
      op: (Column, Column) => Column, mismatch: Option[Boolean]): Column = {
    val fam = family(vt)
    val matched = fam match {
      case "num" =>
        when(m.getField("@k") === 1, op(m.getField("i"), v))
          .when(m.getField("@k") === 2, op(m.getField("f"), v))
      case "str" => when(m.getField("@k") === 3, op(m.getField("s"), v))
      case "bool" => when(m.getField("@k") === 4, op(m.getField("b"), v))
      case _ => when(lit(false), lit(false))
    }
    val mismatchCol = mismatch match {
      case None => lit(null).cast(BooleanType) // ordering: incomparable
      case Some(const) =>
        when(m.getField("@k") === 0 || m.isNull || v.isNull,
          lit(null).cast(BooleanType)).otherwise(lit(const))
    }
    if (fam == "null") lit(null).cast(BooleanType)
    else matched.otherwise(mismatchCol)
  }

  /** equality between two mixed-tagged values: numbers compare across the
    * int/float split (as doubles — exactness above 2^53 is a documented
    * limit), same-family strings/booleans compare their field, null tags
    * poison, family mismatch is false. */
  private def mixedPairEq(x: Column, y: Column): Column = {
    val (kx, ky) = (x.getField("@k"), y.getField("@k"))
    val numX = coalesce(x.getField("i").cast(DoubleType), x.getField("f"))
    val numY = coalesce(y.getField("i").cast(DoubleType), y.getField("f"))
    when(kx === 0 || ky === 0, lit(null).cast(BooleanType))
      .when((kx === 1 || kx === 2) && (ky === 1 || ky === 2), numX === numY)
      .when(kx === 3 && ky === 3, x.getField("s") === y.getField("s"))
      .when(kx === 4 && ky === 4, x.getField("b") === y.getField("b"))
      .otherwise(lit(false))
  }

  /** ordering comparison between two mixed-tagged values: COMPARABILITY,
    * not orderability — cross-family `<` is null (even though ORDER BY
    * ranks families via [[mixedOrderKey]]). */
  private def mixedPairCmp(x: Column, y: Column,
      op: (Column, Column) => Column): Column = {
    val (kx, ky) = (x.getField("@k"), y.getField("@k"))
    val numX = coalesce(x.getField("i").cast(DoubleType), x.getField("f"))
    val numY = coalesce(y.getField("i").cast(DoubleType), y.getField("f"))
    when((kx === 1 || kx === 2) && (ky === 1 || ky === 2), op(numX, numY))
      .when(kx === 3 && ky === 3, op(x.getField("s"), y.getField("s")))
      .when(kx === 4 && ky === 4, op(x.getField("b"), y.getField("b")))
      .otherwise(lit(null).cast(BooleanType))
  }

  /** openCypher global-sort-order key for a mixed-tagged value (CIP
    * "Comparability and orderability", ascending: … STRING, BOOLEAN,
    * NUMBER, null last): rank separates families; within a rank only that
    * family's field is non-null on both sides, so the others tie. Numbers
    * compare as doubles across the int/float split. `nullsLargest` places
    * the null tag (ORDER BY ASC / min skip-nulls want largest; max wants
    * smallest so non-null values win). */
  private[plans] def mixedOrderKey(c: Column, nullsLargest: Boolean): Column = {
    val k = c.getField("@k")
    val rank = when(k === 3, 0).when(k === 4, 1)
      .when(k === 1 || k === 2, 2)
      .otherwise(lit(if (nullsLargest) 9 else -1))
    struct(rank.as("r"), c.getField("s").as("s"), c.getField("b").as("b"),
      coalesce(c.getField("i").cast(DoubleType), c.getField("f")).as("d"))
  }

  /** true when a list type can hold values whose Spark ordering diverges
    * from the CIP global sort order: nullable elements (Spark arrays sort
    * null elements FIRST, Cypher's total order puts null after every
    * value — `[1,1] < [null,3]`), tagged mixed elements (family rank, not
    * struct field order), or a nested list with either. */
  private[plans] def arrayNeedsOrderKey(t: ArrayType): Boolean =
    t.containsNull || (t.elementType match {
      case at: ArrayType => arrayNeedsOrderKey(at)
      case st: StructType => isMixedStruct(st)
      case _ => false
    })

  /** Cypher total-order sort key for a LIST value (probe batch 50): wrap
    * each element as struct(n: isNull, v) — false < true puts null
    * elements LAST under ASC and first under DESC, matching the CIP
    * global sort order; prefix/length comparison is unchanged. Recurses
    * into nested lists; tagged mixed elements order by family rank. */
  private[plans] def arrayOrderKey(c: Column, t: ArrayType): Column = {
    def key(x: Column, et: DataType): Column = {
      val v = et match {
        case at: ArrayType => transform(x, e => key(e, at.elementType))
        case st: StructType if isMixedStruct(st) =>
          mixedOrderKey(x, nullsLargest = true)
        case _ => x
      }
      struct(x.isNull.as("n"), v.as("v"))
    }
    transform(c, x => key(x, t.elementType))
  }

  /** cross-family comparison: `mismatch` Some(v) → constant v unless an
    * operand VALUE is null (then null, Cypher 3VL); None → always null.
    * `ordering` marks </<=/>/>= call sites: durations are NOT orderable in
    * Neo4j (month lengths vary), so duration </> duration yields null even
    * though Spark's interval types happen to sort. */
  private def compileCmp(l: Expr, r: Expr, op: (Column, Column) => Column,
      mismatch: Option[Boolean], ordering: Boolean = false): Column = {
    val (tl, tr) = (typeOf(l), typeOf(r))
    if (ordering && isIntervalType(tl) && isIntervalType(tr))
      return lit(null).cast(BooleanType)
    // temporal instants of DIFFERENT types are never equal and not
    // orderable in Cypher (date ≠ datetime even at midnight) — Spark
    // would silently coerce date → timestamp and compare
    val (tcl, tcr) = (temporalClass(tl), temporalClass(tr))
    if (tcl > 0 && tcr > 0 && tcl != tcr)
      return cmpMismatch(l, r, mismatch)
    // compound values (lists, maps) are INCOMPARABLE with </<=/>/>= in
    // Cypher (CIP comparability) — Spark would compare lexicographically
    def compound(t: DataType): Boolean = t match {
      case _: ArrayType | _: MapType => true
      // mixed-tagged / time structs ENCODE scalars — still orderable
      case st: StructType =>
        !isMixedStruct(st) && !isLocalTimeStruct(st) &&
          !isZonedTimeStruct(st) && !isZonedDtStruct(st)
      case _ => false
    }
    if (ordering && (compound(tl) || compound(tr)))
      return lit(null).cast(BooleanType)
    val structural = (tl, tr) match {
      // time scalars compare by their encoded instant field — struct
      // comparison would also drag the offset in, making two renderings
      // of ONE instant unequal (CIP: times compare by instant)
      case (a, b) if isLocalTimeStruct(a) && isLocalTimeStruct(b) =>
        Some(op(compile(l).getField("@lt"), compile(r).getField("@lt")))
      case (a, b) if isZonedTimeStruct(a) && isZonedTimeStruct(b) =>
        Some(op(compile(l).getField("@zt"), compile(r).getField("@zt")))
      // zoned datetimes compare by instant (offset/zone are presentation)
      case (a, b) if isZonedDtStruct(a) && isZonedDtStruct(b) =>
        Some(op(compile(l).getField("@zdt"), compile(r).getField("@zdt")))
      // a raw TIMESTAMP property (parquet/JDBC-sourced graphs) is an
      // implicitly-UTC instant — compare it with zoned values by instant
      case (a, TimestampType) if isZonedDtStruct(a) =>
        Some(op(compile(l).getField("@zdt"), compile(r)))
      case (TimestampType, b) if isZonedDtStruct(b) =>
        Some(op(compile(l), compile(r).getField("@zdt")))
      // mixed-tagged element vs concrete value: dispatch on the tag
      case (mt, vt) if isMixedStruct(mt) && !isMixedStruct(vt) =>
        Some(mixedCmp(compile(l), compile(r), vt, op,
          if (ordering) None else mismatch))
      case (vt, mt) if isMixedStruct(mt) && !isMixedStruct(vt) =>
        Some(mixedCmp(compile(r), compile(l), vt, (a, b) => op(b, a),
          if (ordering) None else mismatch))
      // Cypher maps compare BY KEY; Spark struct comparison is positional
      // and ignores field names, so {a:1} = {b:1} would come back true.
      // Same key shape → compare with both sides reordered to sorted-key
      // form; different key shape → never equal (nulls still poison).
      // collected-entity struct vs a bound entity var: identity (= id)
      case (st: StructType, _) if isEntityStruct(st) && isEntityVar(r) =>
        Some(op(compile(l).getField("id"), compile(r)))
      case (_, st: StructType) if isEntityStruct(st) && isEntityVar(l) =>
        Some(op(compile(l), compile(r).getField("id")))
      // two mixed-tagged scalars: typed equality across the int/float
      // split; ordering is comparability (cross-family → null)
      case (mt1, mt2) if isMixedStruct(mt1) && isMixedStruct(mt2) =>
        val (lc, rc) = (compile(l), compile(r))
        if (ordering) Some(mixedPairCmp(lc, rc, op))
        else mismatch match {
          case Some(neg) =>
            val eq = mixedPairEq(lc, rc)
            Some(if (neg) !eq else eq)
          case None => Some(lit(null).cast(BooleanType))
        }
      case (a: StructType, b: StructType) =>
        if (sameKeyShape(a, b))
          Some(op(canonStruct(compile(l), a), canonStruct(compile(r), b)))
        else None
      // mixed-tagged LIST vs mixed-or-single-family list: element-wise
      // ternary with typed equality (the single-family side converts
      // per-element to the tagged encoding first)
      case (ArrayType(a, _), ArrayType(b, _))
          if !ordering && mismatch.isDefined &&
            (isMixedStruct(a) || isMixedStruct(b)) &&
            (isMixedStruct(a) || isMixedAtomic(a)) &&
            (isMixedStruct(b) || isMixedAtomic(b)) =>
        val lc0 = compile(l); val rc0 = compile(r)
        val lc = if (isMixedStruct(a)) lc0
          else transform(lc0, e => toMixed(e, a))
        val rc = if (isMixedStruct(b)) rc0
          else transform(rc0, e => toMixed(e, b))
        val eqs = zip_with(lc, rc, (x, y) => mixedPairEq(x, y))
        val anyFalse = exists(eqs, e => !e) // 3VL: true > null > false
        val eq = when(lc0.isNull || rc0.isNull, lit(null).cast(BooleanType))
          .when(size(lc0) =!= size(rc0), lit(false))
          .when(anyFalse === true, lit(false))
          .when(anyFalse.isNull, lit(null).cast(BooleanType))
          .otherwise(lit(true))
        Some(if (mismatch.get) !eq else eq)
      case (ArrayType(a: StructType, _), ArrayType(b: StructType, _)) =>
        if (sameKeyShape(a, b))
          Some(op(canonStruct(compile(l), tl), canonStruct(compile(r), tr)))
        else None
      // Cypher list equality is ELEMENT-WISE ternary: [1,2]=[1,null] is
      // null, not false (Spark array equality is binary and would treat
      // the null element as a distinct value). Length mismatch is false;
      // any definite element mismatch is false even alongside nulls.
      case (ArrayType(ae, _), ArrayType(be, _)) if !ordering &&
          mismatch.isDefined && !ae.isInstanceOf[StructType] &&
          !be.isInstanceOf[StructType] &&
          (family(ae) == family(be) || ae == NullType || be == NullType) =>
        val eq = listEq3VL(compile(l), compile(r))
        Some(if (mismatch.get) !eq else eq)
      // CalendarIntervalType is not comparable in Spark; Cypher duration
      // equality is component-wise — compare the normalized
      // (months, days, microseconds) triple instead.
      case (CalendarIntervalType, CalendarIntervalType) =>
        Some(op(calParts(compile(l)), calParts(compile(r))))
      case _ => Some(null) // not structural: fall through to family logic
    }
    structural match {
      case Some(null) =>
        val (fl, fr) = (family(tl), family(tr))
        if (fl == fr || fl == "null" || fr == "null" || fl == "other" || fr == "other")
          op(compile(l), compile(r))
        else cmpMismatch(l, r, mismatch)
      case Some(c) => c
      case None => cmpMismatch(l, r, mismatch)
    }
  }

  /** float division follows IEEE-754 (Cypher: 1.0/0.0 = Infinity,
    * 0.0/0.0 = NaN) — Spark's ANSI divide raises instead, so the
    * zero-divisor case is routed around it. */
  private def ieeeDiv(lc: Column, rc: Column): Column = {
    val ld = lc.cast(DoubleType); val rd = rc.cast(DoubleType)
    // pow(±0.0, -1) preserves the ZERO'S sign (-0.0 → -Infinity), which
    // `rd === 0.0` alone cannot see — so x/-0.0 = -(x/0.0) per IEEE-754
    when(rd === 0.0,
      when(ld === 0.0, lit(Double.NaN))
        .when(ld.isNull, lit(null).cast(DoubleType))
        .otherwise(signum(ld) * pow(rd, lit(-1.0))))
      .otherwise(ld / rd)
  }

  /** java.lang.Math log semantics (what Neo4j evaluates): f(0) is
    * -Infinity and f(<0) is NaN — Spark's log/log10 return null there. */
  private def javaLog(c: Column, f: Column => Column): Column = {
    val d = c.cast(DoubleType)
    when(d === 0.0, lit(Double.NegativeInfinity))
      .when(d < 0.0, lit(Double.NaN))
      .otherwise(f(d))
  }

  /** ISO day-of-week (1 = Monday … 7 = Sunday) of a date column. */
  private def isoDowCol(d: Column): Column =
    pmod(dayofweek(d) + lit(5), lit(7)) + 1

  /** the date of ISO week-date (weekYear, week, dayOfWeek): Jan 4 is
    * always in week 1, so Monday of week 1 = jan4 - (isoDow(jan4) - 1). */
  private def isoWeekDate(y: Column, w: Column, dow: Column): Column = {
    val jan4 = make_date(y, lit(1), lit(4))
    val mondayW1 = date_sub(jan4, isoDowCol(jan4) - 1)
    date_add(mondayW1, ((w - 1) * 7 + (dow - 1)).cast(IntegerType))
  }

  /** Cypher temporal map constructor, date half (Neo4j TemporalCreate /
    * TemporalSelect): calendar parts (year/month/day), week-date parts
    * (year/week/dayOfWeek), ordinal parts (year/ordinalDay), and
    * SELECTION — a `date` entry carries base components that explicit
    * entries override. */
  /** a map-constructor `date:` base as a plain column — zoned datetimes
    * contribute their LOCAL clock (Neo4j selection semantics) */
  private def selectionBase(e: Expr): Column = typeOf(e) match {
    case st: StructType if isZonedDtStruct(st) => zonedDtLocal(compile(e))
    case _ => compile(e)
  }

  private def dateFromMap(m: Map[String, Expr]): Column = {
    def p(k: String): Option[Column] =
      m.get(k).map(e => compile(e).cast(IntegerType))
    val base = m.get("date").map(e => to_date(selectionBase(e)))
    def part(k: String, f: Column => Column, dflt: Int): Column =
      p(k).orElse(base.map(b => f(b).cast(IntegerType))).getOrElse(lit(dflt))
    if (m.contains("week") || m.contains("dayOfWeek"))
      isoWeekDate(part("year", year, 1), p("week").getOrElse(lit(1)),
        p("dayOfWeek").getOrElse(lit(1)))
    else if (m.contains("ordinalDay"))
      date_add(make_date(part("year", year, 1), lit(1), lit(1)),
        p("ordinalDay").getOrElse(lit(1)) - 1)
    else
      make_date(part("year", year, 1), part("month", month, 1),
        part("day", dayofmonth, 1))
  }

  /** (year, month, day) columns for a timestamp map constructor —
    * derived through [[dateFromMap]] so week/ordinal/selection forms
    * work for datetimes too. */
  private def datePartsFromMap(m: Map[String, Expr]): Seq[Column] = {
    val d = dateFromMap(m)
    Seq(year(d), month(d), dayofmonth(d))
  }

  /** (hour, minute, second-with-fraction) columns for a timestamp map
    * constructor; a base `date` entry that is itself a timestamp
    * contributes its time-of-day, explicit entries override. */
  private def timePartsFromMap(m: Map[String, Expr]): Seq[Column] = {
    def p(k: String): Option[Column] =
      m.get(k).map(e => compile(e).cast(IntegerType))
    val baseTs: Option[Column] = m.get("date").flatMap { e =>
      typeOf(e) match {
        case TimestampType | TimestampNTZType => Some(compile(e))
        case st: StructType if isZonedDtStruct(st) =>
          Some(zonedDtLocal(compile(e)))
        case _ => None
      }
    }
    def part(k: String, f: Column => Column): Column =
      p(k).orElse(baseTs.map(b => f(b).cast(IntegerType))).getOrElse(lit(0))
    val secWhole = part("second", second)
    val frac = (m.get("millisecond").map(e =>
        compile(e).cast(DecimalType(16, 6)) / 1000)
      .toSeq ++ m.get("microsecond").map(e =>
        compile(e).cast(DecimalType(16, 6)) / 1000000))
      .foldLeft(lit(java.math.BigDecimal.ZERO).cast(DecimalType(16, 6)))(_ + _)
    Seq(part("hour", hour), part("minute", minute),
      (secWhole.cast(DecimalType(16, 6)) + frac).cast(DecimalType(16, 6)))
  }

  /** truncation units Spark's date_trunc lacks (Neo4j
    * TemporalTruncateAcceptance): decade, century, millennium (floor of
    * the year digit), weekYear (Monday of week 1 of the ISO week-based
    * year). None → unit handled by date_trunc. */
  private def truncSpecial(unit: String, c: Column): Option[Column] =
    unit.toLowerCase match {
      case "decade" => Some(make_date(
        (floor(year(c) / 10) * 10).cast(IntegerType), lit(1), lit(1)))
      case "century" => Some(make_date(
        (floor(year(c) / 100) * 100).cast(IntegerType), lit(1), lit(1)))
      case "millennium" => Some(make_date(
        (floor(year(c) / 1000) * 1000).cast(IntegerType), lit(1), lit(1)))
      case "weekyear" =>
        val d = c.cast(DateType)
        val wy = year(date_add(d, lit(4) - isoDowCol(d)))
        Some(isoWeekDate(wy, lit(1), lit(1)))
      case _ => None
    }

  /** ISO-8601 date forms Neo4j accepts that Spark's DATE cast rejects:
    * week dates (2015-W30-2, 2015W302, 2015-W30), ordinal dates
    * (2015-202, 2015202), compact (20150721), year-month (2015-07),
    * bare year. */
  /** time ± duration: apply sign × the duration's TIME component only,
    * wrapping within the day (Neo4j time arithmetic ignores the month and
    * day groups of the amount). Preserves the zoned offset. */
  private def timeAddInterval(timeC: Column, ivC: Column, sign: Int,
      t: DataType): Column = {
    import graft.functions.IntervalFunctions._
    val delta = intervalMicros(ivC) * sign
    // null operand rows null the value, not a struct of null fields
    // (see mkZonedDt)
    if (isLocalTimeStruct(t))
      when(timeC.isNull || ivC.isNull, lit(null).cast(StructType(Seq(
        StructField("@lt", LongType)))))
        .otherwise(struct(pmod(timeC.getField("@lt") + delta,
          lit(dayMicros)).as("@lt")))
    else
      when(timeC.isNull || ivC.isNull, lit(null).cast(StructType(Seq(
        StructField("@zt", LongType), StructField("off", IntegerType)))))
        .otherwise(struct(pmod(timeC.getField("@zt") + delta,
          lit(dayMicros)).as("@zt"), timeC.getField("off").as("off")))
  }

  /** time-of-day micros from an hour/minute/second/…-component map. */
  private def timeMicrosFromComponents(m: Map[String, Expr]): Column = {
    def part(k: String) =
      m.get(k).map(e => compile(e).cast(LongType)).getOrElse(lit(0L))
    (part("hour") * 3600L + part("minute") * 60L + part("second")) *
      1000000L + part("millisecond") * 1000L + part("microsecond") +
      (part("nanosecond") / lit(1000L)).cast(LongType)
  }

  private def parseTzOffset(tz: String): Int = tz.trim match {
    case "Z" | "z" | "UTC" => 0
    case o if o.matches("[+-]\\d{2}(:?\\d{2})?") =>
      val sign = if (o.startsWith("-")) -1 else 1
      val d = o.drop(1).replace(":", "")
      sign * (d.take(2).toInt * 3600 +
        (if (d.length > 2) d.drop(2).toInt * 60 else 0))
    case other => throw new IllegalArgumentException(
      s"unsupported timezone offset: $other (named zones need a tz " +
        "database; use a numeric offset)")
  }

  /** ISO time-of-day string → (micros of day, offset seconds option).
    * Accepts HH[:MM[:SS[.fff]]] [±HH[:MM] | Z]; also the compact HHMMSS
    * forms Neo4j takes. */
  private[plans] def parseIsoTime(s0: String): (Long, Option[Int]) =
    ExprCompiler.parseIsoTime(s0)

  private[plans] def parseIsoDate(s0: String): java.time.LocalDate =
    ExprCompiler.parseIsoDate(s0)

  /** date ± calendar duration: months then days applied, sub-day
    * components ignored (Neo4j date arithmetic). */
  private def dateAddInterval(d: Column, i: Column, sign: Int): Column = {
    import graft.functions.IntervalFunctions._
    date_add(
      add_months(d, (intervalMonths(i) * sign).cast(IntegerType)),
      (intervalDays(i) * sign).cast(IntegerType))
  }

  /** Element-wise ternary equality of two atomic-element arrays
    * (precondition: same element family, or NullType on either side):
    * length mismatch or any definite element mismatch → false, else a
    * null element → unknown, else true. */
  private def listEq3VL(lc: Column, rc: Column): Column = {
    val eqs = zip_with(lc, rc, (a, b) => a === b)
    val anyFalse = exists(eqs, e => !e) // 3VL: true > null > false
    when(lc.isNull || rc.isNull, lit(null).cast(BooleanType))
      .when(size(lc) =!= size(rc), lit(false))
      .when(anyFalse === true, lit(false))
      .when(anyFalse.isNull, lit(null).cast(BooleanType))
      .otherwise(lit(true))
  }

  /** 1 = date, 2 = local datetime, 3 = zoned datetime; 0 = not a
    * temporal instant. Distinct non-zero classes are incomparable. */
  private def temporalClass(dt: DataType): Int = dt match {
    case DateType => 1
    case TimestampNTZType => 2
    case TimestampType => 3
    case st: StructType if isZonedDtStruct(st) => 3
    case st: StructType if isLocalTimeStruct(st) => 4
    case st: StructType if isZonedTimeStruct(st) => 5
    case _ => 0
  }

  private def cmpMismatch(l: Expr, r: Expr,
      mismatch: Option[Boolean]): Column = mismatch match {
    case Some(v) =>
      when(compile(l).isNull || compile(r).isNull, lit(null)).otherwise(lit(v))
    case None => lit(null).cast(BooleanType)
  }

  /** normalized (months, days, microseconds) triple of a calendar
    * interval — the reference Duration's component form (Duration.scala
    * stores (months, days, seconds, nanos)). Read from the RAW interval
    * fields: Neo4j duration equality is component-wise, so PT24H and P1D
    * are NOT equal — date_part's folded digits would conflate them. */
  private def calParts(c: Column): Column = {
    import graft.functions.IntervalFunctions._
    val triple = struct(
      intervalMonths(c).as("months"),
      intervalDays(c).as("days"),
      intervalMicros(c).as("micros"))
    val tripleType = StructType(Seq(StructField("months", LongType),
      StructField("days", LongType), StructField("micros", LongType)))
    when(c.isNull, lit(null).cast(tripleType)).otherwise(triple)
  }

  /** true when two struct types carry the same field names at every
    * nesting level (the precondition for key-ordered comparison). */
  private def sameKeyShape(a: DataType, b: DataType): Boolean = (a, b) match {
    case (x: StructType, y: StructType) =>
      x.length == y.length &&
        x.fields.sortBy(_.name).zip(y.fields.sortBy(_.name)).forall {
          case (f, g) => f.name == g.name && sameKeyShape(f.dataType, g.dataType)
        }
    case (ArrayType(x, _), ArrayType(y, _)) => sameKeyShape(x, y)
    case _ => true
  }

  /** rebuild a (possibly nested / array-wrapped) struct with fields in
    * sorted-key order, preserving top-level nulls. */
  private def canonStruct(c: Column, dt: DataType): Column = dt match {
    case st: StructType =>
      val rebuilt = struct(st.fields.sortBy(_.name).map(f =>
        canonStruct(c.getField(f.name), f.dataType).as(f.name)).toIndexedSeq: _*)
      when(c.isNull, lit(null).cast(canonType(st))).otherwise(rebuilt)
    case ArrayType(et: StructType, _) => transform(c, x => canonStruct(x, et))
    case ArrayType(et: ArrayType, _) => transform(c, x => canonStruct(x, et))
    case _ => c
  }

  private def canonType(dt: DataType): DataType = dt match {
    case st: StructType => StructType(st.fields.sortBy(_.name)
      .map(f => f.copy(dataType = canonType(f.dataType))))
    case ArrayType(et, n) => ArrayType(canonType(et), n)
    case _ => dt
  }

  /** Cypher IN: membership with 3VL — `x IN []` is false even for null x;
    * a not-found result over a list containing null is null; elements of
    * a different type family never match (but null elements still poison). */
  /** entity-value struct produced by [[entityValue]] (collect(n) etc.) */
  private def isEntityStruct(t: DataType): Boolean = t match {
    case st: StructType => st.fieldNames.headOption.contains("id") &&
      (st.fieldNames.contains("labels") || st.fieldNames.contains("type"))
    case _ => false
  }
  private def isEntityVar(e: Expr): Boolean = e match {
    case Var(n) if !lambdaEnv.contains(n) => header.get(n).exists(b =>
      b.isInstanceOf[NodeBinding] || b.isInstanceOf[RelBinding])
    case _ => false
  }

  private def compileIn(x: Expr, list: Expr): Column = {
    val tl = typeOf(list)
    val fx = family(typeOf(x))
    tl match {
      case NullType => lit(null).cast(BooleanType)
      // entity membership in a collected-entity list: identity (= id)
      case ArrayType(et, _) if isEntityStruct(et) && isEntityVar(x) =>
        val lc = compile(list); val xid = compile(x)
        when(lc.isNull || xid.isNull, lit(null).cast(BooleanType))
          .otherwise(exists(lc, e => e.getField("id") === xid))
      // membership in a mixed-tagged list: 3VL OR of tag-dispatched
      // element comparisons (true beats null beats false)
      case ArrayType(et, _) if isMixedStruct(et) && !isMixedStruct(typeOf(x)) =>
        val lc = compile(list); val xc = compile(x); val xt = typeOf(x)
        when(lc.isNull, lit(null).cast(BooleanType))
          .otherwise(aggregate(lc, lit(false).cast(BooleanType),
            (acc, e) => acc || mixedCmp(e, xc, xt, _ === _, Some(false))))
      // nested-list membership: element comparison is the TERNARY list
      // equality folded with 3VL OR — [1,null] IN [[1,2]] is null (no
      // definite mismatch, null element), not the binary false that
      // array_contains would produce
      case ArrayType(ArrayType(iet, _), _) if (typeOf(x) match {
          case ArrayType(xet, _) => !iet.isInstanceOf[StructType] &&
            !xet.isInstanceOf[StructType] &&
            (family(iet) == family(xet) || iet == NullType || xet == NullType)
          case _ => false
        }) =>
        val lc = compile(list); val xc = compile(x)
        when(lc.isNull, lit(null).cast(BooleanType))
          .when(size(lc) === 0, lit(false))
          .when(xc.isNull, lit(null).cast(BooleanType))
          .otherwise(aggregate(lc, lit(false).cast(BooleanType),
            (acc, e) => acc || listEq3VL(xc, e)))
      case ArrayType(et, _) =>
        val lc = compile(list)
        val fe = family(et)
        if (fx == "null")
          when(lc.isNull, lit(null))
            .when(size(lc) === 0, lit(false)).otherwise(lit(null))
        else if (fe == "null")
          when(lc.isNull, lit(null))
            .when(size(lc) === 0, lit(false))
            .when(compile(x).isNull, lit(null))
            .otherwise(when(exists(lc, e => e.isNull), lit(null))
              .otherwise(lit(false)))
        else if (fx == fe || fx == "other" || fe == "other")
          // x IN [] is DEFINITE false even for a null x (nothing to be
          // unknown about); array_contains alone would null-poison.
          // size(null) is null → the guard falls through → null, right.
          when(size(lc) === 0, lit(false))
            .otherwise(array_contains(lc, compile(x)))
        else // family mismatch: no element can match; nulls still poison
          when(lc.isNull || compile(x).isNull, lit(null))
            .when(size(lc) === 0, lit(false))
            .otherwise(when(exists(lc, e => e.isNull), lit(null))
              .otherwise(lit(false)))
      // a tagged/mixed or entity struct may hold a list at runtime —
      // leave those to the runtime shape; definite scalars are a type
      // error (Neo4j: "expected List<T> but was String")
      case _: StructType => array_contains(compile(list), compile(x))
      case other => throw new IllegalArgumentException(
        s"Type mismatch: IN expects a list on the right-hand side, " +
          s"got $other")
    }
  }

  private def pathBindingOf(e: Expr): Option[PathBinding] = e match {
    case Var(n) if !lambdaEnv.contains(n) =>
      header.get(n).collect { case pb: PathBinding => pb }
    case _ => None
  }

  /** entity/path functions where a null (NullType) argument must yield
    * null rather than a plan-time type error. */
  private val nullPropagating = Set("keys", "labels", "properties", "type",
    "startnode", "endnode", "nodes", "relationships")

  private def stringArg(e: Expr, fn: String): String = e match {
    case StringLit(s) => s
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal string unit, got $other")
  }

  private def compileFunction(f: Func): Column = {
    def a(i: Int) = compile(f.args(i))
    lazy val a0 = a(0)
    if (nullPropagating(f.name) && f.args.nonEmpty &&
        typeOf(f.args(0)) == NullType) return lit(null)
    f.name match {
      case "nullif" => nullif(a0, a(1))
      case "isnan" => isnan(a0)
      case "toupper" | "upper" => upper(a0)
      case "tolower" | "lower" => lower(a0)
      case "trim" => trim(a0)
      case "ltrim" => ltrim(a0)
      case "rtrim" => rtrim(a0)
      case "reverse" => reverse(a0)
      case "replace" => // replace(str, search, repl) — literal, not regex
        when(a0.isNull || a(1).isNull || a(2).isNull, lit(null))
          .otherwise(expr_replace(a0, a(1), a(2)))
      case "split" => split_literal(a0, f.args(1))
      case "substring" =>
        // Neo4j raises on negative start/length (Spark's substr would
        // silently count from the end) — one cheap per-row guard
        val start = negGuard(a(1), "substring: start must be >= 0") + 1
        if (f.args.size > 2)
          a0.substr(start.cast(IntegerType),
            negGuard(a(2), "substring: length must be >= 0").cast(IntegerType))
        else a0.substr(start.cast(IntegerType), length(a0))
      case "left" =>
        a0.substr(lit(1),
          negGuard(a(1), "left: length must be >= 0").cast(IntegerType))
      case "right" => // n > length(s) keeps the whole string (a negative
        // computed start would wrap around in Spark's substr)
        val rn = negGuard(a(1), "right: length must be >= 0")
        a0.substr(greatest(length(a0) - rn.cast(IntegerType) + 1, lit(1)),
          rn.cast(IntegerType))
      // to*(): unconvertible input is null in Cypher, never an ANSI
      // error. Mixed-family (tagged) inputs dispatch on the tag — the
      // Neo4j 5 signatures: toString any atomic; toInteger
      // bool/string/number; toFloat string/number (boolean → null);
      // toBoolean bool/string/integer (float → null).
      case "tostring" =>
        entityKindOf(f.args(0)).foreach { kind =>
          throw new IllegalArgumentException(
            s"Invalid input for toString(): expected a String, Number, " +
              s"Boolean or temporal value, got $kind")
        }
        typeOf(f.args(0)) match {
          // toString's domain is atomic values (+ temporals/durations);
          // lists, maps and entities are a type error in Neo4j
          case t @ (_: ArrayType | _: MapType) =>
            throw new IllegalArgumentException(
              s"Invalid input for toString(): expected a String, Number, " +
                s"Boolean or temporal value, got $t")
          case st: StructType if !isMixedStruct(st) &&
            !isLocalTimeStruct(st) && !isZonedTimeStruct(st) &&
            !isZonedDtStruct(st) && !isPointStruct(st) =>
            throw new IllegalArgumentException(
              "Invalid input for toString(): expected a String, Number, " +
                "Boolean or temporal value, got a map/entity")
          case _ => ()
        }
        if (isMixedStruct(typeOf(f.args(0))))
          when(a0.getField("@k") === 1, a0.getField("i").cast(StringType))
            .when(a0.getField("@k") === 2, a0.getField("f").cast(StringType))
            .when(a0.getField("@k") === 3, a0.getField("s"))
            .when(a0.getField("@k") === 4, a0.getField("b").cast(StringType))
        else typeOf(f.args(0)) match {
          // datetimes render ISO-8601 ('T' separator, Neo4j form) —
          // Spark's cast uses a space
          case TimestampType | TimestampNTZType =>
            regexp_replace(a0.cast(StringType), lit(" "), lit("T"))
          // durations render ISO-8601 (P…T…, Neo4j form) — Spark's cast
          // renders "1 years 2 months …"
          case CalendarIntervalType => isoDuration(a0)
          case st: StructType if isLocalTimeStruct(st) =>
            when(a0.isNull, lit(null).cast(StringType))
              .otherwise(renderTimeOfDay(a0.getField("@lt")))
          case st: StructType if isZonedTimeStruct(st) =>
            val off = a0.getField("off").cast(LongType)
            when(a0.isNull, lit(null).cast(StringType))
              .otherwise(concat(renderTimeOfDay(
                pmod(a0.getField("@zt") + off * 1000000L, lit(dayMicros))),
                renderOffset(off)))
          case st: StructType if isZonedDtStruct(st) =>
            // local clock + offset, plus a [zone] suffix for named zones.
            // java.time ISO rendering (Neo4j): zero seconds with no
            // fraction are OMITTED ("2024-01-01T13:00+02:00"), and a
            // fraction prints in 3/6-digit groups (".500", not Spark's
            // fully-trimmed ".5").
            val off = a0.getField("off").cast(LongType)
            val zid = a0.getField("zid")
            val cast0 = regexp_replace(zonedDtLocal(a0).cast(StringType),
              lit(" "), lit("T"))
            val noZeroSec =
              regexp_replace(cast0, lit("(T\\d{2}:\\d{2}):00$"), lit("$1"))
            val pad1 = regexp_replace(noZeroSec,
              lit("(?<f>\\.\\d(\\d{3})?)$"), lit("${f}00"))
            val base = regexp_replace(pad1,
              lit("(?<f>\\.\\d{2}(\\d{3})?)$"), lit("${f}0"))
            when(a0.isNull, lit(null).cast(StringType))
              .otherwise(concat(base, renderOffset(off),
                when(zidIsNamed(zid), concat(lit("["), zid, lit("]")))
                  .otherwise(lit(""))))
          case st: StructType if isPointStruct(st) =>
            // Neo4j-style map rendering
            when(a0.isNull, lit(null).cast(StringType)).otherwise(concat(
              lit("point({x: "), a0.getField("px").cast(StringType),
              lit(", y: "), a0.getField("py").cast(StringType),
              lit(", crs: '"), a0.getField("@crs"), lit("'})")))
          case _ => a0.cast(StringType)
        }
      case "tointeger" =>
        convInputGuard("toInteger", f.args(0))
        if (isMixedStruct(typeOf(f.args(0))))
          when(a0.getField("@k") === 1, a0.getField("i"))
            .when(a0.getField("@k") === 2, a0.getField("f").cast(LongType))
            .when(a0.getField("@k") === 3,
              a0.getField("s").try_cast(DoubleType).try_cast(LongType))
            .when(a0.getField("@k") === 4,
              when(a0.getField("b"), 1L).otherwise(0L))
        else typeOf(f.args(0)) match {
          case StringType => a0.try_cast(DoubleType).try_cast(LongType)
          case BooleanType => when(a0, 1L).otherwise(0L)
          case _ => a0.try_cast(LongType)
        }
      case "tofloat" =>
        convInputGuard("toFloat", f.args(0))
        if (isMixedStruct(typeOf(f.args(0))))
          when(a0.getField("@k") === 1, a0.getField("i").cast(DoubleType))
            .when(a0.getField("@k") === 2, a0.getField("f"))
            .when(a0.getField("@k") === 3,
              a0.getField("s").try_cast(DoubleType))
        else typeOf(f.args(0)) match {
          case BooleanType => lit(null).cast(DoubleType)
          case _ => a0.try_cast(DoubleType)
        }
      case "toboolean" =>
        convInputGuard("toBoolean", f.args(0))
        // strict string form: ONLY case-insensitive 'true'/'false'
        // (Spark's cast also accepts 'y'/'1'/padded input — Neo4j doesn't)
        def strToBool(s: Column) =
          when(lower(s) === "true", lit(true))
            .when(lower(s) === "false", lit(false))
            .otherwise(lit(null).cast(BooleanType))
        if (isMixedStruct(typeOf(f.args(0))))
          when(a0.getField("@k") === 4, a0.getField("b"))
            .when(a0.getField("@k") === 3, strToBool(a0.getField("s")))
            .when(a0.getField("@k") === 1, a0.getField("i") =!= 0L)
        else typeOf(f.args(0)) match {
          case StringType => strToBool(a0)
          case DoubleType | FloatType => lit(null).cast(BooleanType)
          case ByteType | ShortType | IntegerType | LongType => a0 =!= 0L
          case _ => a0.try_cast(BooleanType)
        }
      // exact decimal cast (reference: CTBigDecimal + bigdecimal(),
      // SparkSQLExprMapper.scala:473) — precision/scale must be literals
      case "bigdecimal" =>
        require(f.args.size == 3,
          "bigdecimal(expr, precision, scale) takes exactly 3 arguments")
        (f.args(1), f.args(2)) match {
          case (IntLit(p), IntLit(s)) => a0.cast(DecimalType(p.toInt, s.toInt))
          case _ => throw new IllegalArgumentException(
            "bigdecimal() precision and scale must be integer literals")
        }

      case "abs" => abs(a0)
      case "ceil" => ceil(a0).cast(DoubleType)
      case "floor" => floor(a0).cast(DoubleType)
      case "round" =>
        if (f.args.size > 1) f.args(1) match {
          case IntLit(d) => round(a0, d.toInt)
          case other => throw new IllegalArgumentException(
            s"round() precision must be a literal, got $other")
        }
        else round(a0, 0).cast(DoubleType)
      case "sign" => signum(a0).cast(LongType)
      case "sqrt" => sqrt(a0)
      case "exp" => exp(a0)
      case "log" => javaLog(a0, log)
      case "log10" => javaLog(a0, log10)
      case "sin" => sin(a0)
      case "cos" => cos(a0)
      case "tan" => tan(a0)
      case "cot" => ieeeDiv(lit(1.0), tan(a0)) // cot(0) = Infinity, not ANSI error
      case "asin" => asin(a0)
      case "acos" => acos(a0)
      case "atan" => atan(a0)
      case "atan2" => atan2(a0, a(1))
      case "haversin" => (lit(1.0) - cos(a0)) / 2
      // java.lang.Math.toDegrees/toRadians operation ORDER — (x·180)/π
      // and (x/180)·π — not Spark's precomputed-constant multiply, whose
      // last bit differs (reference FunctionTests: degrees(3.14159) =
      // 179.99984796050427, the Math.toDegrees value)
      case "degrees" => a0.cast(DoubleType) * lit(180.0) / lit(math.Pi)
      case "radians" => a0.cast(DoubleType) / lit(180.0) * lit(math.Pi)
      case "e" => lit(math.E)
      case "pi" => lit(math.Pi)
      case "rand" => rand()
      case "randomuuid" => expr("uuid()")
      case "timestamp" => (unix_timestamp() * 1000).cast(LongType)

      // bitwise (reference IR surface, SparkSQLExprMapper.scala:306-309;
      // exposed as functions since openCypher has no operator syntax)
      case "bitwiseand" => a0.bitwiseAND(a(1))
      case "bitwiseor" => a0.bitwiseOR(a(1))
      case "bitwisexor" => a0.bitwiseXOR(a(1))
      case "shiftleft" => shiftleft(a0.cast(LongType), f.args(1) match {
        case IntLit(v) => v.toInt
        case other => throw new IllegalArgumentException(
          s"shiftLeft amount must be a literal, got $other")
      })
      case "shiftrightunsigned" => shiftrightunsigned(a0.cast(LongType),
        f.args(1) match {
          case IntLit(v) => v.toInt
          case other => throw new IllegalArgumentException(
            s"shiftRightUnsigned amount must be a literal, got $other")
        })

      // path functions (extension beyond the reference, which blacklists
      // paths in its TCK run): all three are pure column combinations over
      // ids the pattern already carries — no extra scan or join.
      case "length" if pathBindingOf(f.args(0)).isDefined =>
        ExprCompiler.pathLength(pathBindingOf(f.args(0)).get)
      case "size" if pathBindingOf(f.args(0)).isDefined =>
        // Neo4j: size() takes a string or list, not a path
        throw new IllegalArgumentException(
          "size() cannot be applied to a path - use length(p)")
      case "nodes" =>
        val pb = pathBindingOf(f.args(0)).getOrElse(throw
          new IllegalArgumentException("nodes() expects a named path variable"))
        // bare nodes(p) renders the id list; node VALUES surface only in
        // list positions (compileList) so rendering stays stable even when
        // a lambda elsewhere materialized (pruned) structs
        ExprCompiler.pathNodes(pb)
      case "relationships" | "rels" =>
        val pb = pathBindingOf(f.args(0)).getOrElse(throw
          new IllegalArgumentException(
            "relationships() expects a named path variable"))
        ExprCompiler.pathRels(pb)
      case "size" | "length" =>
        // entities are a type error (TCK "Failing when using `length()`
        // on a node"); a var-length rel VARIABLE is a legitimate list
        entityKindOf(f.args(0))
          .filterNot(_ == "a var-length relationship list").foreach { kind =>
            throw new IllegalArgumentException(
              s"${f.name}() cannot be applied to $kind " +
                "(expected a string or a list)")
          }
        typeOf(f.args(0)) match {
          case StringType => length(a0).cast(LongType)
          case NullType => lit(null).cast(LongType) // size(null) is null
          case _: ArrayType => size(a0).cast(LongType)
          // runtime-typed mixed value (ADVICE r5): dispatch on the tag at
          // RUNTIME like Neo4j — string elements measure, null stays null,
          // any other family raises per-row. A blanket compile-time throw
          // made UNWIND ['ab', 1] AS x RETURN size(x) fail entirely where
          // Neo4j returns 2 for 'ab' and errors only on the bad element.
          case st: StructType if isMixedStruct(st) =>
            when(a0.isNull || a0.getField("@k") === 0,
              lit(null).cast(LongType))
              .when(a0.getField("@k") === 3,
                length(a0.getField("s")).cast(LongType))
              .otherwise(raise_error(concat(
                lit(s"${f.name}() expects a string or a list, got a "),
                when(a0.getField("@k") === 1, lit("integer"))
                  .when(a0.getField("@k") === 2, lit("float"))
                  .otherwise(lit("boolean")))).cast(LongType))
          case other => throw new IllegalArgumentException(
            s"${f.name}() expects a string or a list, " +
              s"got ${other.simpleString}")
        }
      case "isempty" => typeOf(f.args(0)) match {
        case StringType => length(a0) === 0
        case _: MapType => size(map_keys(a0)) === 0
        case st: StructType => // closed struct map: emptiness is static
          when(a0.isNull, lit(null)).otherwise(lit(st.fields.isEmpty))
        case NullType => lit(null).cast(BooleanType)
        case _ => size(a0) === 0
      }
      // head/last/tail of a null list are null, not a type error
      case "head" if typeOf(f.args(0)) == NullType => lit(null)
      case "last" if typeOf(f.args(0)) == NullType => lit(null)
      case "tail" if typeOf(f.args(0)) == NullType => lit(null)
      // static fast path on list literals dodges the ElementAt codegen
      // defect (see staticListSelect) — head(['a', n.s]) selects a
      // non-nullable literal, the exact failing shape
      case "head" => staticListSelect(f.args(0), Some(0L))
        .getOrElse(try_element_at(a0, lit(1)))
      case "last" => staticListSelect(f.args(0), Some(-1L))
        .getOrElse(try_element_at(a0, lit(-1)))
      case "tail" => slice(a0, lit(2), greatest(size(a0) - 1, lit(0)))
      case "range" =>
        f.args.foreach { ra =>
          typeOf(ra) match {
            case ByteType | ShortType | IntegerType | LongType | NullType =>
            case st: StructType if isMixedStruct(st) => // runtime-typed
            case other => throw new IllegalArgumentException(
              s"range() expects integer arguments, got ${other.simpleString}")
          }
        }
        val step = if (f.args.size > 2) a(2) else lit(1L)
        // Cypher: an empty range (start past stop for the step's sign) is
        // [], where Spark's sequence() raises; step 0 raises in Neo4j;
        // any null argument yields null (reference NullTests
        // "range(null, null)"), not []
        when(a0.isNull || a(1).isNull || step.isNull,
          lit(null).cast(ArrayType(LongType)))
          .when(step === 0, raise_error(
            lit("range(): step must not be zero")).cast(ArrayType(LongType)))
          .when((step > 0 && a0 <= a(1)) || (step < 0 && a0 >= a(1)),
            sequence(a0, a(1), step))
          .otherwise(array().cast(ArrayType(LongType)))
      case "coalesce" => coalesce(f.args.map(compile): _*)

      case "id" => typeOf(f.args(0)) match {
        // relationship value struct (lambda over a var-length rel list)
        case st: StructType if st.fieldNames.contains("id") => a0.getField("id")
        case NullType => a0 // id(null) is null
        case _ => f.args(0) match {
          // a literal / arithmetic / string argument is a plain VALUE —
          // Neo4j raises a type error for id(<value>). Entity vars,
          // startNode()/endNode(), indexed nodes(p), lambda elements etc.
          // all compile to id columns and pass through.
          case _: IntLit | _: FloatLit | _: StringLit | _: BoolLit |
               _: ListLit | _: MapLit | _: Add | _: Sub | _: Mul |
               _: Div | _: Mod | _: Pow | _: Neg =>
            throw new IllegalArgumentException(
              "id() expects a node or relationship")
          case _ => a0 // entity vars compile to their id column
        }
      }
      case "type" => f.args(0) match {
        case Var(n) if !lambdaEnv.contains(n) &&
            header.get(n).exists(_.isInstanceOf[RelBinding]) =>
          col(s"`${header(n).asInstanceOf[RelBinding].typCol}`")
        // value bindings (UNWIND over collect(r) / rel struct lists) fall
        // through to the struct-typed branch
        case other => typeOf(other) match {
          // relationship value struct carries its type as a field
          case st: StructType if st.fieldNames.contains("type") =>
            a0.getField("type")
          case _ =>
            throw new IllegalArgumentException("type() expects a relationship")
        }
      }
      case "labels" => f.args(0) match {
        case Var(n) if !lambdaEnv.contains(n) &&
            header.get(n).exists(_.isInstanceOf[NodeBinding]) =>
          val nb = header(n).asInstanceOf[NodeBinding]
          val entries = nb.labelCols.toSeq.sortBy(_._1).map { case (l, c) =>
            when(col(s"`$c`"), lit(l)) }
          val arr =
            if (entries.isEmpty) array()
            else filter(array(entries: _*), x => x.isNotNull)
          // a null node (OPTIONAL MATCH non-match) has null labels, not []
          when(col(s"`${nb.idCol}`").isNull, lit(null)).otherwise(arr)
        // node value struct (lambda/UNWIND over materialized nodes(p)):
        // labels travel as a field
        case other => typeOf(other) match {
          case st: StructType if st.fieldNames.contains("labels") =>
            a0.getField("labels")
          case _ => throw new IllegalArgumentException("labels() expects a node")
        }
      }
      case "keys" => f.args(0) match {
        case Var(n) if !lambdaEnv.contains(n) && header.get(n).exists {
            case _: NodeBinding | _: RelBinding => true; case _ => false } =>
          val (idc, props) = header(n) match {
            case nb: NodeBinding => (nb.idCol, nb.propCols)
            case rb: RelBinding => (rb.idCol, rb.propCols)
            case _ => throw new IllegalStateException("unreachable")
          }
          val entries = props.toSeq.sortBy(_._1).map { case (k, c) =>
            when(col(s"`$c`").isNotNull, lit(k)) }
          val arr =
            if (entries.isEmpty) array()
            else filter(array(entries: _*), x => x.isNotNull)
          when(col(s"`$idc`").isNull, lit(null)).otherwise(arr)
        // keys of a map/struct value: INSERTION order (reference
        // FunctionTests "works with literal maps2" — name, age, address;
        // entity keys above stay sorted), and entries whose value is
        // null are absent (reference CypherMap drops null values —
        // "works with null keys in maps": {key: null} → [])
        case e => typeOf(e) match {
          case s: StructType =>
            if (s.fields.isEmpty) array().cast(ArrayType(StringType))
            else when(a0.isNull, lit(null).cast(ArrayType(StringType)))
              .otherwise(filter(array(s.fieldNames.map(k =>
                when(a0.getField(k).isNotNull, lit(k))): _*),
                x => x.isNotNull))
          case _: MapType =>
            map_keys(map_filter(a0, (_, v) => v.isNotNull))
          case other => throw new IllegalArgumentException(
            s"keys() expects an entity or map, got $other")
        }
      }
      case "properties" => f.args(0) match {
        case Var(n) if !lambdaEnv.contains(n) =>
          val (idc, props) = header(n) match {
            case nb: NodeBinding => (nb.idCol, nb.propCols)
            case rb: RelBinding => (rb.idCol, rb.propCols)
            case _ => throw new IllegalArgumentException("properties() expects an entity")
          }
          when(col(s"`$idc`").isNull, lit(null)).otherwise(
            struct(props.toSeq.sortBy(_._1).map { case (k, c) =>
              col(s"`$c`").as(k) }: _*))
        case other => typeOf(other) match {
          // relationship/node value struct (lambda over a var-length rel
          // list or materialized nodes(p)): the properties are every field
          // but the id/type/labels bookkeeping
          case st: StructType if st.fieldNames.contains("id") =>
            val props = st.fieldNames
              .filterNot(f0 => f0 == "id" || f0 == "type" || f0 == "labels")
            when(a0.isNull, lit(null)).otherwise(
              struct(props.sorted.map(k => a0.getField(k).as(k)): _*))
          // a plain map value IS its own property map (Neo4j accepts maps)
          case _: StructType | _: MapType => a0
          case _ =>
            throw new IllegalArgumentException("properties() expects an entity")
        }
      }
      case "startnode" => f.args(0) match {
        case Var(n) => header(n) match {
          case rb: RelBinding => col(s"`${rb.srcCol}`")
          case _ => throw new IllegalArgumentException("startNode() expects a relationship")
        }
        case _ => throw new IllegalArgumentException("startNode() expects a relationship variable")
      }
      case "endnode" => f.args(0) match {
        case Var(n) => header(n) match {
          case rb: RelBinding => col(s"`${rb.dstCol}`")
          case _ => throw new IllegalArgumentException("endNode() expects a relationship")
        }
        case _ => throw new IllegalArgumentException("endNode() expects a relationship variable")
      }

      // temporal constructors + accessors (SURVEY §2.3 temporal)
      case "date" =>
        if (f.args.isEmpty) current_date()
        else f.args.head match {
          case MapLit(items) => dateFromMap(items.toMap)
          case StringLit(s) => lit(java.sql.Date.valueOf(parseIsoDate(s)))
          // selection from a zoned datetime: its LOCAL calendar date
          case e if isZonedDtStruct(typeOf(e)) =>
            zonedDtLocal(a0).cast(DateType)
          // column-valued ISO string (CSV/JDBC-ingested property): the
          // literal path's parser runs per row, codegen'd — week/ordinal/
          // compact forms included (plain to_date only reads yyyy-MM-dd)
          case e if typeOf(e) == StringType =>
            graft.functions.ParseTemporal.parse(a0, "date")
          case e if typeOf(e) == NullType => lit(null).cast(DateType)
          case _ => to_date(a0)
        }
      // TIME / LOCALTIME — struct-encoded time-of-day scalars (Spark has
      // no TIME type; see the localTimeFields scaladoc). Construction is
      // plan-time for literals, columnar for component maps.
      case "localtime" =>
        if (f.args.isEmpty)
          struct(((hour(localtimestamp()).cast(LongType) * 3600L +
            minute(localtimestamp()).cast(LongType) * 60L +
            second(localtimestamp()).cast(LongType)) * 1000000L).as("@lt"))
        else f.args.head match {
          case StringLit(s) =>
            struct(lit(parseIsoTime(s)._1).as("@lt"))
          case MapLit(items) =>
            struct(timeMicrosFromComponents(items.toMap).as("@lt"))
          // selection from a zoned datetime: its LOCAL clock time-of-day
          case e if isZonedDtStruct(typeOf(e)) =>
            val off = a0.getField("off").cast(LongType)
            struct(pmod(instantMicrosOfDay(a0.getField("@zdt")) +
              off * 1000000L, lit(dayMicros)).as("@lt"))
          // column-valued ISO time string: per-row parse (offset, if
          // present, is dropped — the literal path does the same). The
          // struct shell must stay NULL for null input, not {null}.
          case e if typeOf(e) == StringType =>
            when(a0.isNull, lit(null).cast(StructType(Seq(
              StructField("@lt", LongType)))))
              .otherwise(struct(graft.functions.ParseTemporal
                .parse(a0, "localtime").as("@lt")))
          case e if typeOf(e) == NullType =>
            lit(null).cast(StructType(Seq(StructField("@lt", LongType))))
          case other => throw new IllegalArgumentException(
            s"localtime() expects a time string or a component " +
              s"map, got $other")
        }
      case "time" =>
        if (f.args.isEmpty)
          // engine sessions pin UTC (spark.sql.session.timeZone)
          struct(((hour(current_timestamp()).cast(LongType) * 3600L +
            minute(current_timestamp()).cast(LongType) * 60L +
            second(current_timestamp()).cast(LongType)) * 1000000L)
            .as("@zt"), lit(0).as("off"))
        else f.args.head match {
          case StringLit(s) =>
            val (mic, off) = parseIsoTime(s)
            val o = off.getOrElse(0)
            struct(lit(Math.floorMod(mic - o * 1000000L, dayMicros))
              .as("@zt"), lit(o).as("off"))
          case MapLit(items) =>
            val m = items.toMap
            val offSec = m.get("timezone") match {
              case Some(StringLit(tz)) => parseTzOffset(tz)
              case None => 0
              case Some(other) => throw new IllegalArgumentException(
                s"time() timezone must be a literal offset string, got $other")
            }
            struct(pmod(timeMicrosFromComponents(m - "timezone") -
              lit(offSec.toLong) * 1000000L, lit(dayMicros)).as("@zt"),
              lit(offSec).as("off"))
          // selection from a zoned datetime: time-of-day keeping the
          // offset (@zt is the UTC micros-of-day, like time() strings)
          case e if isZonedDtStruct(typeOf(e)) =>
            struct(instantMicrosOfDay(a0.getField("@zdt")).as("@zt"),
              a0.getField("off").as("off"))
          // column-valued ISO time string: per-row parse into the zoned
          // encoding (missing offset reads as UTC, like the literal path)
          case e if typeOf(e) == StringType =>
            graft.functions.ParseTemporal.parse(a0, "time")
          case e if typeOf(e) == NullType =>
            lit(null).cast(StructType(Seq(StructField("@zt", LongType),
              StructField("off", IntegerType))))
          case other => throw new IllegalArgumentException(
            s"time() expects a time string or a component map, " +
              s"got $other")
        }
      // localdatetime is TIMESTAMP WITHOUT time zone, datetime is the
      // zoned instant — DIFFERENT Cypher types (cross-type comparison is
      // false/null), so they must map to distinct Spark types
      case "localdatetime" =>
        if (f.args.isEmpty) localtimestamp()
        else f.args.head match {
          case MapLit(items) =>
            val m = items.toMap
            val dp = datePartsFromMap(m); val tp = timePartsFromMap(m)
            make_timestamp_ntz(dp(0), dp(1), dp(2), tp(0), tp(1), tp(2))
          // selection from a zoned datetime: its LOCAL wall clock
          case e if isZonedDtStruct(typeOf(e)) =>
            zonedDtLocal(a0).cast(TimestampNTZType)
          // column-valued ISO string: the full literal grammar (week/
          // ordinal/compact dates, compact times) per row; an offset or
          // zone suffix contributes its local clock
          case e if typeOf(e) == StringType =>
            graft.functions.ParseTemporal.parse(a0, "localdatetime")
          case e if typeOf(e) == NullType =>
            lit(null).cast(TimestampNTZType)
          case _ => to_timestamp_ntz(a0)
        }
      case "datetime" =>
        if (f.args.isEmpty) mkZonedDt(current_timestamp(), lit(0), lit("Z"))
        else f.args.head match {
          // epoch construction (Neo4j TemporalCreate epochMillis/Seconds):
          // instants, rendered in UTC
          case MapLit(items) if items.exists(_._1 == "epochMillis") =>
            mkZonedDt(timestamp_millis(
              compile(items.toMap.apply("epochMillis")).cast(LongType)),
              lit(0), lit("Z"))
          case MapLit(items) if items.exists(_._1 == "epochSeconds") =>
            mkZonedDt(timestamp_seconds(
              compile(items.toMap.apply("epochSeconds")).cast(LongType)),
              lit(0), lit("Z"))
          // component map with a COLUMN-valued timezone (round 8): the
          // zone id is data — make_timestamp resolves the wall clock per
          // row in it (an invalid zone raises Spark's per-row error),
          // the offset re-derives at the instant, and the zid column
          // rides along for rendering/arithmetic
          case MapLit(items) if items.toMap.get("timezone").exists(e =>
              !e.isInstanceOf[StringLit] && typeOf(e) == StringType) =>
            val m = items.toMap
            val zc = compile(m("timezone"))
            val m2 = m - "timezone"
            val dp = datePartsFromMap(m2); val tp = timePartsFromMap(m2)
            val inst = make_timestamp(dp(0), dp(1), dp(2), tp(0), tp(1),
              tp(2), zc)
            mkZonedDt(inst, zoneOffsetAt(inst, zc), zc)
          case MapLit(items) =>
            val m = items.toMap
            val zidStr: String = m.get("timezone") match {
              case Some(StringLit(z)) => z.trim
              case None => "Z"
              case Some(other) => throw new IllegalArgumentException(
                s"datetime() timezone must be a literal string, got $other")
            }
            // validate plan-side (named zones AND offsets both resolve)
            val zone = try java.time.ZoneId.of(zidStr)
            catch { case e: java.time.DateTimeException =>
              throw new IllegalArgumentException(
                s"datetime() timezone '$zidStr' is not a valid zone id or " +
                  s"offset: ${e.getMessage}") }
            val zidNorm =
              if (zone.isInstanceOf[java.time.ZoneOffset])
                ExprCompiler.renderOffsetStr(
                  zone.asInstanceOf[java.time.ZoneOffset].getTotalSeconds)
              else zidStr
            val m2 = m - "timezone"
            val dp = datePartsFromMap(m2); val tp = timePartsFromMap(m2)
            // the 7-arg make_timestamp interprets the wall-clock parts IN
            // the given zone and yields the instant
            val inst = make_timestamp(dp(0), dp(1), dp(2), tp(0), tp(1),
              tp(2), lit(zidStr))
            mkZonedDt(inst, zoneOffsetAt(inst, lit(zidNorm)), lit(zidNorm))
          case StringLit(s) =>
            val (inst, off, zid) = ExprCompiler.parseIsoZonedDatetime(s)
            mkZonedDt(lit(inst), lit(off), lit(zid))
          case e if isZonedDtStruct(typeOf(e)) => a0
          // upgrade a raw TIMESTAMP value (parquet/JDBC-sourced property)
          // to the zoned encoding: an implicitly-UTC instant; a
          // localdatetime selects into the default (UTC) zone, Neo4j
          // datetime(localdatetime) semantics
          case e if typeOf(e) == TimestampType =>
            mkZonedDt(a0, lit(0), lit("Z"))
          case e if typeOf(e) == TimestampNTZType =>
            mkZonedDt(a0.cast(TimestampType), lit(0), lit("Z"))
          // column-valued ISO string (the single most likely user-hit
          // shape: a CSV/JDBC-ingested graph with ISO-8601 string
          // properties upgraded in-query): the literal path's zoned
          // parser runs per row, codegen'd — identical zone/offset
          // resolution, malformed strings raise the same typed error
          case e if typeOf(e) == StringType =>
            graft.functions.ParseTemporal.parse(a0, "datetime")
          case e if typeOf(e) == NullType =>
            lit(null).cast(StructType(Seq(
              StructField("@zdt", TimestampType),
              StructField("off", IntegerType),
              StructField("zid", StringType))))
          // a DATE value selects midnight UTC (Neo4j datetime(date))
          case e if typeOf(e) == DateType =>
            mkZonedDt(a0.cast(TimestampNTZType).cast(TimestampType),
              lit(0), lit("Z"))
          case other => throw new IllegalArgumentException(
            "datetime() expects an ISO string, a component map " +
              s"(with optional timezone), or epochMillis/epochSeconds; " +
              s"got $other")
        }
      // duration({...}) / duration('P1Y2M3DT4H5M6S') — ALWAYS
      // CalendarIntervalType: it stores the (months, days, micros) groups
      // separately, exactly Neo4j's duration model (reference
      // Duration.scala stores (months, days, seconds, nanos)), so
      // duration({hours: 26}).days reads 0 and PT24H != P1D.
      // DayTimeIntervalType's total-microsecond storage folds whole days
      // into the DAY digit — faithful only below 24h. Arithmetic
      // (interval±interval, temporal±interval, scaling) is native for
      // CalendarIntervalType; sum()/avg() decompose over the raw fields
      // (the reference needed custom UDAFs, TemporalUdafs.scala:39-116).
      case "duration" => f.args.head match {
        case MapLit(items) =>
          val m = items.toMap
          val bad = m.keySet -- ExprCompiler.durationComponents
          if (bad.nonEmpty) throw new IllegalArgumentException(
            s"unknown duration component(s): ${bad.toSeq.sorted.mkString(", ")} " +
              s"(supported: ${ExprCompiler.durationComponents.toSeq.sorted.mkString(", ")})")
          def part(k: String) = m.get(k).map(compile).getOrElse(lit(0L))
          // sub-second components fold into the seconds decimal;
          // nanoseconds truncate to the storage's microsecond resolution
          val secs = part("seconds").cast(DecimalType(18, 6)) +
            (part("milliseconds").cast(DecimalType(18, 6)) / 1000) +
            (part("microseconds").cast(DecimalType(18, 6)) / 1000000) +
            (floor(part("nanoseconds").cast(DecimalType(27, 6)) / 1000)
              .cast(DecimalType(18, 6)) / 1000000)
          make_interval(part("years").cast(IntegerType),
            (part("quarters").cast(IntegerType) * 3 +
              part("months").cast(IntegerType)).cast(IntegerType),
            part("weeks").cast(IntegerType), part("days").cast(IntegerType),
            part("hours").cast(IntegerType),
            part("minutes").cast(IntegerType),
            secs.cast(DecimalType(18, 6)))
        case StringLit(s) =>
          val p = IsoDuration.parse(s)
          make_interval(lit(p.years), lit(p.months), lit(0),
            lit(p.days), lit(p.hours), lit(p.minutes),
            lit(p.seconds).cast(DecimalType(18, 6)))
        // column-valued ISO-8601 duration string: per-row parse into the
        // same CalendarInterval storage
        case e if typeOf(e) == StringType =>
          graft.functions.ParseTemporal.parse(a0, "duration")
        case e if typeOf(e) == NullType =>
          lit(null).cast(CalendarIntervalType)
        case _ => throw new IllegalArgumentException(
          "duration() expects a map like {months: 1, days: 2} or an ISO-8601 string")
      }
      // duration.between(a, b): calendar-aware difference — complete
      // months, then complete days, computed on the LOCAL timeline; the
      // sub-day remainder is the INSTANT difference from the month+day
      // anchor (java.time/Neo4j: from.plusMonths(m).plusDays(d), then
      // until(to, SECONDS) — so across a DST transition the seconds
      // component reflects elapsed time, consistent with
      // duration.inseconds on the same operands)
      case "duration.between" => {
        // zoned operands contribute their LOCAL clocks in the FIRST
        // operand's zone (Neo4j computes calendar components there)
        val zone1: Column = typeOf(f.args.head) match {
          case st if isZonedDtStruct(st) => a0.getField("zid")
          case _ => lit("Z")
        }
        def localOf(e: Expr, c: Column): Column = typeOf(e) match {
          case st: StructType if isZonedDtStruct(st) =>
            from_utc_timestamp(c.getField("@zdt"), zone1)
          case _ => c.cast(TimestampType)
        }
        def instOf(e: Expr, c: Column): Column = typeOf(e) match {
          case st: StructType if isZonedDtStruct(st) => c.getField("@zdt")
          case _ => c.cast(TimestampType)
        }
        val from = localOf(f.args.head, a0); val to = localOf(f.args(1), a(1))
        // components TRUNCATE toward zero (java.time until / Neo4j: all
        // components share the difference's sign — round 8; floor()
        // previously gave P-1DT23H59M58.75S shapes for small negative
        // diffs), and the remainder keeps MICROSECOND precision
        val m = months_between(to, from).cast(IntegerType)
        val anchor = timestamp_add("MONTH", m, from)
        val localMicros = unix_micros(to) - unix_micros(anchor)
        val days = (localMicros / lit(86400000000L)).cast(IntegerType)
        val anchor2 = timestamp_add("DAY", days, anchor)
        // the anchor local resolves back to an instant with the FIRST
        // operand's offset preferred (non-zoned operands: local = instant)
        val anchorInst: Column = typeOf(f.args.head) match {
          case st if isZonedDtStruct(st) =>
            localToInstant(anchor2, zone1, a0.getField("off"))
          case _ => anchor2
        }
        val micros = unix_micros(instOf(f.args(1), a(1))) -
          unix_micros(anchorInst)
        make_interval(lit(0), m, lit(0), days, lit(0), lit(0),
          (micros.cast(DecimalType(27, 6)) / 1000000)
            .cast(DecimalType(18, 6)))
      }
      case "duration.inmonths" | "duration.indays" | "duration.inseconds" =>
        // calendar units (months/days) read LOCAL clocks in the first
        // operand's zone; seconds are the exact instant difference
        val zone1: Column = typeOf(f.args.head) match {
          case st if isZonedDtStruct(st) => a0.getField("zid")
          case _ => lit("Z")
        }
        def localOf(e: Expr, c: Column): Column = typeOf(e) match {
          case st: StructType if isZonedDtStruct(st) =>
            from_utc_timestamp(c.getField("@zdt"), zone1)
          case _ => c.cast(TimestampType)
        }
        def instOf(e: Expr, c: Column): Column = typeOf(e) match {
          case st: StructType if isZonedDtStruct(st) => c.getField("@zdt")
          case _ => c.cast(TimestampType)
        }
        // like duration.between: whole units TRUNCATE toward zero and
        // inSeconds keeps microsecond precision (round 8)
        f.name.toLowerCase match {
          case "duration.inmonths" =>
            make_interval(lit(0),
              months_between(localOf(f.args(1), a(1)),
                localOf(f.args.head, a0)).cast(IntegerType),
              lit(0), lit(0), lit(0), lit(0), lit(java.math.BigDecimal.ZERO))
          case "duration.indays" =>
            make_interval(lit(0), lit(0), lit(0),
              ((unix_micros(localOf(f.args(1), a(1))) -
                unix_micros(localOf(f.args.head, a0))) /
                lit(86400000000L)).cast(IntegerType),
              lit(0), lit(0), lit(java.math.BigDecimal.ZERO))
          case _ =>
            make_interval(lit(0), lit(0), lit(0), lit(0), lit(0), lit(0),
              ((unix_micros(instOf(f.args(1), a(1))) -
                unix_micros(instOf(f.args.head, a0)))
                .cast(DecimalType(27, 6)) / 1000000)
                .cast(DecimalType(18, 6)))
        }
      // ---- point() / distance() (round 8; see the pointFields scaladoc)
      case "point" =>
        require(f.args.size == 1, "point() takes one map argument")
        f.args.head match {
          case MapLit(items) =>
            val m = items.toMap
            if (m.keySet.exists(k => k == "z" || k == "height"))
              throw new IllegalArgumentException(
                "3D points are not supported (z/height)")
            // crs/srid select the coordinate system; must be literal
            val crsOpt: Option[String] = (m.get("crs"), m.get("srid")) match {
              case (Some(StringLit(c)), _) => Some(c)
              case (Some(other), _) => throw new IllegalArgumentException(
                s"point() crs must be a literal string, got $other")
              case (None, Some(IntLit(4326))) => Some("wgs-84")
              case (None, Some(IntLit(7203))) => Some("cartesian")
              case (None, Some(other)) => throw new IllegalArgumentException(
                s"point() srid must be 4326 or 7203, got $other")
              case (None, None) => None
            }
            crsOpt.foreach { c =>
              if (c != "cartesian" && c != "wgs-84")
                throw new IllegalArgumentException(
                  s"point() crs must be 'cartesian' or 'wgs-84', got '$c'")
            }
            val keys = m.keySet -- Set("crs", "srid")
            def latGuarded(e: Expr): Column = {
              val c = compile(e).cast(DoubleType)
              when(abs(c) > 90.0, raise_error(lit(
                "point() latitude must be in [-90, 90]")).cast(DoubleType))
                .otherwise(c)
            }
            if (keys == Set("latitude", "longitude")) {
              if (crsOpt.contains("cartesian"))
                throw new IllegalArgumentException(
                  "point() with latitude/longitude cannot be cartesian")
              mkPoint(lit("wgs-84"), compile(m("longitude")),
                latGuarded(m("latitude")))
            } else if (keys == Set("x", "y")) {
              val crs = crsOpt.getOrElse("cartesian")
              if (crs == "wgs-84") // x = longitude, y = latitude (Neo4j)
                mkPoint(lit(crs), compile(m("x")), latGuarded(m("y")))
              else mkPoint(lit(crs), compile(m("x")), compile(m("y")))
            } else throw new IllegalArgumentException(
              "point() expects {x, y[, crs|srid]} or {latitude, " +
                s"longitude}, got keys ${m.keySet.toSeq.sorted.mkString(", ")}")
          case e if typeOf(e) == NullType => lit(null).cast(pointType)
          case e if isPointStruct(typeOf(e)) => a0
          case other => throw new IllegalArgumentException(
            s"point() expects a map of coordinates, got $other")
        }
      case "distance" | "point.distance" =>
        require(f.args.size == 2, s"${f.name}() takes two point arguments")
        (typeOf(f.args.head), typeOf(f.args(1))) match {
          case (ta, tb) if (isPointStruct(ta) || ta == NullType) &&
              (isPointStruct(tb) || tb == NullType) =>
            if (ta == NullType || tb == NullType) lit(null).cast(DoubleType)
            else ExprCompiler.pointDistance(a0, a(1))
          case other => throw new IllegalArgumentException(
            s"${f.name}() expects two point values, got $other")
        }
      case "date.truncate" =>
        val u = stringArg(f.args.head, "date.truncate")
        truncSpecial(u, a(1)).getOrElse(date_trunc(u, a(1))).cast(DateType)
      case "datetime.truncate" =>
        val u = stringArg(f.args.head, s"${f.name}")
        typeOf(f.args(1)) match {
          case st if isZonedDtStruct(st) =>
            // truncate the LOCAL clock in the value's zone, then rebuild
            // (original offset preferred on ambiguity — java.time
            // truncatedTo keeps the value's side of a fall-back overlap)
            val zid = a(1).getField("zid")
            val local = from_utc_timestamp(a(1).getField("@zdt"), zid)
            val t = truncSpecial(u, local).map(_.cast(TimestampType))
              .getOrElse(date_trunc(u, local))
            val inst2 = localToInstant(t, zid, a(1).getField("off"))
            mkZonedDt(inst2, zoneOffsetAt(inst2, zid), zid)
          case _ =>
            truncSpecial(u, a(1)).map(_.cast(TimestampType))
              .getOrElse(date_trunc(u, a(1)))
        }
      case "localdatetime.truncate" =>
        val u = stringArg(f.args.head, s"${f.name}")
        truncSpecial(u, a(1)).map(_.cast(TimestampNTZType))
          .getOrElse(date_trunc(u, a(1)).cast(TimestampNTZType))
      case "year" => year(a0).cast(LongType)
      case "month" => month(a0).cast(LongType)
      case "day" => dayofmonth(a0).cast(LongType)
      case "hour" => hour(a0).cast(LongType)
      case "minute" => minute(a0).cast(LongType)
      case "second" => second(a0).cast(LongType)

      case other =>
        throw new IllegalArgumentException(s"unsupported function: $other")
    }
  }

  /** literal (non-regex) replace — Spark's regexp-free translate doesn't fit,
    * so quote the pattern. */
  private def expr_replace(src: Column, search: Column, repl: Column): Column =
    replace(src, search, repl) // Spark 3.5+ functions.replace: literal semantics

  /** Cypher split(): the separator is a LITERAL string, not a regex —
    * quote it. A dynamic (non-literal) separator regex-escapes at run
    * time and goes through the SQL split, which accepts a column pattern. */
  private def split_literal(src: Column, sep: Expr): Column = sep match {
    // empty separator = split to characters (Neo4j special-cases this;
    // a zero-width regex split would append a trailing '' element)
    case StringLit("") =>
      when(src.isNull, lit(null).cast(ArrayType(StringType)))
        .when(length(src) === 0, array(lit("")))
        .otherwise(slice(split(src, ""), lit(1), length(src)))
    case StringLit(s) => split(src, java.util.regex.Pattern.quote(s))
    // Neo4j: split(s, [',', ';']) splits on ANY listed delimiter
    case ListLit(items) if items.forall(_.isInstanceOf[StringLit]) =>
      val alt = items.collect { case StringLit(s) =>
        java.util.regex.Pattern.quote(s) }.mkString("|")
      split(src, alt)
    case e =>
      val pat = regexp_replace(compile(e).cast(StringType),
        lit("([\\\\^$.|?*+()\\[\\]{}])"), lit("\\\\$1"))
      call_function("split", src, pat)
  }

  // ----------------------------------------------------------- aggregates
  def isAggregate(e: Expr): Boolean = e match {
    case CountStar => true
    case Func(n, _, _) if ExprCompiler.aggregateNames(n) => true
    case _ => false
  }

  /** Generic structural walk: an aggregate ANYWHERE inside the item —
    * including a comprehension/reduce source list, a CASE branch, a
    * comparison operand — makes it an aggregating projection item (the
    * old hand-enumerated walk missed comprehension shells, silently
    * skipping grouping). Pattern predicates/comprehensions can't legally
    * contain aggregates; descending is harmless for detection. */
  def containsAggregate(e: Expr): Boolean = {
    def any(x: Any): Boolean = x match {
      case ex: Expr if isAggregate(ex) => true
      case s: Seq[_] => s.exists(any)
      case p: Product => p.productIterator.exists(any) // incl. Option, ::
      case _ => false
    }
    any(e)
  }

  /** compile an aggregating projection item: a direct aggregate call, or
    * any scalar shell around one (`sum(x) / 100`, `[t IN collect(x) | t]`,
    * `reduce(...)` over a collect, CASE over aggregates, …). The shell is
    * compiled by the ordinary `compile` path of an aggregate-context
    * compiler, which routes inner aggregate calls through compileAggCall —
    * so every scalar operator/function composes over aggregates for free. */
  /** percentileCont/Disc argument typing (TCK FunctionsAcceptance
    * "`percentileCont()` failing on bad arguments"): both the value and
    * the percentile must be numbers — typed error, not a raw
    * CAST_INVALID_INPUT at execution time. */
  private def checkPercentileArgs(fn: String, args: Seq[Expr]): Unit = {
    typeOf(args.head) match {
      case _: NumericType | NullType => ()
      case st: StructType if isMixedStruct(st) => () // runtime-typed
      case other => throw new IllegalArgumentException(
        s"$fn() expects a numeric value expression, " +
          s"got ${other.simpleString}")
    }
    typeOf(args(1)) match {
      case _: NumericType | NullType => ()
      case other => throw new IllegalArgumentException(
        s"$fn() percentile argument must be a number in [0.0, 1.0], " +
          s"got ${other.simpleString}")
    }
  }

  /** rand()/randomUUID() inside an aggregate's arguments is invalid (TCK
    * SyntaxErrorAcceptance "Using `rand()` in aggregations") — caught
    * here so the user sees a Cypher error, not Spark's
    * AGGREGATE_FUNCTION_WITH_NONDETERMINISTIC_EXPRESSION. Only aggregate
    * ARGS are checked: `RETURN rand() + count(*)` stays legal. */
  private def nondetInAggArgs(a: Any): Boolean = {
    def containsNondet(x: Any): Boolean = x match {
      case Func(n, _, as) =>
        Set("rand", "randomuuid")(n) || as.exists(containsNondet)
      case p: Product => p.productIterator.exists(containsNondet)
      case it: Iterable[_] => it.exists(containsNondet)
      case _ => false
    }
    a match {
      case Func(n, _, args) if ExprCompiler.aggregateNames(n) =>
        args.exists(containsNondet)
      case p: Product => p.productIterator.exists(nondetInAggArgs)
      case it: Iterable[_] => it.exists(nondetInAggArgs)
      case _ => false
    }
  }

  def compileAggregate(e: Expr): Column =
    if (nondetInAggArgs(e))
      throw new IllegalArgumentException(
        "non-deterministic function (rand()/randomUUID()) cannot be " +
          "used inside an aggregate function")
    else if (isAggregate(e)) compileAggCall(e)
    else if (containsAggregate(e))
      new ExprCompiler(header, params, probe, lambdaEnv, lambdaTypes,
        aggCtx = true).compile(e)
    else
      throw new IllegalArgumentException(s"not an aggregate expression: $e")

  private def compileAggCall(e: Expr): Column = e match {
    case CountStar => count(lit(1))
    case Func("count", true, args) if isMixedStruct(typeOf(args.head)) =>
      // DISTINCT counts equivalence classes (1 and 1.0 are ONE value);
      // the tagged null (@k=0) maps back to SQL null so it stays skipped
      val c = compile(args.head)
      count_distinct(when(c.isNull || c.getField("@k") === 0, lit(null))
        .otherwise(mixedEquivKey(c)))
    case Func("count", true, args) if isZonedTimeStruct(typeOf(args.head)) =>
      // zoned times count by instant (equality ignores the offset)
      count_distinct(compile(args.head).getField("@zt"))
    case Func("count", true, args) if isZonedDtStruct(typeOf(args.head)) =>
      count_distinct(compile(args.head).getField("@zdt"))
    case Func("count", true, args) => count_distinct(compile(args.head))
    case Func("count", false, args) => count(compile(args.head))
    // Cypher sum() over no (non-null) input is 0, not SQL's null.
    // CalendarIntervalType (durations) isn't summable by Spark's Sum —
    // decompose over the raw (months, days, micros) fields and
    // recompose (the reference's custom UDAF, TemporalUdafs.scala:39-72,
    // as three codegen'd longs with map-side combine instead)
    case Func("sum", distinct, args)
        if typeOf(args.head) == CalendarIntervalType =>
      if (distinct) throw new IllegalArgumentException(
        "sum(DISTINCT duration) is not supported (per-component distinct " +
          "would not dedupe whole durations)")
      val c = compile(args.head)
      import graft.functions.IntervalFunctions._
      def s(part: Column) = coalesce(sum(part), lit(0L))
      make_interval(lit(0), s(intervalMonths(c)).cast(IntegerType), lit(0),
        s(intervalDays(c)).cast(IntegerType), lit(0), lit(0),
        (s(intervalMicros(c)) / lit(1000000L)).cast(DecimalType(24, 6)))
    case Func("sum", true, args) =>
      val c = sumChild(args.head)
      val s = sum_distinct(c)
      coalesce(s, lit(0).cast(typeOfAgg(s)))
    case Func("sum", false, args) =>
      val c = sumChild(args.head)
      val s = sum(c)
      coalesce(s, lit(0).cast(typeOfAgg(s)))
    // avg over durations: component sums scaled by 1/n (native calendar
    // interval division handles fractional carry)
    case Func("avg", distinct, args)
        if typeOf(args.head) == CalendarIntervalType =>
      if (distinct) throw new IllegalArgumentException(
        "avg(DISTINCT duration) is not supported")
      val c = compile(args.head)
      import graft.functions.IntervalFunctions._
      make_interval(lit(0), sum(intervalMonths(c)).cast(IntegerType), lit(0),
        sum(intervalDays(c)).cast(IntegerType), lit(0), lit(0),
        (sum(intervalMicros(c)) / lit(1000000L)).cast(DecimalType(24, 6))) /
        count(c)
    case Func("avg", true, args) =>
      val c = compile(args.head)
      sum_distinct(c) / count_distinct(c)
    case Func("avg", false, args) => avg(compile(args.head))
    case Func("min" | "max", _, args)
        if typeOf(args.head) == CalendarIntervalType =>
      throw new IllegalArgumentException(
        "min()/max() over durations: durations are not orderable " +
          "(month lengths vary)")
    case Func("min", _, args) if isMixedStruct(typeOf(args.head)) =>
      // mixed-family values order by the CIP global sort order, not the
      // tagged struct's field order; min skips nulls (null tag largest)
      val c = compile(args.head)
      min_by(c, mixedOrderKey(c, nullsLargest = true))
    case Func("max", _, args) if isMixedStruct(typeOf(args.head)) =>
      val c = compile(args.head)
      max_by(c, mixedOrderKey(c, nullsLargest = false))
    case Func("min", _, args) if (typeOf(args.head) match {
      case at: ArrayType => arrayNeedsOrderKey(at); case _ => false
    }) =>
      // Spark's array min/max order null elements first; the CIP total
      // order puts them last (min([1,1],[null,3]) = [1,1]). Whole-null
      // lists yield a null key, which min_by/max_by skip — matching
      // aggregate null-skipping.
      val c = compile(args.head)
      min_by(c, arrayOrderKey(c, typeOf(args.head).asInstanceOf[ArrayType]))
    case Func("max", _, args) if (typeOf(args.head) match {
      case at: ArrayType => arrayNeedsOrderKey(at); case _ => false
    }) =>
      val c = compile(args.head)
      max_by(c, arrayOrderKey(c, typeOf(args.head).asInstanceOf[ArrayType]))
    case Func("min", _, args) => min(compile(args.head))
    case Func("max", _, args) => max(compile(args.head))
    case Func("collect", true, args) if isMixedStruct(typeOf(args.head)) =>
      // collect_set over the tagged struct would keep 1 AND 1.0; dedupe
      // by EQUIVALENCE with a fold keeping the first representative.
      // Quadratic in the collected-distinct count — fine: DISTINCT
      // results are small by construction (same buffer bound as
      // percentileDisc, documented in NOTES.md).
      val c = compile(args.head)
      val lst = collect_list(c)
      def eqv(x: Column, y: Column): Column =
        (x.getField("@k") === 0 && y.getField("@k") === 0) ||
          coalesce(mixedPairEq(x, y), lit(false))
      aggregate(lst, array().cast(ArrayType(typeOf(args.head))),
        (acc, x) => when(exists(acc, y => eqv(x, y)), acc)
          .otherwise(concat(acc, array(x))))
    case Func("collect", true, args)
        if isZonedTimeStruct(typeOf(args.head)) =>
      // collect_set over the raw {@zt, off} struct would keep two equal
      // instants with different offsets — dedupe by instant, keeping the
      // first-seen representative (same fold + bound as the mixed case)
      val c = compile(args.head)
      val lst = collect_list(c)
      aggregate(lst, array().cast(ArrayType(typeOf(args.head))),
        (acc, x) => when(
          exists(acc, y => y.getField("@zt") === x.getField("@zt")), acc)
          .otherwise(concat(acc, array(x))))
    case Func("collect", true, args)
        if isZonedDtStruct(typeOf(args.head)) =>
      val c = compile(args.head)
      val lst = collect_list(c)
      aggregate(lst, array().cast(ArrayType(typeOf(args.head))),
        (acc, x) => when(
          exists(acc, y => y.getField("@zdt") === x.getField("@zdt")), acc)
          .otherwise(concat(acc, array(x))))
    case Func("collect", true, args) => collect_set(entityValue(args.head))
    case Func("collect", false, args) => collect_list(entityValue(args.head))
    case Func("stdev", _, args) => coalesce(stddev_samp(compile(args.head)), lit(0.0))
    case Func("stdevp", _, args) => coalesce(stddev_pop(compile(args.head)), lit(0.0))
    // exact interpolated percentile (reference buffers all values in a
    // custom UDAF, PercentileUdafs.scala:39-96 — Spark ≥3.5 has it native)
    case Func("percentilecont", false, args) =>
      checkPercentileArgs("percentileCont", args)
      percentile(compile(args.head), compile(args(1)))
    // DISTINCT variant: interpolate over the sorted distinct values
    // (Spark's native percentile has no DISTINCT form)
    case Func("percentilecont", true, args) =>
      checkPercentileArgs("percentileCont", args)
      val arr = array_sort(collect_set(compile(args.head).cast(DoubleType)))
      val p = compile(args(1))
      val rank = lit(1.0) + p * (size(arr) - 1)
      val lo = floor(rank).cast(IntegerType)
      val vlo = element_at(arr, lo)
      val vhi = element_at(arr, ceil(rank).cast(IntegerType))
      when(size(arr) === 0, lit(null).cast(DoubleType))
        .otherwise(vlo + (rank - floor(rank)) * (vhi - vlo))
    // discrete percentile = the value at rank ⌈p·n⌉ — exact via a sorted
    // group buffer (the reference's PercentileUdafs buffered the same way)
    case Func("percentiledisc", distinct, args) =>
      checkPercentileArgs("percentileDisc", args)
      val c = compile(args.head)
      val p = compile(args(1))
      val arr = array_sort(
        if (distinct) collect_set(c) else collect_list(c))
      try_element_at(arr,
        greatest(ceil(p * size(arr)), lit(1)).cast(IntegerType))
    // sketch aggregates (extension — the 100 TB path where exact
    // percentile/distinct would buffer or double-shuffle): HLL++ and
    // fixed-error percentile approximation, both single-pass mergeable
    case Func("approxcountdistinct", _, args) =>
      approx_count_distinct(compile(args.head))
    case Func("percentileapprox", _, args) =>
      val acc = if (args.size > 2) compile(args(2)) else lit(10000)
      percentile_approx(compile(args.head), compile(args(1)), acc)
    case other =>
      throw new IllegalArgumentException(s"not an aggregate call: $other")
  }

  /** collect(n) over an entity variable gathers VALUE structs — same field
    * convention as the var-length/path materialization (`id`, `labels` |
    * `type`, then properties sorted by name) — so UNWIND + property/
    * labels()/type()/id() access over the collected list works without a
    * join-back. Non-entity arguments compile normally. A null entity
    * (OPTIONAL non-match) yields a null struct, which collect skips per
    * openCypher. */
  private def entityValue(e: Expr): Column = e match {
    case Var(n) if !lambdaEnv.contains(n) => header.get(n) match {
      case Some(nb: NodeBinding) =>
        val lbls = nb.labelCols.toSeq.sortBy(_._1).map { case (l, c) =>
          when(col(s"`$c`"), lit(l)) }
        val labelArr =
          if (lbls.isEmpty) array().cast(ArrayType(StringType))
          else filter(array(lbls: _*), x => x.isNotNull)
        val props = nb.propCols.toSeq.sortBy(_._1).map { case (k, c) =>
          col(s"`$c`").as(k) }
        when(col(s"`${nb.idCol}`").isNotNull,
          struct(col(s"`${nb.idCol}`").as("id") +: labelArr.as("labels") +:
            props: _*))
      case Some(rb: RelBinding) =>
        val props = rb.propCols.toSeq.sortBy(_._1).map { case (k, c) =>
          col(s"`$c`").as(k) }
        when(col(s"`${rb.idCol}`").isNotNull,
          struct(col(s"`${rb.idCol}`").as("id") +:
            col(s"`${rb.typCol}`").as("type") +: props: _*))
      case _ => compile(e)
    }
    case _ => compile(e)
  }
}

object ExprCompiler {
  /** Cypher distance() over two point-struct ({@crs, px, py}) columns —
    * the single source of truth for the formula, shared by the compile()
    * case and the planner's distance-join lowering (which re-applies the
    * exact predicate over ALREADY-BOUND struct columns so the grid-join
    * plan carries attribute references, not a re-inlined expression
    * tree). crs mismatch → null (Neo4j semantics); haversine on Neo4j's
    * earth radius with the c41 oracle's exact operand order. */
  private[graft] def pointDistance(pa: Column, pb: Column): Column = {
    val dx = pa.getField("px") - pb.getField("px")
    val dy = pa.getField("py") - pb.getField("py")
    val cart = sqrt(dx * dx + dy * dy)
    val lat1 = radians(pa.getField("py"))
    val lat2 = radians(pb.getField("py"))
    val sLat = sin(radians(pb.getField("py") - pa.getField("py")) / 2)
    val sLon = sin(radians(pb.getField("px") - pa.getField("px")) / 2)
    val h = sLat * sLat + cos(lat1) * cos(lat2) * sLon * sLon
    val hav = asin(sqrt(h)) * lit(2.0 * 6378140.0)
    when(pa.isNull || pb.isNull ||
      pa.getField("@crs") =!= pb.getField("@crs"),
      lit(null).cast(DoubleType))
      .when(pa.getField("@crs") === "cartesian", cart)
      .otherwise(hav)
  }

  /** ISO time-of-day string -> (micros of day, offset seconds option);
    * shared by the expression compiler and the CREATE-fixture literal
    * evaluator. */
  private[graft] def parseIsoTime(s0: String): (Long, Option[Int]) = {
    val s = s0.trim
    def bail(): Nothing = throw new IllegalArgumentException(
      s"invalid ISO time-of-day: '$s0' (expected HH[:MM[:SS[.fff]]] " +
        "or compact HHMMSS, with an optional Z or +/-HH[:MM] offset)")
    // 'Z'/'z' both mean UTC (ISO-8601 is case-insensitive here)
    val offRe = "([+-]\\d{2}(:?\\d{2})?|[Zz])$".r
    val (body, off) = offRe.findFirstIn(s) match {
      case Some("Z") | Some("z") => (s.dropRight(1), Some(0))
      case Some(o) =>
        val sign = if (o.startsWith("-")) -1 else 1
        val digits = o.drop(1).replace(":", "")
        val h = digits.take(2).toInt
        val m = if (digits.length > 2) digits.drop(2).toInt else 0
        (s.dropRight(o.length), Some(sign * (h * 3600 + m * 60)))
      case None => (s, None)
    }
    val normalized =
      if (body.contains(":")) body
      else body.takeWhile(_ != '.').length match {
        // compact bodies: HH / HHMM / HHMMSS[.fff] only
        case 2 => body + ":00"
        case 4 => body.take(2) + ":" + body.drop(2)
        case 6 => body.take(2) + ":" + body.slice(2, 4) + ":" + body.drop(4)
        case _ => bail()
      }
    val t =
      try java.time.LocalTime.parse(normalized)
      catch { case _: java.time.format.DateTimeParseException => bail() }
    (t.toNanoOfDay / 1000L, off)
  }

  /** ISO date string → LocalDate: extended/compact calendar dates,
    * ISO week dates (2015-W30-2, 2015W302, 2015-W30), ordinal dates
    * (2015-202, 2015202), year-month, bare year. Shared by the compiler
    * and the CREATE-fixture literal evaluator. */
  private[graft] def parseIsoDate(s0: String): java.time.LocalDate = {
    import java.time.LocalDate
    import java.time.format.DateTimeFormatter
    val s = s0.trim
    if (s.matches("\\d{4}-?W\\d{2}(-?\\d)?")) {
      val norm0 = if (s.contains("-W")) s
        else s.substring(0, 4) + "-" + s.substring(4)
      val norm1 = norm0.replaceAll("W(\\d{2})(\\d)$", "W$1-$2")
      val norm = if (norm1.matches(".*W\\d{2}$")) norm1 + "-1" else norm1
      LocalDate.parse(norm, DateTimeFormatter.ISO_WEEK_DATE)
    }
    else if (s.matches("\\d{4}-\\d{3}"))
      LocalDate.ofYearDay(s.take(4).toInt, s.drop(5).toInt)
    else if (s.matches("\\d{7}"))
      LocalDate.ofYearDay(s.take(4).toInt, s.drop(4).toInt)
    else if (s.matches("\\d{8}"))
      LocalDate.parse(s, DateTimeFormatter.BASIC_ISO_DATE)
    else if (s.matches("\\d{4}-\\d{2}")) LocalDate.parse(s + "-01")
    else if (s.matches("\\d{4}")) LocalDate.of(s.toInt, 1, 1)
    else LocalDate.parse(s)
  }

  /** offset seconds → "Z" / "+HH:MM" / "-HH:MM" (plan-side twin of the
    * columnar renderOffset). */
  private[graft] def renderOffsetStr(offSec: Int): String =
    if (offSec == 0) "Z"
    else {
      val sign = if (offSec < 0) "-" else "+"
      val a = math.abs(offSec)
      f"$sign${a / 3600}%02d:${a % 3600 / 60}%02d"
    }

  /** ISO zoned datetime string → (UTC instant, offset seconds, zone id).
    * Accepts `<date>[T<time>[<offset>]][\[<zone>\]]` where <date> takes
    * every form [[parseIsoDate]] does and <time> every form
    * [[parseIsoTime]] does. Zone resolution, like Neo4j: an explicit
    * offset is authoritative for the instant (the zone is kept for
    * rendering/arithmetic); a named zone alone resolves via its rules
    * (gap/overlap → the zone's default offset); neither → UTC. */
  private[graft] def parseIsoZonedDatetime(s0: String)
      : (java.time.Instant, Int, String) = {
    val s = s0.trim
    val zoneRe = "^(.*?)\\[([^\\]]+)\\]$".r
    val (body, zname) = s match {
      case zoneRe(b, z) => (b, Some(z))
      case _ => (s, None)
    }
    val ti = body.indexOf('T')
    val (dStr, tStr) =
      if (ti < 0) (body, "") else (body.take(ti), body.drop(ti + 1))
    val ld = parseIsoDate(dStr)
    val (mic, offOpt) =
      if (tStr.isEmpty) (0L, None) else parseIsoTime(tStr)
    val lt = java.time.LocalTime.ofNanoOfDay(mic * 1000L)
    val ldt = java.time.LocalDateTime.of(ld, lt)
    zname match {
      case Some(z) =>
        val zone = java.time.ZoneId.of(z)
        val off = offOpt.map(java.time.ZoneOffset.ofTotalSeconds)
          .getOrElse(zone.getRules.getOffset(ldt))
        (ldt.toInstant(off), off.getTotalSeconds, z)
      case None =>
        val off = offOpt.getOrElse(0)
        (ldt.toInstant(java.time.ZoneOffset.ofTotalSeconds(off)), off,
          renderOffsetStr(off))
    }
  }

  /** duration({...}) map components (Neo4j's accepted set); unknown keys
    * error instead of silently contributing nothing. */
  private[graft] val durationComponents: Set[String] = Set("years",
    "quarters", "months", "weeks", "days", "hours", "minutes", "seconds",
    "milliseconds", "microseconds", "nanoseconds")

  val aggregateNames: Set[String] = Set("count", "sum", "avg", "min", "max",
    "collect", "stdev", "stdevp", "percentilecont", "percentiledisc",
    "approxcountdistinct", "percentileapprox")

  // ------------------------------------------- UNION column alignment
  /** UNION branches may type the same column with different families
    * (Cypher columns are dynamically typed; `RETURN n.k UNION ALL RETURN
    * n.s` is legal). Columns whose branch types span more than one atomic
    * family compile to the tagged-union struct on every branch, instead of
    * letting unionByName insert a crashing cast. Integral branches keep
    * the integer tag (`RETURN 1 UNION ALL RETURN 'a'` preserves `1`, not
    * `1.0`); UNION-distinct still collapses 1 and 1.0 into one row because
    * the dedup keys on the openCypher EQUIVALENCE struct (numbers
    * normalized to double), keeping the lowest-tag (integer)
    * representative — see [[Planner.plan]]. All-numeric unions stay on the
    * documented Long→Double unionByName widening (no tagging). */
  def unionAlignMixed(dfs: Seq[DataFrame]): Seq[DataFrame] = {
    def fam(t: DataType): Option[String] = t match {
      case NullType => Some("null")
      case _: NumericType => Some("num")
      case StringType => Some("str")
      case BooleanType => Some("bool")
      case _ => None
    }
    val names = dfs.head.columns.toSeq
    // a UNION column mixing a single-purpose-encoded value (point,
    // temporal struct, duration) with a DIFFERENT family has no common
    // encoding — a typed error beats Spark's raw
    // INCOMPATIBLE_COLUMN_TYPE (round 8; atomic mixes take the tagged
    // union below, all-numeric columns widen)
    def specialName(t: DataType): Option[String] = t match {
      case st: StructType if st.fieldNames.sameElements(
        Array("@crs", "px", "py")) => Some("POINT")
      case st: StructType if st.fieldNames.headOption.contains("@zdt") =>
        Some("DATETIME")
      case st: StructType if st.fieldNames.headOption.contains("@zt") =>
        Some("TIME")
      case st: StructType if st.fieldNames.headOption.contains("@lt") =>
        Some("LOCALTIME")
      case CalendarIntervalType => Some("DURATION")
      case DateType => Some("DATE")
      case TimestampNTZType => Some("LOCALDATETIME")
      case _ => None
    }
    names.foreach { n =>
      val ts = dfs.map(_.schema(n).dataType).filterNot(_ == NullType)
        .distinct
      if (ts.size > 1) {
        // same special kind on every branch is fine (nullability may
        // differ); a special kind next to anything else is not
        val specials = ts.map(specialName)
        if (specials.exists(_.isDefined) && specials.distinct.size > 1)
          throw new IllegalArgumentException(
            s"UNION column `$n` mixes incompatible value types: " +
              ts.map(t => specialName(t).getOrElse(t.simpleString))
                .mkString(" vs ") +
              " (points/temporals only union with their own type)")
      }
    }
    val needMixed = names.filter { n =>
      val fams = dfs.map(df => fam(df.schema(n).dataType))
      fams.forall(_.isDefined) &&
        fams.flatten.filterNot(_ == "null").distinct.size > 1
    }.toSet
    if (needMixed.isEmpty) return dfs
    def tagged(c: Column, t: DataType): Column = {
      def nl(dt: DataType) = lit(null).cast(dt)
      val (tag, i, f, s, b) = t match {
        case NullType =>
          (lit(0), nl(LongType), nl(DoubleType), nl(StringType),
            nl(BooleanType))
        case DoubleType | FloatType | _: DecimalType =>
          (lit(2), nl(LongType), c.cast(DoubleType), nl(StringType),
            nl(BooleanType))
        case _: NumericType => // integral branches keep the integer tag
          (lit(1), c.cast(LongType), nl(DoubleType), nl(StringType),
            nl(BooleanType))
        case StringType =>
          (lit(3), nl(LongType), nl(DoubleType), c, nl(BooleanType))
        case _ =>
          (lit(4), nl(LongType), nl(DoubleType), nl(StringType), c)
      }
      struct(when(c.isNull, 0).otherwise(tag).as("@k"), i.as("i"),
        f.as("f"), s.as("s"), b.as("b"))
    }
    dfs.map { df =>
      df.select(df.columns.toSeq.map { n =>
        val c = col(s"`$n`")
        if (needMixed(n)) tagged(c, df.schema(n).dataType).as(n) else c
      }: _*)
    }
  }

  // ------------------------------------------------------- named paths
  // A path is rendered from id columns the pattern already carries:
  // nodes(p)/relationships(p)/length(p) are pure column combinations —
  // no extra scan, join, or shuffle.
  private def emptyIds: Column = array().cast(ArrayType(LongType, false))

  /** a path is null (OPTIONAL MATCH non-match) iff any of its element ids
    * is: on a non-match the unshared rel/node columns come back null from
    * the left-outer join (a matched zero-length segment is an EMPTY list,
    * never null, so this misfires on no real path). */
  private def nullGuard(pb: PathBinding, c: Column): Column = {
    val ids = pb.nodeIdCols.map(n => col(s"`$n`")) ++ pb.segs.map {
      case SingleSeg(r) => col(s"`$r`")
      case VarSeg(l, _) => col(s"`$l`")
    } ++ pb.presenceCol.map(n => col(s"`$n`")) // optional-miss marker
    when(ids.map(_.isNull).reduce(_ || _), lit(null)).otherwise(c)
  }

  /** ordered node ids: [n0] ++ innerNodes(seg0) ++ [n1] ++ ... A
    * zero-length var segment traverses nothing (dst IS src), so it
    * contributes no node — openCypher: a length-0 path has one node. */
  def pathNodes(pb: PathBinding): Column = {
    val head = array(col(s"`${pb.nodeIdCols.head}`"))
    val pieces = pb.segs.zipWithIndex.map { case (seg, i) =>
      val dst = array(col(s"`${pb.nodeIdCols(i + 1)}`"))
      seg match {
        case _: SingleSeg => dst
        case VarSeg(l, inner) =>
          when(size(col(s"`$l`")) === 0, emptyIds)
            .otherwise(concat(col(s"`$inner`"), dst))
      }
    }
    nullGuard(pb, if (pieces.isEmpty) head else concat(head +: pieces: _*))
  }

  /** ordered relationship ids across all segments. */
  def pathRels(pb: PathBinding): Column =
    nullGuard(pb,
      if (pb.segs.isEmpty) emptyIds
      else concat(pb.segs.map {
        case SingleSeg(r) => array(col(s"`$r`"))
        case VarSeg(l, _) => col(s"`$l`")
      }: _*))

  /** length(p) = number of relationships. */
  def pathLength(pb: PathBinding): Column =
    nullGuard(pb, pb.segs.map {
      case SingleSeg(_) => lit(1L)
      case VarSeg(l, _) => size(col(s"`$l`")).cast(LongType)
    }.foldLeft(lit(0L))(_ + _))

  /** a path value rendered as a struct of its node and rel id lists. */
  def pathStruct(pb: PathBinding): Column =
    nullGuard(pb,
      struct(pathNodes(pb).as("@nodes"), pathRels(pb).as("@rels")))
}

/** Plan-time ISO-8601 duration parser (`P1Y2M3W4DT5H6M7.5S`) — own
  * implementation of the standard grammar (reference parses the same form
  * in okapi-api/.../temporal/Duration.scala). */
object IsoDuration {
  case class Parts(years: Int, months: Int, days: Int, hours: Int,
      minutes: Int, seconds: Double)
  private val Re =
    """P(?:(\d+)Y)?(?:(\d+)M)?(?:(\d+)W)?(?:(\d+)D)?(?:T(?:(\d+)H)?(?:(\d+)M)?(?:(\d+(?:\.\d+)?)S)?)?""".r
  def parse(s: String): Parts = s match {
    case Re(y, mo, w, d, h, mi, sec) =>
      def i(x: String) = Option(x).map(_.toInt).getOrElse(0)
      Parts(i(y), i(mo), i(w) * 7 + i(d), i(h), i(mi),
        Option(sec).map(_.toDouble).getOrElse(0.0))
    case _ => throw new IllegalArgumentException(
      s"invalid ISO-8601 duration: $s")
  }
}
