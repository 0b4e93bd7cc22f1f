package graft.plans

import scala.collection.immutable.ListMap

/** The expr→column bookkeeping that makes "entity = group of columns" work
  * in a flat DataFrame (idea from the reference's RecordHeader,
  * okapi-relational/.../impl/table/RecordHeader.scala:62 — our own, simpler
  * formulation: a binding per visible variable, each owning its columns).
  */
sealed trait Binding { def columns: Seq[String] }

/** plain value (projected expression, unwound item, ...). */
case class ValueBinding(col: String) extends Binding {
  def columns: Seq[String] = Seq(col)
}

/** node variable: id column + one boolean column per possible label + one
  * column per possible property. `labels` = labels known true. */
case class NodeBinding(idCol: String, labelCols: Map[String, String],
    propCols: Map[String, String], labels: Set[String]) extends Binding {
  def columns: Seq[String] =
    idCol +: (labelCols.toSeq.sortBy(_._1).map(_._2) ++
      propCols.toSeq.sortBy(_._1).map(_._2))
}

/** relationship variable: id/src/dst/type + property columns. src/dst
  * are always STORAGE orientation (orientedRelScan traverses via separate
  * columns), so startNode()/endNode() are direction-independent.
  * `endpointVars`: the pattern's endpoint node variables — in storage
  * order when `oriented`, in written (left, right) order for undirected
  * matches — letting `startNode(r).prop` resolve to the bound endpoint's
  * property columns without a join. */
case class RelBinding(idCol: String, srcCol: String, dstCol: String,
    typCol: String, propCols: Map[String, String], types: Set[String],
    endpointVars: Option[(String, String)] = None, oriented: Boolean = true)
    extends Binding {
  def columns: Seq[String] =
    Seq(idCol, srcCol, dstCol, typCol) ++ propCols.toSeq.sortBy(_._1).map(_._2)
}

/** var-length relationship variable: a list-of-rel-ids column, plus —
  * when some expression in the query reads the relationships as VALUES
  * (`[r IN rs | r.prop]`, `reduce`, `UNWIND rs`, returning `rs`) — a
  * parallel list of (id, type, properties…) structs built during the
  * unroll. The id list stays the uniqueness/path currency; the struct
  * list is only materialized on demand (it widens every unrolled row). */
case class RelListBinding(col: String, types: Set[String],
    structCol: Option[String] = None,
    innerNodesCol: Option[String] = None) extends Binding {
  // innerNodesCol: interior node ids, materialized only for NAMED paths.
  // It must live on the binding — the enclosing PathBinding exists only
  // after the whole chain is planned, and a LATER var-length hop's
  // select(header.columns ++ its-own-new-columns) would otherwise drop
  // an earlier hop's inner list (differential hunt 32296: r1_inner
  // unresolved once UNWIND re-selected the header columns).
  def columns: Seq[String] = (col +: structCol.toSeq) ++ innerNodesCol
}

/** one relationship segment of a named path. */
sealed trait PathSeg { def columns: Seq[String] }
/** single-hop segment: the relationship's id column. */
case class SingleSeg(relIdCol: String) extends PathSeg {
  def columns: Seq[String] = Seq(relIdCol)
}
/** var-length segment: traversed rel ids + interior node ids, in order. */
case class VarSeg(relListCol: String, innerNodesCol: String) extends PathSeg {
  def columns: Seq[String] = Seq(relListCol, innerNodesCol)
}

/** named path (`p = (a)-[r]->(b)`): ordered node-id columns interleaved
  * with relationship segments. Columns are shared with the pattern-element
  * bindings (Header.columns dedups); a projection that keeps only the path
  * therefore keeps exactly the id/list columns it needs — no payload.
  * The reference blacklists paths in its TCK run; this engine supports
  * length/nodes/relationships and path rendering as an extension.
  * `nodeValsCol`: set when some expression iterates nodes(p) VALUES
  * (planner demand analysis) — an ordered (id, labels, props…) struct
  * list materialized by one explode→join→collect pass. */
case class PathBinding(nodeIdCols: Seq[String], segs: Seq[PathSeg],
    nodeValsCol: Option[String] = None,
    presenceCol: Option[String] = None) extends Binding {
  // presenceCol: set by planOptionalMatch — lit(true) on the matched side
  // of the left-outer join, null on a miss. Needed because a path over
  // ALREADY-BOUND pattern elements shares only the outer row's (non-null)
  // columns, so the miss would otherwise be invisible to the path null
  // guard (differential hunt 31400: `OPTIONAL MATCH p = (bound)` with a
  // false WHERE returned length(p) = 0 instead of null).
  def columns: Seq[String] =
    (nodeIdCols ++ segs.flatMap(_.columns) ++ nodeValsCol ++
      presenceCol).distinct
}

case class Header(bindings: ListMap[String, Binding]) {
  def apply(v: String): Binding = bindings.getOrElse(v,
    throw new IllegalArgumentException(
      s"Variable `$v` not defined. In scope: ${bindings.keys.mkString(", ")}"))
  def get(v: String): Option[Binding] = bindings.get(v)
  def contains(v: String): Boolean = bindings.contains(v)
  def columns: Seq[String] = bindings.values.flatMap(_.columns).toSeq.distinct
  def +(kv: (String, Binding)): Header = Header(bindings + kv)
  def vars: Seq[String] = bindings.keys.toSeq
}

object Header {
  val empty: Header = Header(ListMap.empty)
}
