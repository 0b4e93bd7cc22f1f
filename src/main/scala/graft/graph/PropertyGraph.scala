package graft.graph

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Element tables: one DataFrame per node-label-combination / rel type.
  * (Data model follows the reference's ScanGraph —
  * okapi-relational/.../impl/graph/ScanGraph.scala:43 — re-expressed for
  * Spark: LongType ids everywhere, no binary encoding; see SURVEY §1.5.)
  *
  * Contract: node ids are globally unique across ALL node tables of the
  * graph; rel ids across all rel tables. Builders that derive graphs from
  * foreign keys (e.g. [[graft.sources.TpchGraph]]) guarantee this with
  * tag-bits in the upper byte of the id.
  */
case class NodeTable(labels: Set[String], df: DataFrame, idCol: String,
    propCols: Map[String, String])

case class RelTable(relType: String, df: DataFrame, idCol: String,
    srcCol: String, dstCol: String, propCols: Map[String, String])

/** Materialized `(src)-[:REL]->(dst)` pattern table: the denormalized
  * three-way join stored/persisted once, so every hot traversal over it
  * costs ONE probe join instead of two (reference: NodeRelPattern /
  * TripletPattern, okapi-api Pattern.scala:159-199, consumed by
  * LogicalOptimizer.scala:67-134). Built by
  * [[PropertyGraph.withTriplet]] or registered pre-built (e.g. loaded
  * from parquet) via [[PropertyGraph.withTripletTable]].
  *
  * Label/prop column maps mirror the node/rel scans that defined it;
  * `src*`/`dst*` follow storage direction (src → dst).
  */
case class TripletTable(relType: String, srcLabels: Set[String],
    dstLabels: Set[String], df: DataFrame,
    relIdCol: String, srcIdCol: String, dstIdCol: String,
    relPropCols: Map[String, String],
    srcPropCols: Map[String, String], dstPropCols: Map[String, String],
    srcLabelCols: Map[String, String], dstLabelCols: Map[String, String])

/** Materialized 2-element pattern table — node + relationship denormalized
  * into one scan (reference: NodeRelPattern, okapi-api Pattern.scala:159-176).
  * `nodeOnSrc = true` stores `(n:labels)-[:relType]->`; `false` stores
  * `-[:relType]->(n:labels)`. Cheaper to build and hold than a full
  * [[TripletTable]] (no second node join, no far-side property columns) and
  * still removes one join from covered traversals: a pattern start binds
  * node + rel from ONE scan, a mid-chain hop binds rel + target node with a
  * single probe. The far endpoint travels as a bare id column. */
case class NodeRelTable(relType: String, nodeLabels: Set[String],
    nodeOnSrc: Boolean, df: DataFrame,
    relIdCol: String, srcIdCol: String, dstIdCol: String,
    relPropCols: Map[String, String],
    nodeLabelCols: Map[String, String], nodePropCols: Map[String, String])

object SparkTypes {
  /** Cypher-compatible normalization: integers widen to Long, Float to
    * Double, array elements recursively (reference:
    * SparkConversions.scala:164-169). */
  def normalize(dt: DataType): DataType = dt match {
    case ByteType | ShortType | IntegerType => LongType
    case FloatType => DoubleType
    case ArrayType(e, n) => ArrayType(normalize(e), n)
    case other => other
  }

  /** Join of two Spark types for union alignment — a proper (associative,
    * commutative) lattice with NullType as bottom and StringType as top;
    * laws checked exhaustively in TypeLatticeSpec. */
  def widen(a: DataType, b: DataType): DataType = (normalize(a), normalize(b)) match {
    case (x, y) if x == y => x
    case (NullType, y) => y
    case (x, NullType) => x
    // exact joins first (reference: CTBigDecimal, CypherType.scala:332 —
    // money-typed properties must not silently lose exactness): two
    // decimals, or a decimal and a long, meet at the smallest decimal
    // that holds both; only a 38-digit overflow falls to Double
    case (d1: DecimalType, d2: DecimalType) =>
      decimalJoin(d1.precision, d1.scale, d2.precision, d2.scale)
    case (LongType, d: DecimalType) => decimalJoin(20, 0, d.precision, d.scale)
    case (d: DecimalType, LongType) => decimalJoin(20, 0, d.precision, d.scale)
    // numeric join: any other two distinct numeric types meet at Double
    case (x, y) if isNumeric(x) && isNumeric(y) => DoubleType
    case (DateType, TimestampType) | (TimestampType, DateType) => TimestampType
    case (ArrayType(x, nx), ArrayType(y, ny)) => ArrayType(widen(x, y), nx || ny)
    case _ => StringType
  }

  private def isNumeric(dt: DataType): Boolean = dt match {
    case LongType | DoubleType | _: DecimalType => true
    case _ => false
  }

  private def decimalJoin(p1: Int, s1: Int, p2: Int, s2: Int): DataType = {
    val scale = math.max(s1, s2)
    val intDigits = math.max(p1 - s1, p2 - s2)
    if (intDigits + scale <= DecimalType.MAX_PRECISION)
      DecimalType(intDigits + scale, scale)
    else DoubleType
  }
}

/** Declared/derived topology constraint: relationships of `relType` only
  * connect `srcLabels`-combination nodes to `dstLabels`-combination nodes
  * (reference: okapi-api SchemaPattern.scala; used there to pick
  * denormalized scans). Planners use the registry to PRUNE — e.g. the
  * path node-value lookup unions only label combinations reachable via
  * the pattern's relationship types instead of every node table. */
case class SchemaPattern(srcLabels: Set[String], relType: String,
    dstLabels: Set[String])

class PropertyGraph(
    val nodeTables: Seq[NodeTable],
    val relTables: Seq[RelTable],
    val spark: SparkSession,
    val tripletTables: Seq[TripletTable] = Nil,
    val nodeRelTables: Seq[NodeRelTable] = Nil,
    val schemaPatterns: Seq[SchemaPattern] = Nil) {

  import SparkTypes._

  def allLabels: Set[String] = nodeTables.flatMap(_.labels).toSet
  def allRelTypes: Set[String] = relTables.map(_.relType).toSet

  /** Static graph schema (reference: `PropertyGraph.schema`,
    * okapi-api PropertyGraph.scala:52): label combinations, typed
    * property keys per combination / relationship type, declared schema
    * patterns. Pure schema analysis — no job runs; property types are
    * lattice-normalized, same-combination tables union their keys with
    * widened types. */
  def schema: GraphSchema = {
    import SparkTypes._
    def propTypes(tables: Seq[(DataFrame, Map[String, String])])
        : Map[String, DataType] =
      tables.flatMap { case (df, props) =>
        props.toSeq.map { case (k, c) => k -> normalize(dtOf(df, c)) }
      }.groupBy(_._1).map { case (k, ts) =>
        k -> ts.map(_._2).reduce(widen) }
    GraphSchema(
      labelCombinations = nodeTables.map(_.labels).toSet,
      relationshipTypes = allRelTypes,
      nodeProps = nodeTables.groupBy(_.labels).map { case (ls, ts) =>
        ls -> propTypes(ts.map(t => (t.df, t.propCols))) },
      relProps = relTables.groupBy(_.relType).map { case (t, ts) =>
        t -> propTypes(ts.map(r => (r.df, r.propCols))) },
      explicitSchemaPatterns = schemaPatterns.toSet)
  }

  private def dtOf(df: DataFrame, col: String): DataType =
    df.schema(col).dataType

  /** union of property keys → widened Spark type over a set of tables. */
  private def unifiedProps(tables: Seq[(DataFrame, Map[String, String])])
      : Seq[(String, DataType)] = {
    val keyTypes = scala.collection.mutable.LinkedHashMap.empty[String, DataType]
    tables.foreach { case (df, props) =>
      props.foreach { case (k, c) =>
        val t = normalize(dtOf(df, c))
        keyTypes(k) = keyTypes.get(k).map(widen(_, t)).getOrElse(t)
      }
    }
    keyTypes.toSeq
  }

  /** Node scan aligned to a canonical layout:
    * one id col, one boolean col per possible label, one col per property.
    * Returns (df, labelCol-by-label, propCol-by-key) with caller-supplied
    * column names from `naming`.
    */
  /** Canonical node records for variable `name` (reference API:
    * PropertyGraph.nodes, okapi-api PropertyGraph.scala:69): one row per
    * node whose labels cover `labels`, columns `name` (id),
    * `name:LABEL` booleans, `name.prop` values — the same layout the
    * planner's scans use. `exactLabelMatch` restricts to nodes whose
    * label set equals `labels` exactly. */
  def nodes(name: String, labels: Set[String] = Set.empty,
      exactLabelMatch: Boolean = false): DataFrame = {
    val naming = ScanNaming(name, "", "", "",
      p => s"$name.$p", l => s"$name:$l")
    val combos = if (exactLabelMatch) Some(Set(labels)) else None
    nodeScan(labels, naming, combos).df
  }

  /** Canonical relationship records for variable `name` (reference API:
    * PropertyGraph.relationships, okapi-api PropertyGraph.scala:78):
    * columns `name` (id), `name.src`, `name.dst`, `name.type`,
    * `name.prop` values. Empty `types` means all relationship types. */
  def relationships(name: String, types: Seq[String] = Nil): DataFrame = {
    val naming = ScanNaming(name, s"$name.src", s"$name.dst", s"$name.type",
      p => s"$name.$p", l => s"$name:$l")
    relScan(if (types.isEmpty) allRelTypes.toSeq.sorted else types, naming).df
  }

  def nodeScan(requiredLabels: Set[String], naming: ScanNaming,
      combos: Option[Set[Set[String]]] = None): ScanResult = {
    // combos (from the schema-pattern registry) restricts to exact label
    // combinations — requiredLabels remains the subset-coverage filter
    val tables = nodeTables.filter(t => requiredLabels.subsetOf(t.labels) &&
      combos.forall(_.contains(t.labels)))
    val scanLabels = if (tables.isEmpty) requiredLabels else tables.flatMap(_.labels).toSet
    val props = unifiedProps(tables.map(t => (t.df, t.propCols)))
    val labelCols = scanLabels.toSeq.sorted.map(l => l -> naming.labelCol(l)).toMap
    val propColNames = props.map { case (k, _) => k -> naming.propCol(k) }.toMap

    if (tables.isEmpty) {
      val fields = StructField(naming.idCol, LongType) +:
        (labelCols.toSeq.sortBy(_._1).map(lc => StructField(lc._2, BooleanType)) ++
          props.map { case (k, t) => StructField(propColNames(k), t) })
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], StructType(fields))
      return ScanResult(empty, naming.idCol, labelCols, propColNames, scanLabels)
    }

    val aligned = tables.map { t =>
      val idC = t.df.col(t.idCol).cast(LongType).as(naming.idCol)
      val lblCs = labelCols.toSeq.sortBy(_._1).map { case (l, cName) =>
        lit(t.labels.contains(l)).as(cName) }
      val propCs = props.map { case (k, dt) =>
        t.propCols.get(k) match {
          case Some(c) => t.df.col(c).cast(dt).as(propColNames(k))
          case None => lit(null).cast(dt).as(propColNames(k))
        }
      }
      t.df.select((idC +: lblCs) ++ propCs: _*)
    }
    ScanResult(aligned.reduce(_ unionByName _), naming.idCol, labelCols,
      propColNames, scanLabels)
  }

  /** Relationship scan aligned to id/src/dst/type + unified props. */
  def relScan(types: Seq[String], naming: ScanNaming): RelScanResult = {
    val tables =
      if (types.isEmpty) relTables
      else relTables.filter(t => types.contains(t.relType))
    val props = unifiedProps(tables.map(t => (t.df, t.propCols)))
    val propColNames = props.map { case (k, _) => k -> naming.propCol(k) }.toMap

    if (tables.isEmpty) {
      val fields = Seq(
        StructField(naming.idCol, LongType), StructField(naming.srcCol, LongType),
        StructField(naming.dstCol, LongType), StructField(naming.typCol, StringType)) ++
        props.map { case (k, t) => StructField(propColNames(k), t) }
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], StructType(fields))
      return RelScanResult(empty, naming.idCol, naming.srcCol, naming.dstCol,
        naming.typCol, propColNames, types.toSet)
    }

    val aligned = tables.map { t =>
      val base = Seq(
        t.df.col(t.idCol).cast(LongType).as(naming.idCol),
        t.df.col(t.srcCol).cast(LongType).as(naming.srcCol),
        t.df.col(t.dstCol).cast(LongType).as(naming.dstCol),
        lit(t.relType).as(naming.typCol))
      val propCs = props.map { case (k, dt) =>
        t.propCols.get(k) match {
          case Some(c) => t.df.col(c).cast(dt).as(propColNames(k))
          case None => lit(null).cast(dt).as(propColNames(k))
        }
      }
      t.df.select(base ++ propCs: _*)
    }
    RelScanResult(aligned.reduce(_ unionByName _), naming.idCol, naming.srcCol,
      naming.dstCol, naming.typCol, propColNames, tables.map(_.relType).toSet)
  }

  /** Build and register the materialized `(:src)-[:relType]->(:dst)`
    * pattern table (reference: recognized patterns consumed by
    * LogicalOptimizer.replaceScansWithRecognizedPatterns). The planner
    * then answers covered one-hop expands with a single probe join.
    * Persisted MEMORY_AND_DISK by default; pass `persist = false` to
    * keep it a lazy view (e.g. when writing it to parquet instead).
    *
    * 100 TB knobs: `storageLevel` picks the cache tier (e.g.
    * DISK_ONLY for a triplet that is hot but too wide for executor
    * memory), and `compressed` overrides the session's in-memory
    * columnar compression for THIS materialization only — the session
    * default trades memory for CPU (GraftSession disables compression,
    * measured 6× encode tax), which is wrong for a huge mostly-cold
    * triplet where storage dominates. */
  def withTriplet(relType: String, srcLabels: Set[String],
      dstLabels: Set[String], persist: Boolean = true,
      storageLevel: org.apache.spark.storage.StorageLevel =
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK,
      compressed: Option[Boolean] = None): PropertyGraph = {
    def nm(p: String) = ScanNaming(s"${p}_id", s"${p}_src", s"${p}_dst",
      s"${p}_type", k => s"${p}_p_$k", l => s"${p}_l_$l")
    val s = nodeScan(srcLabels, nm("src"))
    val r = relScan(Seq(relType), nm("rel"))
    val d = nodeScan(dstLabels, nm("dst"))
    val joined = s.df
      .join(r.df, col("src_id") === col(r.srcCol), "inner")
      .join(d.df, col(r.dstCol) === col("dst_id"), "inner")
      .drop(r.srcCol, r.dstCol, r.typCol)
    val df = if (persist) PropertyGraph.persistWith(
      joined, storageLevel, compressed) else joined
    withTripletTable(TripletTable(relType, srcLabels, dstLabels, df,
      r.idCol, "src_id", "dst_id", r.propCols, s.propCols, d.propCols,
      s.labelCols, d.labelCols))
  }

  def withTripletTable(t: TripletTable): PropertyGraph =
    new PropertyGraph(nodeTables, relTables, spark, tripletTables :+ t,
      nodeRelTables, schemaPatterns) // a derived table adds no topology

  /** Build and register a materialized [[NodeRelTable]]: the node scan for
    * `nodeLabels` pre-joined onto the `relType` scan's source
    * (`nodeOnSrc = true`) or target side. Same consolidation idea as
    * [[withTriplet]] at roughly half the storage cost — use it when only
    * one side of a hot traversal benefits from denormalization. */
  def withNodeRel(relType: String, nodeLabels: Set[String],
      nodeOnSrc: Boolean = true, persist: Boolean = true,
      storageLevel: org.apache.spark.storage.StorageLevel =
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK,
      compressed: Option[Boolean] = None): PropertyGraph = {
    def nm(p: String) = ScanNaming(s"${p}_id", s"${p}_src", s"${p}_dst",
      s"${p}_type", k => s"${p}_p_$k", l => s"${p}_l_$l")
    val n = nodeScan(nodeLabels, nm("nr"))
    val r = relScan(Seq(relType), nm("rel"))
    val nearEnd = if (nodeOnSrc) r.srcCol else r.dstCol
    val joined = n.df
      .join(r.df, col("nr_id") === col(nearEnd), "inner")
      .drop(nearEnd, r.typCol)
    val df = if (persist) PropertyGraph.persistWith(
      joined, storageLevel, compressed) else joined
    val (srcId, dstId) =
      if (nodeOnSrc) ("nr_id", r.dstCol) else (r.srcCol, "nr_id")
    withNodeRelTable(NodeRelTable(relType, nodeLabels, nodeOnSrc, df,
      r.idCol, srcId, dstId, r.propCols, n.labelCols, n.propCols))
  }

  def withNodeRelTable(t: NodeRelTable): PropertyGraph =
    new PropertyGraph(nodeTables, relTables, spark, tripletTables,
      nodeRelTables :+ t, schemaPatterns)

  /** property keys a node with these labels may carry (for `keys()` etc). */
  def nodePropertyKeys(requiredLabels: Set[String]): Seq[String] =
    unifiedProps(nodeTables.filter(t => requiredLabels.subsetOf(t.labels))
      .map(t => (t.df, t.propCols))).map(_._1)

  /** Union of two graphs (GraphUnionAll, SURVEY §2.1). Ids must already be
    * disjoint — tag-bit id spaces (see class doc) or [[prefixIdSpace]]
    * when they are not. */
  def unionAll(other: PropertyGraph): PropertyGraph =
    // triplet/node-rel tables are NOT carried over: a union can add node
    // tables that widen a label scan, invalidating a coverage claim.
    // Schema patterns survive only when BOTH sides declare a registry —
    // an undeclared side's rels are unconstrained, and keeping just one
    // side's patterns would falsely constrain them.
    new PropertyGraph(nodeTables ++ other.nodeTables,
      relTables ++ other.relTables, spark,
      schemaPatterns =
        if (schemaPatterns.nonEmpty && other.schemaPatterns.nonEmpty)
          (schemaPatterns ++ other.schemaPatterns).distinct
        else Nil)

  /** Incremental merge (upsert) — the reference's Neo4jGraphMerge
    * semantics (`sync/Neo4jGraphMerge.scala`), storage-agnostic: an
    * element of `updates` REPLACES the existing element with the same id
    * in the same label-combination / relationship-type table; existing
    * elements not re-stated persist; tables new to `updates` are added.
    * Property schemas union per table (a side missing a property
    * contributes nulls of the other side's type). Each merged table is
    * one anti-join + union-by-name: at 100 TB the shuffle is on the
    * 8-byte id, and untouched tables aren't rewritten at all. */
  def merge(updates: PropertyGraph): PropertyGraph = {
    def nullOf(dt: org.apache.spark.sql.types.DataType) = lit(null).cast(dt)

    def mergeTables[T](existing: Seq[T], updated: Seq[T], key: T => AnyRef,
        ord: T => String, combine: (T, T) => T): Seq[T] = {
      val e = existing.map(t => key(t) -> t).toMap
      val u = updated.map(t => key(t) -> t).toMap
      (e.keySet ++ u.keySet).toSeq.map(k => (e.get(k), u.get(k))).map {
        case (Some(a), None) => a
        case (None, Some(b)) => b
        case (Some(a), Some(b)) => combine(a, b)
        case _ => throw new IllegalStateException("unreachable")
      }.sortBy(ord)
    }

    def propType(t: DataFrame, propCols: Map[String, String], k: String) =
      propCols.get(k).map(c => t.schema(c).dataType)

    def mergeNode(a: NodeTable, b: NodeTable): NodeTable = {
      val keys = (a.propCols.keySet ++ b.propCols.keySet).toSeq.sorted
      def norm(t: NodeTable, other: NodeTable): DataFrame =
        t.df.select(col(s"`${t.idCol}`").cast(LongType).as("@id") +:
          keys.map { k =>
            t.propCols.get(k).map(c => col(s"`$c`"))
              .getOrElse(nullOf(propType(other.df, other.propCols, k).get))
              .as(k)
          }: _*)
      val stay = norm(a, b).join(norm(b, a).select("@id"), Seq("@id"), "left_anti")
      NodeTable(a.labels, norm(b, a).unionByName(stay), "@id",
        keys.map(k => k -> k).toMap)
    }

    def mergeRel(a: RelTable, b: RelTable): RelTable = {
      val keys = (a.propCols.keySet ++ b.propCols.keySet).toSeq.sorted
      def norm(t: RelTable, other: RelTable): DataFrame =
        t.df.select(col(s"`${t.idCol}`").cast(LongType).as("@id") +:
          col(s"`${t.srcCol}`").cast(LongType).as("@src") +:
          col(s"`${t.dstCol}`").cast(LongType).as("@dst") +:
          keys.map { k =>
            t.propCols.get(k).map(c => col(s"`$c`"))
              .getOrElse(nullOf(propType(other.df, other.propCols, k).get))
              .as(k)
          }: _*)
      val stay = norm(a, b).join(norm(b, a).select("@id"), Seq("@id"), "left_anti")
      RelTable(a.relType, norm(b, a).unionByName(stay), "@id", "@src", "@dst",
        keys.map(k => k -> k).toMap)
    }

    // derived pattern tables are dropped: a merge can invalidate them.
    // Schema patterns union only when BOTH sides declare (same rule as
    // unionAll — undeclared updates could connect anything).
    new PropertyGraph(
      mergeTables[NodeTable](nodeTables, updates.nodeTables,
        _.labels, _.labels.toSeq.sorted.mkString(","), mergeNode),
      mergeTables[RelTable](relTables, updates.relTables,
        _.relType, _.relType, mergeRel),
      spark,
      schemaPatterns =
        if (schemaPatterns.nonEmpty && updates.schemaPatterns.nonEmpty)
          (schemaPatterns ++ updates.schemaPatterns).distinct
        else Nil)
  }

  /** Re-tag every element id into a disjoint space: `(prefix << 56) | id`
    * (role of the reference's PrefixedGraph byte prefix,
    * okapi-relational/.../impl/graph/PrefixedGraph.scala:40-64). Ids must
    * fit 56 bits; prefix 1..127. */
  def prefixIdSpace(prefix: Int): PropertyGraph = {
    require(prefix > 0 && prefix < 128, "prefix must be in 1..127")
    val p = lit(prefix.toLong << 56)
    def retag(df: DataFrame, cols: Seq[String]): DataFrame =
      cols.foldLeft(df)((d, c) => d.withColumn(c, p + col(s"`$c`").cast(LongType)))
    new PropertyGraph(
      nodeTables.map(t => t.copy(df = retag(t.df, Seq(t.idCol)))),
      relTables.map(t => t.copy(df = retag(t.df, Seq(t.idCol, t.srcCol, t.dstCol)))),
      spark,
      tripletTables.map(t => t.copy(df =
        retag(t.df, Seq(t.relIdCol, t.srcIdCol, t.dstIdCol)))),
      nodeRelTables.map(t => t.copy(df =
        retag(t.df, Seq(t.relIdCol, t.srcIdCol, t.dstIdCol)))),
      schemaPatterns) // topology is id-invariant
  }

  /** register topology constraints (see [[SchemaPattern]]). */
  def withSchemaPatterns(ps: Seq[SchemaPattern]): PropertyGraph =
    new PropertyGraph(nodeTables, relTables, spark, tripletTables,
      nodeRelTables, ps)

  /** Infer the schema-pattern registry FROM DATA: per relationship type,
    * the distinct (src label combination, dst label combination) pairs
    * that actually occur (reference: the Neo4j source's schema-sampling
    * queries — here exact, one narrow aggregation per rel type). Runs
    * Spark jobs; the result is schema-sized (≤ combos² per type). */
  def deriveSchemaPatterns(): Seq[SchemaPattern] = {
    if (nodeTables.isEmpty || relTables.isEmpty) return Nil
    val combos = nodeTables.map { t =>
      t.df.select(col(s"`${t.idCol}`").cast(LongType).as("id"),
        lit(t.labels.toSeq.sorted.mkString("|")).as("combo"))
    }.reduce(_ unionByName _)
    def toSet(s: String): Set[String] =
      if (s.isEmpty) Set.empty else s.split("\\|").toSet
    relTables.flatMap { r =>
      r.df.select(col(s"`${r.srcCol}`").cast(LongType).as("s"),
          col(s"`${r.dstCol}`").cast(LongType).as("d"))
        .join(combos.toDF("s", "scombo"), "s")
        .join(combos.toDF("d", "dcombo"), "d")
        .select("scombo", "dcombo").distinct().collect()
        .map(row => SchemaPattern(toSet(row.getString(0)), r.relType,
          toSet(row.getString(1))))
    }.sortBy(p => (p.relType, p.srcLabels.toSeq.sorted.mkString(","),
      p.dstLabels.toSeq.sorted.mkString(",")))
  }

  /** node label combinations reachable as an endpoint of any of
    * `relTypes` per the registry; None when the registry can't answer
    * (no patterns, an untyped rel in the pattern, or a rel type the
    * registry declares nothing about — declared patterns are
    * CONSTRAINTS, so an undeclared type constrains nothing). */
  def reachableCombos(relTypes: Set[String]): Option[Set[Set[String]]] =
    reachable(relTypes, srcSide = true, dstSide = true)

  /** combos reachable as the storage SOURCE of any of `relTypes`
    * (the target of an Incoming traversal). */
  def reachableSrcCombos(relTypes: Set[String]): Option[Set[Set[String]]] =
    reachable(relTypes, srcSide = true, dstSide = false)

  /** combos reachable as the storage DESTINATION of any of `relTypes`
    * (the target of an Outgoing traversal). */
  def reachableDstCombos(relTypes: Set[String]): Option[Set[Set[String]]] =
    reachable(relTypes, srcSide = false, dstSide = true)

  private def reachable(relTypes: Set[String], srcSide: Boolean,
      dstSide: Boolean): Option[Set[Set[String]]] =
    if (schemaPatterns.isEmpty || relTypes.isEmpty ||
        !relTypes.forall(t => schemaPatterns.exists(_.relType == t))) None
    else Some(schemaPatterns.filter(p => relTypes.contains(p.relType))
      .flatMap(p => (if (srcSide) Seq(p.srcLabels) else Nil) ++
        (if (dstSide) Seq(p.dstLabels) else Nil)).toSet)

  /** Materialize all element tables (reference: Cache operator +
    * CachedDataSource, RelationalOptimizer.scala:35-92 — shared-subtree
    * reuse; repeated pattern scans hit memory instead of re-reading). */
  def cache(storageLevel: org.apache.spark.storage.StorageLevel =
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK): PropertyGraph = {
    // guard on the CacheManager's plan-level lookup: a second cache()
    // call (or a table shared with an already-cached graph) is a no-op
    // instead of an "already cached" warning per table
    def p(df: org.apache.spark.sql.DataFrame): Unit =
      if (df.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
        df.persist(storageLevel)
    nodeTables.foreach(t => p(t.df))
    relTables.foreach(t => p(t.df))
    tripletTables.foreach(t => p(t.df))
    nodeRelTables.foreach(t => p(t.df))
    this
  }

  def unpersist(): PropertyGraph = {
    nodeTables.foreach(_.df.unpersist())
    relTables.foreach(_.df.unpersist())
    tripletTables.foreach(_.df.unpersist())
    nodeRelTables.foreach(_.df.unpersist())
    this
  }

  /** Run a Cypher query with this graph as the input graph — the
    * reference's graph-level entry point (okapi-api
    * PropertyGraph.scala:99: `graph.cypher(...)` delegates to the
    * session). An ad-hoc session plans the query; register the graph in a
    * [[graft.api.GraftSession]] instead when multi-graph catalogs or
    * driving tables are needed. */
  def cypher(query: String,
      parameters: Map[String, Any] = Map.empty): DataFrame =
    graft.api.GraftSession(spark).cypher(this, query, parameters)

  /** Schema summary — label combinations, relationship types, and property
    * key→type maps (role of the reference's PropertyGraphSchema,
    * okapi-api/.../api/schema/PropertyGraphSchema.scala:62; ours is derived
    * from the element tables instead of being declared separately, so it
    * can never drift from the data). One row per element table. */
  def describe(): DataFrame = {
    import spark.implicits._
    val rows =
      nodeTables.map { t =>
        ("node", t.labels.toSeq.sorted.mkString(":"),
          t.propCols.toSeq.sortBy(_._1).map { case (k, c) =>
            s"$k: ${normalize(dtOf(t.df, c)).simpleString}" }.mkString(", "))
      } ++ relTables.map { t =>
        ("relationship", t.relType,
          t.propCols.toSeq.sortBy(_._1).map { case (k, c) =>
            s"$k: ${normalize(dtOf(t.df, c)).simpleString}" }.mkString(", "))
      }
    rows.toDF("kind", "labels_or_type", "properties")
  }

  /** Upper-bound row estimate for a would-be pattern table over
    * `relType`: the rel scan's Catalyst row-count stat when the source
    * provides one, else one count job over the rel scan — cheap next to
    * the materialization it gates (the triplet join only ever removes
    * rows from the rel side, so this bounds the result). */
  def relRowEstimate(relType: String): Long = {
    val nm = ScanNaming("est_id", "est_src", "est_dst", "est_type",
      k => s"est_p_$k", l => s"est_l_$l")
    val df = relScan(Seq(relType), nm).df
    df.queryExecution.optimizedPlan.stats.rowCount match {
      case Some(n) => n.toLong
      case None => df.count()
    }
  }
}

object PropertyGraph {
  /** Persist `df` at `storageLevel`, optionally overriding the session's
    * in-memory columnar compression for this one materialization
    * (`spark.sql.inMemoryColumnarStorage.compressed` is captured by the
    * CacheManager when the cache entry is REGISTERED, so a scoped
    * set/restore around `persist` is sufficient). The toggle is
    * session-visible for the duration of the call — catalog-style
    * operations, not a per-row hot path. */
  private[graft] def persistWith(df: DataFrame,
      storageLevel: org.apache.spark.storage.StorageLevel,
      compressed: Option[Boolean]): DataFrame = {
    // Dataset.storageLevel looks the plan up in the CacheManager by its
    // canonicalized form, so this also catches an EQUIVALENT plan cached
    // through another graph over the same source tables (two graphs
    // materializing the same triplet join) — re-persisting would only
    // log "Asked to cache already cached data" and keep the first entry
    if (df.storageLevel != org.apache.spark.storage.StorageLevel.NONE) df
    else compressed match {
      case None => df.persist(storageLevel)
      case Some(c) =>
        val conf = df.sparkSession.conf
        val key = "spark.sql.inMemoryColumnarStorage.compressed"
        val prior = conf.get(key, "true")
        conf.set(key, c.toString)
        try df.persist(storageLevel) finally conf.set(key, prior)
    }
  }
}

/** Caller-chosen column naming for one scan (keeps generated names unique
  * across the whole plan — the planner owns the counter). */
case class ScanNaming(idCol: String, srcCol: String, dstCol: String,
    typCol: String, propCol: String => String, labelCol: String => String)

case class ScanResult(df: DataFrame, idCol: String,
    labelCols: Map[String, String], propCols: Map[String, String],
    possibleLabels: Set[String])

case class RelScanResult(df: DataFrame, idCol: String, srcCol: String,
    dstCol: String, typCol: String, propCols: Map[String, String],
    types: Set[String])
