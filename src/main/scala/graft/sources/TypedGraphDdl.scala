package graft.sources

import scala.util.parsing.combinator.RegexParsers

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.graph.{NodeTable, PropertyGraph, RelTable}

/** Full Graph DDL surface: typed element types with inheritance, graph
  * types with schema patterns, and view mappings with explicit join
  * columns — the grammar of the reference's Graph DDL
  * (graph-ddl/.../GraphDdlParser.scala, semantics evidenced by
  * GraphDdlTest.scala:340-960), re-derived as a combinator grammar over
  * the Spark catalog rather than a port of the fastparse stack:
  *
  * {{{
  * SET SCHEMA warehouse.sales
  *
  * CREATE ELEMENT TYPE Person ( name STRING, age INTEGER? )
  * CREATE ELEMENT TYPE Employee EXTENDS Person ( dept STRING )
  *
  * CREATE GRAPH TYPE hr (
  *   (Person), (Employee),
  *   (Employee)-[WORKS_AT]->(Person)
  * )
  *
  * CREATE GRAPH myGraph OF hr (
  *   (Person)   FROM persons_view ( person_name AS name ),
  *   (Employee) FROM employees_view,
  *   (Employee)-[WORKS_AT]->(Person) FROM contracts e
  *     START NODES (Employee) FROM employees_view n JOIN ON e.emp = n.id
  *     END   NODES (Person)   FROM persons_view  n JOIN ON e.org = n.id
  * )
  * }}}
  *
  * Semantics honored from the reference:
  *  - `EXTENDS` / `<:` inheritance: a node type `(B)` where
  *    `B EXTENDS A` materializes with labels {A, B} and the union of both
  *    element types' properties (GraphDdlTest "inherited node and edge
  *    labels").
  *  - property types are declared Cypher types; `?` marks nullable.
  *    Unsuffixed properties are NOT NULL constraints — mapped columns are
  *    checked at build time (one aggregate per view).
  *  - element types may be declared globally (`CREATE ELEMENT TYPE`),
  *    inside a graph type, or inline in a graph; the most local wins.
  *  - `SET SCHEMA ds.schema` prefixes unqualified view names; a view is
  *    resolved as `schema.view` first, bare `view` second.
  *
  * Lowering (Spark-first, not the reference's): node ids are
  * `xxhash64(tableTag, joinKeyCols…)` — the join columns referenced by
  * the graph's rel mappings define each node view's key, so edge
  * endpoints compute the SAME id from the edge-side columns with zero
  * extra joins at load. Views never used in a `JOIN ON` hash their
  * mapped property columns instead. Relationship ids are tag-prefixed
  * `monotonically_increasing_id` (unique, load-time-assigned — same
  * contract as the reference's SQL data source).
  */
object TypedGraphDdl {

  // ---------------------------------------------------------- AST
  case class PropType(cypherType: String, nullable: Boolean) {
    def sparkType: DataType = cypherType.toUpperCase match {
      case "STRING" => StringType
      case "INTEGER" => LongType
      case "FLOAT" => DoubleType
      case "BOOLEAN" => BooleanType
      case "DATE" => DateType
      case "LOCALDATETIME" | "DATETIME" => TimestampNTZType
      case "TIMESTAMP" => TimestampType
      case "DECIMAL" => DecimalType(38, 18)
      case other => throw new IllegalArgumentException(
        s"unknown property type $other")
    }
  }
  case class ElementTypeDef(name: String, parents: Set[String],
      props: Map[String, PropType], key: Option[(String, Set[String])])
  case class NodeTypeDef(labels: Seq[String])
  case class RelTypeDef(src: NodeTypeDef, relTypes: Seq[String],
      dst: NodeTypeDef)
  case class ViewMapping(view: Seq[String],
      propToCol: Option[Map[String, String]])
  case class NodeMappingDef(node: NodeTypeDef, views: Seq[ViewMapping])
  case class EndMapping(node: NodeTypeDef, view: Seq[String], alias: String,
      joins: Seq[(String, String)]) // (nodeViewCol, edgeViewCol)
  case class RelViewMapping(view: Seq[String], alias: String,
      propToCol: Option[Map[String, String]],
      start: EndMapping, end: EndMapping)
  case class RelMappingDef(rel: RelTypeDef, views: Seq[RelViewMapping])
  case class GraphTypeDef(name: String, elements: Seq[ElementTypeDef],
      nodeTypes: Seq[NodeTypeDef], relTypes: Seq[RelTypeDef])
  case class TypedGraphDef(name: String, ofType: Option[String],
      elements: Seq[ElementTypeDef], nodeTypes: Seq[NodeTypeDef],
      relTypes: Seq[RelTypeDef], nodeMappings: Seq[NodeMappingDef],
      relMappings: Seq[RelMappingDef])
  case class DdlDocument(setSchema: Option[(String, String)],
      elementTypes: Seq[ElementTypeDef], graphTypes: Seq[GraphTypeDef],
      graphs: Seq[TypedGraphDef])

  // ---------------------------------------------------------- parser
  private object P extends RegexParsers {
    override protected val whiteSpace = """(\s|--[^\n]*)+""".r
    private def K(w: String): Parser[String] = ("""(?i)""" + w + """\b""").r
    def ident: Parser[String] =
      ("`" ~> """[^`]+""".r <~ "`") | """[a-zA-Z_][a-zA-Z0-9_]*""".r
    def viewRef: Parser[Seq[String]] = rep1sep(ident, ".")

    def propType: Parser[PropType] =
      ident ~ opt("?") ^^ { case t ~ n =>
        val pt = PropType(t, n.isDefined)
        pt.sparkType // reject unknown types at parse time
        pt
      }
    def propEntry: Parser[(String, PropType)] =
      ident ~ propType ^^ { case n ~ t => n -> t }
    def propBlock: Parser[Map[String, PropType]] =
      "(" ~> repsep(propEntry, ",") <~ ")" ^^ (_.toMap)
    def keyClause: Parser[(String, Set[String])] =
      K("key") ~> ident ~ ("(" ~> rep1sep(ident, ",") <~ ")") ^^ {
        case n ~ cols => (n, cols.toSet) }

    def elementType: Parser[ElementTypeDef] =
      ident ~ opt((K("extends") | "<:") ~> rep1sep(ident, ",")) ~
        opt(propBlock) ~ opt(keyClause) ^^ {
        case n ~ par ~ props ~ key =>
          ElementTypeDef(n, par.getOrElse(Nil).toSet,
            props.getOrElse(Map.empty), key)
      }
    def globalElementType: Parser[ElementTypeDef] =
      K("create") ~> K("element") ~> K("type") ~> elementType

    def nodeType: Parser[NodeTypeDef] =
      "(" ~> rep1sep(ident, ",") <~ ")" ^^ NodeTypeDef.apply
    def relType: Parser[RelTypeDef] =
      nodeType ~ ("-[" ~> rep1sep(ident, ",") <~ "]->") ~ nodeType ^^ {
        case s ~ ts ~ d => RelTypeDef(s, ts, d) }

    def setSchema: Parser[(String, String)] =
      K("set") ~> K("schema") ~> (ident ~ ("." ~> ident)) <~ opt(";") ^^ {
        case a ~ b => (a, b) }

    def graphType: Parser[GraphTypeDef] =
      K("create") ~> K("graph") ~> K("type") ~> ident ~
        ("(" ~> repsep(relType | nodeType | elementType, ",") <~ ")") ^^ {
        case n ~ items => GraphTypeDef(n,
          items.collect { case e: ElementTypeDef => e },
          items.collect { case t: NodeTypeDef => t },
          items.collect { case r: RelTypeDef => r })
      }

    def propMap: Parser[Map[String, String]] =
      "(" ~> rep1sep((ident <~ K("as")) ~ ident, ",") <~ ")" ^^ {
        _.map { case c ~ p => p -> c }.toMap }

    def viewMapping: Parser[ViewMapping] =
      K("from") ~> viewRef ~ opt(propMap) ^^ {
        case v ~ m => ViewMapping(v, m) }
    def nodeMapping: Parser[NodeMappingDef] =
      nodeType ~ rep1(viewMapping) ^^ {
        case n ~ vs => NodeMappingDef(n, vs) }

    def joinPred: Parser[((String, String), (String, String))] =
      (ident ~ ("." ~> ident)) ~ ("=" ~> ident ~ ("." ~> ident)) ^^ {
        case (a1 ~ c1) ~ (a2 ~ c2) => ((a1, c1), (a2, c2)) }
    def joinOn: Parser[Seq[((String, String), (String, String))]] =
      K("join") ~> K("on") ~> rep1sep(joinPred, K("and"))

    private def endMapping(kw: String): Parser[EndMapping] =
      K(kw) ~> K("nodes") ~> nodeType ~ (K("from") ~> viewRef) ~ ident ~
        joinOn ^^ { case n ~ v ~ a ~ joins =>
          EndMapping(n, v, a, joins.map { case (p1, p2) =>
            // either side of `=` may be the node alias
            if (p1._1 == a) (p1._2, p2._2) else (p2._2, p1._2)
          })
        }

    def relViewMapping: Parser[RelViewMapping] =
      K("from") ~> viewRef ~ ident ~ opt(propMap) ~
        endMapping("start") ~ endMapping("end") ^^ {
        case v ~ a ~ m ~ s ~ e => RelViewMapping(v, a, m, s, e) }
    def relMapping: Parser[RelMappingDef] =
      relType ~ rep1(relViewMapping) ^^ {
        case r ~ vs => RelMappingDef(r, vs) }

    def graphStatement: Parser[Any] =
      relMapping | nodeMapping | relType | nodeType | elementType

    def graphDef: Parser[TypedGraphDef] =
      K("create") ~> K("graph") ~> ident ~ opt(K("of") ~> ident) ~
        ("(" ~> repsep(graphStatement, ",") <~ ")") ^^ {
        case n ~ of ~ items => TypedGraphDef(n, of,
          items.collect { case e: ElementTypeDef => e },
          items.collect { case t: NodeTypeDef => t },
          items.collect { case r: RelTypeDef => r },
          items.collect { case m: NodeMappingDef => m },
          items.collect { case m: RelMappingDef => m })
      }

    def document: Parser[DdlDocument] =
      opt(setSchema) ~ rep(globalElementType | graphType | graphDef) ^^ {
        case ss ~ items => DdlDocument(ss,
          items.collect { case e: ElementTypeDef => e },
          items.collect { case t: GraphTypeDef => t },
          items.collect { case g: TypedGraphDef => g })
      }

    def parseDocument(text: String): DdlDocument =
      parseAll(document, text) match {
        case Success(d, _) => d
        case f: NoSuccess => throw new IllegalArgumentException(
          s"Graph DDL parse error: ${f.msg} at ${f.next.pos}")
      }
    def parseOnly[T](p: Parser[T], text: String): T =
      parseAll(p, text) match {
        case Success(d, _) => d
        case f: NoSuccess => throw new IllegalArgumentException(
          s"Graph DDL parse error: ${f.msg} at ${f.next.pos}")
      }
  }

  def parseDocument(ddl: String): DdlDocument = P.parseDocument(ddl)
  // parser-parity hooks for the spec batch
  private[graft] def parseElementType(s: String) = P.parseOnly(P.elementType, s)
  private[graft] def parseGlobalElementType(s: String) =
    P.parseOnly(P.globalElementType, s)
  private[graft] def parseNodeType(s: String) = P.parseOnly(P.nodeType, s)
  private[graft] def parseRelType(s: String) = P.parseOnly(P.relType, s)
  private[graft] def parseGraphType(s: String) = P.parseOnly(P.graphType, s)
  private[graft] def parseGraph(s: String) = P.parseOnly(P.graphDef, s)
  private[graft] def parseNodeMapping(s: String) =
    P.parseOnly(P.nodeMapping, s)
  private[graft] def parseRelMapping(s: String) = P.parseOnly(P.relMapping, s)
  private[graft] def parseSetSchema(s: String) = P.parseOnly(P.setSchema, s)

  // ---------------------------------------------------------- lowering

  private class Resolver(doc: DdlDocument, g: TypedGraphDef) {
    private val graphType: Option[GraphTypeDef] =
      g.ofType.map(n => doc.graphTypes.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"unknown graph type $n")))
    // most local wins: inline graph > graph type > global catalog
    val elements: Map[String, ElementTypeDef] =
      (doc.elementTypes ++ graphType.toSeq.flatMap(_.elements) ++ g.elements)
        .map(e => e.name -> e).toMap

    def expandLabels(label: String): Set[String] = {
      def rec(l: String, seen: Set[String]): Set[String] =
        if (seen(l)) seen
        else elements.get(l).map(_.parents).getOrElse(Set.empty)
          .foldLeft(seen + l)((acc, p) => rec(p, acc))
      rec(label, Set.empty)
    }
    def expand(n: NodeTypeDef): Set[String] =
      n.labels.flatMap(expandLabels).toSet

    /** union of the OWN properties of every label in the (expanded) set —
      * parents contribute via label expansion, mirroring the reference's
      * nodePropertyKeys (GraphDdlTest.scala:385-389). */
    def propsFor(labels: Set[String]): Map[String, PropType] =
      labels.toSeq.sorted.flatMap(l =>
        elements.get(l).map(_.props).getOrElse(Map.empty)).toMap
  }

  private def resolveView(spark: SparkSession, schema: Option[(String, String)],
      view: Seq[String]): DataFrame = {
    val candidates =
      (if (view.length > 1) Seq(view.mkString(".")) else Seq.empty) ++
        schema.map { case (_, s) => s"$s.${view.mkString(".")}" } ++
        Seq(view.mkString("."))
    candidates.distinct.flatMap { name =>
      try Some(spark.table(name)) catch { case _: Exception => None }
    }.headOption.getOrElse(throw new IllegalArgumentException(
      s"view ${view.mkString(".")} not found (tried ${candidates.mkString(", ")})"))
  }

  private def tagOf(labels: Set[String], view: Seq[String]): String =
    labels.toSeq.sorted.mkString(":") + "|" + view.mkString(".")

  /** Build every graph declared in `ddl` against the session catalog.
    * `validate = true` runs one aggregate per mapped view checking the
    * DDL's NOT NULL property constraints (unsuffixed types). */
  def createGraphs(spark: SparkSession, ddl: String,
      validate: Boolean = true): Map[String, PropertyGraph] = {
    val doc = parseDocument(ddl)
    doc.graphs.map(g => g.name -> createGraph(spark, doc, g, validate)).toMap
  }

  private def createGraph(spark: SparkSession, doc: DdlDocument,
      g: TypedGraphDef, validate: Boolean): PropertyGraph = {
    val r = new Resolver(doc, g)

    // node view key: the node-side join columns any rel mapping uses for
    // this (labels, view); all references must agree (they define the id)
    val keyByNodeView = scala.collection.mutable.Map.empty[
      (Set[String], Seq[String]), Seq[String]]
    for (rm <- g.relMappings; v <- rm.views; em <- Seq(v.start, v.end)) {
      val k = (r.expand(em.node), em.view)
      val cols = em.joins.map(_._1).sorted
      keyByNodeView.get(k) match {
        case Some(prev) if prev != cols =>
          throw new IllegalArgumentException(
            s"inconsistent join keys for node view $k: $prev vs $cols")
        case _ => keyByNodeView(k) = cols
      }
    }

    def notNullCheck(df: DataFrame, cols: Seq[String], where: String): Unit =
      if (validate && cols.nonEmpty) {
        val counts = df.agg(
          cols.map(c => sum(col(s"`$c`").isNull.cast("long")).as(c)).head,
          cols.map(c => sum(col(s"`$c`").isNull.cast("long")).as(c)).tail: _*
        ).head()
        cols.zipWithIndex.foreach { case (c, i) =>
          if (!counts.isNullAt(i) && counts.getLong(i) > 0)
            throw new IllegalArgumentException(
              s"NOT NULL constraint violated: $where.$c has ${counts.getLong(i)} nulls")
        }
      }

    val nodeTables = for {
      nm <- g.nodeMappings
      vm <- nm.views
    } yield {
      val labels = r.expand(nm.node)
      val declared = r.propsFor(labels)
      val df = resolveView(spark, doc.setSchema, vm.view)
      val propToCol = vm.propToCol.getOrElse(
        declared.keys.map(p => p -> p).toMap)
      propToCol.keys.foreach(p => require(declared.contains(p),
        s"property $p not declared for node type ${nm.node.labels.mkString(",")}"))
      notNullCheck(df,
        declared.collect { case (p, t) if !t.nullable => propToCol(p) }.toSeq,
        vm.view.mkString("."))
      val keyCols = keyByNodeView.getOrElse((labels, vm.view),
        propToCol.values.toSeq.sorted)
      // hash inputs normalized to string: the node side may cast a key
      // column to its declared type while the edge side hashes the raw
      // view column — xxhash64 is type-sensitive, strings are not
      val withId = df.withColumn("_gid",
        xxhash64(lit(tagOf(labels, vm.view)) +:
          keyCols.map(c => col(s"`$c`").cast(StringType)): _*))
      val typed = declared.foldLeft(withId) { case (d, (p, t)) =>
        d.withColumn(propToCol(p),
          col(s"`${propToCol(p)}`").cast(t.sparkType)) }
      NodeTable(labels, typed, "_gid", propToCol)
    }

    val relTables = for {
      (rm, rmIdx) <- g.relMappings.zipWithIndex
      relTypeName <- rm.rel.relTypes
      (v, vIdx) <- rm.views.zipWithIndex
    } yield {
      val declared = r.propsFor(r.expandLabels(relTypeName))
      val df = resolveView(spark, doc.setSchema, v.view)
      val propToCol = v.propToCol.getOrElse(
        declared.keys.map(p => p -> p).toMap)
      notNullCheck(df,
        declared.collect { case (p, t) if !t.nullable => propToCol(p) }.toSeq,
        v.view.mkString("."))
      def endId(em: EndMapping): Column = {
        val labels = r.expand(em.node)
        // edge-side columns ordered by their node-side partner — the node
        // table hashed its key columns sorted, so both sides line up
        val ordered = em.joins.sortBy(_._1).map(_._2)
        xxhash64(lit(tagOf(labels, em.view)) +:
          ordered.map(c => col(s"`$c`").cast(StringType)): _*)
      }
      val typed = declared.foldLeft(df) { case (d, (p, t)) =>
        d.withColumn(propToCol(p),
          col(s"`${propToCol(p)}`").cast(t.sparkType)) }
      // load-time-assigned rel ids, tag-prefixed per table (class doc)
      val tableTag = (rmIdx.toLong * 31 + vIdx + 1) << 48
      val withIds = typed
        .withColumn("_rid", lit(tableTag) + monotonically_increasing_id())
        .withColumn("_src", endId(v.start))
        .withColumn("_dst", endId(v.end))
      RelTable(relTypeName, withIds, "_rid", "_src", "_dst", propToCol)
    }

    // the graph type's rel patterns become declared schema patterns
    // (expanded through inheritance) — planners prune with them
    val patterns = (g.relTypes ++
      g.ofType.flatMap(n => doc.graphTypes.find(_.name == n))
        .toSeq.flatMap(_.relTypes))
      .flatMap(rt => rt.relTypes.map(t =>
        graft.graph.SchemaPattern(r.expand(rt.src), t, r.expand(rt.dst))))
      .distinct
    new PropertyGraph(nodeTables, relTables, spark,
      schemaPatterns = patterns)
  }
}
