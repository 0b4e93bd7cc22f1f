package graft.sources

import scala.util.parsing.combinator.RegexParsers

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.graph.{NodeTable, PropertyGraph, RelTable}

/** Declarative table→graph mapping, the role of the reference's Graph DDL
  * (graph-ddl/.../GraphDdlParser.scala, GraphDdl.scala — grammar shape
  * re-derived as a focused subset, not a port):
  *
  * {{{
  * CREATE GRAPH myGraph (
  *   NODE Person FROM persons_view (person_id AS id),
  *   NODE Product:Item FROM products (pid AS id),
  *   REL KNOWS FROM knows_view (kid AS id, a AS source, b AS target)
  * )
  * }}}
  *
  * `FROM x` reads the Spark table / temp view `x` (so Hive tables, temp
  * views over JDBC reads, or any registered DataFrame all work — the same
  * indirection the reference's SQL PGDS uses). Columns not named in the
  * mapping become properties. Id/source/target columns must be integral;
  * they are cast to Long.
  */
object GraphDdl {

  case class NodeDef(labels: Seq[String], table: String, idCol: String)
  case class RelDef(relType: String, table: String, idCol: String,
      srcCol: String, dstCol: String)
  case class GraphDef(name: String, nodes: Seq[NodeDef], rels: Seq[RelDef])

  private object P extends RegexParsers {
    override protected val whiteSpace = """(\s|--[^\n]*)+""".r
    private def K(w: String): Parser[String] = ("""(?i)""" + w + """\b""").r
    def ident: Parser[String] =
      ("`" ~> """[^`]+""".r <~ "`") | """[a-zA-Z_][a-zA-Z0-9_.]*""".r

    def nodeMapping: Parser[NodeDef] =
      K("node") ~> rep1sep(ident, ":") ~ (K("from") ~> ident) ~
        ("(" ~> (ident <~ K("as") <~ K("id")) <~ ")") ^^ {
        case labels ~ table ~ id => NodeDef(labels, table, id) }

    private sealed trait Role
    private case object IdRole extends Role
    private case object SrcRole extends Role
    private case object DstRole extends Role
    private def role: Parser[Role] =
      K("id") ^^^ IdRole | K("source") ^^^ SrcRole | K("target") ^^^ DstRole

    def relMapping: Parser[RelDef] =
      K("rel") ~> ident ~ (K("from") ~> ident) ~
        ("(" ~> rep1sep((ident <~ K("as")) ~ role, ",") <~ ")") ^^ {
        case tpe ~ table ~ maps =>
          def pick(r: Role): String = maps.collectFirst {
            case c ~ rr if rr == r => c
          }.getOrElse(throw new IllegalArgumentException(
            s"REL $tpe needs `col AS ${r.toString.dropRight(4).toLowerCase}`"))
          RelDef(tpe, table, pick(IdRole), pick(SrcRole), pick(DstRole))
      }

    def graph: Parser[GraphDef] =
      K("create") ~> K("graph") ~> ident ~
        ("(" ~> rep1sep(nodeMapping | relMapping, ",") <~ ")") ^^ {
        case name ~ items => GraphDef(name,
          items.collect { case n: NodeDef => n },
          items.collect { case r: RelDef => r })
      }

    def parseDdl(text: String): GraphDef = parseAll(graph, text) match {
      case Success(g, _) => g
      case f: NoSuccess => throw new IllegalArgumentException(
        s"Graph DDL parse error: ${f.msg} at ${f.next.pos}")
    }
  }

  def parse(ddl: String): GraphDef = P.parseDdl(ddl)

  /** Materialize the mapping against the session catalog. Returns
    * (graphName, graph) so callers can register it. */
  def createGraph(spark: SparkSession, ddl: String): (String, PropertyGraph) = {
    val g = parse(ddl)
    val nodes = g.nodes.map { n =>
      val df = spark.table(n.table)
      val props = df.columns.filterNot(_ == n.idCol)
      NodeTable(n.labels.toSet,
        df.withColumn(n.idCol, col(s"`${n.idCol}`").cast("long")),
        n.idCol, props.map(c => c -> c).toMap)
    }
    val rels = g.rels.map { r =>
      val df = spark.table(r.table)
      val keyCols = Set(r.idCol, r.srcCol, r.dstCol)
      val props = df.columns.filterNot(keyCols)
      val cast = keyCols.foldLeft(df)((d, c) =>
        d.withColumn(c, col(s"`$c`").cast("long")))
      RelTable(r.relType, cast, r.idCol, r.srcCol, r.dstCol,
        props.map(c => c -> c).toMap)
    }
    (g.name, new PropertyGraph(nodes, rels, spark))
  }
}
