package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.cypher.CypherParser
import graft.graph.PropertyGraph
import graft.plans.Planner

/** User-facing session: a catalog of named property graphs + the Cypher
  * entry point (role of the reference's MorpheusSession,
  * morpheus-spark-cypher/.../api/MorpheusSession.scala:55).
  */
class GraftSession(val spark: SparkSession) {

  private val catalog = scala.collection.concurrent.TrieMap.empty[String, PropertyGraph]

  def register(name: String, graph: PropertyGraph): Unit = catalog(name) = graph
  def graph(name: String): PropertyGraph = catalog.getOrElse(name,
    throw new IllegalArgumentException(
      s"graph `$name` not in catalog (have: ${catalog.keys.mkString(", ")})"))
  def graphNames: Seq[String] = catalog.keys.toSeq.sorted

  /** Run a Cypher read query against a graph; result is a plain DataFrame
    * (lazily planned — nothing executes until an action). */
  def cypher(g: PropertyGraph, query: String,
      params: Map[String, Any] = Map.empty): DataFrame = {
    val ast = CypherParser.parse(query)
    new Planner(spark, params, graph, g).plan(ast)
  }

  def cypher(graphName: String, query: String): DataFrame =
    cypher(graph(graphName), query, Map.empty[String, Any])

  def cypher(graphName: String, query: String, params: Map[String, Any]): DataFrame =
    cypher(graph(graphName), query, params)

  /** Run a graph-returning query (`... CONSTRUCT ... [RETURN GRAPH]`) —
    * multiple-graph extension (reference: ConstructGraphPlanner.scala:52,
    * RelationalCypherSession.scala:171-196). The result graph is lazy (its
    * element tables are unexecuted DataFrame plans) and can be registered
    * in the catalog and queried like any other. */
  def cypherGraph(g: PropertyGraph, query: String,
      params: Map[String, Any] = Map.empty): PropertyGraph = {
    val ast = CypherParser.parse(query)
    new Planner(spark, params, graph, g).planGraph(ast)
  }

  def cypherGraph(graphName: String, query: String): PropertyGraph =
    cypherGraph(graph(graphName), query, Map.empty[String, Any])

  /** Graph DDL entry point (reference: graph-ddl module + catalog DDL,
    * RelationalCypherSession.scala:171-196): parses a `CREATE GRAPH ...`
    * mapping over Spark tables/views, registers and returns the graph. */
  def createGraph(ddl: String): PropertyGraph = {
    val (name, g) = graft.sources.GraphDdl.createGraph(spark, ddl)
    register(name, g)
    g
  }

  /** Build an in-memory graph from openCypher `CREATE` statements (the
    * TCK fixture form; reference: okapi-testing CreateGraphFactory).
    * Property values must be literals. */
  def createGraphFromCypher(createStatements: String): PropertyGraph =
    graft.sources.CypherCreateGraph(spark, createStatements)

  /** Records as maps — the reference's `toCypherMaps` surface
    * (MorpheusRecords.scala:138) without a boxed value hierarchy: each row
    * becomes name→JVM value (structs → nested maps, arrays → Seq). */
  def cypherMaps(g: PropertyGraph, query: String,
      params: Map[String, Any] = Map.empty)
      : org.apache.spark.sql.Dataset[Map[String, Any]] = {
    val df = cypher(g, query, params)
    implicit val enc: org.apache.spark.sql.Encoder[Map[String, Any]] =
      org.apache.spark.sql.Encoders.kryo[Map[String, Any]]
    def convert(v: Any): Any = v match {
      case r: org.apache.spark.sql.Row =>
        r.schema.fieldNames.zip(r.toSeq.map(convert)).toMap
      case s: Seq[_] => s.map(convert)
      case other => other
    }
    val names = df.columns
    df.map(row => names.zip(row.toSeq.map(convert)).toMap)
  }

  /** Spark SQL pass-through (reference entry point 2,
    * MorpheusSession.scala:84-86). */
  def sql(query: String): DataFrame = spark.sql(query)
}

object GraftSession {
  def apply(spark: SparkSession): GraftSession = new GraftSession(spark)
}
