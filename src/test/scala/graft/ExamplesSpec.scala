package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.api.GraftSession
import graft.graph.{NodeTable, PropertyGraph, RelTable}

/** End-to-end usage shapes named after the reference's runnable examples
  * (morpheus-examples/src/main/scala/.../examples/ — same scenarios,
  * our API): DataFrameInputExample, CypherSQLRoundtripExample,
  * MultipleGraphExample, GraphXPageRankExample.
  */
class ExamplesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var gs: GraftSession = _
  private var social: PropertyGraph = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-examples")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    gs = GraftSession(spark)
    val s = spark
    import s.implicits._
    val people = Seq((1L, "Alice"), (2L, "Bob"), (3L, "Eve"))
      .toDF("id", "name")
    val knows = Seq((10L, 1L, 2L), (11L, 2L, 3L), (12L, 3L, 1L))
      .toDF("rid", "src", "dst")
    social = new PropertyGraph(
      Seq(NodeTable(Set("Person"), people, "id", Map("name" -> "name"))),
      Seq(RelTable("KNOWS", knows, "rid", "src", "dst", Map.empty)), spark)
    gs.register("social", social)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("DataFrameInputExample: build a graph from DataFrames and query it") {
    val rows = gs.cypher(social,
      "MATCH (a:Person)-[:KNOWS]->(b:Person) RETURN a.name AS a, b.name AS b ORDER BY a")
      .collect()
    assert(rows.length === 3 && rows.head.getString(0) === "Alice")
  }

  test("CypherSQLRoundtripExample: Cypher result → SQL view → Cypher input") {
    gs.cypher(social,
      "MATCH (a:Person)-[:KNOWS]->(b:Person) RETURN a.name AS a_name, b.name AS b_name")
      .createOrReplaceTempView("friendships")
    val viaSql = gs.sql(
      "SELECT a_name FROM friendships WHERE b_name = 'Bob'").collect()
    assert(viaSql.map(_.getString(0)).toSeq === Seq("Alice"))
  }

  test("MultipleGraphExample: construct, register, query across graphs") {
    val g2 = gs.cypherGraph(social,
      """MATCH (a:Person)-[:KNOWS]->(b:Person)
        |CONSTRUCT NEW (a)-[:FOF]->(b) RETURN GRAPH""".stripMargin)
    gs.register("derived", g2)
    val n = gs.cypher(social,
      "FROM GRAPH derived MATCH ()-[:FOF]->() RETURN count(*) AS n")
      .head.getLong(0)
    assert(n === 3L)
  }

  test("GraphXPageRankExample: export and rank") {
    val ranks = graft.interop.GraphXExport.pageRank(social)
    assert(ranks.count() === 3)
    // symmetric 3-cycle → equal ranks
    val vals = ranks.collect().map(_.getDouble(1))
    assert(vals.max - vals.min < 1e-6)
  }
}
