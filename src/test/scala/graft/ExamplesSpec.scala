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

  test("explain surface: logical clause tree + Catalyst plans") {
    val plans = gs.explain(social,
      "MATCH (a:Person)-[:KNOWS]->(b:Person) WHERE a.name = 'Alice' " +
        "RETURN b.name AS friend")
    assert(plans.logical.contains("MatchClause") &&
      plans.logical.contains("Alice"))
    // optimized plan: the projection alias survives and the expansion is
    // equi-joins (the literal itself may be constant-folded INTO the
    // local relation — that folding is the point of exposing this plan)
    assert(plans.relational.contains("friend"))
    assert(plans.relational.contains("Join Inner") ||
      plans.physical.contains("HashJoin") ||
      plans.physical.contains("SortMergeJoin"))
    assert(!plans.physical.contains("CartesianProduct"))
    assert(plans.toString.contains("=== physical ==="))
  }

  test("CypherSQLRoundtripExample: Cypher result → SQL view → Cypher input") {
    gs.cypher(social,
      "MATCH (a:Person)-[:KNOWS]->(b:Person) RETURN a.name AS a_name, b.name AS b_name")
      .createOrReplaceTempView("friendships")
    val viaSql = gs.sql(
      "SELECT a_name FROM friendships WHERE b_name = 'Bob'")
    assert(viaSql.collect().map(_.getString(0)).toSeq === Seq("Alice"))

    // …and feed the SQL result back in as a Cypher driving table
    // (reference: CypherSQLRoundtripExample's full loop)
    val back = gs.cypher(social,
      """MATCH (p:Person)-[:KNOWS]->(q:Person) WHERE p.name = a_name
        |RETURN a_name, q.name AS friend""".stripMargin,
      Map.empty, viaSql).collect()
    assert(back.map(r => (r.getString(0), r.getString(1))).toSeq ===
      Seq(("Alice", "Bob")))
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

  test("GraphX strongly connected components") {
    // KNOWS is a directed 3-cycle → one SCC containing all three vertices
    val scc = graft.interop.GraphXExport.stronglyConnectedComponents(social)
      .collect().map(_.getLong(1)).distinct
    assert(scc.toSeq === Seq(1L))
  }

  test("GraphX triangle count and label propagation") {
    // the KNOWS 3-cycle is one undirected triangle: every vertex is in it
    val tris = graft.interop.GraphXExport.triangleCount(social)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(tris.values.toSeq === Seq(1, 1, 1))
    // one connected cycle → label propagation yields ≤ 2 communities
    // (3-cycle oscillation can split it; it must not isolate all three)
    val comms = graft.interop.GraphXExport.labelPropagation(social)
      .collect().map(_.getLong(1)).distinct
    assert(comms.length <= 2)
  }

  test("CaseClassExample: graphs from typed Datasets") {
    import ExamplesSpec.{Bought, Product}
    val s = spark
    import s.implicits._
    val products = Seq(Product(100L, "book", 12.5), Product(101L, "pen", 1.5))
      .toDS().toDF()
    val bought = Seq(Bought(200L, 1L, 100L, 2L), Bought(201L, 2L, 101L, 5L))
      .toDS().toDF()
    val shop = social.unionAll(new PropertyGraph(
      Seq(NodeTable(Set("Product"), products, "id",
        Map("title" -> "title", "price" -> "price"))),
      Seq(RelTable("BOUGHT", bought, "rid", "src", "dst", Map("qty" -> "qty"))),
      spark))
    val rows = gs.cypher(shop,
      """MATCH (p:Person)-[b:BOUGHT]->(x:Product)
        |RETURN p.name AS who, x.title AS what, b.qty * x.price AS paid
        |ORDER BY who""".stripMargin).collect()
    assert(rows.map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSeq
      === Seq(("Alice", "book", 25.0), ("Bob", "pen", 7.5)))
  }

  test("CatalogExample + ViewsExample: statement-level catalog management") {
    gs.cypher(
      """CATALOG CREATE GRAPH demo.tiny {
        |  CONSTRUCT CREATE (:Tag {name: 'spark'})-[:ON]->(:Post {score: 7})
        |  RETURN GRAPH
        |}""".stripMargin)
    gs.cypher(
      """CATALOG CREATE VIEW highScore($g) {
        |  FROM $g MATCH (t:Tag)-[o:ON]->(p:Post) WHERE p.score > 5
        |  CONSTRUCT CLONE t, p, o RETURN GRAPH
        |}""".stripMargin)
    val n = gs.cypher(
      """FROM GRAPH highScore(demo.tiny)
        |MATCH (:Tag)-[:ON]->(p:Post) RETURN count(*) AS n""".stripMargin)
      .head.getLong(0)
    assert(n === 1L)
    gs.cypher("CATALOG DROP VIEW highScore")
    gs.cypher("CATALOG DROP GRAPH demo.tiny")
  }

  test("SQL views over graph element tables") {
    val views = gs.registerSqlViews("social")
    assert(views.contains("social_node_Person") &&
      views.contains("social_rel_KNOWS"))
    val n = gs.sql(
      """SELECT count(*) AS n FROM social_node_Person p
        |JOIN social_rel_KNOWS k ON k.src = p.id""".stripMargin)
      .head.getLong(0)
    assert(n == 3L)
  }

  test("Customer360Example: integrate graphs from two sources, query across") {
    val s = spark
    import s.implicits._
    // source A: CRM users; source B: web accounts — overlapping emails
    val crm = new PropertyGraph(
      Seq(NodeTable(Set("Customer"),
        Seq((1L, "alice@x.com", "Alice A"), (2L, "bob@x.com", "Bob B"))
          .toDF("id", "email", "name"),
        "id", Map("email" -> "email", "name" -> "name"))),
      Seq.empty, spark)
    val web = new PropertyGraph(
      Seq(NodeTable(Set("Account"),
        Seq((1L, "alice@x.com", 42L), (9L, "carol@x.com", 7L))
          .toDF("id", "email", "visits"),
        "id", Map("email" -> "email", "visits" -> "visits"))),
      Seq.empty, spark)
    // disjoint id spaces, then one integrated graph (Customer360 recipe)
    val integrated = crm.prefixIdSpace(1).unionAll(web.prefixIdSpace(2))
    val joined = gs.cypher(integrated,
      """MATCH (c:Customer), (a:Account) WHERE c.email = a.email
        |RETURN c.name AS name, a.visits AS visits""".stripMargin).collect()
    assert(joined.map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("Alice A", 42L)))
  }

  test("DataFrameOutputExample: results are plain DataFrames") {
    val df = gs.cypher(social,
      "MATCH (p:Person) RETURN p.name AS name, id(p) AS pid")
    // full Spark surface available on the result
    val out = df.where(org.apache.spark.sql.functions.col("name") =!= "Eve")
      .groupBy().count().head.getLong(0)
    assert(out === 2L)
    assert(df.schema.fieldNames.toSeq === Seq("name", "pid"))
  }

  test("UpdateExample: enrich a graph via CONSTRUCT SET") {
    val enriched = gs.cypherGraph(social,
      """MATCH (p:Person)
        |CONSTRUCT CLONE p SET p.outdeg = size((p)-[:KNOWS]->())
        |RETURN GRAPH""".stripMargin)
    val rows = gs.cypher(enriched,
      "MATCH (p:Person) RETURN p.name AS n, p.outdeg AS d ORDER BY n")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows === Seq(("Alice", 1L), ("Bob", 1L), ("Eve", 1L)))
  }

  test("RecommendationExample: multi-hop suggestion query") {
    // recommend people known by your connections that you don't know yet
    val recs = gs.cypher(social,
      """MATCH (me:Person {name: 'Alice'})-[:KNOWS]->(f:Person)-[:KNOWS]->(fof:Person)
        |WHERE NOT (me)-[:KNOWS]->(fof) AND fof.name <> 'Alice'
        |RETURN DISTINCT fof.name AS rec""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(recs === Seq("Eve"))
  }
}

object ExamplesSpec {
  case class Product(id: Long, title: String, price: Double)
  case class Bought(rid: Long, src: Long, dst: Long, qty: Long)
}
