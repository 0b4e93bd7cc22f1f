package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.api.GraftSession
import graft.graph.{NodeTable, PropertyGraph, RelTable}

/** 2-element (node + relationship) materialized pattern tables (reference:
  * NodeRelPattern, okapi-api Pattern.scala:159-176): half the storage of a
  * triplet, still removes one join from covered traversals. A pattern
  * start binds node + rel from one scan; a mid-chain hop binds rel +
  * target node with a single probe.
  */
class NodeRelSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var gs: GraftSession = _
  private var plain: PropertyGraph = _
  private var withNr: PropertyGraph = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-noderel-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    gs = GraftSession(spark)
    val s = spark
    import s.implicits._
    val people = Seq((1L, "Alice", 23L), (2L, "Bob", 42L), (3L, "Carol", 31L))
      .toDF("id", "name", "age")
    val cities = Seq((10L, "Berlin"), (11L, "Aachen")).toDF("id", "city")
    val knows = Seq((100L, 1L, 2L, 2016L), (101L, 2L, 3L, 2017L))
      .toDF("rid", "src", "dst", "since")
    val livesIn = Seq((200L, 1L, 10L), (201L, 2L, 10L), (202L, 3L, 11L))
      .toDF("rid", "src", "dst")
    plain = new PropertyGraph(
      Seq(NodeTable(Set("Person"), people, "id",
        Map("name" -> "name", "age" -> "age")),
        NodeTable(Set("City"), cities, "id", Map("city" -> "city"))),
      Seq(RelTable("KNOWS", knows, "rid", "src", "dst", Map("since" -> "since")),
        RelTable("LIVES_IN", livesIn, "rid", "src", "dst", Map.empty)),
      spark)
    withNr = plain
      .withNodeRel("KNOWS", Set("Person"), nodeOnSrc = true)
      .withNodeRel("LIVES_IN", Set("City"), nodeOnSrc = false)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def rows(g: PropertyGraph, q: String): Seq[Seq[Any]] =
    gs.cypher(g, q).collect().toSeq.map(_.toSeq)

  private def sameResults(q: String): Unit =
    assert(rows(withNr, q) === rows(plain, q), s"node-rel divergence for:\n$q")

  test("pattern start over a src-attached table: node+rel from one scan") {
    val q = """MATCH (a:Person)-[k:KNOWS]->(b:Person)
              |RETURN a.name AS an, k.since AS since, b.name AS bn
              |ORDER BY an""".stripMargin
    sameResults(q)
    val plan = gs.cypher(withNr, q).queryExecution.executedPlan.toString
    assert(plan.split("InMemoryRelation").head.contains("InMemoryTableScan"),
      s"expected node-rel cache read:\n$plan")
  }

  test("anonymous unconstrained target: whole hop is join-free") {
    val q = """MATCH (a:Person)-[k:KNOWS]->()
              |RETURN a.name AS an, k.since AS s ORDER BY an""".stripMargin
    sameResults(q)
    val plan = gs.cypher(withNr, q).queryExecution.executedPlan.toString
    val aboveCache = plan.split("InMemoryRelation").head
    assert(aboveCache.contains("InMemoryTableScan") &&
      !aboveCache.contains("Join"),
      s"expected zero-join hop over the node-rel table:\n$plan")
  }

  test("mid-chain fresh target probes a dst-attached table once") {
    // (p)-[:LIVES_IN]->(c:City) consumes the nodeOnSrc=false table
    sameResults(
      """MATCH (p:Person) WHERE p.age > 25
        |MATCH (p)-[:LIVES_IN]->(c:City)
        |RETURN p.name AS pn, c.city AS cc ORDER BY pn""".stripMargin)
  }

  test("incoming start reads the dst-attached table") {
    // (c:City)<-[:LIVES_IN]-(p) — c sits on the stored rel's dst side
    sameResults(
      """MATCH (c:City)<-[l:LIVES_IN]-(p:Person)
        |RETURN c.city AS cc, p.name AS pn ORDER BY cc, pn""".stripMargin)
  }

  test("incoming mid-chain fresh target reads a src-attached table") {
    // (b)<-[:KNOWS]-(a:Person): target a sits on the stored src side
    sameResults(
      """MATCH (b:Person) WHERE b.age > 30
        |MATCH (b)<-[k:KNOWS]-(a:Person)
        |RETURN b.name AS bn, a.name AS an, k.since AS s ORDER BY bn""".stripMargin)
  }

  test("inline property maps and element functions still apply") {
    sameResults(
      """MATCH (a:Person)-[:KNOWS {since: 2017}]->(b:Person)
        |RETURN a.name AS an, b.name AS bn""".stripMargin)
    sameResults(
      """MATCH (a:Person {name: 'Alice'})-[k:KNOWS]->(b:Person)
        |RETURN id(a) AS ia, type(k) AS t, labels(b) AS lb ORDER BY ia""".stripMargin)
  }

  test("rel uniqueness holds across node-rel hops") {
    sameResults(
      """MATCH (a:Person)-[k1:KNOWS]->(b:Person)-[k2:KNOWS]->(c:Person)
        |RETURN a.name AS an, c.name AS cn""".stripMargin)
  }

  test("uncovered shapes fall back (undirected, multi-type, label mismatch)") {
    sameResults(
      """MATCH (a:Person)-[:KNOWS]-(b:Person)
        |RETURN a.name AS an, b.name AS bn ORDER BY an, bn""".stripMargin)
    sameResults(
      """MATCH (a:Person)-[r:KNOWS|LIVES_IN]->(x)
        |RETURN a.name AS an, type(r) AS t ORDER BY an, t""".stripMargin)
    // City is nodeOnSrc=false only; a City-start outgoing traversal is
    // uncovered and must fall back to scans
    sameResults(
      "MATCH (c:City)-[r]->(x) RETURN c.city AS cc, id(x) AS ix ORDER BY cc, ix")
  }

  test("a covering triplet wins over a node-rel table") {
    val both = withNr.withTriplet("KNOWS", Set("Person"), Set("Person"))
    val q = """MATCH (a:Person)-[k:KNOWS]->(b:Person)
              |RETURN a.name AS an, b.name AS bn ORDER BY an""".stripMargin
    assert(rows(both, q) === rows(plain, q))
    // triplet path: no join above the caches at all (dst comes from it too)
    val plan = gs.cypher(both, q).queryExecution.executedPlan.toString
    assert(!plan.split("InMemoryRelation").head.contains("Join"),
      s"expected join-free triplet plan:\n$plan")
  }

  test("optional/exists subqueries may consume node-rel tables") {
    sameResults(
      """MATCH (a:Person) WHERE (a)-[:KNOWS]->(:Person)
        |RETURN a.name AS an ORDER BY an""".stripMargin)
    sameResults(
      """MATCH (p:Person) OPTIONAL MATCH (p)-[:LIVES_IN]->(c:City)
        |RETURN p.name AS pn, c.city AS cc ORDER BY pn""".stripMargin)
  }
}
