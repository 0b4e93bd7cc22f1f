package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.api.GraftSession
import graft.sources.BulkImportSink

/** Neo4j bulk-import CSV sink (reference: Neo4jBulkCSVDataSink.scala —
  * the offline `neo4j-admin import` layout; write-only, no driver jar).
  */
class BulkImportSinkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder().master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false").getOrCreate()
  lazy val gs = GraftSession(spark)

  private def slurp(p: java.nio.file.Path): String =
    new String(Files.readAllBytes(p))
  private def findUnder(root: java.nio.file.Path, name: String) = {
    import scala.jdk.CollectionConverters._
    Files.walk(root).iterator().asScala.filter(_.getFileName.toString == name)
      .toSeq
  }
  private def dataLines(dir: java.nio.file.Path): Seq[String] = {
    import scala.jdk.CollectionConverters._
    Files.walk(dir).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("part") &&
        p.getFileName.toString.endsWith(".csv"))
      .flatMap(p => slurp(p).split("\n").filter(_.nonEmpty))
      .toSeq
  }

  test("writes per-combo node and per-type rel CSVs with admin headers") {
    val g = gs.createGraphFromCypher(
      """CREATE (a:Person {name: 'Ann', age: 30, tags: ['x', 'y']})
        |CREATE (b:Person:Admin {name: 'Dee', age: 40})
        |CREATE (c:City {name: 'Berlin'})
        |CREATE (a)-[:LIVES_IN {since: 2010}]->(c)
        |CREATE (b)-[:LIVES_IN {since: 2005}]->(c)""".stripMargin)
    val root = Files.createTempDirectory("bulk_sink")
    val script = BulkImportSink.write(g, root.toString, "testdb")

    // import script lists every element table and the admin invocation
    val sh = slurp(java.nio.file.Paths.get(
      script.stripPrefix("file:").stripPrefix("//")))
    assert(sh.contains("neo4j-admin import"))
    assert(sh.contains("--database=testdb"))
    assert(sh.contains("--nodes:Person "))
    assert(sh.contains("--nodes:Admin:Person "))
    assert(sh.contains("--nodes:City "))
    assert(sh.contains("--relationships:LIVES_IN "))

    // node schema headers carry :ID and typed properties
    val schemas = findUnder(root, "schema.csv").map(p =>
      p.getParent.getFileName.toString -> slurp(p)).toMap
    assert(schemas("Person") == "__id:ID,age:int,name:string,tags:string[]")
    assert(schemas("Admin_Person") == "__id:ID,age:int,name:string")
    assert(schemas("City") == "__id:ID,name:string")
    assert(schemas("LIVES_IN") == ":START_ID,:END_ID,since:int")

    // data parts: right row counts; arrays joined with the delimiter
    val personDir = findUnder(root, "schema.csv")
      .find(_.getParent.getFileName.toString == "Person").get.getParent
    val person = dataLines(personDir.resolve("data"))
    assert(person.size == 1 && person.head.contains("x|y"))
    val relDir = findUnder(root, "schema.csv")
      .find(_.getParent.getFileName.toString == "LIVES_IN").get.getParent
    assert(dataLines(relDir.resolve("data")).size == 2)
  }

  test("BulkImportSource round-trips the sink's layout") {
    val g = gs.createGraphFromCypher(
      """CREATE (a:Person {name: 'Ann', age: 30, tags: ['x', 'y']})
        |CREATE (b:Person:Admin {name: 'Dee', age: 40})
        |CREATE (c:City {name: 'Berlin'})
        |CREATE (a)-[:LIVES_IN {since: 2010}]->(c)
        |CREATE (b)-[:LIVES_IN {since: 2005}]->(c)""".stripMargin)
    val root = Files.createTempDirectory("bulk_rt")
    BulkImportSink.write(g, root.toString, "rt")
    val back = graft.sources.BulkImportSource.read(spark, root.toString, "rt")

    // same label combinations and rel types
    assert(back.nodeTables.map(_.labels).toSet ===
      g.nodeTables.map(_.labels).toSet)
    assert(back.relTables.map(_.relType) === Seq("LIVES_IN"))

    // queries over the round-tripped graph match the original
    val q = """MATCH (p:Person)-[r:LIVES_IN]->(c:City)
              |RETURN p.name AS n, p.age AS a, r.since AS s, c.name AS cn
              |ORDER BY n""".stripMargin
    val orig = gs.cypher(g, q).collect().map(_.toSeq).toSeq
    val rt = gs.cypher(back, q).collect().map(_.toSeq).toSeq
    assert(rt === orig)
    // array property survives with typed elements
    val tags = gs.cypher(back,
      "MATCH (p:Person {name: 'Ann'}) RETURN p.tags AS t").collect()
    assert(tags.head.getSeq[String](0) === Seq("x", "y"))
  }

  test("source round-trips temporal and unlabeled tables") {
    val g = gs.createGraphFromCypher(
      "CREATE (:Ev {name: 'e1', on: date('2024-02-29')})")
    val root = Files.createTempDirectory("bulk_rt_t")
    BulkImportSink.write(g, root.toString)
    val back = graft.sources.BulkImportSource.read(spark, root.toString)
    val rows = gs.cypher(back,
      "MATCH (e:Ev) RETURN e.name AS n, e.on AS d").collect()
    assert(rows.length == 1 && rows.head.getString(0) == "e1" &&
      rows.head.getDate(1).toString == "2024-02-29")
  }

  test("temporal properties write ISO strings under date-typed headers") {
    val g = gs.createGraphFromCypher(
      "CREATE (:Ev {name: 'e1', on: date('2024-02-29')})")
    val root = Files.createTempDirectory("bulk_sink_t")
    BulkImportSink.write(g, root.toString)
    val schema = findUnder(root, "schema.csv").map(p => slurp(p)).head
    assert(schema == "__id:ID,name:string,on:date")
    val dir = findUnder(root, "schema.csv").head.getParent
    val rows = dataLines(dir.resolve("data"))
    assert(rows.size == 1 && rows.head.contains("2024-02-29"))
  }
}
