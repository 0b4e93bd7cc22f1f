package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.api.{GraftSession, GraphElements, GraphNode, GraphRelationship, Labels, RelationshipType}

/** Case-class graph construction (reference: CaseClassExample.scala,
  * MorpheusSession.readFrom MorpheusSession.scala:77-86,
  * GraphElement.scala:34-90): class-name labels, annotation overrides,
  * non-meta fields → properties, Int props widened to Long. */
object CaseClassGraphSpec {
  case class Person(id: Long, name: String, age: Int) extends GraphNode

  @Labels("Person", "Employee")
  case class Employee(id: Long, name: String, salary: Double) extends GraphNode

  @RelationshipType("FRIEND_OF")
  case class Friend(id: Long, source: Long, target: Long, since: String)
      extends GraphRelationship

  case class Knows(id: Long, source: Long, target: Long)
      extends GraphRelationship
}

class CaseClassGraphSpec extends AnyFunSuite
    with org.scalatest.BeforeAndAfterAll {
  import CaseClassGraphSpec._

  private var spark: org.apache.spark.sql.SparkSession = _

  override def beforeAll(): Unit = {
    spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .appName("graft-caseclass-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  test("readFrom builds a queryable graph from case classes") {
    val session = new GraftSession(spark)
    val g = session.readFrom(
      Seq(Person(0, "Alice", 10), Person(1, "Bob", 20), Person(2, "Carol", 15)),
      Seq(Friend(0, 0, 1, "1987"), Friend(1, 1, 2, "2009")))
    val rows = session.cypher(g,
      """MATCH (a:Person)-[r:FRIEND_OF]->(b)
        |RETURN a.name AS a, b.name AS b, r.since AS since
        |ORDER BY a""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows.toSeq === Seq(("Alice", "Bob", "1987"), ("Bob", "Carol", "2009")))
  }

  test("labels default to class name; @Labels overrides; Int widens to Long") {
    val nt = GraphElements.nodeTable(spark, Seq(Person(0, "Alice", 10)))
    assert(nt.labels === Set("Person"))
    assert(nt.df.schema("age").dataType ===
      org.apache.spark.sql.types.LongType)
    assert(nt.propCols.keySet === Set("name", "age"))

    val emp = GraphElements.nodeTable(spark, Seq(Employee(7, "Dave", 9.5)))
    assert(emp.labels === Set("Person", "Employee"))
  }

  test("rel type defaults to upper-cased class name; @RelationshipType overrides") {
    val ft = GraphElements.relTable(spark, Seq(Friend(0, 0, 1, "x")))
    assert(ft.relType === "FRIEND_OF")
    assert(ft.propCols.keySet === Set("since"))

    val kt = GraphElements.relTable(spark, Seq(Knows(0, 0, 1)))
    assert(kt.relType === "KNOWS")
    assert(kt.propCols.isEmpty)
  }

  test("nodes()/relationships() record views expose canonical scans") {
    val session = new GraftSession(spark)
    val g = session.readFrom(
      Seq(Person(0, "Alice", 10), Person(1, "Bob", 20)),
      Seq(Friend(0, 0, 1, "1987")))
    val n = g.nodes("n")
    assert(n.columns.toSet === Set("n", "n:Person", "n.name", "n.age"))
    assert(n.count() === 2)
    val r = g.relationships("r")
    assert(r.columns.toSet ===
      Set("r", "r.src", "r.dst", "r.type", "r.since"))
    assert(r.select("`r.type`").head().getString(0) === "FRIEND_OF")
    // exact label match on a label with no exact table yields empty
    assert(g.nodes("m", Set("Person"), exactLabelMatch = true).count() === 2)
  }

  test("multi-type graphs compose from element tables") {
    val session = new GraftSession(spark)
    val g = new graft.graph.PropertyGraph(
      Seq(GraphElements.nodeTable(spark, Seq(Person(0, "Alice", 10))),
        GraphElements.nodeTable(spark, Seq(Employee(1, "Dave", 9.5)))),
      Seq(GraphElements.relTable(spark, Seq(Knows(0, 0, 1)))), spark)
    val out = session.cypher(g,
      "MATCH (a)-[:KNOWS]->(b:Employee) RETURN a.name AS a, b.salary AS s")
      .collect()
    assert(out.length === 1)
    assert(out(0).getString(0) === "Alice")
    assert(out(0).getDouble(1) === 9.5)
  }
}
