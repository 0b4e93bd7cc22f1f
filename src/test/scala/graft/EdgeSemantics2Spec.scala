package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.api.GraftSession

/** Second edge-semantics batch: clause scoping (WITH + aggregation +
  * WHERE), UNWIND corner inputs, quantifier vacuous-truth, map
  * projections, label predicates in WHERE, CASE forms, and string
  * function bounds.
  */
class EdgeSemantics2Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val gs = GraftSession(spark)
  lazy val g = gs.createGraphFromCypher(
    """CREATE (a:Person {name: 'Alice', age: 30})
      |CREATE (b:Person {name: 'Bob', age: 25})
      |CREATE (d:Person:Admin {name: 'Dave'})
      |CREATE (a)-[:KNOWS {w: 1}]->(b)
      |CREATE (a)-[:KNOWS {w: 2}]->(d)
      |CREATE (b)-[:KNOWS {w: 3}]->(d)""".stripMargin)

  private def rows(q: String): Seq[Map[String, Any]] = {
    val df = gs.cypher(g, q)
    df.collect().toSeq.map(r => df.columns.zipWithIndex.map { case (c, i) =>
      c -> (r.get(i) match {
        case s: scala.collection.Seq[_] => s.toList
        case x => x
      })
    }.toMap)
  }
  private def one(q: String): Any = rows(q).head.values.head

  test("WITH aggregate then WHERE on alias") {
    val r = rows(
      """MATCH (p:Person)-[:KNOWS]->() WITH p, count(*) AS c WHERE c > 1
        |RETURN p.name AS name""".stripMargin)
    assert(r.map(_("name")) == Seq("Alice"))
  }
  test("WITH carries only projected vars") {
    assertThrows[Exception](rows(
      "MATCH (p:Person) WITH p.name AS n RETURN p.age"))
  }
  test("UNWIND empty list yields no rows")(
    assert(rows("UNWIND [] AS x RETURN x").isEmpty))
  test("UNWIND null yields no rows")(
    assert(rows("UNWIND null AS x RETURN x").isEmpty))
  test("UNWIND nested lists one level")(
    assert(one("UNWIND [[1,2],[3]] AS l RETURN size(l) AS s") == 2L))
  test("all over empty list is true")(
    assert(one("RETURN all(x IN [] WHERE x > 0) AS b") == true))
  test("any over empty list is false")(
    assert(one("RETURN any(x IN [] WHERE x > 0) AS b") == false))
  test("none over empty list is true")(
    assert(one("RETURN none(x IN [] WHERE x > 0) AS b") == true))
  test("single over empty list is false")(
    assert(one("RETURN single(x IN [] WHERE x > 0) AS b") == false))
  test("single true for exactly one")(
    assert(one("RETURN single(x IN [1,2,3] WHERE x = 2) AS b") == true))
  test("map projection of properties") {
    val m = one("MATCH (p:Person {name: 'Alice'}) RETURN p {.name, .age} AS m")
    assert(m.toString.contains("Alice") && m.toString.contains("30"))
  }
  test("label predicate in WHERE") {
    assert(rows("MATCH (p:Person) WHERE p:Admin RETURN p.name AS n")
      .map(_("n")) == Seq("Dave"))
  }
  test("negated label predicate") {
    assert(rows("MATCH (p:Person) WHERE NOT p:Admin RETURN p.name AS n")
      .map(_("n")).toSet == Set("Alice", "Bob"))
  }
  test("simple CASE with null subject falls to else")(
    assert(one(
      "MATCH (p:Person {name: 'Dave'}) RETURN CASE p.age WHEN 30 THEN 'x' ELSE 'y' END AS c")
      == "y"))
  test("searched CASE without else yields null")(
    assert(one("RETURN CASE WHEN false THEN 1 END AS c") == null))
  test("substring out of range is empty")(
    assert(one("RETURN substring('ab', 5) AS s") == ""))
  test("substring with length")(
    assert(one("RETURN substring('abcdef', 1, 3) AS s") == "bcd"))
  test("toString of null is null")(
    assert(one("RETURN toString(null) AS s") == null))
  test("split with multichar delimiter")(
    assert(one("RETURN split('a--b--c', '--') AS l") == List("a", "b", "c")))
  test("keys of node") {
    assert(one("MATCH (p:Person {name: 'Alice'}) RETURN keys(p) AS k") match {
      case l: List[_] => l.toSet == Set("name", "age")
      case _ => false
    })
  }
  test("anti-pattern WHERE NOT exists") {
    assert(rows(
      "MATCH (p:Person) WHERE NOT (p)-[:KNOWS]->() RETURN p.name AS n")
      .map(_("n")) == Seq("Dave"))
  }
  test("labels() of multi-label node sorted") {
    assert(one("MATCH (p:Admin) RETURN labels(p) AS l") ==
      List("Admin", "Person"))
  }
  test("id equality across bound vars") {
    assert(rows(
      """MATCH (a:Person {name: 'Alice'}), (b:Person)
        |WHERE id(a) = id(b) RETURN b.name AS n""".stripMargin)
      .map(_("n")) == Seq("Alice"))
  }
  test("type of relationship") {
    assert(one(
      "MATCH (:Person {name: 'Bob'})-[r]->() RETURN type(r) AS t") == "KNOWS")
  }
  test("EXISTS subquery with inner WHERE") {
    assert(rows(
      """MATCH (p:Person)
        |WHERE EXISTS { MATCH (p)-[k:KNOWS]->() WHERE k.w > 2 }
        |RETURN p.name AS n""".stripMargin).map(_("n")) == Seq("Bob"))
  }
  test("ORDER BY in WITH feeds LIMIT downstream") {
    assert(rows(
      """MATCH (p:Person) WITH p ORDER BY p.name DESC LIMIT 1
        |RETURN p.name AS n""".stripMargin).map(_("n")) == Seq("Dave"))
  }
  test("SKIP and LIMIT with params") {
    val df = gs.cypher(g,
      "MATCH (p:Person) RETURN p.name AS n ORDER BY n SKIP $s LIMIT $l",
      Map("s" -> 1, "l" -> 1))
    assert(df.collect().map(_.getString(0)).toSeq == Seq("Bob"))
  }
  test("aggregate grouped by expression key") {
    val r = rows(
      """MATCH (p:Person) RETURN p.age IS NULL AS noAge, count(*) AS c
        |ORDER BY noAge""".stripMargin)
    assert(r.map(m => (m("noAge"), m("c"))) == Seq((false, 2L), (true, 1L)))
  }
  test("reduce over empty list returns initial")(
    assert(one("RETURN reduce(s = 42, x IN [] | s + x) AS r") == 42L))
  test("nested pattern comprehension in list") {
    assert(one(
      """MATCH (a:Person {name: 'Alice'})
        |RETURN size([(a)-[:KNOWS]->(x) | x.name]) AS s""".stripMargin) == 2L)
  }
}
