package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.api.GraftSession

/** Scalar shells around aggregates: any expression shape wrapping an
  * aggregate call must plan as an aggregating projection item — the
  * aggregate-context compiler composes the shell over the aggregate
  * Column (reference: SparkSQLExprMapper routes every expression through
  * one mapper, so shells compose there implicitly; here aggCtx does it). */
class EdgeSemantics6Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val gs = GraftSession(spark)
  lazy val g = gs.createGraphFromCypher(
    """CREATE (a:P {name: 'Ann', age: 30, team: 'x'})
      |CREATE (b:P {name: 'Bob', age: 20, team: 'x'})
      |CREATE (c:P {name: 'Cid', age: 25, team: 'y'})
      |CREATE (a)-[:K]->(b)
      |CREATE (a)-[:K]->(c)
      |CREATE (b)-[:K]->(c)""".stripMargin)

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

  test("list comprehension over collect is an aggregating item") {
    val rs = rows("MATCH (n:P)-[:K]->(m) " +
      "RETURN n.name AS nm, [x IN collect(m.name) | x] AS ms ORDER BY nm")
    assert(rs.map(_("nm")) == Seq("Ann", "Bob"))
    assert(rs.head("ms").asInstanceOf[List[_]].toSet == Set("Bob", "Cid"))
  }

  test("comprehension filter + DISTINCT over collect") {
    val rs = rows("MATCH (n:P)-[:K]->(m) RETURN n.name AS nm, " +
      "[x IN collect(DISTINCT m.team) WHERE x IS NOT NULL | x] AS ts " +
      "ORDER BY nm")
    assert(rs.head("ts").asInstanceOf[List[_]].toSet == Set("x", "y"))
    assert(rs(1)("ts") == List("y"))
  }

  test("comprehension body transforms collected elements") {
    assert(one("UNWIND [1,2,2] AS v " +
      "RETURN [x IN collect(DISTINCT v) | x * 10] AS l")
      .asInstanceOf[List[_]].toSet == Set(10L, 20L))
  }

  test("reduce over collect") {
    val rs = rows("MATCH (n:P)-[:K]->(m) RETURN n.name AS nm, " +
      "reduce(acc = 0, x IN collect(m.age) | acc + x) AS tot ORDER BY nm")
    assert(rs.map(_("tot")) == Seq(45L, 25L))
  }

  test("CASE over an aggregate") {
    val rs = rows("MATCH (n:P)-[:K]->(m) RETURN n.name AS nm, " +
      "CASE WHEN count(m) > 1 THEN 'many' ELSE 'few' END AS k ORDER BY nm")
    assert(rs.map(_("k")) == Seq("many", "few"))
  }

  test("comparison over aggregates is an aggregating item") {
    assert(one("MATCH (n:P) RETURN count(*) > 2 AS big") == true)
  }

  test("list literal of aggregates") {
    assert(one("MATCH (n:P) RETURN [min(n.age), max(n.age)] AS r")
      == List(20L, 30L))
  }

  test("arithmetic shell keeps Cypher integer division") {
    // sum=75, count=3 → exact 25; double-division shell would give 25.0
    assert(one("MATCH (n:P) RETURN sum(n.age) / count(*) AS mean") == 25L)
  }

  test("scalar function shell over aggregate") {
    assert(one("MATCH (n:P) RETURN size(collect(n.name)) AS c") == 3L)
    assert(one("MATCH (n:P) RETURN toString(count(*)) AS s") == "3")
  }

  test("aggregate in ORDER BY over non-aggregating RETURN rejected") {
    // Neo4j (and the reference's Neo4j front end): "Cannot use
    // aggregation in ORDER BY if there are no aggregate expressions in
    // the preceding RETURN" — implicit grouping from a sort key alone
    // would silently change the cardinality (probe batch 50)
    val e = intercept[Exception](rows(
      "MATCH (n:P)-[:K]->(m) RETURN n.name AS nm ORDER BY count(m) DESC, nm"))
    assert(e.getMessage.contains("ORDER BY"))
  }

  test("aggregate in ORDER BY with aggregating RETURN still legal") {
    val rs = rows("MATCH (n:P)-[:K]->(m) RETURN n.name AS nm, count(*) AS c " +
      "ORDER BY count(m) DESC, nm")
    assert(rs.map(_("nm")) == Seq("Ann", "Bob"))
  }

  test("aggregate in WHERE still rejected") {
    intercept[Exception](rows("MATCH (n:P) WHERE count(*) > 1 RETURN n.name"))
  }

  test("nested aggregate still rejected") {
    intercept[Exception](rows("MATCH (n:P) RETURN max(count(n)) AS x"))
  }
}
