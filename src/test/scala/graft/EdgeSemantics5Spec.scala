package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.api.GraftSession

/** Sixth edge batch: operator precedence, projection pipeline
  * combinations (DISTINCT + ORDER BY + SKIP/LIMIT in WITH), chained
  * OPTIONAL MATCH, comprehension variable shadowing, and driving-table
  * entry shapes.
  */
class EdgeSemantics5Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val gs = GraftSession(spark)
  lazy val g = gs.createGraphFromCypher(
    """CREATE (a:U {n: 'a', v: 1})
      |CREATE (b:U {n: 'b', v: 2})
      |CREATE (c:U {n: 'c', v: 2})
      |CREATE (a)-[:L]->(b)
      |CREATE (b)-[:L]->(c)""".stripMargin)

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

  test("multiplication binds tighter than addition")(
    assert(one("RETURN 2 + 3 * 4 AS x") == 14L))
  test("unary minus before exponent")(
    assert(one("RETURN -2 ^ 2 AS x") == 4.0)) // (-2)^2 per Cypher
  test("NOT binds looser than comparison")(
    assert(one("RETURN NOT 1 > 2 AS x") == true))
  test("AND binds tighter than OR")(
    assert(one("RETURN true OR false AND false AS x") == true))
  test("XOR truth table corner")(
    assert(one("RETURN true XOR true AS x") == false))
  test("string concat with number via toString only") {
    // '+' on string+integer concatenates in Cypher
    assert(one("RETURN 'a' + 1 AS x") == "a1")
  }
  test("modulo on floats")(
    assert(one("RETURN 5.5 % 2 AS x") == 1.5))
  test("WITH DISTINCT then ORDER BY then SKIP and LIMIT") {
    val r = rows(
      """MATCH (u:U) WITH DISTINCT u.v AS v ORDER BY v DESC SKIP 1 LIMIT 1
        |RETURN v""".stripMargin)
    assert(r.map(_("v")) == Seq(1L))
  }
  test("two chained OPTIONAL MATCHes with intermediate WHERE") {
    val r = rows(
      """MATCH (a:U {n: 'a'})
        |OPTIONAL MATCH (a)-[:L]->(b)
        |OPTIONAL MATCH (b)-[:L]->(c) WHERE c.v = 2
        |RETURN b.n AS bn, c.n AS cn""".stripMargin)
    assert(r == Seq(Map("bn" -> "b", "cn" -> "c")))
  }
  test("optional match on null binding stays null") {
    val r = rows(
      """MATCH (a:U {n: 'c'})
        |OPTIONAL MATCH (a)-[:L]->(b)
        |OPTIONAL MATCH (b)-[:L]->(c)
        |RETURN b.n AS bn, c.n AS cn""".stripMargin)
    assert(r == Seq(Map("bn" -> null, "cn" -> null)))
  }
  test("comprehension variable shadows outer") {
    val r = one(
      """MATCH (u:U {n: 'a'}) WITH u.v AS x
        |RETURN [x IN [10, 20] | x + 1] AS l""".stripMargin)
    assert(r == List(11L, 21L))
  }
  test("nested comprehensions with distinct vars") {
    assert(one(
      "RETURN [x IN [1,2] | [y IN [10] | x + y]] AS l") ==
      List(List(11L), List(12L)))
  }
  test("driving table binds columns as value vars") {
    import spark.implicits._
    val driving = Seq(("a", 10L), ("c", 30L)).toDF("name", "bonus")
    val df = gs.cypher(g,
      """MATCH (u:U) WHERE u.n = name
        |RETURN u.n AS n, u.v + bonus AS t ORDER BY n""".stripMargin,
      Map.empty, driving)
    assert(df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a", 11L), ("c", 32L)))
  }
  test("driving table with UNWIND extension") {
    import spark.implicits._
    val driving = Seq(Seq(1, 2), Seq(3)).toDF("xs")
    val df = gs.cypher(g,
      "UNWIND xs AS x RETURN x ORDER BY x", Map.empty, driving)
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(1, 2, 3))
  }
  test("aliased expression visible to ORDER BY in RETURN") {
    val r = rows(
      "MATCH (u:U) RETURN u.n AS n, u.v * -1 AS nv ORDER BY nv, n")
    assert(r.map(_("n")) == Seq("b", "c", "a"))
  }
  test("CASE in WHERE") {
    val r = rows(
      """MATCH (u:U) WHERE CASE WHEN u.v = 2 THEN true ELSE false END
        |RETURN u.n AS n ORDER BY n""".stripMargin)
    assert(r.map(_("n")) == Seq("b", "c"))
  }
  test("list membership of computed element")(
    assert(one("RETURN (1 + 1) IN [2, 3] AS x") == true))
  test("exists() property form") {
    val r = rows(
      "MATCH (u:U) WHERE u.v IS NOT NULL RETURN count(*) AS c")
    assert(r.head("c") == 3L)
  }
}
