package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.api.GraftSession

/** Fifth edge batch: var-length pattern corners (zero-length, undirected,
  * self-loops, multiple var-length hops in one pattern) and aggregation
  * shapes (grouped collect ordering, aggregates of aggregates via WITH,
  * count on optional vars, min/max over mixed null groups).
  */
class EdgeSemantics4Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val gs = GraftSession(spark)
  // diamond with a self-loop: a→b→d, a→c→d, d→d
  lazy val g = gs.createGraphFromCypher(
    """CREATE (a:V {n: 'a'})
      |CREATE (b:V {n: 'b'})
      |CREATE (c:V {n: 'c'})
      |CREATE (d:V {n: 'd'})
      |CREATE (a)-[:E {w: 1}]->(b)
      |CREATE (a)-[:E {w: 2}]->(c)
      |CREATE (b)-[:E {w: 3}]->(d)
      |CREATE (c)-[:E {w: 4}]->(d)
      |CREATE (d)-[:E {w: 5}]->(d)""".stripMargin)

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

  test("zero-length var-length binds same node") {
    assert(rows("MATCH (x:V {n: 'a'})-[:E*0..0]->(y) RETURN y.n AS n")
      .map(_("n")) == Seq("a"))
  }
  test("var-length *0..1 includes both lengths") {
    assert(rows("MATCH (x:V {n: 'a'})-[:E*0..1]->(y) RETURN y.n AS n ORDER BY n")
      .map(_("n")) == Seq("a", "b", "c"))
  }
  test("self-loop traversed once per rel-uniqueness") {
    // d→d→d would reuse the same rel: only length-1 paths allowed
    assert(rows("MATCH (x:V {n: 'd'})-[:E*1..2]->(y:V {n: 'd'}) RETURN count(*) AS c")
      .head("c") == 1L)
  }
  test("two var-length hops in one pattern") {
    // a -*1..1-> m -*1..1-> d: via b or via c
    assert(rows(
      """MATCH (x:V {n: 'a'})-[:E*1..1]->(m)-[:E*1..1]->(y:V {n: 'd'})
        |RETURN m.n AS n ORDER BY n""".stripMargin)
      .map(_("n")) == Seq("b", "c"))
  }
  test("undirected var-length reaches both directions") {
    assert(rows("MATCH (x:V {n: 'b'})-[:E*1..1]-(y) RETURN y.n AS n ORDER BY n")
      .map(_("n")) == Seq("a", "d"))
  }
  test("var-length path count with rel list length") {
    assert(rows(
      """MATCH (x:V {n: 'a'})-[rs:E*1..3]->(y:V {n: 'd'})
        |RETURN size(rs) AS l, count(*) AS c ORDER BY l""".stripMargin)
      .map(m => (m("l"), m("c"))) == Seq((2L, 2L), (3L, 2L)))
  }
  test("aggregate of aggregate via WITH") {
    // per-node out-degree, then max over those
    assert(one(
      """MATCH (x:V)-[:E]->() WITH x, count(*) AS deg
        |RETURN max(deg) AS m""".stripMargin) == 2L)
  }
  test("count of optional var counts matches only") {
    assert(one(
      """MATCH (x:V) OPTIONAL MATCH (x)-[:E]->(y:V {n: 'd'})
        |RETURN count(y) AS c""".stripMargin) == 3L)
  }
  test("count star with optional counts all rows") {
    assert(one(
      """MATCH (x:V) OPTIONAL MATCH (x)-[:E]->(y:V {n: 'd'})
        |RETURN count(*) AS c""".stripMargin) == 4L)
  }
  test("collect with ORDER BY upstream is ordered") {
    assert(one(
      """MATCH (x:V)-[e:E]->(:V {n: 'd'}) WITH e ORDER BY e.w
        |RETURN collect(e.w) AS ws""".stripMargin) == List(3L, 4L, 5L))
  }
  test("grouping key appears with no matches for other key") {
    val r = rows(
      """MATCH (x:V) OPTIONAL MATCH (x)-[:E]->(y:V {n: 'd'})
        |RETURN x.n AS n, count(y) AS c ORDER BY n""".stripMargin)
    assert(r.map(m => (m("n"), m("c"))) ==
      Seq(("a", 0L), ("b", 1L), ("c", 1L), ("d", 1L)))
  }
  test("min and max in one aggregation") {
    val r = rows("MATCH ()-[e:E]->() RETURN min(e.w) AS lo, max(e.w) AS hi")
    assert(r.head("lo") == 1L && r.head("hi") == 5L)
  }
  test("DISTINCT aggregate vs plain") {
    val r = rows(
      """MATCH (x:V)-[:E]->(y) RETURN count(y) AS c,
        |count(DISTINCT y) AS d""".stripMargin)
    // y values are b, c, d, d, d → 5 rows, 3 distinct nodes
    assert(r.head("c") == 5L && r.head("d") == 3L)
  }
  test("var-length with per-step property filter") {
    assert(rows(
      "MATCH (x:V {n: 'a'})-[:E*1..2 {w: 1}]->(y) RETURN y.n AS n")
      .map(_("n")) == Seq("b"))
  }
  test("unbounded var-length terminates with rel uniqueness") {
    // longest simple path a→{b|c}→d→d(self) = 3 rels
    assert(rows(
      """MATCH (x:V {n: 'a'})-[rs:E*]->(y:V {n: 'd'})
        |RETURN size(rs) AS l ORDER BY l""".stripMargin)
      .map(_("l")) == Seq(2L, 2L, 3L, 3L))
  }
}
