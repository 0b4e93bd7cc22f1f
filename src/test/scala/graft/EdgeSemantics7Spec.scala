package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.api.GraftSession

/** Entity-valued collect() and uncorrelated (zero-bound-variable) pattern
  * predicates/comprehensions — both are global/one-shot plans, never
  * per-row subqueries. */
class EdgeSemantics7Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val gs = GraftSession(spark)
  lazy val g = gs.createGraphFromCypher(
    """CREATE (a:P {name: 'Ann', age: 30})
      |CREATE (b:P {name: 'Bob', age: 20})
      |CREATE (c:Q {name: 'Cid'})
      |CREATE (a)-[:K {w: 1}]->(b)
      |CREATE (b)-[:K {w: 2}]->(c)""".stripMargin)

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

  test("collect(node) → UNWIND → property access") {
    val rs = rows("MATCH (n:P) WITH collect(n) AS ns UNWIND ns AS x " +
      "RETURN x.name AS nm, x.age AS ag ORDER BY nm")
    assert(rs.map(r => (r("nm"), r("ag"))) == Seq(("Ann", 30L), ("Bob", 20L)))
  }

  test("collect(node) elements answer labels() and id()") {
    val rs = rows("MATCH (n:P) WITH collect(n) AS ns UNWIND ns AS x " +
      "RETURN labels(x) AS ls, id(x) IS NOT NULL AS h")
    assert(rs.forall(_("ls") == List("P")))
    assert(rs.forall(_("h") == true))
  }

  test("collect(rel) elements answer type() and properties") {
    val rs = rows("MATCH ()-[r:K]->() WITH collect(r) AS rs UNWIND rs AS x " +
      "RETURN type(x) AS t, x.w AS w ORDER BY w")
    assert(rs.map(r => (r("t"), r("w"))) == Seq(("K", 1L), ("K", 2L)))
  }

  test("collect skips null entities from OPTIONAL non-matches") {
    val rs = rows("MATCH (n:P) OPTIONAL MATCH (n)-[:K]->(m:Q) " +
      "WITH n, collect(m) AS ms RETURN n.name AS nm, size(ms) AS c ORDER BY nm")
    assert(rs.map(r => (r("nm"), r("c"))) == Seq(("Ann", 0L), ("Bob", 1L)))
  }

  test("collect DISTINCT over entities dedups by full value") {
    assert(one("MATCH (n:P) WITH collect(DISTINCT n) AS ns " +
      "RETURN size(ns) AS c") == 2L)
  }

  test("value collect unchanged by entity support") {
    assert(one("MATCH (n:P) RETURN collect(n.name) AS names")
      .asInstanceOf[List[_]].toSet == Set("Ann", "Bob"))
  }

  test("uncorrelated exists() in RETURN") {
    assert(one("RETURN exists((:P {name:'Ann'})-[:K]->()) AS e") == true)
    assert(one("RETURN exists((:P {name:'Zed'})-[:K]->()) AS e") == false)
  }

  test("uncorrelated pattern predicate in WHERE keeps/drops all rows") {
    assert(rows("MATCH (n:Q) WHERE (:P {name:'Ann'})-[:K]->() " +
      "RETURN n.name AS nm").map(_("nm")) == Seq("Cid"))
    assert(rows("MATCH (n:Q) WHERE (:P {name:'Zed'})-[:K]->() " +
      "RETURN n.name AS nm").isEmpty)
    assert(rows("MATCH (n:Q) WHERE NOT (:P {name:'Zed'})-[:K]->() " +
      "RETURN n.name AS nm").map(_("nm")) == Seq("Cid"))
  }

  test("uncorrelated pattern comprehension") {
    assert(one("RETURN [(p:P)-[:K]->(q) | q.name] AS names")
      .asInstanceOf[List[_]].toSet == Set("Bob", "Cid"))
    assert(one("RETURN size([(p:P)-[:K]->() | 1]) AS deg") == 2L)
    assert(one("RETURN [(p:Zed)-->() | 1] AS l") == List())
  }
}
