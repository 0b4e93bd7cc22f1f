package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.api.GraftSession

/** Third edge batch: CONSTRUCT interacting with the rest of the language —
  * var-length / OPTIONAL / UNWIND / aggregation inputs, chained
  * construct-then-query pipelines, and cross-graph composition.
  */
class ConstructInteropSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val gs = GraftSession(spark)
  lazy val g = gs.createGraphFromCypher(
    """CREATE (a:P {n: 'a'})
      |CREATE (b:P {n: 'b'})
      |CREATE (c:P {n: 'c'})
      |CREATE (a)-[:R]->(b)
      |CREATE (b)-[:R]->(c)""".stripMargin)

  test("CONSTRUCT from var-length match input") {
    val g2 = gs.cypherGraph(g,
      """MATCH (x:P)-[:R*1..2]->(y:P)
        |CONSTRUCT NEW (:Reach {from: x.n, to: y.n})
        |RETURN GRAPH""".stripMargin)
    val rows = gs.cypher(g2,
      "MATCH (r:Reach) RETURN r.from AS f, r.to AS t ORDER BY f, t")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows === Seq(("a", "b"), ("a", "c"), ("b", "c")))
  }

  test("CONSTRUCT from aggregated WITH input") {
    val g2 = gs.cypherGraph(g,
      """MATCH (x:P)-[:R]->() WITH x, count(*) AS deg
        |CONSTRUCT NEW (:Deg {n: x.n, d: deg})
        |RETURN GRAPH""".stripMargin)
    val rows = gs.cypher(g2,
      "MATCH (d:Deg) RETURN d.n AS n, d.d AS d ORDER BY n")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows === Seq(("a", 1L), ("b", 1L)))
  }

  test("CONSTRUCT from UNWIND input") {
    val g2 = gs.cypherGraph(g,
      """UNWIND [1, 2, 3] AS i
        |CONSTRUCT NEW (:Num {v: i * 10})
        |RETURN GRAPH""".stripMargin)
    val vs = gs.cypher(g2, "MATCH (n:Num) RETURN n.v AS v ORDER BY v")
      .collect().map(_.getLong(0)).toSeq
    assert(vs === Seq(10L, 20L, 30L))
  }

  test("chained construct: query a constructed graph and construct again") {
    val g2 = gs.cypherGraph(g,
      """MATCH (x:P)-[:R]->(y:P)
        |CONSTRUCT NEW (x)-[:HOP2 {via: y.n}]->(y)
        |RETURN GRAPH""".stripMargin)
    val g3 = gs.cypherGraph(g2,
      """MATCH (x:P)-[h:HOP2]->(y:P)
        |CONSTRUCT NEW (:Edge {s: x.n, t: y.n, via: h.via})
        |RETURN GRAPH""".stripMargin)
    val rows = gs.cypher(g3,
      "MATCH (e:Edge) RETURN e.s AS s, e.t AS t ORDER BY s")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows === Seq(("a", "b"), ("b", "c")))
  }

  test("CONSTRUCT ON self plus NEW adds to a union of the base") {
    gs.register("base", g)
    val g2 = gs.cypherGraph(g,
      """MATCH (x:P {n: 'a'})
        |CONSTRUCT ON base
        |NEW (x)-[:EXTRA]->(:Q {n: 'q'})
        |RETURN GRAPH""".stripMargin)
    // base content retained
    val ps = gs.cypher(g2, "MATCH (p:P) RETURN p.n AS n ORDER BY n")
      .collect().map(_.getString(0)).toSeq
    assert(ps === Seq("a", "b", "c"))
    // new edge attaches to the CLONED base node, not a detached copy
    val q = gs.cypher(g2,
      "MATCH (p:P)-[:EXTRA]->(q:Q) RETURN p.n AS pn, q.n AS qn")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(q === Seq(("a", "q")))
  }

  test("OPTIONAL MATCH null rows do not construct phantom elements") {
    val g2 = gs.cypherGraph(g,
      """MATCH (x:P)
        |OPTIONAL MATCH (x)-[:R]->(y:P {n: 'zzz'})
        |CONSTRUCT CLONE y
        |RETURN GRAPH""".stripMargin)
    val n = gs.cypher(g2, "MATCH (m) RETURN count(*) AS c")
      .collect().head.getLong(0)
    assert(n === 0L)
  }

  test("CLONE of a rel pulls its endpoint nodes in (reference semantics)") {
    // endpoints bound as vars: cloned WITH their labels + properties
    val g2 = gs.cypherGraph(g,
      "MATCH (x:P)-[r:R]->(y:P) CONSTRUCT CLONE r RETURN GRAPH")
    val rows = gs.cypher(g2,
      "MATCH (x)-[:R]->(y) RETURN x.n AS xn, y.n AS yn ORDER BY xn")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows.nonEmpty && rows.forall { case (a, b) => a != null && b != null })
    // anonymous endpoints: bare id-only nodes keep the rel well-formed
    val g3 = gs.cypherGraph(g,
      "MATCH ()-[r:R]->() CONSTRUCT CLONE r RETURN GRAPH")
    val cnt = gs.cypher(g3,
      "MATCH (a)-[:R]->(b) RETURN count(*) AS c").collect().head.getLong(0)
    assert(cnt == rows.size.toLong)
  }

  test("union of two constructed graphs keeps both element sets") {
    val ga = gs.cypherGraph(g,
      "CONSTRUCT NEW (:A {v: 1}) RETURN GRAPH")
    val gb = gs.cypherGraph(g,
      "CONSTRUCT NEW (:B {v: 2}) RETURN GRAPH")
    val u = ga.unionAll(gb)
    val labels = gs.cypher(u, "MATCH (n) RETURN labels(n)[0] AS l ORDER BY l")
      .collect().map(_.getString(0)).toSeq
    assert(labels === Seq("A", "B"))
  }

  // reference MultipleGraphTests "CLONEs with an alias"
  test("CLONE with an AS alias binds the copy for SET") {
    val g2 = gs.cypherGraph(g,
      """MATCH (p:P {n: 'a'})
        |CONSTRUCT CLONE p AS q SET q.cloned = true
        |RETURN GRAPH""".stripMargin)
    val rows = gs.cypher(g2,
      "MATCH (n:P) RETURN n.n AS nm, n.cloned AS c").collect()
    assert(rows.map(r => (r.getString(0), r.getBoolean(1))).toSeq ===
      Seq(("a", true)))
  }

  // reference MultipleGraphTests "construct match construct": a mid-query
  // CONSTRUCT switches the working graph and RESETS the binding table
  // (CONSTRUCT outputs the graph + a unit table)
  test("consecutive construction matches the intermediate graph") {
    val g2 = gs.cypherGraph(g,
      """MATCH (p:P)
        |CONSTRUCT NEW (:Stage1 {n: p.n})
        |MATCH (s:Stage1)
        |CONSTRUCT NEW (:Stage2 {n2: s.n})
        |RETURN GRAPH""".stripMargin)
    val rows = gs.cypher(g2,
      "MATCH (s:Stage2) RETURN s.n2 AS n ORDER BY n")
      .collect().map(_.getString(0)).toSeq
    assert(rows === Seq("a", "b", "c")) // one per Stage1 node, no fan-out
  }

  test("mid-query CONSTRUCT feeding a records RETURN") {
    val rows = gs.cypher(g,
      """MATCH (p:P)
        |CONSTRUCT NEW (:T {v: p.n})
        |MATCH (t:T)
        |RETURN t.v AS v ORDER BY v""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(rows === Seq("a", "b", "c"))
  }

  // reference "should CONSTRUCT a graph with multiple connected CREATE
  // clauses": later NEW parts reuse earlier parts' fresh vars
  test("multiple NEW clauses share constructed variables") {
    val g2 = gs.cypherGraph(g,
      """CONSTRUCT
        |  NEW (a:X {v: 1})
        |  NEW (b:Y {v: 2})
        |  NEW (a)-[:E]->(b)
        |RETURN GRAPH""".stripMargin)
    val rows = gs.cypher(g2,
      "MATCH (x:X)-[:E]->(y:Y) RETURN x.v AS xv, y.v AS yv").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((1L, 2L)))
  }
}
