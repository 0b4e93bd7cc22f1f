package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.api.GraftSession
import graft.sources.CypherCreateGraph

/** shortestPath()/allShortestPaths() — extension beyond the reference
  * (which supports neither): bounded var-length expand + one window
  * keyed by the endpoint pair. The diamond fixtures make the min-length
  * filter non-vacuous: longer alternatives exist and must be dropped.
  */
class ShortestPathSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  lazy val gs = GraftSession(spark)

  // a → d directly, and a → b → d: shortest is the 1-hop
  lazy val diamond = CypherCreateGraph(spark,
    """CREATE (a:P {name: 'a'})-[:E]->(b:P {name: 'b'}),
      |       (b)-[:E]->(d:P {name: 'd'}),
      |       (a)-[:E]->(d)""".stripMargin)

  // two distinct 2-hop routes a→b→d / a→c→d, no direct edge
  lazy val twin = CypherCreateGraph(spark,
    """CREATE (a:P {name: 'a'})-[:E]->(b:P {name: 'b'}),
      |       (a)-[:E]->(c:P {name: 'c'}),
      |       (b)-[:E]->(d:P {name: 'd'}),
      |       (c)-[:E]->(d)""".stripMargin)

  test("shortestPath keeps only the minimum-length path per pair") {
    val df = gs.cypher(diamond,
      """MATCH p = shortestPath((a:P {name: 'a'})-[:E*1..3]->(d:P {name: 'd'}))
        |RETURN length(p) AS len""".stripMargin)
    val rows = df.collect()
    assert(rows.length == 1)
    assert(rows.head.getLong(0) == 1)
  }

  test("allShortestPaths keeps every tie at the minimum length") {
    val df = gs.cypher(twin,
      """MATCH p = allShortestPaths((a:P {name: 'a'})-[:E*1..3]->(d:P {name: 'd'}))
        |RETURN length(p) AS len, nodes(p) AS ns""".stripMargin)
    val rows = df.collect()
    assert(rows.length == 2) // via b and via c
    assert(rows.forall(_.getLong(0) == 2))
  }

  test("shortestPath picks one deterministic winner among ties") {
    val df = gs.cypher(twin,
      """MATCH p = shortestPath((a:P {name: 'a'})-[:E*1..3]->(d:P {name: 'd'}))
        |RETURN length(p) AS len""".stripMargin)
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("shortestPath applies per endpoint pair with open ends") {
    // from a: to b (1 hop), to c (1), to d (1 in diamond, not 2)
    val df = gs.cypher(diamond,
      """MATCH p = shortestPath((a:P {name: 'a'})-[:E*1..3]->(x:P))
        |RETURN x.name AS name, length(p) AS len ORDER BY name""".stripMargin)
    val rows = df.collect().map(r => r.getString(0) -> r.getLong(1))
    assert(rows.toSeq == Seq("b" -> 1L, "d" -> 1L))
  }

  test("unnamed shortestPath pattern works without path functions") {
    val df = gs.cypher(diamond,
      """MATCH shortestPath((a:P {name: 'a'})-[:E*1..3]->(d:P {name: 'd'}))
        |RETURN a.name AS an, d.name AS dn""".stripMargin)
    assert(df.collect().map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("a", "d")))
  }

  test("GraphX landmark BFS agrees with the bounded shortestPath") {
    import graft.interop.GraphXExport
    val ids = gs.cypher(diamond, "MATCH (n:P) RETURN n.name AS name, id(n) AS i")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val dists = GraphXExport.shortestPathLengths(diamond, Seq(ids("d")))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(dists(ids("d")) == 0)
    assert(dists(ids("b")) == 1)
    assert(dists(ids("a")) == 1, "direct edge must beat the 2-hop route")
  }

  test("GraphX landmark BFS undirected reaches against edge direction") {
    import graft.interop.GraphXExport
    val ids = gs.cypher(twin, "MATCH (n:P) RETURN n.name AS name, id(n) AS i")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val directed = GraphXExport.shortestPathLengths(twin, Seq(ids("a")))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(directed.get(ids("d")).isEmpty, "d cannot reach a along edges")
    val undirected = GraphXExport
      .shortestPathLengths(twin, Seq(ids("a")), undirected = true)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(undirected(ids("d")) == 2)
  }

  test("zero-length lower bound: shortest to self is the empty path") {
    val df = gs.cypher(diamond,
      """MATCH p = shortestPath((a:P {name: 'a'})-[:E*0..3]->(x:P {name: 'a'}))
        |RETURN length(p) AS len""".stripMargin)
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(0L))
  }
}
