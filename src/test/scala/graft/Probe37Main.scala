package graft

import org.apache.spark.sql.SparkSession
import graft.api.GraftSession

/** Probe batch 29: CONSTRUCT shapes from the reference's
  * MultipleGraphTests (morpheus-testing/.../acceptance/MultipleGraphTests
  * .scala) — consecutive construction, UNWIND-driven construction,
  * multi-copy NEW, CLONE aliasing, cross-graph matching, label pickup.
  */
object Probe37Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gs = GraftSession(spark)
    val g = gs.createGraphFromCypher(
      """CREATE (a:Person {name: 'Alice', age: 30}),
        |       (b:Person {name: 'Bob', age: 40}),
        |       (a)-[:KNOWS {since: 2010}]->(b)""".stripMargin)

    def probeRows(name: String, q: String): Unit = {
      val r = try {
        gs.cypher(g, q).collect().map(_.toSeq.mkString(",")).mkString(" | ")
      } catch { case e: Throwable =>
        s"ERROR(${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(110)})"
      }
      println(f"$name%-44s -> $r")
    }
    def probeGraph(name: String, q: String, check: String): Unit = {
      val r = try {
        val cg = gs.cypherGraph(g, q)
        gs.cypher(cg, check).collect().map(_.toSeq.mkString(",")).mkString(" | ")
      } catch { case e: Throwable =>
        s"ERROR(${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(110)})"
      }
      println(f"$name%-44s -> $r")
    }

    // multiple copies of the same node: NEW per driving row
    probeGraph("new-node-per-row",
      """MATCH (p:Person)
        |CONSTRUCT NEW (:Copy {of: p.name})
        |RETURN GRAPH""".stripMargin,
      "MATCH (c:Copy) RETURN c.of AS o ORDER BY o")
    // UNWIND-driven construction
    probeGraph("unwind-driven-construct",
      """UNWIND [1, 2, 3] AS i
        |CONSTRUCT NEW (:N {v: i})
        |RETURN GRAPH""".stripMargin,
      "MATCH (n:N) RETURN n.v AS v ORDER BY v")
    // construct property from matched node + literal + label pickup
    probeGraph("construct-prop-from-match",
      """MATCH (p:Person {name: 'Alice'})
        |CONSTRUCT NEW (:Derived {src: p.name, lit: 7})
        |RETURN GRAPH""".stripMargin,
      "MATCH (d:Derived) RETURN d.src AS s, d.lit AS l")
    // CLONE with alias
    probeGraph("clone-with-alias",
      """MATCH (p:Person {name: 'Alice'})
        |CONSTRUCT CLONE p AS q SET q.cloned = true
        |RETURN GRAPH""".stripMargin,
      "MATCH (n:Person) RETURN n.name AS nm, n.cloned AS c")
    // implicit clone: relationship construction over matched endpoints
    probeGraph("implicit-clone-rel-endpoints",
      """MATCH (a:Person {name: 'Alice'}), (b:Person {name: 'Bob'})
        |CONSTRUCT NEW (a)-[:LIKES]->(b)
        |RETURN GRAPH""".stripMargin,
      """MATCH (x)-[:LIKES]->(y) RETURN x.name AS xn, y.name AS yn""")
    // consecutive construction: construct, match it, construct again
    probeGraph("consecutive-construction",
      """MATCH (p:Person)
        |CONSTRUCT NEW (:Stage1 {n: p.name})
        |MATCH (s:Stage1)
        |CONSTRUCT NEW (:Stage2 {n2: s.n})
        |RETURN GRAPH""".stripMargin,
      "MATCH (s:Stage2) RETURN s.n2 AS n ORDER BY n")
    // multiple connected NEW clauses
    probeGraph("multiple-connected-news",
      """CONSTRUCT
        |  NEW (a:X {v: 1})
        |  NEW (b:Y {v: 2})
        |  NEW (a)-[:E]->(b)
        |RETURN GRAPH""".stripMargin,
      "MATCH (x:X)-[:E]->(y:Y) RETURN x.v AS xv, y.v AS yv")
    // CONSTRUCT ON a catalog graph
    gs.register("base", g)
    probeGraph("construct-on-adds",
      """MATCH (p:Person {name: 'Alice'})
        |CONSTRUCT ON base CLONE p SET p.extra = 1
        |RETURN GRAPH""".stripMargin,
      "MATCH (n:Person) RETURN n.name AS nm, n.extra AS e ORDER BY nm")
    // copy a relationship (rel CLONE pulls endpoints)
    probeGraph("copy-relationship",
      """MATCH (:Person)-[k:KNOWS]->(:Person)
        |CONSTRUCT CLONE k AS k2
        |RETURN GRAPH""".stripMargin,
      "MATCH (a)-[r:KNOWS]->(b) RETURN a.name AS an, r.since AS s, b.name AS bn")
    spark.stop()
  }
}
