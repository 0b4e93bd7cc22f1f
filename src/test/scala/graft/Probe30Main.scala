package graft

import org.apache.spark.sql.SparkSession
import graft.api.GraftSession

/** Probe batch 22: CONSTRUCT and catalog-view corners. */
object Probe30Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gs = GraftSession(spark)
    val g = gs.createGraphFromCypher(
      """CREATE (a:P {name: 'a', age: 10})
        |CREATE (b:P {name: 'b', age: 20})
        |CREATE (a)-[:K {w: 1}]->(b)""".stripMargin)
    gs.register("pg", g)

    def probe(name: String, thunk: => org.apache.spark.sql.DataFrame): Unit = {
      val r = try {
        thunk.collect().map(_.toSeq.mkString(",")).mkString(" | ")
      } catch { case e: Throwable =>
        s"ERROR(${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(90)})"
      }
      println(f"$name%-38s -> $r")
    }
    def q(s: String) = gs.cypher(g, s)

    // CLONE a rel without cloning endpoints: reference auto-adds them
    probe("clone-rel-auto-endpoints", {
      val g2 = gs.cypherGraph(g,
        "MATCH (x:P)-[r:K]->(y:P) CONSTRUCT CLONE r RETURN GRAPH")
      gs.cypher(g2, "MATCH (x)-[r:K]->(y) RETURN x.name AS xn, y.name AS yn")
    })
    // NEW with properties computed from aggregates via WITH
    probe("construct-after-aggregate", {
      val g2 = gs.cypherGraph(g,
        """MATCH (p:P) WITH count(*) AS n
          |CONSTRUCT NEW (:Stat {cnt: n}) RETURN GRAPH""".stripMargin)
      gs.cypher(g2, "MATCH (s:Stat) RETURN s.cnt AS c")
    })
    // NEW rel between two CLONEs with copied + computed props
    probe("new-rel-computed-props", {
      val g2 = gs.cypherGraph(g,
        """MATCH (x:P)-[r:K]->(y:P)
          |CONSTRUCT CLONE x, y NEW (x)-[:W2 {w2: r.w * 2}]->(y)
          |RETURN GRAPH""".stripMargin)
      gs.cypher(g2, "MATCH ()-[r:W2]->() RETURN r.w2 AS w")
    })
    // view with a VALUE parameter alongside the graph parameter
    probe("view-with-value-param", {
      gs.cypher(
        """CATALOG CREATE VIEW older($g, $minAge) {
          |  FROM $g MATCH (p:P) WHERE p.age >= $minAge
          |  CONSTRUCT CLONE p RETURN GRAPH
          |}""".stripMargin)
      gs.cypher("FROM GRAPH older(pg, 15) MATCH (p:P) RETURN p.name AS n")
    })
    // CONSTRUCT ... SET on NEW nodes
    probe("set-on-new", {
      val g2 = gs.cypherGraph(g,
        """MATCH (p:P) CONSTRUCT NEW (c:Copy {name: p.name})
          |SET c.flag = true RETURN GRAPH""".stripMargin)
      gs.cypher(g2, "MATCH (c:Copy) RETURN c.name AS n, c.flag AS f ORDER BY n")
    })
    // DETACH-less double clone of same node via two vars = one node
    probe("clone-dedup-by-id", {
      val g2 = gs.cypherGraph(g,
        """MATCH (x:P)-[r:K]->(y:P)
          |CONSTRUCT CLONE x, x, r RETURN GRAPH""".stripMargin)
      gs.cypher(g2, "MATCH (n:P) RETURN count(*) AS n")
    })
    spark.stop()
  }
}
