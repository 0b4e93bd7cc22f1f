package graft

import org.apache.spark.sql.SparkSession
import graft.api.GraftSession

/** Probe batch 19: entity value semantics — equality, membership,
  * dynamic property access, collected-entity field access. */
object Probe27Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gs = GraftSession(spark)
    val g = gs.createGraphFromCypher(
      """CREATE (a:P {name: 'a', age: 10})
        |CREATE (b:P {name: 'b', age: 20})
        |CREATE (a)-[:K {w: 1}]->(b), (b)-[:K {w: 2}]->(a)""".stripMargin)

    def probe(name: String, q: String,
        params: Map[String, Any] = Map.empty): Unit = {
      val r = try {
        gs.cypher(g, q, params).collect().map(_.toSeq.mkString(",")).mkString(" | ")
      } catch { case e: Throwable =>
        s"ERROR(${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(90)})"
      }
      println(f"$name%-38s -> $r")
    }

    probe("node-equality-same-var",
      "MATCH (a:P), (b:P) WHERE a = b RETURN count(*) AS n")          // 2
    probe("node-inequality",
      "MATCH (a:P), (b:P) WHERE a <> b RETURN count(*) AS n")         // 2
    probe("rel-equality",
      "MATCH (:P)-[r1:K]->(:P), (:P)-[r2:K]->(:P) WHERE r1 = r2 RETURN count(*) AS n") // 2
    probe("dynamic-prop-access",
      "MATCH (n:P) RETURN n['name'] AS x ORDER BY x")                 // a | b
    probe("dynamic-prop-access-var-key",
      "WITH 'age' AS k MATCH (n:P) RETURN n[k] AS x ORDER BY x")      // 10 | 20
    probe("collected-node-index-prop",
      """MATCH (n:P) WITH collect(n) AS ns
        |RETURN size(ns) AS s, ns[0].name IS NOT NULL AS hasName""".stripMargin)
    probe("entity-in-collected-list",
      """MATCH (a:P {name: 'a'}) MATCH (n:P) WITH a, collect(n) AS ns
        |RETURN a IN ns AS hit""".stripMargin)                        // true
    probe("exists-prop-function",
      "MATCH (n:P) RETURN exists(n.age) AS e, exists(n.zzz) AS z LIMIT 1") // true,false
    probe("node-distinct-count",
      "MATCH (a:P)-[:K]->() RETURN count(DISTINCT a) AS n")           // 2
    probe("replace-empty-search",
      "RETURN replace('abc', '', 'x') AS r")                          // Neo4j: 'abc' unchanged
    probe("replace-remove",
      "RETURN replace('aaa', 'a', '') AS r")                          // ''
    probe("reduce-mixed-acc",
      "RETURN reduce(s = 0.0, x IN [1, 2, 3] | s + x) AS r")          // 6.0
    probe("nested-param-map",
      "RETURN $conf.thresholds[0] AS t",
      Map("conf" -> Map("thresholds" -> Seq(5L, 9L))))
    spark.stop()
  }
}
