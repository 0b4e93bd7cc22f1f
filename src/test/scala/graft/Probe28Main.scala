package graft

import org.apache.spark.sql.SparkSession
import graft.api.GraftSession

/** Probe batch 20: projection aliasing rules, UNION tails, UNWIND
  * non-lists, collected-entity field chains. */
object Probe28Main {
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

    def probe(name: String, q: String): Unit = {
      val r = try {
        gs.cypher(g, q).collect().map(_.toSeq.mkString(",")).mkString(" | ")
      } catch { case e: Throwable =>
        s"ERROR(${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(90)})"
      }
      println(f"$name%-38s -> $r")
    }

    probe("with-expr-unaliased",
      "MATCH (p:P) WITH p.name RETURN count(*) AS n") // Neo4j: error must be aliased
    probe("with-var-unaliased-ok",
      "MATCH (p:P) WITH p RETURN count(p) AS n")      // 2 (bare var ok)
    probe("union-order-by-tail",
      "RETURN 2 AS x UNION RETURN 1 AS x ORDER BY x") // Neo4j: ORDER binds to 2nd branch
    probe("unwind-non-list",
      "UNWIND 5 AS x RETURN x")                       // Neo4j: one row (singleton)? or error
    probe("unwind-string",
      "UNWIND 'ab' AS x RETURN x")
    probe("collected-first-field-chain",
      """MATCH (n:P) WITH collect(n) AS ns
        |WITH ns[0] AS first RETURN first.name AS nm""".stripMargin) // a (or b)
    probe("collected-rel-field",
      """MATCH ()-[r:K]->() WITH collect(r) AS rs
        |RETURN rs[0].w AS w, size(rs) AS n""".stripMargin)          // 1, 1
    probe("head-collect-prop",
      "MATCH (n:P) RETURN head(collect(n.name)) AS h")               // a or b
    probe("case-result-type-mix",
      "UNWIND [1, 2] AS v RETURN CASE WHEN v = 1 THEN 'one' ELSE v END AS r")
    probe("limit-expression",
      "MATCH (p:P) RETURN p.name AS n ORDER BY n LIMIT 1 + 1")       // both
    probe("skip-param-like-expr",
      "MATCH (p:P) RETURN p.name AS n ORDER BY n SKIP 2 - 1")        // b
    probe("nested-aggregate-error",
      "MATCH (p:P) RETURN max(count(p)) AS r")   // Neo4j: nested agg error
    probe("aggregate-in-where-error",
      "MATCH (p:P) WHERE count(p) > 1 RETURN p.name") // Neo4j: error, use WITH
    probe("distinct-star-invalid",
      "MATCH (p:P) RETURN DISTINCT * ORDER BY p.name LIMIT 1")
    spark.stop()
  }
}
