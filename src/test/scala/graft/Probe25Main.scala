package graft

import org.apache.spark.sql.SparkSession
import graft.api.GraftSession

/** Probe batch 17: clause-pipeline and quantifier corners. */
object Probe25Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gs = GraftSession(spark)
    val g = gs.createGraphFromCypher(
      """CREATE (a:P {name: 'a', age: 10, city: 'X'})
        |CREATE (b:P {name: 'b', age: 20, city: 'X'})
        |CREATE (c:P {name: 'c', age: 30, city: 'Y'})
        |CREATE (a)-[:K]->(b), (b)-[:K]->(a), (b)-[:K]->(c)""".stripMargin)

    def probe(name: String, q: String): Unit = {
      val r = try {
        gs.cypher(g, q).collect().map(_.toSeq.mkString(",")).mkString(" | ")
      } catch { case e: Throwable =>
        s"ERROR(${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(100)})"
      }
      println(f"$name%-36s -> $r")
    }

    // stacked aggregation via WITH
    probe("agg-of-agg",
      "MATCH (p:P) WITH p.city AS c, count(*) AS n WITH max(n) AS m RETURN m")
    // Neo4j: ORDER BY after RETURN DISTINCT may only use returned columns
    probe("distinct-order-by-unprojected",
      "MATCH (p:P) RETURN DISTINCT p.city AS c ORDER BY p.age")
    // RETURN * with nothing in scope: Neo4j error
    probe("return-star-empty-scope", "RETURN *")
    probe("with-star-then-agg",
      "MATCH (p:P) WITH * RETURN count(p.age) AS n")
    // quantifier with non-boolean predicate: Neo4j type error
    probe("any-non-boolean-pred",
      "RETURN any(x IN [1, 2] WHERE x) AS r")
    // percentile with DISTINCT
    probe("percentile-distinct",
      "UNWIND [1, 1, 1, 100] AS v RETURN percentileCont(DISTINCT v, 0.5) AS r")
    probe("percentile-disc-distinct",
      "UNWIND [1, 1, 1, 100] AS v RETURN percentileDisc(DISTINCT v, 0.5) AS r")
    // var-length cycle back to the SAME variable
    probe("varlength-cycle-to-self",
      "MATCH (a:P)-[:K*2..2]->(a) RETURN a.name AS n ORDER BY n")
    probe("fixed-cycle-to-self",
      "MATCH (a:P)-[:K]->(b:P)-[:K]->(a) RETURN a.name AS n ORDER BY n")
    // toString on temporals
    probe("tostring-date",
      "RETURN toString(date('2024-02-29')) AS d, toString(3.0) AS f, toString(true) AS b")
    // negative zero
    probe("negative-zero-eq", "RETURN 0.0 = -0.0 AS eq, 1.0/0.0 > 1.0/-0.0 AS inf")
    // unwind of map list then property access after aggregate
    probe("unwind-map-agg",
      "UNWIND [{k: 1}, {k: 2}] AS m RETURN sum(m.k) AS s")
    // WITH alias used in later WHERE with aggregate present
    probe("with-agg-alias-in-where",
      """MATCH (p:P) WITH p.city AS c, count(*) AS n WHERE n > 1
        |RETURN c, n""".stripMargin)
    // DISTINCT keeps null rows once
    probe("distinct-null-once",
      "UNWIND [null, null, 1] AS v RETURN DISTINCT v ORDER BY v")
    // list of structs equality in DISTINCT
    probe("distinct-list-of-maps",
      "UNWIND [[{a: 1}], [{a: 1}], [{a: 2}]] AS l RETURN count(DISTINCT l) AS n")
    // label predicate in RETURN
    probe("label-predicate-in-return",
      "MATCH (p) RETURN p.name AS n, p:P AS isP ORDER BY n")
    spark.stop()
  }
}
