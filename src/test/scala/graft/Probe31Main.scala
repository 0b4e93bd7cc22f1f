package graft

import org.apache.spark.sql.SparkSession
import graft.api.GraftSession

/** Probe batch 23: OPTIONAL MATCH × var-length × quantifier interplay. */
object Probe31Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gs = GraftSession(spark)
    val g = gs.createGraphFromCypher(
      """CREATE (a:P {name: 'a'}), (b:P {name: 'b'}), (c:P {name: 'c'})
        |CREATE (d:Q {name: 'd'})
        |CREATE (a)-[:K {w: 1}]->(b), (b)-[:K {w: 5}]->(c)""".stripMargin)

    def probe(name: String, q: String): Unit = {
      val r = try {
        gs.cypher(g, q).collect().map(_.toSeq.mkString(",")).mkString(" | ")
      } catch { case e: Throwable =>
        s"ERROR(${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(90)})"
      }
      println(f"$name%-40s -> $r")
    }

    probe("optional-varlength-quantifier",
      """MATCH (n {name: 'a'}) OPTIONAL MATCH (n)-[rs:K*1..2]->(m)
        |WHERE all(r IN rs WHERE r.w < 3)
        |RETURN m.name AS mn ORDER BY mn""".stripMargin)   // b only (w=5 blocks a->b->c)
    probe("optional-varlength-no-match-null",
      """MATCH (n:Q) OPTIONAL MATCH (n)-[rs:K*1..2]->(m)
        |RETURN n.name AS nn, m.name AS mn""".stripMargin) // d, null
    probe("two-optionals-share-var",
      """MATCH (n {name: 'a'})
        |OPTIONAL MATCH (n)-[:K]->(m)
        |OPTIONAL MATCH (m)-[:K]->(o)
        |RETURN m.name AS mn, o.name AS on""".stripMargin) // b, c
    probe("unwind-null-list-after-optional",
      """MATCH (n:Q) OPTIONAL MATCH (n)-[rs:K*1..2]->()
        |UNWIND rs AS r RETURN count(r) AS c""".stripMargin) // 0 rows → count 0? (agg over none)
    probe("optional-where-on-varlength-props",
      """MATCH (n {name: 'a'}) OPTIONAL MATCH (n)-[rs:K*2..2]->(m)
        |WHERE any(r IN rs WHERE r.w > 10)
        |RETURN n.name AS nn, m.name AS mn""".stripMargin)  // a, null (no qualifying path)
    probe("optional-path-length-null",
      """MATCH (n:Q) OPTIONAL MATCH p = (n)-[:K*1..2]->(m)
        |RETURN length(p) AS len""".stripMargin)            // null
    probe("varlength-quantifier-under-not",
      """MATCH (n {name: 'a'})-[rs:K*1..2]->(m)
        |WHERE NOT any(r IN rs WHERE r.w > 3)
        |RETURN m.name AS mn""".stripMargin)                // b (a->b->c has w=5)
    probe("optional-then-construct-graph-count",
      """MATCH (n:Q) OPTIONAL MATCH (n)-[:K]->(m)
        |RETURN count(m) AS c""".stripMargin)               // 0
    spark.stop()
  }
}
