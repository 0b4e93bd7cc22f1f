package graft

import org.apache.spark.sql.SparkSession

import graft.api.GraftSession

/** What do EXISTS {} subqueries and pattern predicates evaluate to when an
  * outer variable is null (failed OPTIONAL MATCH)? Establishes the engine
  * semantics the differential NaiveEval must mirror before ExistsE joins
  * the generator grammar.
  */
object ProbeExistsNullMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gs = GraftSession(spark)
    val g = gs.createGraphFromCypher(
      """CREATE (v0:A {k: 1})
        |CREATE (v1:A {k: 2})
        |CREATE (v2:B {k: 3})
        |CREATE (v0)-[:T {w: 1}]->(v2)
        |CREATE (v2)-[:T {w: 2}]->(v2)
        |""".stripMargin)

    def show(label: String, q: String): Unit = {
      println(s"== $label\n$q")
      try gs.cypher(g, q).show(20, false)
      catch { case e: Throwable =>
        println(s"ERROR ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(300)}")
      }
    }

    // m is null for a.k=2 (no outgoing :T)
    show("EXISTS block on null var in WHERE",
      """MATCH (a:A) OPTIONAL MATCH (a)-[:T]->(m:B)
        |WITH a, m WHERE EXISTS { MATCH (m)-[:T]->(x) }
        |RETURN a.k AS ak""".stripMargin)
    show("NOT EXISTS block on null var in WHERE",
      """MATCH (a:A) OPTIONAL MATCH (a)-[:T]->(m:B)
        |WITH a, m WHERE NOT EXISTS { MATCH (m)-[:T]->(x) }
        |RETURN a.k AS ak""".stripMargin)
    show("pattern predicate on null var in WHERE",
      """MATCH (a:A) OPTIONAL MATCH (a)-[:T]->(m:B)
        |WITH a, m WHERE (m)-[:T]->()
        |RETURN a.k AS ak""".stripMargin)
    show("NOT pattern predicate on null var in WHERE",
      """MATCH (a:A) OPTIONAL MATCH (a)-[:T]->(m:B)
        |WITH a, m WHERE NOT (m)-[:T]->()
        |RETURN a.k AS ak""".stripMargin)
    show("EXISTS block as RETURN expression",
      """MATCH (a:A) OPTIONAL MATCH (a)-[:T]->(m:B)
        |RETURN a.k AS ak, EXISTS { MATCH (m)-[:T]->(x) } AS e""".stripMargin)
    show("pattern predicate as RETURN expression",
      """MATCH (a:A) OPTIONAL MATCH (a)-[:T]->(m:B)
        |RETURN a.k AS ak, (m)-[:T]->() AS e""".stripMargin)
    show("EXISTS block, both endpoints bound",
      """MATCH (a:A), (b:B)
        |WHERE EXISTS { MATCH (a)-[:T]->(b) }
        |RETURN a.k AS ak, b.k AS bk""".stripMargin)
    show("EXISTS block with inner WHERE",
      """MATCH (a:A)
        |WHERE EXISTS { MATCH (a)-[r:T]->(x) WHERE r.w > 1 }
        |RETURN a.k AS ak""".stripMargin)
    show("EXISTS block var-length",
      """MATCH (a:A)
        |WHERE EXISTS { MATCH (a)-[:T*1..2]->(x:B) }
        |RETURN a.k AS ak""".stripMargin)
    spark.stop()
  }
}
