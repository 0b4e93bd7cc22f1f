package graft

import org.apache.spark.sql.SparkSession
import graft.api.GraftSession

/** Probe batch 39b: CONSTRUCT NEW semantics — per-row multiplicity,
  * property maps on NEW edges, NEW with cloned endpoints. */
object Probe46Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gs = GraftSession(spark)
    val g = gs.createGraphFromCypher(
      """CREATE (a:A {k: 1, uid: 0})
        |CREATE (b:B {k: 2, uid: 1})
        |CREATE (c:B {k: 3, uid: 2})
        |CREATE (a)-[:T {uid: 1000}]->(b)
        |CREATE (a)-[:T {uid: 1001}]->(c)""".stripMargin)
    def q(s: String): Unit = {
      print(s.replace('\n', ' ') + "  ==>  ")
      try println(gs.cypher(g, s).collect().map(_.toString).mkString("; "))
      catch { case e: Throwable =>
        println(s"ERROR ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(140)}")
      }
    }
    // NEW edge between cloned nodes: one edge per binding row?
    q("""MATCH (a:A)-[:T]->(b:B)
        |CONSTRUCT CLONE a, b NEW (a)-[:X]->(b)
        |MATCH (x)-[y:X]->(z) RETURN x.uid AS xu, z.uid AS zu ORDER BY zu""".stripMargin)
    // NEW edge with properties
    q("""MATCH (a:A)-[:T]->(b:B)
        |CONSTRUCT CLONE a, b NEW (a)-[:X {w: b.k}]->(b)
        |MATCH (x)-[y:X]->(z) RETURN y.w AS w ORDER BY w""".stripMargin)
    // NEW node
    q("""MATCH (a:A)
        |CONSTRUCT CLONE a NEW (n:Fresh {v: 7})
        |MATCH (m:Fresh) RETURN m.v AS v""".stripMargin)
    // duplicate rows → how many NEW edges? (a matched twice via 2 rels)
    q("""MATCH (a:A)-[:T]->(b)
        |CONSTRUCT CLONE a NEW (a)-[:Y]->(z:Z)
        |MATCH (x)-[y:Y]->(m:Z) RETURN count(*) AS n""".stripMargin)
    // NEW between clone and NEW node
    q("""MATCH (a:A)-[:T]->(b:B)
        |CONSTRUCT CLONE a, b NEW (a)-[:W]->(b) NEW (a)-[:V]->(b)
        |MATCH (x)-[y]->(z) RETURN type(y) AS t ORDER BY t""".stripMargin)
    // exactly duplicate (src,dst) rows: per-row NEW or per-pair?
    val g2 = gs.createGraphFromCypher(
      """CREATE (a:A {uid: 0})
        |CREATE (b:B {uid: 1})
        |CREATE (a)-[:T {uid: 1000}]->(b)
        |CREATE (a)-[:T {uid: 1001}]->(b)""".stripMargin)
    print("dup-pair NEW  ==>  ")
    try println(gs.cypher(g2,
      """MATCH (a:A)-[:T]->(b:B)
        |CONSTRUCT CLONE a, b NEW (a)-[:X]->(b)
        |MATCH (x)-[y:X]->(z) RETURN count(*) AS n""".stripMargin)
      .collect().map(_.toString).mkString("; "))
    catch { case e: Throwable => println("ERROR " + e.getMessage.take(100)) }
    spark.stop()
  }
}
