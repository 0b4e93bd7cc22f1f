package graft

import org.apache.spark.sql.SparkSession
import graft.api.GraftSession

/** Probe batch 36: exact map-equality semantics + CONSTRUCT CLONE dedup,
  * shaping the round-6 differential map/construct grammar. */
object Probe42Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gs = GraftSession(spark)
    val g = gs.createGraphFromCypher(
      """CREATE (a:A {k: 1, s: 'x', uid: 0})
        |CREATE (b:A {k: 1, uid: 1})
        |CREATE (c:B {k: 2, uid: 2})
        |CREATE (a)-[:T {w: 5, uid: 1000}]->(b)
        |CREATE (a)-[:T {w: 6, uid: 1001}]->(c)
        |CREATE (b)-[:S {w: 7, uid: 1002}]->(c)""".stripMargin)
    def q(s: String): Unit = {
      print(s.replace('\n', ' ') + "  ==>  ")
      try println(gs.cypher(g, s).collect().map(_.toString).mkString("; "))
      catch { case e: Throwable =>
        println(s"ERROR ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(140)}")
      }
    }
    // map equality corners: struct-style or ternary?
    q("MATCH (n:A {uid: 0}) RETURN {k: n.missing} = {k: n.missing} AS bothNull")
    q("MATCH (n:A {uid: 0}) RETURN {k: n.missing} <> {k: 1} AS neqNull")
    q("MATCH (n:A {uid: 0}) RETURN {k: 1, s: 'a'} = {k: 1, s: 'b'} AS diff")
    q("MATCH (n) RETURN n {.k, .s} = {k: 1, s: 'x'} AS eq ORDER BY n.uid")
    q("MATCH (n) WHERE n {.k} = {k: 1} RETURN n.uid AS u ORDER BY u")
    q("MATCH (n:A {uid: 0}) RETURN {a: {b: n.k}} AS nested")
    q("MATCH (n:A {uid: 0}) RETURN {a: n.k, b: 'x'}.b AS idx")
    q("MATCH (n) RETURN n {.k}.k AS pk ORDER BY n.uid")
    q("MATCH (n:A {uid: 0}) RETURN {f: n.uid * 0.5, b: true} AS m2")
    // DISTINCT over maps
    q("MATCH (n:A) RETURN DISTINCT n {.k} AS m")
    // map in CASE / coalesce
    q("MATCH (n:A {uid: 0}) RETURN coalesce({k: n.missing}, {k: 9}) AS c")
    // CONSTRUCT: clone dedup across rows + multiple rels + props survive
    q("""MATCH (a)-[r:T]->(b)
        |CONSTRUCT CLONE a, r, b
        |MATCH (x)-[y]->(z)
        |RETURN x.uid AS xu, y.uid AS yu, z.uid AS zu ORDER BY yu""".stripMargin)
    q("""MATCH (a)-[r]->(b)
        |CONSTRUCT CLONE a, r, b
        |MATCH (x) RETURN x.uid AS xu ORDER BY xu""".stripMargin)
    q("""MATCH (a:A)-[r:T]->(b)
        |CONSTRUCT CLONE a, r, b
        |MATCH (x:A)-[y:T]->(z) WHERE z.k = 2
        |RETURN x.uid AS xu, z.uid AS zu""".stripMargin)
    // cloned node vars only (no rel) — graph has nodes, no edges
    q("""MATCH (a)-[r:S]->(b)
        |CONSTRUCT CLONE a, b
        |MATCH (x) RETURN x.uid AS xu ORDER BY xu""".stripMargin)
    // clone with a WHERE upstream
    q("""MATCH (a)-[r:T]->(b) WHERE b.uid = 2
        |CONSTRUCT CLONE a, r, b
        |MATCH (x)-[y]->(z) RETURN x.uid AS xu, z.uid AS zu""".stripMargin)
    // post-construct aggregate
    q("""MATCH (a)-[r:T]->(b)
        |CONSTRUCT CLONE a, r, b
        |MATCH (x)-[y]->(z) RETURN count(*) AS n, sum(y.w) AS sw""".stripMargin)
    spark.stop()
  }
}
