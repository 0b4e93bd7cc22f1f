package graft

import org.apache.spark.sql.SparkSession
import graft.api.GraftSession

/** Probe batch 18: CONSTRUCT corners, catalog views, map projections. */
object Probe18Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gs = GraftSession(spark)
    val g = gs.createGraphFromCypher("""
      CREATE (a:P {n: 'a', v: 1})
      CREATE (b:P {n: 'b', v: 2})
      CREATE (a)-[:R {w: 5}]->(b)
    """)
    gs.register("g", g)
    def run(q: String): Unit = {
      print(q.replaceAll("\\s+", " ").take(100) + "  ==>  ")
      try println(gs.cypher(g, q).collect().map(r =>
        r.toSeq.map(v => if (v == null) "NULL" else v.toString).mkString("(", ",", ")"))
        .mkString("[", " ", "]"))
      catch { case e: Exception => println("ERR " + e.getMessage.take(110)) }
    }
    def runG(q: String): Unit = {
      print(q.replaceAll("\\s+", " ").take(100) + "  ==>  ")
      try {
        val g2 = gs.cypherGraph(g, q)
        println(s"nodes=${g2.nodeTables.map(_.df.count()).sum} rels=${g2.relTables.map(_.df.count()).sum}")
      } catch { case e: Exception => println("ERR " + e.getMessage.take(110)) }
    }
    // CONSTRUCT corners
    runG("MATCH (a:P) CONSTRUCT NEW (:Copy {n: a.n}) RETURN GRAPH")
    runG("MATCH (a:P)-[r:R]->(b) CONSTRUCT CLONE a, b NEW (a)-[:R2 {w2: r.w * 2}]->(b) RETURN GRAPH")
    runG("CONSTRUCT NEW (:Single {k: 1}) RETURN GRAPH") // no match clause
    runG("MATCH (a:P) WHERE a.v > 5 CONSTRUCT NEW (:None {n: a.n}) RETURN GRAPH") // empty
    runG("MATCH (a:P) CONSTRUCT NEW (x:Pair {n: a.n}), NEW (x)-[:SELF]->(x) RETURN GRAPH")
    // map projections
    run("MATCH (a:P {n:'a'}) RETURN a {.n, .v} AS m")
    run("MATCH (a:P {n:'a'}) RETURN a {.*} AS m")
    run("MATCH (a:P {n:'a'}) RETURN a {.n, extra: 42} AS m")
    // properties() / keys()
    run("MATCH (a:P {n:'a'}) RETURN properties(a) AS p, keys(a) AS k")
    run("MATCH ()-[r:R]->() RETURN properties(r) AS p, keys(r) AS k")
    // catalog views with params
    try {
      gs.cypherStatement("CATALOG CREATE VIEW vlow($lo) { FROM GRAPH $g MATCH (x:P) WHERE x.v >= $lo CONSTRUCT CLONE x RETURN GRAPH }", Map.empty)
      println("view created")
      val r = gs.cypher("FROM GRAPH vlow(g) MATCH (x:P) RETURN count(*) AS n")
      println("view query => " + r.collect().map(_.toSeq).mkString)
    } catch { case e: Exception => println("VIEW ERR " + e.getMessage.take(140)) }
    // union of graphs then query
    run("MATCH (x) RETURN count(*) AS n")
    spark.stop()
  }
}
