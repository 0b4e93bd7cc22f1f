package graft
import org.apache.spark.sql.SparkSession
import graft.api.GraftSession
object Probe18b {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gs = GraftSession(spark)
    val g = gs.createGraphFromCypher("CREATE (a:P {n: 'a', v: 1}) CREATE (b:P {n: 'b', v: 2}) CREATE (a)-[:R {w: 5}]->(b)")
    gs.register("g", g)
    def runG(q: String): Unit = {
      print(q.replaceAll("\\s+", " ").take(90) + "  ==>  ")
      try { val g2 = gs.cypherGraph(g, q)
        println(s"nodes=${g2.nodeTables.map(_.df.count()).sum} rels=${g2.relTables.map(_.df.count()).sum}")
      } catch { case e: Exception => println("ERR " + e.getMessage.take(120)) }
    }
    runG("MATCH (a:P) CONSTRUCT NEW (x:Pair {n: a.n}) NEW (x)-[:SELF]->(x) RETURN GRAPH")
    runG("MATCH (a:P) CONSTRUCT NEW (x:Pair {n: a.n})-[:SELF]->(x) RETURN GRAPH")
    try {
      gs.cypherStatement("CATALOG CREATE VIEW vlow($g, $lo) { FROM GRAPH $g MATCH (x:P) WHERE x.v >= $lo CONSTRUCT CLONE x RETURN GRAPH }", Map.empty)
      val r = gs.cypher("FROM GRAPH vlow(g, 2) MATCH (x:P) RETURN count(*) AS n")
      println("view(g,2) => " + r.collect().map(_.toSeq).mkString)
    } catch { case e: Exception => println("VIEW ERR " + e.getMessage.take(140)) }
    spark.stop()
  }
}
