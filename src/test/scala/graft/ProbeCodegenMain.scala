package graft
import org.apache.spark.sql.SparkSession
import graft.api.GraftSession
object ProbeCodegenMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gs = GraftSession(spark)
    val g = gs.createGraphFromCypher(
      "CREATE (a:A {k: 1, s: 'abc'})\nCREATE (b:B {k: 2, s: 'xy'})\nCREATE (a)-[:T]->(b)")
    def q(name: String, text: String): Unit = {
      try { gs.cypher(g, text).collect() } catch { case _: Throwable => }
      println(s"done $name")
    }
    q("leftFn", "MATCH (n:A) RETURN left(n.s, 2) AS x")
    q("substringFn", "MATCH (n:A) RETURN substring(n.s, 1, 2) AS x")
    q("strInJoin", "MATCH (a:A)-[:T]->(b) WHERE left(a.s, 1) = 'a' RETURN b.k AS x")
    q("headSlice", "MATCH (n:A) RETURN head([n.k, 2][0..1]) AS x")
    q("quantifier", "MATCH (n:A) RETURN any(x IN [n.k, 2] WHERE x > 1) AS x")
    q("caseContains", "MATCH (a:A)-[:T]->(b) RETURN (CASE WHEN replace(b.s, 'c', 'x') CONTAINS 'd' THEN 'd' ELSE 'a' END) AS x")
    spark.stop()
  }
}
