package graft
import org.apache.spark.sql.SparkSession
import graft.api.GraftSession
object ProbeCodegen2Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gs = GraftSession(spark)
    val g = gs.createGraphFromCypher(
      "CREATE (a:A {k: 1, s: 'abc'})\nCREATE (b:A {k: 2})")
    def q(name: String, text: String): Unit = {
      try { gs.cypher(g, text).collect() } catch { case _: Throwable => }
      println(s"done $name")
    }
    q("lastInWhere", "MATCH (n:A) WHERE last([n.s, 'c']) < n.s RETURN n.k AS x")
    q("headInWhere", "MATCH (n:A) WHERE head([n.s, 'c']) < n.s RETURN n.k AS x")
    q("idxInWhere", "MATCH (n:A) WHERE [n.s, 'c'][0] < n.s RETURN n.k AS x")
    q("lastInReturn", "MATCH (n:A) RETURN last([n.s, 'c']) AS x")
    spark.stop()
  }
}
