package graft
import org.apache.spark.sql.SparkSession
import graft.api.GraftSession
object ProbePathBugMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gs = GraftSession(spark)
    val g = gs.createGraphFromCypher(
      "CREATE (a:A {k: 1})\nCREATE (b:B {k: 2})\nCREATE (a)-[:T]->(b)")
    def show(name: String, q: String): Unit =
      try {
        val rows = gs.cypher(g, q).collect().toList.map(_.toSeq.mkString("|"))
        println(s"$name: $rows")
      } catch { case e: Throwable =>
        println(s"$name: ERROR ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(100)}")
        e.getStackTrace.take(6).foreach(f => println(s"   at $f")) }
    show("singleNodePathLen", "MATCH p = (n:A) RETURN length(p) AS l")
    show("pathLenLaterClause",
      "MATCH p = (a:A)-[:T]->(b) MATCH (m:B) WHERE length(p) >= 1 RETURN m.k AS k")
    show("pathLenAfterOptional",
      "MATCH p = (a:A)-[:T]->(b) OPTIONAL MATCH (z:B) WHERE length(p) > 9 RETURN z.k AS k")
    show("singleNodePathNodes", "MATCH p = (n:A) RETURN size(nodes(p)) AS n")
    spark.stop()
  }
}
