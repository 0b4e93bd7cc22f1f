package graft
import org.apache.spark.sql.SparkSession
import graft.api.GraftSession
object ProbeDiffR5Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gs = GraftSession(spark)
    val g = gs.createGraphFromCypher(
      """CREATE (a:A {k: 1})
        |CREATE (b:B {s: 'x'})
        |CREATE (a)-[:T]->(b)
        |""".stripMargin)
    def show(name: String, q: String): Unit =
      try {
        val rows = gs.cypher(g, q).collect().toList
          .map(_.toSeq.map(v => if (v == null) "null" else v.toString).mkString("|"))
        println(s"$name: $rows")
      } catch { case e: Throwable =>
        println(s"$name: ERROR ${Option(e.getMessage).getOrElse(e.toString).take(200)}") }
    show("nullInEmpty", "RETURN null IN [] AS x")
    show("nullInEmptySlice", "WITH null AS v RETURN v IN [1][0..-2] AS x")
    show("orPatternRight", "MATCH (n) WHERE ((n)<-[]-(:A {k: 11})) OR (n.k IS NOT NULL) RETURN n.k AS k")
    show("orPatternLeft", "MATCH (n) WHERE (n.k IS NOT NULL) OR ((n)<-[]-(:A {k: 11})) RETURN n.k AS k")
    show("orPatternTrue", "MATCH (n) WHERE ((n)-[]->(:B)) OR (n.k = 99) RETURN n.k AS k")
    show("andPattern", "MATCH (n) WHERE ((n)-[]->(:B)) AND (n.k = 1) RETURN n.k AS k")
    show("notPattern", "MATCH (n) WHERE NOT ((n)-[]->(:B)) RETURN n.s AS s")
    show("xorPattern", "MATCH (n) WHERE ((n)-[]->(:B)) XOR (n.k = 1) RETURN n.k AS k, n.s AS s")
    show("orExistsBlock", "MATCH (n) WHERE EXISTS { MATCH (n)-[]->(:B) } OR (n.k = 99) RETURN n.k AS k")
    show("mixedNeq", "MATCH (n) RETURN [n.k, 'abc'][0] <> 'b' AS x ORDER BY x")
    spark.stop()
  }
}
