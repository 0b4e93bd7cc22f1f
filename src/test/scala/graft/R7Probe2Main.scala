package graft

import org.apache.spark.sql.SparkSession

object R7Probe2Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gs = graft.api.GraftSession(spark)
    val g = gs.createGraphFromCypher(
      """CREATE (v1:B {k: 3, s: 'a', uid: 1})
        |CREATE (v4:A {k: 2, s: 'd', uid: 4})
        |CREATE (v4)-[:T {uid: 1002, w: 1}]->(v1)""".stripMargin)
    def run(name: String, q: String): Unit =
      try println(s"OK   $name -> ${gs.cypher(g, q).collect().mkString(";")}")
      catch { case e: Throwable =>
        println(s"FAIL $name -> ${e.getClass.getSimpleName}: " +
          Option(e.getMessage).getOrElse("").linesIterator.take(3).mkString(" "))
      }
    run("full",
      """MATCH (n5:B)-[r6]->(n7:B)
        |RETURN count(r6.uid) AS a0
        |UNION ALL
        |MATCH (n500:B)-[:T]-(n502:A)
        |RETURN (CASE WHEN (n502.s IN ['c', 'c']) THEN n502.s ELSE 'd' END) AS a0""".stripMargin)
    run("b2-only",
      """MATCH (n500:B)-[:T]-(n502:A)
        |RETURN (CASE WHEN (n502.s IN ['c', 'c']) THEN n502.s ELSE 'd' END) AS a0""".stripMargin)
    run("simpler",
      "RETURN count(1) AS a0 UNION ALL RETURN 'd' AS a0")
    run("simpler2",
      "MATCH (x:Nope) RETURN count(x.k) AS a0 UNION ALL RETURN 'd' AS a0")
    spark.stop()
  }
}
