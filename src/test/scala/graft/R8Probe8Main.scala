package graft

import org.apache.spark.sql.SparkSession

/** Round-8 probe batch 8: isolate WHY WHERE-EXISTS fails over the
  * constructed graph of 112827. */
object R8Probe8Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gs = graft.api.GraftSession(spark)
    val g = gs.createGraphFromCypher(
      """CREATE (v0:A {uid: 0})
        |CREATE (v2:A:B {uid: 2})
        |CREATE (v1:A:B {uid: 1})
        |CREATE (v4:A:B {f: 0.5, uid: 4})
        |CREATE (v4)-[:S {uid: 1002}]->(v4)
        |CREATE (v4)-[:S {uid: 1006}]->(v2)
        |CREATE (v4)-[:S {uid: 1008}]->(v0)
        |CREATE (v4)-[:S {uid: 1010}]->(v1)
        |""".stripMargin)
    def run(name: String, q: String): Unit =
      try {
        val rows = gs.cypher(g, q).collect()
        println(s"OK   $name -> ${rows.mkString(";")}")
      } catch { case e: Throwable =>
        println(s"FAIL $name -> ${e.getClass.getSimpleName}: " +
          Option(e.getMessage).getOrElse("").linesIterator.take(2).mkString(" "))
      }
    val cons = "MATCH (n0:A)-[:S*2..2]->(n2) " +
      "CONSTRUCT CLONE n0 NEW (cp0 COPY OF n0) NEW (n0)-[:Y {w: 2}]->(cp0) "

    run("proj-exists", cons +
      "MATCH (m) RETURN m.uid AS u, EXISTS { MATCH (m)<-[]-(q:B) } AS e")
    run("where-exists-plain-match", cons +
      "MATCH (m) WHERE EXISTS { MATCH (m)<-[]-(q:B) } RETURN count(*) AS c")
    run("where-exists-typed-rel", cons +
      "MATCH (m) WHERE EXISTS { MATCH (m)<-[:Y]-(q:B) } RETURN count(*) AS c")
    run("where-exists-no-label", cons +
      "MATCH (m) WHERE EXISTS { MATCH (m)<-[]-(q) } RETURN count(*) AS c")
    run("where-exists-after-varlength", cons +
      "MATCH (a)-[:S*0..1]->(b) WHERE EXISTS { MATCH (a)<-[]-(q:B) } " +
      "RETURN count(*) AS c")
    run("incoming-direct", cons +
      "MATCH (m)<-[]-(q:B) RETURN m.uid AS mu, q.uid AS qu")
    spark.stop()
  }
}
