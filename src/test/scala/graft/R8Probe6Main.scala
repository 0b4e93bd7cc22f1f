package graft

import org.apache.spark.sql.SparkSession

/** Round-8 probe batch 6: minimize hunt divergence 112827 — COPY OF
  * nodes + EXISTS over the constructed graph. */
object R8Probe6Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gs = graft.api.GraftSession(spark)
    val g = gs.createGraphFromCypher(
      """CREATE (v4:A:B {f: 0.5, uid: 4})
        |CREATE (v0:A {uid: 0})
        |CREATE (v4)-[:S {uid: 1002}]->(v4)
        |CREATE (v4)-[:S {uid: 1008}]->(v0)
        |""".stripMargin)
    def run(name: String, q: String): Unit =
      try {
        val rows = gs.cypher(g, q).collect()
        println(s"OK   $name -> ${rows.mkString(";")}")
      } catch { case e: Throwable =>
        println(s"FAIL $name -> ${e.getClass.getSimpleName}: " +
          Option(e.getMessage).getOrElse("").linesIterator.take(2).mkString(" "))
      }

    run("copies-keep-labels",
      "MATCH (n0:A)-[:S*2..2]->(n2) " +
        "CONSTRUCT CLONE n0 NEW (cp0 COPY OF n0) NEW (n0)-[:Y {w: 2}]->(cp0) " +
        "MATCH (m) RETURN m.uid AS u, labels(m) AS ls, (m:A) AS isA")
    run("exists-over-constructed",
      "MATCH (n0:A)-[:S*2..2]->(n2) " +
        "CONSTRUCT CLONE n0 NEW (cp0 COPY OF n0) NEW (n0)-[:Y {w: 2}]->(cp0) " +
        "MATCH (m) RETURN m.uid AS u, " +
        "EXISTS { MATCH (m)<-[]-(q:B) } AS hasIncB")
    run("zero-hop-varlength-label",
      "MATCH (n0:A)-[:S*2..2]->(n2) " +
        "CONSTRUCT CLONE n0 NEW (cp0 COPY OF n0) NEW (n0)-[:Y {w: 2}]->(cp0) " +
        "MATCH (a)-[:S*0..1]->(b), (b:A) RETURN a.uid AS au, b.uid AS bu")
    run("full-repro",
      "MATCH (n0:A)-[:S*2..2]->(n2) " +
        "CONSTRUCT CLONE n0 NEW (cp0 COPY OF n0) NEW (n0)-[:Y {w: 2}]->(cp0) " +
        "MATCH (a)-[:S*0..1]->(b), (b:A) " +
        "WHERE EXISTS { MATCH (a)<-[]-(q:B) } " +
        "RETURN b.uid AS u, coalesce(a.f, b.f) AS f")
    spark.stop()
  }
}
