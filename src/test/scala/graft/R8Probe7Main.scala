package graft

import org.apache.spark.sql.SparkSession

/** Round-8 probe batch 7: exact repro of hunt 112827 with stepwise
  * simplification. */
object R8Probe7Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gs = graft.api.GraftSession(spark)
    val g = gs.createGraphFromCypher(
      """CREATE (v0:A {f: 2.0, k: 2, s: 'ab', uid: 0, zd: datetime('2025-01-01T00:00Z')})
        |CREATE (v1:A:B {d: date('2024-01-26'), f: 1.0, s: 'abc', uid: 1, zd: datetime('2025-01-01T02:00+01:00')})
        |CREATE (v2:A:B {f: 3.0, uid: 2, zd: datetime('2025-01-01T00:00-02:00')})
        |CREATE (v3:A {k: 2, s: 'abc', uid: 3, zd: datetime('2025-01-01T04:30+01:30')})
        |CREATE (v4:A:B {f: 0.5, k: 2, s: 'c', uid: 4, zs: '2025-01-01T03:00-01:00'})
        |CREATE (v3)-[:S {uid: 1000}]->(v3)
        |CREATE (v3)-[:T {uid: 1001, w: 1}]->(v1)
        |CREATE (v4)-[:S {uid: 1002}]->(v4)
        |CREATE (v2)-[:T {uid: 1003}]->(v1)
        |CREATE (v2)-[:T {uid: 1004, w: 0}]->(v2)
        |CREATE (v4)-[:T {uid: 1005}]->(v2)
        |CREATE (v4)-[:S {uid: 1006, w: 2}]->(v2)
        |CREATE (v0)-[:T {uid: 1007, w: 3}]->(v0)
        |CREATE (v4)-[:S {uid: 1008, w: 2}]->(v0)
        |CREATE (v4)-[:T {uid: 1009, w: 1}]->(v4)
        |CREATE (v4)-[:S {uid: 1010, w: 0}]->(v1)
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

    run("exact-112827",
      cons + "MATCH (n300)-[:S*0..1]->(n302), (n302:A) " +
        "WHERE ((n302.b <> n302.b) OR EXISTS { MATCH (n300)<-[]-(qx:B) }) " +
        "RETURN n302.zd AS c0, coalesce(n300.f, n302.f) AS c1 " +
        "ORDER BY c0 ASC, c1 DESC SKIP 1")
    run("no-skip",
      cons + "MATCH (n300)-[:S*0..1]->(n302), (n302:A) " +
        "WHERE ((n302.b <> n302.b) OR EXISTS { MATCH (n300)<-[]-(qx:B) }) " +
        "RETURN n302.zd AS c0, coalesce(n300.f, n302.f) AS c1")
    run("no-where",
      cons + "MATCH (n300)-[:S*0..1]->(n302), (n302:A) " +
        "RETURN count(*) AS c")
    run("where-exists-only",
      cons + "MATCH (n300)-[:S*0..1]->(n302), (n302:A) " +
        "WHERE EXISTS { MATCH (n300)<-[]-(qx:B) } RETURN count(*) AS c")
    run("where-b-only",
      cons + "MATCH (n300)-[:S*0..1]->(n302), (n302:A) " +
        "WHERE (n302.b <> n302.b) RETURN count(*) AS c")
    run("where-or",
      cons + "MATCH (n300)-[:S*0..1]->(n302), (n302:A) " +
        "WHERE ((n302.b <> n302.b) OR EXISTS { MATCH (n300)<-[]-(qx:B) }) " +
        "RETURN count(*) AS c")
    run("nodes-in-constructed", cons + "MATCH (m) RETURN m.uid AS u, (m:A) AS a")
    spark.stop()
  }
}
