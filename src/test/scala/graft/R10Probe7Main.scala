package graft

import org.apache.spark.sql.SparkSession

/** Round-10 probe: phase attribution for differential case 734 —
  * graph creation vs per-clause planning vs execution. */
object R10Probe7Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gs = graft.api.GraftSession(spark)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PH $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val create = """CREATE (v0:B {d: date('2024-02-01'), f: 2.0, uid: 0, zs: '2025-01-01T00:00Z'})
CREATE (v1 {pt: point({x: 1.5, y: -1.0, crs: 'cartesian'}), uid: 1, zs: '2025-01-01T02:00+01:00'})
CREATE (v2:A:B {b: true, k: 2, uid: 2})
CREATE (v2)-[:S {uid: 1000, w: 2}]->(v1)
CREATE (v0)-[:T {uid: 1001}]->(v0)
CREATE (v0)-[:T {uid: 1002, w: 1}]->(v0)
CREATE (v1)-[:T {uid: 1003, w: 2}]->(v2)
CREATE (v2)-[:T {uid: 1004, w: 3}]->(v0)
CREATE (v0)-[:S {uid: 1005, w: 4}]->(v2)
"""
    val pg = time("create_graph")(gs.createGraphFromCypher(create))
    // the three stacked clauses, planned cumulatively like the real case
    val q12 = """MATCH (n0:B)<-[r1]-(n0:B)
CONSTRUCT CLONE n0, r1 NEW (cp0 COPY OF n0)
MATCH (n300:A)<-[r301]-(n302), (n303)<-[*1..2]-(n305)
WHERE ((n303)<-[:S]-())
CONSTRUCT CLONE n300, r301, n302 NEW (n302)-[:X]->(n302)
RETURN 1 AS one LIMIT 1"""
    val full = """MATCH (n0:B)<-[r1]-(n0:B)
CONSTRUCT CLONE n0, r1 NEW (cp0 COPY OF n0)
MATCH (n300:A)<-[r301]-(n302), (n303)<-[*1..2]-(n305)
WHERE ((n303)<-[:S]-())
CONSTRUCT CLONE n300, r301, n302 NEW (n302)-[:X]->(n302)
MATCH (n600 {k: 1002})-[r601*1..3]-(n602), (n603)-[:T]->(n605)
WHERE (none(qv IN r601 WHERE (qv.w < 11)) XOR (1008 IN [null, n605.uid, n602.uid]))
RETURN coalesce(n605.d, n602.d) AS c0"""
    val prefix = """MATCH (n0:B)<-[r1]-(n0:B)
CONSTRUCT CLONE n0, r1 NEW (cp0 COPY OF n0)
RETURN 1 AS one LIMIT 1"""
    val dfP = time("plan_construct1")(gs.cypher(pg, prefix))
    time("exec_construct1")(dfP.collect())
    val df12 = time("plan_through_construct2")(gs.cypher(pg, q12))
    time("exec_through_construct2")(df12.collect())
    val df = time("plan_full")(gs.cypher(pg, full))
    time("exec_full")(df.collect())
    // repeat with warm JIT: fresh session-level planning, same JVM
    val gs2 = graft.api.GraftSession(spark)
    val df2 = time("plan_full_warm")(gs2.cypher(pg, full))
    time("exec_full_warm")(df2.collect())
    // derived-graph table plan sizes: size of graph2's tables as the
    // 3rd match sees them
    def planSize(d: org.apache.spark.sql.DataFrame): Int = {
      var n = 0; d.queryExecution.analyzed.foreach(_ => n += 1); n
    }
    val g2 = gs2.cypherGraph(pg, q12.linesIterator.toSeq.dropRight(1)
      .mkString("\n") + "\nRETURN GRAPH")
    g2.nodeTables.foreach(t =>
      println(s"PS node ${t.labels} size=${planSize(t.df)}"))
    g2.relTables.foreach(t =>
      println(s"PS rel ${t.relType} size=${planSize(t.df)}"))
    // plan ONLY the 3rd match over graph2, at different barriers
    val m3 = """MATCH (n600 {k: 1002})-[r601*1..3]-(n602), (n603)-[:T]->(n605)
WHERE (none(qv IN r601 WHERE (qv.w < 11)) XOR (1008 IN [null, n605.uid, n602.uid]))
RETURN coalesce(n605.d, n602.d) AS c0"""
    Seq("400", "50", "10").foreach { b =>
      spark.conf.set("graft.construct.planBarrier", b)
      val gs3 = graft.api.GraftSession(spark)
      val g3 = gs3.cypherGraph(pg, q12.linesIterator.toSeq.dropRight(1)
        .mkString("\n") + "\nRETURN GRAPH")
      g3.relTables.headOption.foreach(t =>
        println(s"PS b=$b rel ${t.relType} size=${planSize(t.df)}"))
      val d3 = time(s"plan_match3_b$b")(gs3.cypher(g3, m3))
      time(s"exec_match3_b$b")(d3.collect())
    }
    spark.stop()
  }
}
