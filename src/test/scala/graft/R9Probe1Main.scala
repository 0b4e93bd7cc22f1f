package graft

import org.apache.spark.sql.SparkSession

/** Round-9 probe 1: deterministic fresh ids — duplicate driving rows,
  * per-row NEW multiplicity, cross-table agreement under repeated
  * evaluation, nondeterministic driving frames. */
object R9Probe1Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gs = graft.api.GraftSession(spark)
    val g = gs.createGraphFromCypher(
      """CREATE (a:N {uid: 1})
        |CREATE (b:N {uid: 2})
        |CREATE (a)-[:T]->(b)
        |CREATE (a)-[:T]->(b)
        |""".stripMargin)
    def run(name: String, q: String): Unit =
      try {
        val rows = gs.cypher(g, q).collect()
        println(s"OK   $name -> ${rows.mkString(";")}")
      } catch { case e: Throwable =>
        println(s"FAIL $name -> ${e.getClass.getSimpleName}: " +
          Option(e.getMessage).getOrElse("").linesIterator.take(3).mkString(" "))
      }
    // duplicate driving rows from UNWIND: NEW must create one node PER ROW
    run("unwind-dup-new",
      "MATCH (n:N {uid: 1}) UNWIND [1, 1, 1] AS x " +
        "CONSTRUCT CREATE (m:M) MATCH (q:M) RETURN count(*) AS c") // expect 3
    // duplicate rows, NEW rel between fresh nodes: 3 disjoint pairs
    run("unwind-dup-new-rel",
      "MATCH (n:N {uid: 1}) UNWIND [7, 7, 7] AS x " +
        "CONSTRUCT CREATE (s:S)-[:R]->(t:TT) " +
        "MATCH (a:S)-[:R]->(b:TT) RETURN count(*) AS c") // expect 3
    // parallel T rels between the same endpoints: NEW per driving row
    run("parallel-rel-new",
      "MATCH (a:N)-[:T]->(b:N) " +
        "CONSTRUCT NEW (a)-[:H]->(b) " +
        "MATCH ()-[h:H]->() RETURN count(*) AS c") // expect 2
    // two COPY OF the same var in one pattern: distinct fresh ids per row
    run("two-copies",
      "MATCH (a:N {uid: 2}) CONSTRUCT CREATE (f COPY OF a)-[:FOO]->(g COPY OF a) " +
        "MATCH (s)-[:FOO]->(t) RETURN s.uid AS su, t.uid AS tu, s = t AS same")
    // cross-table agreement exercised many times (flakiness check)
    (1 to 5).foreach { i =>
      run(s"agreement-$i",
        "MATCH (a:N)-[:T]->(b:N) " +
          "CONSTRUCT CREATE (c COPY OF a)-[:W]->(d COPY OF b) " +
          "MATCH (x)-[:W]->(y) RETURN count(*) AS pairs, " +
          "count(x.uid) AS sx, count(y.uid) AS sy") // 2, 2, 2 (no dangling)
    }
    // nondeterministic driving frame → barrier path
    run("nondet-frame",
      "MATCH (n:N) WITH n, rand() AS r " +
        "CONSTRUCT CREATE (m:M {v: 1}) MATCH (q:M) RETURN count(*) AS c") // 2
    // aggregated single-row frame (no element ids at all)
    run("agg-frame",
      "MATCH (n:N) WITH count(n) AS c0 " +
        "CONSTRUCT CREATE (m:M {v: c0}) MATCH (q:M) RETURN q.v AS v") // 2
    // unit frame (no MATCH at all)
    run("unit-frame",
      "CONSTRUCT CREATE (x:U)-[:L]->(y:U) " +
        "MATCH (a:U)-[:L]->(b:U) RETURN count(*) AS c, a = b AS same")
    spark.stop()
  }
}
