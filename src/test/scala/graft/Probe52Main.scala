package graft

import org.apache.spark.sql.SparkSession
import graft.api.GraftSession

/** Probe batch 52: hidden sort aggregates in aggregating projections —
  * DISTINCT aggregates, expressions containing aggregates, percentiles,
  * collect, and the interplay with SKIP/LIMIT cuts in WITH. */
object Probe52Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gs = GraftSession(spark)
    val create =
      """CREATE (:A {uid: 0, k: 2})
        |CREATE (:A {uid: 1, k: 1})
        |CREATE (:A {uid: 2, k: 1})
        |CREATE (:A {uid: 3, k: 1})
        |""".stripMargin
    def run(q: String): Unit = {
      print(q.replace('\n', ' ').take(118) + "  ==>  ")
      try {
        val g = gs.createGraphFromCypher(create)
        println(gs.cypher(g, q).collect().map(_.toString).mkString("; "))
      } catch { case e: Throwable =>
        println(s"ERROR ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(130)}")
      }
    }
    // 1. sort by an EXPRESSION containing an aggregate (not a bare agg)
    run("MATCH (n:A) RETURN n.k AS x, count(*) AS c ORDER BY sum(n.uid) + 1 DESC")
    // 2. sort by a DISTINCT aggregate not projected
    run("MATCH (n:A) RETURN n.k AS x, count(*) AS c ORDER BY count(DISTINCT n.k) DESC, x ASC")
    // 3. percentile as hidden sort aggregate
    run("MATCH (n:A) RETURN n.k AS x, count(*) AS c ORDER BY percentileCont(n.uid, 0.5) DESC")
    // 4. hidden sort aggregate in WITH + cut
    run("MATCH (n:A) WITH n.k AS x, count(*) AS c ORDER BY sum(n.uid) DESC LIMIT 1 RETURN x, c")
    // 5. sort by min(collected) — aggregate over same arg as projected collect
    run("MATCH (n:A) RETURN n.k AS x, collect(n.uid) AS l ORDER BY min(n.uid) DESC")
    // 6. ORDER BY mixing projected agg alias and hidden aggregate
    run("MATCH (n:A) RETURN n.k AS x, count(*) AS c ORDER BY c DESC, max(n.uid) ASC")
    // 7. global aggregation + ORDER BY aggregate (single row, legal)
    run("MATCH (n:A) RETURN count(*) AS c ORDER BY sum(n.uid)")
    // 8. hidden aggregate references a var also used in a key expr
    run("MATCH (n:A) RETURN n.k + 1 AS x1, count(*) AS c ORDER BY sum(n.uid) ASC")
    // 9. DISTINCT projection + hidden aggregate (Neo4j: error — DISTINCT
    // output has no group to aggregate over)
    run("MATCH (n:A) RETURN DISTINCT n.k AS x ORDER BY count(*)")
    // 10. sort-agg inside CASE
    run("MATCH (n:A) RETURN n.k AS x, count(*) AS c " +
      "ORDER BY CASE WHEN sum(n.uid) > 3 THEN 1 ELSE 0 END DESC, x ASC")
    spark.stop()
  }
}
