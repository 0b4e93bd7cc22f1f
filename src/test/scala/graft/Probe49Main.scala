package graft

import org.apache.spark.sql.SparkSession
import graft.api.GraftSession

/** Probe batch 49: WITH ... ORDER BY / SKIP / LIMIT (mid-query cuts) ahead
  * of the differential-grammar widening — verifies the engine's clause
  * order (projection → ORDER BY → SKIP/LIMIT → WHERE), property access on
  * projected entities inside the ORDER BY, aggregating-WITH cuts, DISTINCT
  * cuts, and null placement. */
object Probe49Main {
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
        |CREATE (:A {uid: 3})
        |""".stripMargin
    def run(q: String): Unit = {
      print(q.replace('\n', ' ').take(110) + "  ==>  ")
      try {
        val g = gs.createGraphFromCypher(create)
        println(gs.cypher(g, q).collect().map(_.toString).mkString("; "))
      } catch { case e: Throwable =>
        println(s"ERROR ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(140)}")
      }
    }
    // 1. basic cut on a passed entity, property access in ORDER BY
    run("MATCH (n:A) WITH n ORDER BY n.uid DESC LIMIT 2 RETURN n.uid AS u")
    // 2. renamed entity: ORDER BY on the NEW name
    run("MATCH (n:A) WITH n AS m ORDER BY m.uid ASC SKIP 1 RETURN m.uid AS u")
    // 3. aggregating WITH + cut (order on key + agg)
    run("MATCH (n:A) WITH n.k AS x, count(*) AS c ORDER BY x ASC LIMIT 2 RETURN x, c")
    // 4. WHERE applies AFTER the cut (expect only uid 1 if cut-first)
    run("MATCH (n:A) WITH n ORDER BY n.uid ASC LIMIT 2 WHERE n.uid > 0 RETURN n.uid AS u")
    // 5. DISTINCT + cut
    run("MATCH (n:A) WITH DISTINCT n.k AS x ORDER BY x DESC SKIP 1 RETURN x")
    // 6. null placement: ASC = nulls last (expect 1,1,2 for LIMIT 3)
    run("MATCH (n:A) WITH n.k AS x ORDER BY x ASC LIMIT 3 RETURN x")
    // 7. null placement DESC = nulls first (expect null,2 for LIMIT 2)
    run("MATCH (n:A) WITH n.k AS x ORDER BY x DESC LIMIT 2 RETURN x")
    // 8. multi-key: entity uid + projection, mixed directions
    run("MATCH (n:A) WITH n, n.k AS x ORDER BY x ASC, n.uid DESC SKIP 1 LIMIT 2 RETURN n.uid AS u, x")
    // 9. ORDER BY only (no cut) in WITH — plan sanity, row set unchanged
    run("MATCH (n:A) WITH n ORDER BY n.uid DESC RETURN count(*) AS c")
    // 10. SKIP past the end / LIMIT 0
    run("MATCH (n:A) WITH n ORDER BY n.uid ASC SKIP 9 RETURN n.uid AS u")
    run("MATCH (n:A) WITH n ORDER BY n.uid ASC LIMIT 0 RETURN n.uid AS u")
    // 11. cut then MATCH continues from the surviving rows
    run("MATCH (n:A) WITH n ORDER BY n.uid ASC LIMIT 1 MATCH (m:A) WHERE m.uid = n.uid RETURN m.uid AS u")
    // 12. ORDER BY a date projection (family 'E')
    run("MATCH (n:A) WITH n.uid AS u, date('2024-01-01') + duration({days: n.uid}) AS d " +
      "ORDER BY d DESC LIMIT 2 RETURN u")
    // 13. aggregating WITH, order by agg value only
    run("MATCH (n:A) WITH n.k AS x, count(*) AS c ORDER BY c DESC, x ASC LIMIT 1 RETURN x, c")
    // 14. boolean ORDER BY key
    run("MATCH (n:A) WITH n.uid AS u, n.uid >= 2 AS b ORDER BY b ASC, u ASC LIMIT 3 RETURN u, b")
    spark.stop()
  }
}
