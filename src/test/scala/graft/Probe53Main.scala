package graft

import org.apache.spark.sql.SparkSession
import graft.api.GraftSession

/** Probe batch 53: parameters in SKIP/LIMIT, zoned temporal ordering,
  * duration orderability errors, and ORDER BY inside EXISTS bodies. */
object Probe53Main {
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
        |""".stripMargin
    def run(q: String, params: Map[String, Any] = Map.empty): Unit = {
      print(q.replace('\n', ' ').take(112) + "  ==>  ")
      try {
        val g = gs.createGraphFromCypher(create)
        println(gs.cypher(g, q, params).collect()
          .map(_.toString).mkString("; "))
      } catch { case e: Throwable =>
        println(s"ERROR ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(130)}")
      }
    }
    // 1. parameters in SKIP/LIMIT (Neo4j: legal)
    run("MATCH (n:A) RETURN n.uid AS u ORDER BY u SKIP $s LIMIT $l",
      Map("s" -> 1L, "l" -> 1L))
    // 2. parameter in a WITH cut
    run("MATCH (n:A) WITH n ORDER BY n.uid DESC LIMIT $l RETURN n.uid AS u",
      Map("l" -> 2L))
    // 3. parameter arithmetic in LIMIT
    run("MATCH (n:A) RETURN n.uid AS u ORDER BY u LIMIT $l + 1",
      Map("l" -> 1L))
    // 4. negative / non-integer params are typed errors
    run("MATCH (n:A) RETURN n.uid AS u LIMIT $l", Map("l" -> -1L))
    run("MATCH (n:A) RETURN n.uid AS u LIMIT $l", Map("l" -> 1.5))
    // 5. ORDER BY zoned datetimes compares instants across offsets
    run("UNWIND [datetime('2024-01-01T13:00+02:00'), " +
      "datetime('2024-01-01T12:30Z'), datetime('2024-01-01T11:00-01:00')] " +
      "AS t RETURN toString(t) AS s ORDER BY t ASC")
    // 6. named-timezone datetime parse
    run("RETURN datetime('2024-06-01T12:00[Europe/Berlin]') = " +
      "datetime('2024-06-01T10:00Z') AS eq")
    // 7. ORDER BY durations: not orderable in Cypher (Neo4j error)
    run("UNWIND [duration({days: 1}), duration({hours: 12})] AS d " +
      "RETURN d ORDER BY d")
    // 8. min/max over durations already errors — ORDER BY on a duration
    // PROPERTY of sorted rows is fine when the key is something else
    run("MATCH (n:A) WITH n, duration({days: n.uid}) AS d " +
      "ORDER BY n.uid DESC LIMIT 1 RETURN toString(d) AS s")
    // 9. ORDER BY inside an EXISTS body (Neo4j: parse error)
    run("MATCH (n:A) WHERE EXISTS { MATCH (n)-->(m) RETURN m ORDER BY m.uid } " +
      "RETURN n.uid AS u")
    // 10. SKIP with a float literal is a typed error
    run("MATCH (n:A) RETURN n.uid AS u SKIP 1.5")
    spark.stop()
  }
}
