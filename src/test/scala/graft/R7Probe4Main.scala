package graft

import org.apache.spark.sql.SparkSession

/** Round-7 probe batch 2: corner semantics for the r7 scenario batch —
  * three-branch mixed unions, error messages, time wrap-around, simple
  * CASE with null subject, date.truncate, DISTINCT over mixed lists. */
object R7Probe4Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gs = graft.api.GraftSession(spark)
    val g = gs.createGraphFromCypher("CREATE (:A {k: 1})")
    def run(name: String, q: String): Unit =
      try {
        val rows = gs.cypher(g, q).collect()
        println(s"OK   $name -> ${rows.mkString(";")}")
      } catch { case e: Throwable =>
        println(s"FAIL $name -> ${e.getClass.getSimpleName}: " +
          Option(e.getMessage).getOrElse("").linesIterator.take(2).mkString(" "))
      }

    run("union3-mixed-distinct",
      "RETURN 1 AS x UNION RETURN 'a' AS x UNION RETURN 1.0 AS x")
    run("union3-mixed-distinct-float-first",
      "RETURN 1.0 AS x UNION RETURN 'a' AS x UNION RETURN 1 AS x")
    run("div-zero-message", "RETURN [1/0, 2][1] AS x")
    run("time-wrap",
      "RETURN time('23:30Z') + duration({hours: 1}) = time('00:30Z') AS eq")
    run("mixed-distinct-count",
      "UNWIND [1, 1.0, 'a', 1] AS x RETURN count(DISTINCT x) AS c")
    run("map-null-eq", "RETURN {a: 1, b: null} = {a: 1, b: null} AS eq")
    run("case-null-subject",
      "RETURN CASE null WHEN null THEN 'y' ELSE 'n' END AS c")
    run("date-truncate",
      "RETURN date.truncate('month', date('2026-08-15')) = date('2026-08-01') AS eq")
    run("min-zoned-time",
      "UNWIND [time('13:00+01:00'), time('12:00Z'), time('01:00Z')] AS t " +
        "RETURN min(t) = time('01:00Z') AS m")
    run("distinct-order-after-with-star",
      "UNWIND [3, 1, 2, 1] AS v WITH * ORDER BY v RETURN DISTINCT v LIMIT 2")
    run("keys-map", "RETURN keys({b: 1, a: 2}) AS k")
    run("duration-tostring",
      "RETURN toString(duration({years: 1, months: 2, days: 3, minutes: 1, seconds: 30})) AS s")
    run("split-empties", "RETURN split('a,b,,c', ',') AS s")
    run("quantifier-varlength",
      """MATCH (a:A) RETURN 1 AS one""".stripMargin)
    spark.stop()
  }
}
