package graft

import org.apache.spark.sql.SparkSession
import graft.api.GraftSession

/** Probe batch 54: the zoned DATETIME struct end-to-end — parsing
  * (offsets, named zones, date-only), instant equality/ordering across
  * offsets, accessors (clock vs epoch vs offset), DST-correct calendar
  * arithmetic, truncation, selection, grouping, and fixtures. */
object Probe54Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gs = GraftSession(spark)
    val create =
      """CREATE (:E {uid: 0, at: datetime('2024-06-01T12:00+02:00')})
        |CREATE (:E {uid: 1, at: datetime('2024-06-01T10:30Z')})
        |CREATE (:E {uid: 2, at: datetime('2024-06-01T05:00-04:00[America/New_York]')})
        |""".stripMargin
    def run(q: String): Unit = {
      print(q.replace('\n', ' ').take(116) + "  ==>  ")
      try {
        val g = gs.createGraphFromCypher(create)
        println(gs.cypher(g, q).collect().map(_.toString).mkString("; "))
      } catch { case e: Throwable =>
        println(s"ERROR ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(140)}")
      }
    }
    // 1. offset string parse + toString round-trip
    run("RETURN toString(datetime('2024-01-01T13:00+02:00')) AS s")
    // 2. named zone: offset resolved by rules (Berlin summer = +02:00)
    run("RETURN toString(datetime('2024-06-01T12:00[Europe/Berlin]')) AS s")
    // 3. instant equality across offsets
    run("RETURN datetime('2024-06-01T12:00+02:00') = datetime('2024-06-01T10:00Z') AS eq")
    // 4. ordering by instant
    run("UNWIND [datetime('2024-01-01T13:00+02:00'), datetime('2024-01-01T12:30Z'), " +
      "datetime('2024-01-01T11:00-01:00')] AS t RETURN toString(t) AS s ORDER BY t ASC")
    // 5. clock accessors read LOCAL time; epoch reads the instant
    run("WITH datetime('2024-06-01T12:34:56.789+02:00') AS d RETURN d.year AS y, " +
      "d.hour AS h, d.minute AS m, d.offset AS o, d.timezone AS tz, d.epochSeconds AS es")
    // 6. named-zone accessor + [zone] rendering
    run("WITH datetime('2024-06-01T05:00[America/New_York]') AS d " +
      "RETURN d.hour AS h, d.offset AS o, d.timezone AS tz, toString(d) AS s")
    // 7. DST-crossing day arithmetic: wall clock kept, offset shifts
    run("RETURN toString(datetime('2024-03-30T21:00[Europe/Berlin]') + duration({days: 1})) AS s")
    // 8. fixed-offset arithmetic: offset constant
    run("RETURN toString(datetime('2024-03-30T21:00+01:00') + duration({days: 1})) AS s")
    // 9. sub-day arithmetic is exact elapsed time
    run("RETURN toString(datetime('2024-03-31T01:30[Europe/Berlin]') + duration({hours: 1})) AS s")
    // 10. datetime - duration
    run("RETURN toString(datetime('2024-01-01T00:00Z') - duration({minutes: 90})) AS s")
    // 11. component-map constructor with timezone
    run("RETURN toString(datetime({year: 2024, month: 6, day: 1, hour: 12, " +
      "timezone: 'Europe/Berlin'})) AS s")
    // 12. epoch constructors + epoch accessors
    run("RETURN datetime({epochSeconds: 120}).epochSeconds AS es, " +
      "datetime({epochMillis: 86400000}).epochMillis AS em")
    // 13. date-only string = midnight UTC
    run("RETURN toString(datetime('2024-01-01')) AS s")
    // 14. DISTINCT collapses instant-equal values across offsets
    run("UNWIND [datetime('2024-06-01T12:00+02:00'), datetime('2024-06-01T10:00Z')] AS d " +
      "RETURN count(DISTINCT d) AS c")
    // 15. min/max pick by instant
    run("UNWIND [datetime('2024-06-01T12:00+02:00'), datetime('2024-06-01T09:59Z')] AS d " +
      "RETURN toString(min(d)) AS lo, toString(max(d)) AS hi")
    // 16. truncate in the value's zone
    run("RETURN toString(datetime.truncate('day', datetime('2024-06-01T23:30[Europe/Berlin]'))) AS s")
    // 17. duration.between over zoned datetimes
    run("RETURN toString(duration.between(datetime('2024-01-01T00:00Z'), " +
      "datetime('2024-03-01T12:00+02:00'))) AS s")
    // 18. selection: date()/localdatetime() take the LOCAL clock
    run("WITH datetime('2024-06-01T23:30-04:00') AS d " +
      "RETURN toString(date(d)) AS dd, toString(localdatetime(d)) AS ldt")
    // 19. fixture-stored datetime properties: order + accessors + compare
    run("MATCH (e:E) RETURN e.uid AS u, e.at.hour AS h, e.at.offset AS o ORDER BY e.at ASC, u ASC")
    run("MATCH (e:E) WHERE e.at = datetime('2024-06-01T10:00Z') RETURN e.uid AS u ORDER BY u")
    // 20. datetime vs localdatetime never compare
    run("RETURN datetime('2024-01-01T00:00Z') = localdatetime('2024-01-01T00:00:00') AS x")
    // 21. week-date + compact forms through the shared date parser
    run("RETURN toString(datetime('2015-W30-2T12:00+02:00')) AS s")
    // 22. null propagation
    run("RETURN datetime('2024-01-01T00:00Z') + null AS a, toString(datetime({epochSeconds: 0})) AS b")
    spark.stop()
  }
}
