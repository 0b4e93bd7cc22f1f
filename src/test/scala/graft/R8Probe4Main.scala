package graft

import org.apache.spark.sql.SparkSession

/** Round-8 probe batch 4: corners for the r8b lock batch — half-hour
  * DST zones, month-end clamps, point membership/aggregation, fractional
  * durations, column-parse exotic forms. */
object R8Probe4Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gs = graft.api.GraftSession(spark)
    val g = gs.createGraphFromCypher(
      "CREATE (:D {uid: 0, zb: '2024-06-01T12:00+02:00[Europe/Berlin]', " +
        "ym: '2024-06', yo: '2024', ct: '0930', dur: 'PT1.5S'})")
    def run(name: String, q: String): Unit =
      try {
        val rows = gs.cypher(g, q).collect()
        println(s"OK   $name -> ${rows.mkString(";")}")
      } catch { case e: Throwable =>
        println(s"FAIL $name -> ${e.getClass.getSimpleName}: " +
          Option(e.getMessage).getOrElse("").linesIterator.take(2).mkString(" "))
      }

    // java.time ground truth for Lord Howe (30-minute DST shift)
    import java.time._
    val lh = ZoneId.of("Australia/Lord_Howe")
    println("truth LH 2024-04-07T01:30+11 plusHours(1): " +
      ZonedDateTime.of(2024, 4, 7, 1, 30, 0, 0, lh)
        .withEarlierOffsetAtOverlap().plusHours(1))
    println("truth Jan31+P1M: " +
      ZonedDateTime.of(2024, 1, 31, 12, 0, 0, 0, ZoneOffset.UTC).plusMonths(1))

    run("lord-howe-half-hour-overlap",
      "RETURN toString(datetime('2024-04-07T01:30+11:00[Australia/Lord_Howe]') " +
        "+ duration({hours: 1})) AS s")
    run("month-end-clamp",
      "RETURN toString(datetime('2024-01-31T12:00Z') + duration({months: 1})) AS s")
    run("zdt-minus-mixed",
      "RETURN toString(datetime('2024-03-15T12:00+01:00[Europe/Berlin]') " +
        "- duration({months: 1, days: 2, hours: 3})) AS s")
    run("zdt-frac-seconds",
      "RETURN toString(datetime('2024-01-01T00:00Z') + duration({seconds: 1.5})) AS s")
    run("between-parts-triple",
      "WITH duration.between(datetime('2024-01-15T06:00Z'), " +
        "datetime('2024-03-20T08:30:10Z')) AS d " +
        "RETURN d.months AS m, d.days AS dd, d.minutes AS mi, d.seconds AS s")
    run("inmonths-indays-zdt",
      "WITH datetime('2024-01-15T06:00+01:00[Europe/Berlin]') AS a, " +
        "datetime('2024-03-20T08:30Z') AS b " +
        "RETURN toString(duration.inMonths(a, b)) AS m, " +
        "toString(duration.inDays(a, b)) AS d")
    run("datetime-col-bracket-zone",
      "MATCH (n:D) RETURN toString(datetime(n.zb)) AS s, " +
        "datetime(n.zb).timezone AS tz")
    run("date-col-year-month",
      "MATCH (n:D) RETURN toString(date(n.ym)) AS ym, " +
        "toString(date(n.yo)) AS yo")
    run("time-col-compact",
      "MATCH (n:D) RETURN toString(localtime(n.ct)) AS s")
    run("duration-col-frac",
      "MATCH (n:D) RETURN toString(duration(n.dur)) AS s, " +
        "duration(n.dur).milliseconds AS ms")
    run("point-in-list",
      "RETURN point({x: 1, y: 2}) IN [point({x: 3, y: 4}), " +
        "point({x: 1.0, y: 2.0})] AS a, " +
        "point({x: 9, y: 9}) IN [point({x: 1, y: 2})] AS b")
    run("point-collect-unwind",
      "UNWIND [1, 2] AS i WITH point({x: i, y: 0}) AS p " +
        "WITH collect(p) AS ps UNWIND ps AS q RETURN q.x AS x ORDER BY x")
    run("point-case-coalesce",
      "RETURN coalesce(null, point({x: 1, y: 2})).x AS x, " +
        "CASE WHEN true THEN point({x: 5, y: 6}) ELSE point({x: 0, y: 0}) " +
        "END.y AS y")
    run("distance-symmetric-zero",
      "WITH point({latitude: 10, longitude: 20}) AS a, " +
        "point({latitude: -5, longitude: 30}) AS b " +
        "RETURN distance(a, b) = distance(b, a) AS sym, " +
        "distance(a, a) AS zero")
    run("point-srid-key",
      "RETURN point({x: 1, y: 2, srid: 4326}).latitude AS lat")
    run("point-unknown-accessor",
      "RETURN point({x: 1, y: 2}).nope AS z")
    run("parsed-date-minmax",
      "UNWIND ['2024-03-05', '2015-W30-2', '20240229'] AS s " +
        "RETURN toString(min(date(s))) AS lo, toString(max(date(s))) AS hi")
    run("parsed-datetime-where",
      "UNWIND ['2024-01-01T00:00Z', '2024-06-01T00:00Z'] AS s " +
        "WITH datetime(s) AS d WHERE d > datetime('2024-03-01T00:00Z') " +
        "RETURN count(*) AS c")

    spark.stop()
  }
}
