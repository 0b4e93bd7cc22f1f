package graft

import org.apache.spark.sql.SparkSession

/** Round-8 probe batch 1: DST corner semantics for zoned-datetime
  * arithmetic after the ADVICE r7 fixes — time components of a duration
  * apply to the INSTANT (java.time), calendar components to the local
  * clock with the original offset preferred on ambiguity, and
  * duration.between's seconds remainder is an instant difference.
  * Expected values hand-derived from java.time ZonedDateTime. */
object R8Probe1Main {
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

    // java.time cross-check (prints the ground truth)
    import java.time._
    val berlin = ZoneId.of("Europe/Berlin")
    val overlap = ZonedDateTime.of(2024, 10, 27, 2, 30, 0, 0, berlin)
      .withEarlierOffsetAtOverlap()
    println("truth plusHours(1):  " + overlap.plusHours(1))
    println("truth plusDays(1) from 10-26: " +
      ZonedDateTime.of(2024, 10, 26, 2, 30, 0, 0, berlin).plusDays(1))
    println("truth plus24h from 10-26: " +
      ZonedDateTime.of(2024, 10, 26, 2, 30, 0, 0, berlin).plusHours(24))
    println("truth between 10-26T01:00+02 .. 10-27T01:00+01: " +
      "months/days local, secs instant")

    // 1. +PT1H across the fall-back overlap: one ELAPSED hour
    //    (02:30+02:00 -> 02:30+01:00), not a local-clock hop to 03:30
    run("hours-across-overlap",
      "WITH datetime('2024-10-27T02:30+02:00[Europe/Berlin]') + " +
        "duration({hours: 1}) AS x " +
        "RETURN toString(x) AS s, x.offsetSeconds AS off, x.hour AS h")
    // 2. +P1D landing IN the overlap retains the original offset (+02:00)
    run("days-into-overlap-retains-offset",
      "WITH datetime('2024-10-26T02:30+02:00[Europe/Berlin]') + " +
        "duration({days: 1}) AS x " +
        "RETURN toString(x) AS s, x.offsetSeconds AS off")
    // 3. PT24H vs P1D across the transition: 24 elapsed hours from
    //    10-26T02:30+02:00 (00:30Z) is 10-27T00:30Z = 02:30+02:00 local
    //    (assert equal instants is FALSE vs P1D? here they coincide in
    //    instant? P1D retains +02:00 = 10-27T00:30Z — same instant!)
    //    Use 03:30 base instead: P1D -> 10-27T03:30+01:00 (02:30Z);
    //    PT24H -> 10-27T01:30Z = 02:30+01:00 local. DIFFERENT instants.
    run("p1d-vs-pt24h-diverge",
      "WITH datetime('2024-10-26T03:30+02:00[Europe/Berlin]') AS b " +
        "WITH b + duration({days: 1}) AS d1, b + duration({hours: 24}) AS h24 " +
        "RETURN toString(d1) AS d1, toString(h24) AS h24, d1 = h24 AS eq")
    // 4. spring-forward gap: +P1D onto a local time in the gap resolves
    //    forward (02:30 -> 03:30+02:00) — pre-existing lock, must hold
    run("gap-resolves-forward",
      "WITH datetime('2025-03-29T02:30+01:00[Europe/Berlin]') + " +
        "duration({days: 1}) AS x RETURN toString(x) AS s")
    // 5. mixed duration: calendar part local + retained offset, THEN
    //    time part on the instant: 10-26T02:30+02:00 + P1DT1H =
    //    (10-27T02:30+02:00) + 1h elapsed = 10-27T02:30+01:00
    run("mixed-day-then-hour",
      "WITH datetime('2024-10-26T02:30+02:00[Europe/Berlin]') + " +
        "duration({days: 1, hours: 1}) AS x RETURN toString(x) AS s")
    // 6. ADVICE repro: between across spring-forward = PT2H not PT3H
    run("between-across-gap",
      "RETURN toString(duration.between(" +
        "datetime('2024-03-31T01:00+01:00[Europe/Berlin]'), " +
        "datetime('2024-03-31T04:00+02:00[Europe/Berlin]'))) AS d")
    // 7. between with a day component across fall-back: P1DT1H (local
    //    days + instant seconds), old code said P1D
    run("between-day-plus-instant-hour",
      "RETURN toString(duration.between(" +
        "datetime('2024-10-26T01:00+02:00[Europe/Berlin]'), " +
        "datetime('2024-10-27T01:00+01:00[Europe/Berlin]'))) AS d")
    // 8. between == inseconds when no month/day component
    run("between-consistent-with-inseconds",
      "WITH datetime('2024-03-31T01:00+01:00[Europe/Berlin]') AS a, " +
        "datetime('2024-03-31T04:00+02:00[Europe/Berlin]') AS b " +
        "RETURN duration.between(a, b) = duration.inSeconds(a, b) AS eq")
    // 9. truncate retains the value's side of the overlap
    run("truncate-retains-offset",
      "WITH datetime.truncate('hour', " +
        "datetime('2024-10-27T02:30+01:00[Europe/Berlin]')) AS x " +
        "RETURN toString(x) AS s, x.offsetSeconds AS off")
    run("truncate-earlier-side",
      "WITH datetime.truncate('hour', " +
        "datetime('2024-10-27T02:30+02:00[Europe/Berlin]')) AS x " +
        "RETURN toString(x) AS s, x.offsetSeconds AS off")
    // 10. no-transition sanity: plain arithmetic unchanged
    run("plain-arith",
      "WITH datetime('2024-01-01T12:00+02:00') + " +
        "duration({days: 1, hours: 2}) AS x RETURN toString(x) AS s")
    run("plain-between",
      "RETURN toString(duration.between(" +
        "datetime('2024-01-01T12:00Z'), datetime('2024-03-05T14:30Z'))) AS d")
    // 11. negative direction across the overlap: subtracting an hour
    //     from 02:30+01:00 -> 02:30+02:00 (one elapsed hour back)
    run("minus-hours-across-overlap",
      "WITH datetime('2024-10-27T02:30+01:00[Europe/Berlin]') - " +
        "duration({hours: 1}) AS x RETURN toString(x) AS s")
    // 12. date-typed operands unaffected
    run("between-dates",
      "RETURN toString(duration.between(date('2024-01-31'), " +
        "date('2024-03-01'))) AS d")
    // 13. between on localdatetime (no zone): local==instant
    run("between-localdatetime",
      "RETURN toString(duration.between(localdatetime('2024-01-01T10:00'), " +
        "localdatetime('2024-01-02T11:30:15'))) AS d")

    spark.stop()
  }
}
