package graft

import org.apache.spark.sql.SparkSession
import graft.api.GraftSession

/** Probe batch 18: temporal accessors, parsing, truncation, arithmetic. */
object Probe26Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gs = GraftSession(spark)
    val g = gs.createGraphFromCypher("CREATE (:T {x: 1})")

    def probe(name: String, q: String): Unit = {
      val r = try {
        gs.cypher(g, q).collect().map(_.toSeq.mkString(",")).mkString(" | ")
      } catch { case e: Throwable =>
        s"ERROR(${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(90)})"
      }
      println(f"$name%-38s -> $r")
    }

    probe("leap-clamp-year",
      "RETURN date('2024-02-29') + duration({years: 1}) AS d")   // 2025-02-28
    probe("week-accessors",
      """WITH date('2024-01-01') AS d
        |RETURN d.week AS w, d.dayOfWeek AS dw, d.quarter AS q,
        |       d.ordinalDay AS od""".stripMargin)               // 1,1,1,1
    probe("week-of-late-december",
      "RETURN date('2019-12-30').week AS w, date('2019-12-30').weekYear AS wy") // 1, 2020
    probe("fractional-seconds-parse",
      """WITH localdatetime('2020-01-01T00:00:00.123456') AS t
        |RETURN t.millisecond AS ms, t.microsecond AS us""".stripMargin) // 123, 123456
    probe("epoch-accessors",
      """WITH datetime('1970-01-02T00:00:00Z') AS t
        |RETURN t.epochSeconds AS s, t.epochMillis AS ms""".stripMargin) // 86400, 86400000
    probe("truncate-week-is-monday",
      "RETURN date.truncate('week', date('2024-02-29')) AS d")   // 2024-02-26
    probe("full-iso-duration-parse",
      """WITH duration('P1Y2M3DT4H5M6.789S') AS du
        |RETURN du.months AS m, du.days AS d, du.seconds AS s,
        |       du.milliseconds AS ms""".stripMargin)            // 14,3,14706,14706789
    probe("duration-div-fractional",
      "RETURN (duration({days: 1}) / 2).hours AS h")             // 12
    probe("date-minus-duration",
      "RETURN date('2024-03-31') - duration({months: 1}) AS d")  // 2024-02-29
    probe("datetime-plus-seconds-fraction",
      """RETURN localdatetime('2020-01-01T00:00:00')
        |       + duration({seconds: 1.5}) AS t""".stripMargin)  // 00:00:01.5
    probe("duration-between-dates",
      """WITH duration.between(date('2020-01-01'), date('2020-03-15')) AS du
        |RETURN du.months AS m, du.days AS d""".stripMargin)     // 2, 14
    probe("negative-duration-accessors",
      """WITH duration({days: -3, hours: -5}) AS du
        |RETURN du.days AS d, du.hours AS h""".stripMargin)      // -3, -5
    probe("date-comparison",
      """RETURN date('2024-01-01') < date('2024-06-01') AS lt,
        |date('2024-01-01') = date('2024-01-01') AS eq""".stripMargin)
    probe("tostring-datetime",
      "RETURN toString(localdatetime('2020-06-15T12:30:45')) AS s")
    probe("temporal-min-max",
      """UNWIND [date('2024-01-05'), date('2023-12-31')] AS d
        |RETURN min(d) AS lo, max(d) AS hi""".stripMargin)
    spark.stop()
  }
}
