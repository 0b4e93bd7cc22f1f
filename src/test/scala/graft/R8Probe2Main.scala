package graft

import org.apache.spark.sql.SparkSession

/** Round-8 probe batch 2: COLUMN-valued temporal constructor args —
  * datetime/date/time/localtime/localdatetime/duration over data
  * columns (VERDICT r7 item 1). */
object R8Probe2Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gs = graft.api.GraftSession(spark)
    val g = gs.createGraphFromCypher(
      """CREATE (:D {uid: 0, iso: '2024-06-01T12:00+02:00[Europe/Berlin]',
        |           d: '2024-03-05', t: '13:30:15+01:00', dur: 'P1Y2MT3H',
        |           ldt: '2024-06-01T08:30:15.5'})
        |CREATE (:D {uid: 1, iso: '2024-01-01T00:00Z', d: '2015-W30-2',
        |           t: '09:15', dur: 'PT90S', ldt: '20240105T070809'})
        |CREATE (:D {uid: 2, iso: '2024-06-01', d: '20240229',
        |           t: '231500', dur: 'P3W', ldt: '2024-202'})
        |CREATE (:D {uid: 3})
        |""".stripMargin)
    def run(name: String, q: String): Unit =
      try {
        val rows = gs.cypher(g, q).collect()
        println(s"OK   $name -> ${rows.mkString(";")}")
      } catch { case e: Throwable =>
        println(s"FAIL $name -> ${e.getClass.getSimpleName}: " +
          Option(e.getMessage).getOrElse("").linesIterator.take(2).mkString(" "))
      }

    run("datetime-col",
      "MATCH (n:D) RETURN n.uid AS u, toString(datetime(n.iso)) AS s " +
        "ORDER BY u")
    run("datetime-col-accessors",
      "MATCH (n:D) WHERE n.uid = 0 WITH datetime(n.iso) AS dt " +
        "RETURN dt.hour AS h, dt.offset AS o, dt.timezone AS tz, " +
        "dt.epochSeconds AS es")
    run("datetime-col-order-group",
      "MATCH (n:D) WITH datetime(n.iso) AS dt WHERE dt IS NOT NULL " +
        "RETURN count(DISTINCT dt) AS c, toString(min(dt)) AS lo")
    run("datetime-col-arith",
      "MATCH (n:D) WHERE n.uid = 0 " +
        "RETURN toString(datetime(n.iso) + duration({days: 1})) AS s")
    run("date-col",
      "MATCH (n:D) RETURN n.uid AS u, toString(date(n.d)) AS s ORDER BY u")
    run("date-col-compare",
      "MATCH (n:D) WHERE date(n.d) > date('2016-01-01') " +
        "RETURN count(*) AS c")
    run("time-col",
      "MATCH (n:D) RETURN n.uid AS u, toString(time(n.t)) AS s, " +
        "time(n.t).hour AS h ORDER BY u")
    run("localtime-col",
      "MATCH (n:D) RETURN n.uid AS u, toString(localtime(n.t)) AS s " +
        "ORDER BY u")
    run("localdatetime-col",
      "MATCH (n:D) RETURN n.uid AS u, toString(localdatetime(n.ldt)) AS s " +
        "ORDER BY u")
    run("duration-col",
      "MATCH (n:D) RETURN n.uid AS u, toString(duration(n.dur)) AS s " +
        "ORDER BY u")
    run("duration-col-arith",
      "MATCH (n:D) WHERE n.uid = 1 " +
        "RETURN toString(date('2024-01-01') + duration(n.dur)) AS s")
    run("null-prop-all",
      "MATCH (n:D) WHERE n.uid = 3 RETURN datetime(n.iso) IS NULL AS a, " +
        "date(n.d) IS NULL AS b, time(n.t) IS NULL AS c, " +
        "localtime(n.t) IS NULL AS d, localdatetime(n.ldt) IS NULL AS e, " +
        "duration(n.dur) IS NULL AS f")
    run("statically-absent-prop",
      "MATCH (n:D) WHERE n.uid = 0 RETURN datetime(n.nope) IS NULL AS a, " +
        "date(n.nope) IS NULL AS b, duration(n.nope) IS NULL AS f")
    run("malformed-raises",
      "WITH 'garbage' AS s RETURN datetime(s)")
    run("malformed-date-raises",
      "WITH 'not-a-date' AS s RETURN date(s)")
    run("datetime-col-eq-literal",
      "MATCH (n:D) WHERE n.uid = 1 " +
        "RETURN datetime(n.iso) = datetime('2024-01-01T00:00Z') AS eq")
    // derived string (not a raw property column)
    run("derived-string",
      "MATCH (n:D) WHERE n.uid = 1 " +
        "RETURN toString(date(substring(n.iso, 0, 10))) AS s")

    spark.stop()
  }
}
