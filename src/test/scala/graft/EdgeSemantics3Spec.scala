package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.api.GraftSession

/** Fourth edge batch: temporal semantics — construction forms, accessors,
  * date ± duration arithmetic, comparisons, and duration component
  * normalization.
  */
class EdgeSemantics3Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val gs = GraftSession(spark)
  lazy val g = gs.createGraphFromCypher("CREATE (:E {v: 1})")

  private def one(q: String): Any = {
    val df = gs.cypher(g, q)
    df.collect().head.get(0)
  }

  test("date from string")(
    assert(one("RETURN date('2020-06-15') AS d").toString == "2020-06-15"))
  test("date comparison")(
    assert(one("RETURN date('2020-01-01') < date('2020-06-15') AS b") == true))
  test("date accessors") {
    assert(one("RETURN date('2020-06-15').year AS y") == 2020L)
    assert(one("RETURN date('2020-06-15').month AS m") == 6L)
    assert(one("RETURN date('2020-06-15').day AS d") == 15L)
  }
  test("localdatetime accessors") {
    assert(one(
      "RETURN localdatetime('2020-06-15T10:30:45').hour AS h") == 10L)
    assert(one(
      "RETURN localdatetime('2020-06-15T10:30:45').second AS s") == 45L)
  }
  test("date plus day duration")(
    assert(one("RETURN (date('2020-06-15') + duration({days: 20})) AS d")
      .toString == "2020-07-05"))
  test("date plus month duration")(
    assert(one("RETURN (date('2020-01-31') + duration({months: 1})) AS d")
      .toString == "2020-02-29")) // calendar-aware clamp, leap year
  test("date minus duration")(
    assert(one("RETURN (date('2020-03-01') - duration({days: 1})) AS d")
      .toString == "2020-02-29"))
  test("duration from ISO string")(
    assert(one("RETURN duration('P1Y2M3D').months AS m") == 14L))
  test("duration days accessor keeps the constructed day group")(
    // Neo4j keeps (months, days, seconds) groups as constructed: 26 hours
    // stay in the seconds group, the day count stays 5 (durations are
    // CalendarIntervalType with raw-field accessors since round 3)
    assert(one("RETURN duration({days: 5, hours: 26}).days AS d") == 5L))
  test("duration between dates")(
    assert(one(
      "RETURN duration.between(date('2020-01-01'), date('2020-03-01')).months AS m")
      == 2L))
  test("datetime plus duration with time part")(
    assert(one(
      """RETURN (localdatetime('2020-06-15T23:00:00') +
        | duration({hours: 2})) AS t""".stripMargin)
      .toString.startsWith("2020-06-16T01:00"))) // NTZ: LocalDateTime repr
  test("date equality across construction forms")(
    assert(one(
      "RETURN date({year: 2020, month: 6, day: 15}) = date('2020-06-15') AS b")
      == true))
  test("temporal in WHERE filter") {
    val g2 = gs.createGraphFromCypher(
      """CREATE (:Ev {name: 'a', on: '2020-01-15'})
        |CREATE (:Ev {name: 'b', on: '2020-06-15'})""".stripMargin)
    val df = gs.cypher(g2,
      "MATCH (e:Ev) WHERE date(e.on) > date('2020-03-01') RETURN e.name AS n")
    assert(df.collect().map(_.getString(0)).toSeq == Seq("b"))
  }
  test("duration multiplication by integer")(
    assert(one("RETURN (duration({days: 2}) * 3).days AS d") == 6L))
  test("truncated date")(
    assert(one("RETURN date.truncate('month', date('2020-06-15')) AS d")
      .toString == "2020-06-01"))
}
