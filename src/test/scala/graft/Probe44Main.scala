package graft

import org.apache.spark.sql.SparkSession
import graft.api.GraftSession

/** Probe batch 38: temporal-blacklist corners not yet locked —
  * duration.between family (inDays/inMonths/inSeconds, null propagation),
  * temporal comparison matrix, toString round-trips, truncate edges.
  * The reference blacklists its ENTIRE 920-scenario temporal area; every
  * green probe here is surface beyond it.
  */
object Probe44Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gs = GraftSession(spark)
    val g = gs.createGraphFromCypher("CREATE (:A {k: 1})")
    def q(s: String): Unit = {
      print(s.replace('\n', ' ') + "  ==>  ")
      try println(gs.cypher(g, s).collect().map(_.toString).mkString("; "))
      catch { case e: Throwable =>
        println(s"ERROR ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(120)}")
      }
    }
    q("RETURN duration.between(date('1984-10-11'), date('2015-06-24')) AS d")
    q("RETURN duration.inDays(date('2015-06-24'), date('1984-10-11')) AS d")
    q("RETURN duration.inMonths(date('1984-10-11'), date('2015-06-24')) AS d")
    q("RETURN duration.inSeconds(localdatetime('2015-06-24T12:00'), localdatetime('2015-06-24T12:30:35')) AS d")
    q("MATCH (n:A) RETURN duration.between(n.missing, date('2015-06-24')) AS d")
    q("RETURN duration.between(date('2015-06-24'), null) AS d")
    // large duration in seconds
    q("RETURN duration.inSeconds(localdatetime('1984-10-11T21:30'), localdatetime('2015-06-24T12:00')) AS d")
    // comparison matrix
    q("RETURN date('2024-01-01') <= date('2024-01-01') AS a, localtime('12:00') < localtime('13:00') AS b")
    q("RETURN localdatetime('2024-01-01T10:00') >= localdatetime('2024-01-01T09:59') AS a")
    q("RETURN duration({days: 1}) = duration({days: 1}) AS eq")
    // toString round-trips
    q("RETURN toString(date('2024-02-29')) AS d, toString(localtime('09:05:01.5')) AS t")
    q("RETURN toString(duration({months: 14, days: 3, seconds: 90})) AS d")
    // truncate edges
    q("RETURN date.truncate('month', date('2024-02-29')) AS m, date.truncate('year', date('2024-02-29')) AS y")
    q("RETURN date.truncate('week', date('2024-01-01')) AS w")
    q("RETURN datetime.truncate('day', datetime('2024-02-29T13:37:01Z')) AS d")
    // accessors on composite temporals
    q("RETURN datetime('2024-02-29T13:37:01.5Z').epochMillis AS em")
    q("RETURN localdatetime('2024-02-29T13:37:01').minute AS m, time('13:37:01+01:00').offset AS o")
    // duration accessor components
    q("RETURN duration({months: 14, days: 3, seconds: 90}).months AS mo, duration({months: 14}).years AS y")
    spark.stop()
  }
}
