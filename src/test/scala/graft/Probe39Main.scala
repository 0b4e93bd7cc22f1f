package graft
// Probe batch 31: temporal selection/composition constructors, ISO
// week/ordinal/compact date forms, decade/century/millennium/weekYear
// truncation, epoch construction (the reference blacklists its ENTIRE
// 920-scenario temporal TCK surface; these shapes now all pass here).
import org.apache.spark.sql.SparkSession
import graft.api.GraftSession
object Probe39Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gs = GraftSession(spark)
    val g = gs.createGraphFromCypher("CREATE (:T {x: 1})")
    def probe(name: String, q: String): Unit = {
      val r = try gs.cypher(g, q).collect().map(_.toSeq.mkString(",")).mkString(" | ")
        catch { case e: Throwable => s"ERROR(${String.valueOf(e.getMessage).take(90)})" }
      println(f"$name%-40s -> $r")
    }
    probe("date-from-datetime", "RETURN date(localdatetime('2020-03-15T10:30:00')) AS r")
    probe("localdatetime-from-date", "RETURN localdatetime(date('2020-03-15')) AS r")
    probe("date-select-override", "RETURN date({date: date('2020-03-15'), day: 5}) AS r")
    probe("date-select-from-dt", "RETURN date({date: localdatetime('2020-03-15T10:00:00')}) AS r")
    probe("ldt-compose-date-time", "RETURN localdatetime({date: date('2020-03-15'), hour: 7, minute: 30}) AS r")
    probe("date-week-form", "RETURN date('2015-W30-2') AS r")
    probe("date-ordinal-form", "RETURN date('2015-202') AS r")
    probe("date-compact-form", "RETURN date('20150721') AS r")
    probe("date-year-month-form", "RETURN date('2015-07') AS r")
    probe("truncate-decade", "RETURN date.truncate('decade', date('2017-03-15')) AS r")
    probe("truncate-century", "RETURN date.truncate('century', date('2017-03-15')) AS r")
    probe("truncate-millennium", "RETURN date.truncate('millennium', date('2017-03-15')) AS r")
    probe("truncate-weekyear", "RETURN date.truncate('weekYear', date('2017-01-01')) AS r")
    probe("duration-between-fraction",
      "RETURN duration.between(localdatetime('2020-01-01T00:00:00.6'), localdatetime('2020-01-01T00:00:00.1')).seconds AS s")
    probe("datetime-epoch-millis", "RETURN datetime({epochMillis: 86400000}) AS r")
    probe("localdatetime-week-compose", "RETURN localdatetime({year: 2015, week: 30, dayOfWeek: 2}) AS r")
    spark.stop()
  }
}
