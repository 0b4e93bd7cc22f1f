package graft

import org.apache.spark.sql.SparkSession
import graft.api.GraftSession

/** Probe batch 38b: time()/localtime() support status. */
object Probe45Main {
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
    q("RETURN time('13:37:01+01:00') AS t")
    q("RETURN time('13:37:01') AS t")
    q("RETURN time('13:37:01').hour AS h")
    q("RETURN time({hour: 13, minute: 37}) AS t")
    q("RETURN toString(time('13:37:01+01:00')) AS t, toString(localtime('09:05:01.5')) AS lt")
    q("RETURN time('13:37:01+01:00').hour AS h, time('13:37:01+01:00').offset AS o")
    q("RETURN localtime('12:00') < localtime('13:00') AS lt, time('13:00+01:00') = time('12:00Z') AS sameInstant")
    q("RETURN localtime('12:00') = localdatetime('1970-01-01T12:00') AS crossType")
    q("RETURN time('23:30-02:00').hour AS wrapHour")
    q("RETURN toString(duration({months: 14, days: 3, seconds: 90})) AS iso")
    q("RETURN toString(duration({seconds: 0})) AS zero, toString(duration({seconds: 90.5})) AS frac")
    q("RETURN localtime({hour: 9, minute: 5, second: 1, millisecond: 500}).millisecond AS ms")
    q("UNWIND [localtime('13:00'), localtime('09:00')] AS t RETURN t ORDER BY t")
    q("WITH time('13:37:01+01:00') AS t RETURN t.hour AS h")
    q("RETURN (time('13:37:01+01:00')).hour AS h")
    q("WITH localtime('09:05:01') AS t RETURN t.minute AS m")
    spark.stop()
  }
}
