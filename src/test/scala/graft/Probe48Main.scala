package graft

import org.apache.spark.sql.SparkSession
import graft.api.GraftSession

/** Probe batch 40b: TIME/LOCALTIME (and duration) values as NODE
  * PROPERTIES through the CREATE-fixture path — the storage half of the
  * new temporal types. */
object Probe48Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gs = GraftSession(spark)
    def run(create: String, q: String): Unit = {
      print(q.replace('\n', ' ').take(90) + "  ==>  ")
      try {
        val g = gs.createGraphFromCypher(create)
        println(gs.cypher(g, q).collect().map(_.toString).mkString("; "))
      } catch { case e: Throwable =>
        println(s"ERROR ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(110)}")
      }
    }
    run("CREATE (:E {t: localtime('09:05'), uid: 0})\nCREATE (:E {uid: 1})",
      "MATCH (n:E) RETURN toString(n.t) AS t ORDER BY n.uid")
    run("CREATE (:E {t: localtime('09:05'), uid: 0})\nCREATE (:E {t: localtime('14:30'), uid: 1})",
      "MATCH (n:E) WHERE n.t < localtime('12:00') RETURN n.uid AS u")
    run("CREATE (:E {t: time('09:05+02:00'), uid: 0})",
      "MATCH (n:E) RETURN n.t.hour AS h, n.t.offset AS o")
    run("CREATE (:E {d: duration({days: 2, hours: 3}), uid: 0})",
      "MATCH (n:E) RETURN toString(n.d) AS d, n.d.days AS days")
    spark.stop()
  }
}
