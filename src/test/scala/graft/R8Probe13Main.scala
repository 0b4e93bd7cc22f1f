package graft
import org.apache.spark.sql.SparkSession
object R8Probe13Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gs = graft.api.GraftSession(spark)
    val g = gs.createGraphFromCypher("CREATE (:A {k: 1})")
    def run(name: String, q: String): Unit =
      try println(s"OK   $name -> ${gs.cypher(g, q).collect().mkString(";")}")
      catch { case e: Throwable =>
        println(s"FAIL $name -> ${e.getClass.getSimpleName}: " +
          Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString(" ")) }
    run("date-minus-date", "RETURN date('2024-01-05') - date('2024-01-01') AS d")
    run("zdt-minus-zdt", "RETURN datetime('2024-01-02T00:00Z') - datetime('2024-01-01T00:00Z') AS d")
    run("ldt-minus-ldt", "RETURN localdatetime('2024-01-02T00:00') - localdatetime('2024-01-01T00:00') AS d")
    run("time-minus-time", "RETURN time('13:00Z') - time('12:00Z') AS d")
    run("date-plus-date", "RETURN date('2024-01-05') + date('2024-01-01') AS d")
    run("dur-minus-dur", "RETURN toString(duration({days: 3}) - duration({hours: 2})) AS d")
    run("dur-plus-dur", "RETURN toString(duration({days: 3}) + duration({hours: 2})) AS d")
    run("zdt-plus-zdt", "RETURN datetime('2024-01-02T00:00Z') + datetime('2024-01-01T00:00Z') AS d")
    run("point-plus-point", "RETURN point({x:1,y:2}) + point({x:1,y:2}) AS d")
    spark.stop()
  }
}
