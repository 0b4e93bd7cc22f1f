package graft
import org.apache.spark.sql.SparkSession
object R8Probe12Main {
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
    run("between-subsecond",
      "RETURN toString(duration.between(datetime('2024-01-01T00:00:00.5Z'), " +
        "datetime('2024-01-01T00:00:01.75Z'))) AS d")
    run("inseconds-subsecond",
      "RETURN toString(duration.inSeconds(datetime('2024-01-01T00:00:00.5Z'), " +
        "datetime('2024-01-01T00:00:01.75Z'))) AS d")
    run("between-ldt-subsecond",
      "RETURN toString(duration.between(localdatetime('2024-01-01T00:00:00.5'), " +
        "localdatetime('2024-01-01T00:00:01.75'))) AS d")
    run("between-negative-subsecond",
      "RETURN toString(duration.between(datetime('2024-01-01T00:00:01.75Z'), " +
        "datetime('2024-01-01T00:00:00.5Z'))) AS d")
    spark.stop()
  }
}
