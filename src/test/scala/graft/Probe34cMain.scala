package graft
import org.apache.spark.sql.SparkSession
import graft.api.GraftSession
object Probe34cMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
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
      println(f"$name%-44s -> $r")
    }
    probe("dur-26h-days", "RETURN duration({hours: 26}).days AS d, duration({hours: 26}).hours AS h")
    probe("dur-iso-26h", "RETURN duration('PT26H').days AS d, duration('PT26H').hours AS h")
    probe("dt-minus-dt-type",
      "WITH localdatetime('2020-01-03T10:00:00') AS a, localdatetime('2020-01-01T08:00:00') AS b RETURN (a - b).days AS d, (a - b).hours AS h")
    probe("dur-between-26h",
      "RETURN duration.between(localdatetime('2020-01-01T00:00:00'), localdatetime('2020-01-02T02:00:00')).days AS d")
    spark.stop()
  }
}
