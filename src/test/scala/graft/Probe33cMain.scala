package graft
import org.apache.spark.sql.SparkSession
import graft.api.GraftSession
object Probe33cMain {
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
        s"ERROR(${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(100)})"
      }
      println(f"$name%-40s -> $r")
    }
    probe("het-nested-list-literal", "RETURN [[1, 10], ['a', 5]] AS l")
    probe("het-nested-unwind", "UNWIND [[1, 10], ['a', 5]] AS p RETURN p")
    probe("het-inner-mixed", "RETURN [1, ['a', 5]] AS l")
    spark.stop()
  }
}
