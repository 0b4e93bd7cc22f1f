package graft
import org.apache.spark.sql.SparkSession
import graft.api.GraftSession
object Probe33bMain {
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
    probe("nested-mixed-unwind",
      "UNWIND [[1, 10], [2, 20]] AS p RETURN p[0] AS k, p[1] AS v")
    probe("nested-het-unwind",
      "UNWIND [[1, 10], [1.0, 20]] AS p RETURN p[0] AS k")
    probe("group-agg-mixed-key",
      "UNWIND [1, 1.0, 'a', 2] AS v RETURN v AS k, count(*) AS n, sum(1) AS s ORDER BY n DESC, k")
    probe("group-agg-mixed-two-keys",
      "UNWIND [1, 1.0, 'a'] AS v UNWIND ['p','q'] AS w RETURN v, w, count(*) AS n ORDER BY w, v")
    probe("distinct-order-skip-limit",
      "UNWIND [1, 1.0, 'a', 2, 'a'] AS v RETURN DISTINCT v ORDER BY v SKIP 1 LIMIT 2")
    spark.stop()
  }
}
