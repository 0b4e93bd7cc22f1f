package graft

import org.apache.spark.sql.SparkSession
import graft.api.GraftSession

/** Probe batch 24: mixed-family values as grouping/DISTINCT keys. */
object Probe32Main {
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
        s"ERROR(${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(80)})"
      }
      println(f"$name%-40s -> $r")
    }

    probe("group-by-mixed-key",
      "UNWIND [1, 'a', 1] AS v RETURN v, count(*) AS n ORDER BY n DESC")
    probe("distinct-mixed",
      "UNWIND [1, 'a', 1, 'a'] AS v RETURN DISTINCT v ORDER BY v")
    probe("distinct-int-vs-float",
      "UNWIND [1, 1.0, 'x'] AS v RETURN count(DISTINCT v) AS n")
    probe("collect-mixed-size",
      "UNWIND [1, 'a', true] AS v RETURN size(collect(v)) AS n")
    probe("mixed-in-where",
      "UNWIND [1, 'a', 2] AS v WITH v WHERE v = 1 RETURN v")
    probe("mixed-case-key",
      """UNWIND [1, 'a'] AS v
        |RETURN CASE v WHEN 1 THEN 'num' ELSE 'other' END AS k
        |ORDER BY k""".stripMargin)
    spark.stop()
  }
}
