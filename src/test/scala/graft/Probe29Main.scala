package graft

import org.apache.spark.sql.SparkSession
import graft.api.GraftSession

/** Probe batch 21: function-surface residuals. */
object Probe29Main {
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
      println(f"$name%-34s -> $r")
    }

    probe("e-pi", "RETURN e() AS e, pi() AS p")
    probe("degrees-radians",
      "RETURN degrees(pi()) AS d, radians(180.0) AS r")
    probe("haversin", "RETURN haversin(0) AS h0, haversin(pi()) AS hp")
    probe("rand-range", "WITH rand() AS r RETURN r >= 0.0 AND r < 1.0 AS ok")
    probe("randomuuid-shape",
      "WITH randomUUID() AS u RETURN size(u) AS n")
    probe("timestamp-positive", "RETURN timestamp() > 0 AS ok")
    probe("split-list-of-delims",
      "RETURN split('a,b;c', [',', ';']) AS r")
    probe("min-over-lists",
      "UNWIND [[1, 2], [1], [2]] AS l RETURN min(l) AS lo, max(l) AS hi")
    probe("left-zero", "RETURN left('abc', 0) AS r")
    probe("empty-list-index", "RETURN [][0] AS r")
    probe("nested-reduce",
      """RETURN reduce(acc = 0, x IN [[1,2],[3]] |
        |acc + reduce(a2 = 0, y IN x | a2 + y)) AS r""".stripMargin)
    probe("abs-int-keeps-type", "RETURN abs(-5) AS i, abs(-5.5) AS f")
    probe("round-modes",
      "RETURN round(2.5) AS a, round(-2.5) AS b, round(2.4) AS c")
    probe("tolower-upper-roundtrip",
      "RETURN toLower('ÄbC') AS lo, toUpper('Äbc') AS up")
    spark.stop()
  }
}
