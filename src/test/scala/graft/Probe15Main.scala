package graft

import org.apache.spark.sql.SparkSession
import graft.api.GraftSession

/** Probe batch 15: ORDER BY null placement, scalar edges. */
object Probe15Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gs = GraftSession(spark)
    val g = gs.createGraphFromCypher("""
      CREATE (:X {k: 2, s: 'b'})
      CREATE (:X {k: 1, s: 'a'})
      CREATE (:X {s: 'c'})
    """)
    def run(q: String): Unit = {
      print(q.replaceAll("\\s+", " ").take(90) + "  ==>  ")
      try println(gs.cypher(g, q).collect().map(r =>
        r.toSeq.map(v => if (v == null) "NULL" else v.toString).mkString("(", ",", ")"))
        .mkString("[", " ", "]"))
      catch { case e: Exception => println("ERR " + e.getMessage.take(100)) }
    }
    // ORDER BY null placement: Cypher puts nulls LAST on ASC, FIRST on DESC
    run("MATCH (x:X) RETURN x.k AS k ORDER BY k")
    run("MATCH (x:X) RETURN x.k AS k ORDER BY k DESC")
    run("MATCH (x:X) RETURN x.s AS s, x.k AS k ORDER BY k ASC, s DESC")
    // scalar edges
    run("RETURN substring('abc', 1, 0) AS a, substring('abc', 0, 2) AS b")
    run("RETURN range(0, -1) AS r, size(range(0, -1)) AS n")
    run("RETURN collect(null) AS c")
    run("RETURN [x IN null | x] AS a, size(null) AS b, head(null) AS c")
    run("RETURN CASE WHEN false THEN 1 END AS noelse")
    run("RETURN round(2.555, 2) AS r2, round(2.5) AS r0")
    run("RETURN abs(-2.5) AS a, sign(0) AS s, sign(-3) AS n")
    run("RETURN toUpper('straße') AS u, toLower('ÀÉÎ') AS l")
    run("RETURN 5.0 % 2.0 AS fm, 5 % 2.5 AS im")
    run("RETURN date('2024-01-02') = localdatetime('2024-01-02T00:00:00') AS deq")
    run("RETURN date('2024-01-02') < localdatetime('2024-01-03T00:00:00') AS dlt")
    run("RETURN left('abc', 0) AS l0, right('abc', 0) AS r0")
    run("RETURN split('a,,b', ',') AS s, size(split('a,,b', ',')) AS n")
    run("RETURN trim('  x  ') AS t, ltrim('  x') AS l, rtrim('x  ') AS r")
    run("RETURN 0.1 + 0.2 = 0.3 AS fp")
    run("MATCH (x:X) WHERE x.k IS NOT NULL RETURN max(x.s) AS ms, min(x.k) AS mk")
    run("RETURN reverse(null) AS r, toBoolean(1) AS tb")
    run("RETURN timestamp() > 0 AS ts, e() > 2.7 AS e, pi() > 3.1 AS p")
    spark.stop()
  }
}
