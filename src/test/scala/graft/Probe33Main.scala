package graft

import org.apache.spark.sql.SparkSession
import graft.api.GraftSession

/** Probe batch 25: mixed-family EQUIVALENCE in grouping / DISTINCT /
  * count(DISTINCT) / collect(DISTINCT) — 1 and 1.0 must be one value —
  * plus the null-dividend float modulo and non-string dynamic key
  * fixes from this round's advice.
  */
object Probe33Main {
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

    probe("distinct-int-float-equiv",
      "UNWIND [1, 1.0, 'a'] AS v RETURN DISTINCT v ORDER BY v")
    probe("distinct-float-first",
      "UNWIND [1.0, 1, 'a'] AS v RETURN DISTINCT v ORDER BY v")
    probe("count-distinct-equiv",
      "UNWIND [1, 1.0, 'x', null] AS v RETURN count(DISTINCT v) AS n")
    probe("group-by-equiv",
      "UNWIND [1, 1.0, 'a', 2] AS v RETURN v, count(*) AS n ORDER BY n DESC, v")
    probe("collect-distinct-equiv",
      "UNWIND [1, 1.0, 'a', 1] AS v RETURN size(collect(DISTINCT v)) AS n")
    probe("group-by-equiv-agg-sum",
      "UNWIND [[1, 10], [1.0, 20], ['a', 5]] AS p " +
        "RETURN p[0] AS k, sum(p[1]) AS s ORDER BY s DESC")
    probe("null-mod-zero-float",
      "WITH null AS x RETURN x % 0.0 AS r")
    probe("null-prop-mod-zero",
      "MATCH (t:T) RETURN t.missing % 0.0 AS r")
    probe("float-mod-zero-still-nan",
      "RETURN 1.5 % 0.0 AS r")
    probe("dynamic-key-int-errors",
      "MATCH (t:T) RETURN t[0] AS r")
    probe("dynamic-key-float-errors",
      "MATCH (t:T) RETURN t[1.5] AS r")
    probe("dynamic-key-null-ok",
      "MATCH (t:T) RETURN t[null] AS r")
    probe("dynamic-key-string-ok",
      "MATCH (t:T) RETURN t['x'] AS r")
    spark.stop()
  }
}
