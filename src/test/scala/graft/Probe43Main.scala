package graft

import org.apache.spark.sql.SparkSession
import graft.api.GraftSession

/** Probe batch 37: the remaining READ-ONLY reference-blacklist surfaces
  * (failing_blacklist TypeConversion/StartsWith/SkipLimit/Return2 rows +
  * wont_fix "sorting on variable removed by DISTINCT") — round-6 item 9.
  */
object Probe43Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gs = GraftSession(spark)
    val g = gs.createGraphFromCypher(
      "CREATE (:A {k: 1, s: 'x', f: 1.5, b: true})")
    def q(s: String): Unit = {
      print(s.replace('\n', ' ') + "  ==>  ")
      try println(gs.cypher(g, s).collect().map(_.toString).mkString("; "))
      catch { case e: Throwable =>
        println(s"ERROR ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(120)}")
      }
    }
    // TypeConversionFunctions over mixed/Any (tagged) values
    q("UNWIND [1, 2.3, '4', '4.7', 'foo', true] AS x RETURN toInteger(x) AS i")
    q("UNWIND [1, 2.3, '4', '4.7', 'foo', true] AS x RETURN toFloat(x) AS f")
    q("UNWIND [1, 2.3, 'foo', true] AS x RETURN toString(x) AS s")
    q("UNWIND [1, 0, 'true', 'False', 'foo', true] AS x RETURN toBoolean(x) AS b")
    q("RETURN toBoolean(1.5) AS b") // invalid type: error or null?
    q("RETURN toBoolean([1]) AS b") // invalid type
    // StartsWithAcceptance: non-string operands → null
    q("MATCH (n:A) RETURN n.k STARTS WITH 'x' AS a, 'x' CONTAINS n.f AS b, n.b ENDS WITH 'e' AS c")
    q("RETURN 1 STARTS WITH '1' AS a")
    // SkipLimit with variable-free expressions
    q("UNWIND [1,2,3,4,5] AS x RETURN x ORDER BY x SKIP toInteger(1.0) LIMIT toInteger(ceil(1.7))")
    q("UNWIND [1,2,3,4,5] AS x RETURN x ORDER BY x LIMIT 1 + 1")
    // ReturnAcceptance2 shapes
    q("RETURN size([1,2,3] + [4,5]) AS n") // concatenating literal lists
    q("MATCH (a:A) RETURN [a.k, 7] + [9] AS l") // concat same type
    q("MATCH (a:A) RETURN [a.k, 7] + 9 AS l") // append element
    q("RETURN 1 + null AS a, null * 2 AS b, abs(null) AS c") // null propagation
    q("UNWIND [{m: [{x: 1}]}, {m: [{x: 1}]}, {m: [{x: 2}]}] AS v RETURN count(DISTINCT v) AS n") // nested maps in lists in maps
    q("MATCH (a:A) WITH a.k AS x, a.k * 2 AS y RETURN x, y, x + y AS z") // backreferencing
    // wont_fix: sorting on a variable removed by DISTINCT must FAIL
    q("UNWIND [1,2] AS x UNWIND [3,4] AS y RETURN DISTINCT x ORDER BY y")
    // sorting on an expression OF a distinct column is fine
    q("UNWIND [2,1] AS x RETURN DISTINCT x ORDER BY x * -1")
    // Return all variables (RETURN *)
    q("MATCH (a:A) RETURN *")
    spark.stop()
  }
}
