package graft

import org.apache.spark.sql.SparkSession
import graft.api.GraftSession

/** Probe batch 16: error/boundary semantics vs Neo4j expectations.
  * Prints engine behavior; divergences become fixes or scenarios. */
object Probe24Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gs = GraftSession(spark)
    val g = gs.createGraphFromCypher("CREATE (:P {x: 1})")

    def probe(name: String, q: String): Unit = {
      val r = try {
        gs.cypher(g, q).collect().map(_.toSeq.mkString(",")).mkString(" | ")
      } catch { case e: Throwable =>
        s"ERROR(${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(90)})"
      }
      println(f"$name%-34s -> $r")
    }

    probe("int-div-zero", "RETURN 1 / 0 AS r")                 // Neo4j: error
    probe("float-div-zero", "RETURN 1.0 / 0 AS r")             // Neo4j: Infinity? (error in older)
    probe("mod-zero", "RETURN 1 % 0 AS r")                     // Neo4j: error
    probe("float-mod-zero", "RETURN 1.5 % 0.0 AS r")           // NaN
    probe("substring-neg-start", "RETURN substring('abc', -1) AS r") // Neo4j: error
    probe("left-negative", "RETURN left('abc', -1) AS r")      // Neo4j: error
    probe("toInteger-hexstr", "RETURN toInteger('0x10') AS r") // null
    probe("toInteger-ws", "RETURN toInteger(' 12 ') AS r")     // Neo4j: 12 (trims)
    probe("toFloat-ws", "RETURN toFloat(' 1.5 ') AS r")        // 1.5
    probe("toInteger-float-str", "RETURN toInteger('3.9') AS r") // Neo4j: 3
    probe("dup-alias", "RETURN 1 AS a, 2 AS a")                // Neo4j: error ColumnNameConflict
    probe("union-mismatch",
      "RETURN 1 AS a UNION RETURN 2 AS b")                     // Neo4j: error
    probe("order-by-unknown-var",
      "RETURN 1 AS a ORDER BY bogus")                          // Neo4j: error unknown var
    probe("min-string-vs-number",
      "UNWIND [1, 'a'] AS v RETURN min(v) AS r")               // Neo4j: min across types by type order
    probe("sqrt-negative", "RETURN sqrt(-1.0) AS r")           // NaN
    probe("asin-out-of-range", "RETURN asin(2.0) AS r")        // NaN
    probe("zero-pow-zero", "RETURN 0 ^ 0 AS r")                // 1.0
    probe("exp-overflow", "RETURN exp(1000.0) AS r")           // Infinity
    probe("range-step-zero", "RETURN range(1, 3, 0) AS r")     // Neo4j: error
    probe("size-string", "RETURN size('abc') AS r")            // 3
    probe("trim-unicode-space", "RETURN trim(' x ') AS r") // Neo4j trims ASCII ws only
    probe("upper-sharp-s", "RETURN toUpper('straße') AS r")  // STRASSE
    probe("split-empty-sep", "RETURN split('ab', '') AS r")    // ['a','b']
    probe("string-lt-number", "RETURN 'a' < 1 AS r")           // null
    probe("list-index-noninteger", "RETURN [1,2,3][1.5] AS r") // Neo4j: error
    probe("percentile-out-of-range",
      "UNWIND [1,2] AS v RETURN percentileCont(v, 1.5) AS r")  // Neo4j: error
    probe("collect-on-empty-db",
      "MATCH (q:Zzz) RETURN collect(q.x) AS r")                // []
    probe("abs-long-min",
      "RETURN abs(-9223372036854775808) AS r")                 // Neo4j: overflow error
    probe("unary-minus-string", "RETURN -'a' AS r")            // error
    probe("plus-bool", "RETURN true + 1 AS r")                 // error
    probe("id-of-value", "RETURN id(5) AS r")                  // error (id on non-entity)
    spark.stop()
  }
}
