package graft

import org.apache.spark.sql.SparkSession

import graft.api.GraftSession

/** Scratch semantics prober batch 12: string/math function corners,
  * list functions, type conversions on entity properties.
  */
object Probe12Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gs = GraftSession(spark)
    val g = gs.createGraphFromCypher("CREATE (:P {name: 'Ann'})")
    def run(q: String): Unit = {
      try {
        val rows = gs.cypher(g, q).collect().map(_.toString).mkString(" | ")
        println(s"PROBE12 OK   $q\n  => $rows")
      } catch {
        case e: Throwable =>
          println(s"PROBE12 FAIL $q\n  => ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(160)}")
      }
    }
    // strings
    run("RETURN left('hello', 3) AS l, right('hello', 3) AS r, left('hi', 99) AS lo")
    run("RETURN replace('aaa', 'a', 'b') AS r1, replace('abc', '', 'x') AS r2")
    run("RETURN split('a--b', '--') AS s1, split('abc', '') AS s2")
    run("RETURN toUpper('aBc') AS u, toLower('AbC') AS lo")
    run("RETURN substring('hello', -1, 2) AS neg") // Neo4j errors; null ok?
    run("RETURN toString(3.0) AS a, toString(1000000) AS b, toString([1,2]) AS c")
    // math corners
    run("RETURN round(2.5) AS r1, round(-2.5) AS r2, round(2.4999) AS r3")
    run("RETURN ceil(-0.5) AS c, floor(-0.5) AS f, abs(-0.0) AS a")
    run("RETURN sqrt(-1.0) AS s, log(0.0) AS lg, log(-1.0) AS ln")
    run("RETURN 9 % 0 AS m") // div by zero in modulo
    run("RETURN round(3.14159, 2) AS p2, round(3.14159, 0) AS p0")
    // list functions
    run("RETURN last([]) AS l, head([]) AS h, tail([1]) AS t, tail([]) AS te")
    run("RETURN [1,2,3][1..] AS a, [1,2,3][..2] AS b, [1,2,3][-2..] AS c")
    run("RETURN range(1, 10)[2..4] AS r")
    run("WITH [3,1,2] AS l RETURN reduce(acc = 0, x IN l | acc + x) AS sum, reduce(acc = '', x IN l | acc + toString(x)) AS cat")
    // null-safe entity functions
    run("OPTIONAL MATCH (n:NoSuch) RETURN labels(n) AS l, id(n) AS i, properties(n) AS p, keys(n) AS k")
    run("OPTIONAL MATCH (n:NoSuch)-[r:X]->() RETURN type(r) AS t, startNode(r) AS s")
    // conversions on properties
    run("MATCH (p:P) RETURN toInteger(p.name) AS ni, toFloat(p.name) AS nf, toBoolean(p.name) AS nb")
    // exists variants
    run("MATCH (p:P) RETURN p.name IS NOT NULL AS a, p.nope IS NULL AS b")
    // nested function composition
    run("RETURN size(split(trim('  a b c  '), ' ')) AS words")
    run("RETURN toString(toInteger(toFloat('3.7'))) AS roundtrip")
    spark.stop()
  }
}
