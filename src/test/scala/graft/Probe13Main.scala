package graft

import org.apache.spark.sql.SparkSession

import graft.api.GraftSession

/** Scratch semantics prober batch 13: lexical corners — escapes, backtick
  * identifiers, comments, keyword-named labels/properties, numerics.
  */
object Probe13Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gs = GraftSession(spark)
    val g = gs.createGraphFromCypher(
      "CREATE (:P {name: 'Ann', `my prop`: 7, match: 'kw'})")
    def run(q: String): Unit = {
      try {
        val rows = gs.cypher(g, q).collect().map(_.toString).mkString(" | ")
        println(s"PROBE13 OK   ${q.replace('\n', '~')}\n  => $rows")
      } catch {
        case e: Throwable =>
          println(s"PROBE13 FAIL ${q.replace('\n', '~')}\n  => ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(140)}")
      }
    }
    run("RETURN 'it\\'s' AS a, \"say \\\"hi\\\"\" AS b")
    run("RETURN '\\u0041' AS u")
    run("RETURN 'back\\\\slash' AS bs")
    run("MATCH (`my var`:P) RETURN `my var`.name AS n")
    run("MATCH (p:P) RETURN p.`my prop` AS mp")
    run("MATCH (p:P) RETURN p.match AS kw")
    run("MATCH (n) // line comment\nRETURN n.name AS nm")
    run("MATCH (n) /* block\ncomment */ RETURN n.name AS nm")
    run("RETURN 1 /* inline */ + 2 AS x")
    run("match (n) return n.name as nm")
    run("MATCH (n) RETURN n.name AS nm;")
    run("RETURN -9223372036854775808 AS minLong")
    run("RETURN 9223372036854775807 AS maxLong")
    run("RETURN .5 AS h, -0.0 AS z")
    run("RETURN 'Ünïcödé 中文 🎉' AS u")
    run("MATCH (p:P) WHERE p.name = 'Ann' AND /* c */ true RETURN count(*) AS c")
    spark.stop()
  }
}
