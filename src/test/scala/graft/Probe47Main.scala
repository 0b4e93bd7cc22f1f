package graft

import org.apache.spark.sql.SparkSession
import graft.api.GraftSession

/** Probe batch 40: parser whitespace/syntax tolerance corners from the
  * read-only halves of LabelsAcceptance + misc grammar edges. */
object Probe47Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gs = GraftSession(spark)
    val g = gs.createGraphFromCypher(
      "CREATE (:A:B {k: 1, s: 'x'})\nCREATE (:A {k: 2})")
    def q(s: String): Unit = {
      print(s.replace('\n', ' ') + "  ==>  ")
      try println(gs.cypher(g, s).collect().map(_.toString).mkString("; "))
      catch { case e: Throwable =>
        println(s"ERROR ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(100)}")
      }
    }
    q("MATCH (n :A) RETURN count(*) AS c") // space before colon
    q("MATCH (n:A:B) RETURN n.k AS k") // multiple labels
    q("MATCH (n) WHERE n:A:B RETURN n.k AS k") // label conjunction predicate
    q("MATCH (n) WHERE n : A RETURN count(*) AS c") // spaced predicate
    q("MATCH (n:A) RETURN n.k\nAS k ORDER BY k") // newline before AS
    q("MATCH (n:A) WHERE n.k IN[1,2] RETURN count(*) AS c") // no space after IN
    q("RETURN 1+2 AS x, 1 +2 AS y, 1+ 2 AS z") // arith spacing
    q("MATCH (n:A)RETURN count(*) AS c") // missing space (should error?)
    q("RETURN 0.5 AS a, .5 AS b, 5. AS c") // float literal forms
    q("RETURN 0x1F AS hex, 0o17 AS oct") // hex/octal integers
    q("RETURN 1e3 AS a, 1E-2 AS b")
    q("mAtCh (n:A) rEtUrN count(*) AS c") // keyword case
    q("RETURN `weird col` IS NULL AS x") // backtick var (undefined → error)
    q("MATCH (`my var`:A) RETURN `my var`.k AS k ORDER BY k") // backtick vars
    q("WITH 1 AS `back tick` RETURN `back tick` AS x")
    q("RETURN [x IN range(1,3) WHERE x <> 2 | x*10] AS l")
    q("/* block comment */ MATCH (n:A) // line comment\nRETURN count(*) AS c")
    spark.stop()
  }
}
