package graft

import org.apache.spark.sql.SparkSession
import graft.api.GraftSession

/** Reproduces the tagged-union ElementAt codegen compile failure (judge
  * round-5 finding: janino "isNull_x is not an rvalue" → interpreted
  * fallback on heterogeneous list indexing).
  */
object CodegenReproMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val gs = GraftSession(spark)
    val g = gs.createGraphFromCypher("CREATE (:A {k: 1})")
    val queries = Seq(
      "MATCH (n:A) RETURN [n.k, 'abc'][0] <> 'b' AS x",
      "MATCH (n:A) RETURN [n.k, 'abc'][0] = 'b' AS x",
      "MATCH (n:A) RETURN [n.missing, 'abc'][0] <> 'b' AS x",
      "MATCH (n:A) RETURN n.missing IN [n.k] AS x",
      "MATCH (n:A) RETURN 'abc' IN [n.k, 'abc'] AS x",
      "MATCH (n:A) RETURN [n.k, 'abc', true][2] AS x")
    queries.foreach { q =>
      println(s"=== $q")
      gs.cypher(g, q).collect().foreach(println)
    }
    println("[repro done]")
    spark.stop()
  }
}
