package graft

import org.apache.spark.sql.SparkSession
import graft.api.GraftSession

/** repro for the remaining whole-stage hashAgg codegen failure (hunt
  * case 623): count(DISTINCT mixed-list[-2]) in an aggregate. */
object Codegen3ReproMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("INFO")
    val gs = GraftSession(spark)
    val g = gs.createGraphFromCypher(
      """CREATE (v0:A {f: 3.0, k: 2, s: 'c', uid: 0})
        |CREATE (v1:A {b: false, uid: 1})
        |CREATE (v3:A {b: true, f: 1.5, uid: 3})
        |CREATE (v0)-[:T {uid: 1000, w: 3}]->(v3)""".stripMargin)
    val q =
      """MATCH (n0:A)-[*1..3]->(n3)
        |RETURN n3.f AS g0, count(DISTINCT [n0.k, 7, n3.uid][-2]) AS a0
        |ORDER BY g0 DESC, a0 DESC""".stripMargin
    gs.cypher(g, q).collect().foreach(println)
    println("[done]")
    spark.stop()
  }
}
