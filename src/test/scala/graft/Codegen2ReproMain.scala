package graft

import org.apache.spark.sql.SparkSession
import graft.api.GraftSession

object Codegen2ReproMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("INFO")
    val gs = GraftSession(spark)
    val g = gs.createGraphFromCypher(
      """CREATE (v0:A {k: 0, uid: 0})
        |CREATE (v1:B {b: false, k: 0, s: 'ab', uid: 1})
        |CREATE (v2:A {b: true, f: 3.0, uid: 2})""".stripMargin)
    val q =
      """MATCH (n0)
        |WHERE ([n0.s, n0.uid][1] <> n0.uid)
        |RETURN labels(n0) AS c0""".stripMargin
    val df = gs.cypher(g, q)
    df.collect().foreach(println)
    val plan = df.queryExecution.optimizedPlan.toString
    println("has element_at: " + plan.contains("element_at"))
    println("has CreateArray/array(: " + (plan.contains("array(")))
    println(plan.take(3000))
    spark.stop()
  }
}
