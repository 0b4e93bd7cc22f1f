package graft

import org.apache.spark.sql.SparkSession

/** Confirms the c37 gate query engages the iterative frontier route
  * (ExistingRDD from the localCheckpoint) rather than the unroll. */
object C37RouteProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = CypherQueries.queries("c37_deep_varlength")(
      spark, "/root/testdata/sf0.001")
    df.collect().foreach(println)
    val plan = df.queryExecution.executedPlan.toString
    println("frontier route engaged: " + plan.contains("ExistingRDD"))
    spark.stop()
  }
}
