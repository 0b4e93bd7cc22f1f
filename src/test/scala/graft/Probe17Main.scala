package graft

import org.apache.spark.sql.SparkSession

/** Plan audit: new round-3 gated paths at explain level. */
object Probe17Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    for (q <- Seq("c33_typed_ddl", "p35_dedup_keep_best")) {
      println(s"===== $q")
      val df = SparkEntry.queries(q)(spark, dir)
      val plan = df.queryExecution.executedPlan.toString
      println("  Exchanges: " + "Exchange".r.findAllIn(plan).size)
      println("  SortMergeJoin: " + "SortMergeJoin".r.findAllIn(plan).size +
        "  BroadcastHashJoin: " + "BroadcastHashJoin".r.findAllIn(plan).size)
      println("  Window: " + "Window".r.findAllIn(plan).size +
        "  WholeStageCodegen spans: " + "WholeStageCodegen".r.findAllIn(plan).size)
      println("  PushedFilters: " + "PushedFilters: \\[[^\\]]+\\]".r.findAllIn(plan).take(3).mkString(" | ").take(200))
    }
    spark.stop()
  }
}
