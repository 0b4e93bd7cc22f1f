package graft

import org.apache.spark.sql.SparkSession

/** Plan audit for the round-3 gate additions: prints the formatted
  * physical plan of each new query at sf0.01 so broadcasts, pushed
  * filters, and codegen spans can be eyeballed.
  * `runMain graft.Probe23Main [query ...]` */
object Probe23Main {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq
      else Seq("c34_driving_table", "c35_graph_union", "c36_catalog_view",
        "p38_lm_score", "p39_decontam_bloom")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n================ $n ================")
      val df = SparkEntry.queries(n)(spark, "/root/testdata/sf0.01")
      println(df.queryExecution.executedPlan.toString.take(6000))
    }
    spark.stop()
  }
}
