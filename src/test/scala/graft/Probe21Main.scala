package graft
import org.apache.spark.sql.SparkSession

/** Measures driver-side plan-construction time (parse -> plan -> DataFrame,
  * no action) for representative gate queries. */
object Probe21Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    for (name <- Seq("c3_expand2", "c13_varlength", "c31_path_node_values",
        "c30_varlength_quantifier", "c21_construct", "c7_exists")) {
      val fn = SparkEntry.queries(name)
      fn(spark, sf) // warm (class loading, first parse)
      val t0 = System.nanoTime()
      (1 to 5).foreach(_ => fn(spark, sf))
      println(f"PLAN $name ${(System.nanoTime() - t0) / 5e6}%.1f ms/plan")
    }
    spark.stop()
  }
}
