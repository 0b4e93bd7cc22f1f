package graft

import org.apache.spark.sql.SparkSession

/** Time a named subset of SparkEntry.queries (args: names...; env
  * SPARK_GRAFT_SF_DIR for the data dir). Dev tool for iterating on one
  * query's perf without a full Bench run. */
object BenchOneMain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try SparkEntry.entry(spark).count() catch { case _: Throwable => }
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to 3).foreach { rep =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        println(f"$name rep$rep: ${(System.nanoTime() - t0) / 1e9}%.3f s rows=$n")
      }
    }
    spark.stop()
  }
}
