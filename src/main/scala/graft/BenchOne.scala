package graft
import org.apache.spark.sql.SparkSession

/** Times a single named gate query (dev loop for plan tuning):
  * `runMain graft.BenchOne p18_dedup_clusters [sfDir] [reps]`. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    (1 to reps).foreach { r =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"BENCHONE $name rep$r rows=$n ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
