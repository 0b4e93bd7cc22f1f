package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-11 skew probe (VERDICT item 5): wall-clock of the hot-bucket
  * pair expansion with and without the salted tiling route. One bucket
  * key owns 8000 rows (32M pairs) — a population no bucket-key
  * partitioning can split. `runMain graft.R11Probe1Main`. */
object R11Probe1Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.pipeline.Dedup
    val hot = spark.range(0, if (args.nonEmpty) args(0).toLong else 8000L).select(lit("HOT").as("k"), col("id"))
    val rest = spark.range(10000, 110000).select(
      concat(lit("u"), (col("id") % 20000).cast("string")).as("k"), col("id"))
    val keyed = hot.unionByName(rest)
    def time(label: String): Unit = (1 to 3).foreach { r =>
      val t0 = System.nanoTime()
      val n = Dedup.bucketPairJoin(keyed, Seq("k"))
        .select(col("a.id"), col("b.id"))
        .write.format("noop").mode("overwrite").save()
      println(f"R11PROBE1 $label rep$r ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.conf.set("graft.dedup.hotBucketPairs", "-1")
    time("unsalted")
    spark.conf.unset("graft.dedup.hotBucketPairs")
    time("salted")
    spark.stop()
  }
}
