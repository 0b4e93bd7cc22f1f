package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Probe: does Window.partitionBy(lit(0)) suppress the WindowExec
  * "No Partition Defined" warning, and does the optimizer keep it? */
object WindowLitPartProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val df = Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("bucket", "n")
    val wb = Window.partitionBy(lit(0)).orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val r = df.withColumn("off", coalesce(sum(col("n")).over(wb), lit(0L)))
    r.collect().foreach(println)
    r.explain("formatted")
    println("[probe done]")
    spark.stop()
  }
}
