package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Pure-Spark minimal repro of the ElementAt codegen failure: foldable
  * in-bounds index over CreateArray with non-nullable elements makes
  * ElementAt.nullable=false, yet doGenCode still emits the out-of-bounds
  * `isNull = true` guard for a variable that is never declared.
  */
object SparkElementAtReproMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = Seq((1L, "x"), (2L, "y")).toDF("k", "s")
    // non-nullable struct elements, foldable index
    val arr = array(struct(lit(1).as("a")), struct(col("k").cast("int").as("a")))
    val r = df.select(try_element_at(arr, lit(2)).getField("a").as("v"))
    r.collect().foreach(println)
    // simple ints too?
    val r2 = df.select(try_element_at(array(lit(1), col("k").cast("int")), lit(2)).as("v"))
    r2.collect().foreach(println)
    println("[done]")
    spark.stop()
  }
}
