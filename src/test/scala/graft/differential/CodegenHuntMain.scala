package graft.differential

import org.apache.spark.sql.SparkSession

/** Sequential hunt that attributes Spark CodeGenerator ERRORs (whole-stage
  * codegen fallbacks) to the generated case that triggered them — the
  * parallel DiffHuntMain interleaves too much to tell.
  */
object CodegenHuntMain {
  def main(args: Array[String]): Unit = {
    val from = if (args.length > 0) args(0).toLong else 20000L
    val to = if (args.length > 1) args(1).toLong else 20100L
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val runner = new DiffRunner(spark)
    (from until to).foreach { i =>
      Console.out.flush(); Console.err.flush()
      println(s"[case $i]")
      Console.out.flush()
      runner.runCase(i)
    }
    println("[done]")
    spark.stop()
  }
}
