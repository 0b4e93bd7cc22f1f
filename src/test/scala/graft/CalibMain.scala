package graft
import org.apache.spark.sql.SparkSession
object CalibMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def probe(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, 8000000L, 1L, 32)
        .selectExpr("xxhash64(id * 31) AS h").selectExpr("sum(h) AS s").count()
      spark.range(0L, 2000000L, 1L, 32)
        .selectExpr("id % 997 AS k", "xxhash64(id) AS h")
        .groupBy("k").sum("h").count()
      (System.nanoTime() - t0) / 1e9
    }
    probe(); probe() // warm codegen
    val xs = (1 to 9).map(_ => probe())
    println(f"probes: ${xs.map(x => f"$x%.3f").mkString(", ")}")
    println(f"median: ${xs.sorted.apply(xs.size / 2)}%.3f min: ${xs.min}%.3f")
    spark.stop()
  }
}
