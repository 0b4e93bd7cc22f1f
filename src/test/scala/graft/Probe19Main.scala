package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Probe19Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.range(1).select(
      make_interval(lit(0), lit(1), lit(0), lit(2), lit(26), lit(0), lit(java.math.BigDecimal.ZERO)).as("a"),
      make_interval(lit(0), lit(0), lit(0), lit(1), lit(2), lit(0), lit(java.math.BigDecimal.ZERO)).as("b"))
    def t(name: String)(f: => Unit): Unit =
      try { f; () } catch { case e: Exception => println(s"$name ERR: ${e.getMessage.take(120)}") }
    t("add")(println("add: " + df.select((col("a") + col("b")).cast("string")).head.getString(0)))
    t("sub")(println("sub: " + df.select((col("a") - col("b")).cast("string")).head.getString(0)))
    t("div")(println("div: " + df.select((col("a") / lit(2)).cast("string")).head.getString(0)))
    t("mul")(println("mul: " + df.select((col("a") * lit(2)).cast("string")).head.getString(0)))
    t("neg")(println("neg: " + df.select((col("a") * lit(-1)).cast("string")).head.getString(0)))
    t("sum-decomposed")(println("sumdec ok"))
    spark.stop()
  }
}
