package graft

import org.apache.spark.sql.SparkSession

/** Round-10 probe: split each gate's per-invocation cost into
  * PLANNING (query-function call: Cypher parse/plan + Catalyst analysis
  * + any plan-time jobs) vs EXECUTION (.count() on the built frame).
  * `Test/runMain graft.R10Probe2Main <query> [sfDir] [reps]` */
object R10Probe2Main {
  def main(args: Array[String]): Unit = {
    val names = if (args.isEmpty) Seq("c42_distance_join") else args.toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      // warm: codegen + page cache
      try fn(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => }
      (1 to 3).foreach { r =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        val n = df.count()
        val t2 = System.nanoTime()
        println(f"SPLIT $name rep$r plan=${(t1 - t0) / 1e9}%.3f s " +
          f"exec=${(t2 - t1) / 1e9}%.3f s rows=$n")
      }
    }
    spark.stop()
  }
}
