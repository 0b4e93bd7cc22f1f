package graft

import org.apache.spark.sql.SparkSession

/** Dumps `.explain("formatted")` for every driver-gate query to
  * plans/<tag>/<name>_<suffix>.txt — the optimization-round plan
  * artifacts the judge diffs against the code's claims.
  *
  * Usage: `Test/runMain graft.PlanDumpMain <tag> <suffix> [query...]`
  * e.g. `Test/runMain graft.PlanDumpMain r10 before` (all queries) or
  * `Test/runMain graft.PlanDumpMain r10 after p8_ngram_jaccard`.
  */
object PlanDumpMain {
  def main(args: Array[String]): Unit = {
    val tag = if (args.length > 0) args(0) else "r10"
    val suffix = if (args.length > 1) args(1) else "before"
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = new java.io.File(s"plans/$tag")
    dir.mkdirs()
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        // queryExecution.explainString = what .explain("formatted") prints
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val pw = new java.io.PrintWriter(
          new java.io.File(dir, s"${name}_$suffix.txt"))
        try pw.println(txt) finally pw.close()
        println(s"PLANDUMP $name ok (${txt.length} chars)")
      } catch {
        case e: Throwable =>
          println(s"PLANDUMP $name FAILED: ${e.getClass.getSimpleName}: " +
            Option(e.getMessage).getOrElse("").take(200))
      }
    }
    spark.stop()
  }
}
