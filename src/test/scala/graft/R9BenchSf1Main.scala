package graft

import org.apache.spark.sql.SparkSession

/** Round-9 scale-headroom spot check (VERDICT item 3): run the five
  * heaviest gates once against the 10×-replicated sf1 fixture
  * (GenSf1Main) as a CLIFF DETECTOR — looking for superlinear blowups
  * (shuffle spill, frontier explosion, fixpoint rounds), not for oracle
  * matches. Writes BENCH_SF1.json.
  */
object R9BenchSf1Main {
  def main(args: Array[String]): Unit = {
    val sfDir = GenSf1Main.OutDir
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // default: the five heaviest gates; "all" sweeps EVERY driver gate
    // (the complete cliff audit — any query >20× its sf0.1 time is a
    // planning cliff, not data growth)
    val gates =
      if (args.contains("all")) SparkEntry.queries.keys.toSeq.sorted
      else Seq("c21_construct", "c30_varlength_quantifier",
        "c37_deep_varlength", "p8_ngram_jaccard", "p35_dedup_keep_best")
    val reps = 2
    val results = gates.map { name =>
      // codegen warm at sf0.01 so sf1 timings measure data work
      try SparkEntry.queries(name)(spark, "/root/testdata/sf0.01").count()
      catch { case _: Throwable => }
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = try SparkEntry.queries(name)(spark, sfDir).count()
          catch { case e: Throwable =>
            println(s"FAIL $name: ${e.getClass.getSimpleName}: " +
              Option(e.getMessage).getOrElse("").linesIterator.take(2)
                .mkString(" "))
            -1L
          }
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"SF1 $name rows=$n $dt%.3f s")
        dt
      }
      name -> times.min
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val json = s"""{"metric":"sf1_spot","value":${f"$total%.3f"},"unit":"sec","queries":$qs,"reps":$reps,"sf":"$sfDir"}"""
    val pw = new java.io.PrintWriter("BENCH_SF1.json")
    try pw.println(json) finally pw.close()
    println(json)
    spark.stop()
  }
}
