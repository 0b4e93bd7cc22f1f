package graft

import org.apache.spark.sql.SparkSession

/** Round-10 probe: differential case 734's driver-time vs the construct
  * plan-size barrier. Usage:
  * `Test/runMain graft.R10Probe6Main [barrier ...]` — times the case at
  * each barrier setting in one JVM (first run absorbs warm-up; compare
  * the repeats). */
object R10Probe6Main {
  def main(args: Array[String]): Unit = {
    val barriers = if (args.isEmpty) Seq("400", "400", "100", "50", "-1")
      else args.toSeq
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    barriers.foreach { b =>
      spark.conf.set("graft.construct.planBarrier", b)
      // fresh runner per setting: the per-session plan cache would
      // otherwise hide all re-planning cost after the first run
      val runner = new graft.differential.DiffRunner(spark)
      val t0 = System.nanoTime()
      val res = runner.runCase(734L)
      println(f"CASE734 barrier=$b ${(System.nanoTime() - t0) / 1e9}%.1f s " +
        s"divergence=${res.isDefined}")
      runner.gs.releaseQueryCaches()
    }
    spark.stop()
  }
}
