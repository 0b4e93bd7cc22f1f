package graft
import org.apache.spark.sql.SparkSession

object Bench {
  /** Fixed, data-independent contention probe: a pure-CPU hash fold plus
    * one small shuffle. Timed alongside the real queries (every K of
    * them), it measures the HOST, not the engine — this machine swings
    * 2-3× across hours (NOTES.md bench discipline), and the probe's
    * drift against an idle-host reference separates that from code
    * regressions. */
  private def calibProbe(spark: SparkSession, cpus: Int): Double = {
    val t0 = System.nanoTime()
    spark.range(0L, 8000000L, 1L, cpus)
      .selectExpr("xxhash64(id * 31) AS h").selectExpr("sum(h) AS s")
      .count()
    spark.range(0L, 2000000L, 1L, cpus)
      .selectExpr("id % 997 AS k", "xxhash64(id) AS h")
      .groupBy("k").sum("h").count()
    (System.nanoTime() - t0) / 1e9
  }

  /** idle-host reference for the calibration probe (seconds), measured
    * on this machine with nothing else running at local[32] /
    * shuffle=32 (CalibMain, two runs: medians 0.575 and 0.670 across
    * 9 probes each); override with SPARK_GRAFT_CALIB_REF after hardware
    * or default-cpus changes */
  private val calibRefDefault = 0.60

  /** idle-host reference for the FORKED pure-JVM host probe
    * (HostProbeMain median seconds at 32 threads on an idle machine);
    * override with SPARK_GRAFT_HOST_REF after hardware changes */
  private val hostRefDefault = 0.62

  /** Run HostProbeMain in a fresh forked JVM: host contention without
    * this JVM's GC/code-cache state (round 9, VERDICT item 5). Returns
    * None when forking fails — normalization then falls back to the
    * in-bench Spark probe alone, as in round 8. */
  private def forkHostProbe(threads: Int): Option[Double] = try {
    val javaBin = new java.io.File(new java.io.File(
      System.getProperty("java.home"), "bin"), "java").getAbsolutePath
    val pb = new ProcessBuilder(javaBin, "-cp",
      System.getProperty("java.class.path"), "graft.HostProbeMain",
      threads.toString)
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = scala.io.Source.fromInputStream(p.getInputStream).mkString
    p.waitFor()
    "HOSTPROBE ([0-9.]+)".r.findFirstMatchIn(out).map(_.group(1).toDouble)
  } catch { case _: Throwable => None }

  /** per-query seconds from a previous detail artifact ("queries" map),
    * for outlier re-runs — best-of-N still admits a contended triple.
    * Only comparable at the SAME scale factor; prefers the per-core-count
    * file (round 11, VERDICT item 6: an 8-core scaling run used to
    * clobber the 32-core detail AND feed wrong outlier baselines). */
  private def previousBest(sfDir: String, cpus: String): Map[String, Double] = {
    val f = Seq(new java.io.File(s"BENCH_LOCAL_c$cpus.json"),
      new java.io.File("BENCH_LOCAL.json")).find(_.exists())
      .getOrElse(return Map.empty)
    try {
      val text = scala.io.Source.fromFile(f).mkString
      val prevSf = """"sf":"([^"]*)"""".r.findFirstMatchIn(text)
        .map(_.group(1))
      if (!prevSf.contains(sfDir)) return Map.empty
      val qs = """"queries":\{([^}]*)\}""".r.findFirstMatchIn(text)
        .map(_.group(1)).getOrElse(return Map.empty)
      """"([^"]+)":([0-9.Ee+-]+)""".r.findAllMatchIn(qs)
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
    } catch { case _: Throwable => Map.empty }
  }

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
    // the media decoders (ImageIO/javax.sound/GIF) JIT-compile on first
    // use — ~5 s of JVM warm-up that lands on p11/p14's first call
    // otherwise. Warm them on the sf0.001 fixtures (same codecs, tiny
    // data); the timed sf runs then measure decode throughput, not
    // class-loading.
    Seq("p14_media_features", "p11_media_frames").foreach { q =>
      try SparkEntry.queries(q)(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => }
    }
    val nCpus = cpus.toInt
    // host factor, sample 1 of 2: forked fresh-JVM probe (pure CPU, no
    // Spark) — host contention isolated from this JVM's accumulated state
    val hostStart = forkHostProbe(nCpus)
    // warm the probe's own codegen before its timings count
    calibProbe(spark, nCpus)
    val probes = scala.collection.mutable.ArrayBuffer(
      calibProbe(spark, nCpus))
    // best of 3 reps per query: rep 1 still carries JIT/page-cache warm-up
    // for whichever operators run first, and this machine shows ~2-3×
    // scheduling noise on identical in-JVM reps (NOTES.md bench
    // discipline) — a third rep materially tightens the minimum (same
    // idea as the reference's JMH AverageTime-with-warmup harnesses)
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    def timeQuery(fn: (SparkSession, String) => org.apache.spark.sql
        .DataFrame, n: Int): Seq[Double] =
      (1 to n).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        (System.nanoTime() - t0) / 1e9
      }
    // per query: best (steady state), first-call time, and max — so a
    // cross-round delta is attributable without standalone re-runs
    // (first >> best = one-time planning/materialization cost; a wide
    // max/best spread = host contention, not a code regression)
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    val results0 = ordered.zipWithIndex.map { case ((name, fn), i) =>
      // Per-query untimed codegen warm at sf0.001 IMMEDIATELY before the
      // timed sf runs: whole-stage codegen + expression JIT is
      // data-independent, so the timed first call then measures data
      // work (cache materialization, shuffles), not janino. Warming must
      // be per-query-interleaved, not one upfront pass — Spark's
      // generated-class cache holds ~100 entries, so warming all 93
      // queries first evicts the early ones again (measured: an upfront
      // all-queries warm made first_call_total WORSE, 57 → 73 s).
      // c37 warms at sf0.01 instead: at sf0.001 its frontier empties
      // early and the deeper per-depth join stages stay uncompiled.
      val warmSf = if (name == "c37_deep_varlength")
        "/root/testdata/sf0.01" else "/root/testdata/sf0.001"
      try fn(spark, warmSf).count() catch { case _: Throwable => }
      val times = timeQuery(fn, reps)
      if ((i + 1) % 10 == 0) probes += calibProbe(spark, nCpus)
      (name, times.min, times.head, times.max)
    }
    probes += calibProbe(spark, nCpus)
    // outlier re-run: a query whose best is >2× its previous artifact is
    // almost always host noise (best-of-N still loses when every rep is
    // contended) — one more rep at the very end, minutes later, usually
    // lands in a different contention window
    val prev = previousBest(sfDir, cpus)
    val byName = ordered.toMap
    val results = results0.map { case r @ (name, b, f0, x) =>
      prev.get(name) match {
        case Some(p) if p > 0.05 && b > 2 * p =>
          val again = timeQuery(byName(name), 1).min
          (name, math.min(b, again), f0, math.max(x, again))
        case _ => r
      }
    }
    val reruns = results0.zip(results).count { case (a, b) => a._2 != b._2 }
    val best = results.map { case (k, b, _, _) => k -> b }.toMap
    def m(f: ((String, Double, Double, Double)) => String) =
      results.map(f).mkString("{", ",", "}")
    val qs = m { case (k, b, _, _) => s"\"" + k + "\":" + b }
    val firsts = m { case (k, _, f, _) => s"\"" + k + "\":" + f"$f%.3f" }
    val maxes = m { case (k, _, _, x) => s"\"" + k + "\":" + f"$x%.3f" }
    val total = best.values.sum
    val firstTotal = results.map(_._3).sum
    // contention normalization: the probe-median's drift over the
    // idle-host reference scales the whole run (the r7→r6 "+16%" was
    // exactly this — uniform inflation across untouched queries)
    val sortedProbes = probes.sorted
    val probeMedian = sortedProbes(sortedProbes.size / 2)
    val calibRef = sys.env.get("SPARK_GRAFT_CALIB_REF").map(_.toDouble)
      .getOrElse(calibRefDefault)
    val factor = math.max(1.0, probeMedian / calibRef)
    // host factor, sample 2 of 2, then split the in-bench factor:
    //   factor        = host contention × bench-JVM state   (Spark probe)
    //   factor_host   = host contention alone               (forked probe)
    //   factor_jvm    = factor / factor_host                (residual)
    // Normalize with factor_host ONLY — JVM wear inflates the probe more
    // than it inflates the (mostly shuffle/IO-bound) queries, which is
    // why round 8's normalized total was a floor rather than an estimate.
    val hostEnd = forkHostProbe(nCpus)
    val hostSamples = Seq(hostStart, hostEnd).flatten
    val hostRef = sys.env.get("SPARK_GRAFT_HOST_REF").map(_.toDouble)
      .getOrElse(hostRefDefault)
    val factorHost = hostSamples match {
      case Nil => factor // fork failed: round-8 behavior
      case s => math.max(1.0, (s.sum / s.size) / hostRef)
    }
    val factorJvm = math.max(1.0, factor / factorHost)
    val normalized = total / factorHost
    val probesJson = probes.map(p => f"$p%.3f").mkString("[", ",", "]")
    val hostJson = hostSamples.map(p => f"$p%.3f").mkString("[", ",", "]")
    // calibration_version 2 (round 10, VERDICT item 6): version 1 (r8)
    // normalized by the single in-bench Spark-probe factor; version 2
    // (r9+) splits host vs JVM factors and normalizes by factor_host
    // ONLY. Cross-round comparisons must match versions or re-derive:
    // v1_normalized = value / factor, v2_normalized = value / factor_host.
    val calibJson = s"""{"calibration_version":2,"probes":$probesJson,"median":${f"$probeMedian%.3f"},"ref":$calibRef,"factor":${f"$factor%.3f"},"host_probes":$hostJson,"host_ref":$hostRef,"factor_host":${f"$factorHost%.3f"},"factor_jvm":${f"$factorJvm%.3f"},"reruns":$reruns}"""
    val fullJson =
      s"""{"metric":"total","value":$total,"unit":"sec","value_normalized":${f"$normalized%.3f"},"calibration":$calibJson,"cpus":$nCpus,"queries":$qs,"first_call":$firsts,"max":$maxes,"first_call_total":$firstTotal,"reps":$reps,"sf":"$sfDir"}"""
    // stdout gets one JSON line; round 11 (VERDICT item 6) it carries the
    // FULL per-query map (~2.5 kB for 102 queries, well inside the
    // harness's stdout-tail capture) — the former 5-slowest digest made
    // queries that merely LEFT the top 5 look dropped to the driver's
    // round-over-round comparison.
    val compact =
      s"""{"metric":"total","value":$total,"unit":"sec","value_normalized":${f"$normalized%.3f"},"calibration":$calibJson,"cpus":$nCpus,"n_queries":${best.size},"first_call_total":${f"$firstTotal%.2f"},"queries":$qs,"sf":"$sfDir","detail":"BENCH_LOCAL_c$cpus.json"}"""
    // per-core-count detail file so a scaling run at another
    // $SPARK_GRAFT_CPUS never clobbers this run's per-query map;
    // BENCH_LOCAL.json stays as the latest-run pointer for older tooling
    for (path <- Seq(s"BENCH_LOCAL_c$cpus.json", "BENCH_LOCAL.json")) {
      val pw = new java.io.PrintWriter(path)
      try pw.println(fullJson) finally pw.close()
    }
    println(compact)
    spark.stop()
  }
}
