package graft.differential

import org.apache.spark.sql.SparkSession

import graft.api.GraftSession
import graft.graph.PropertyGraph

/** Shared differential-test executor: generates (graph, query) cases by
  * seed, runs both the engine and the naive interpreter, and reports a
  * diagnostic on divergence. Used by DifferentialSpec (CI, cases
  * 0..999) and DiffHuntMain (large out-of-CI hunts).
  */
final class DiffRunner(spark: SparkSession) {

  val gs = GraftSession(spark)

  private val graphCache =
    scala.collection.mutable.HashMap.empty[Long, (Model.MGraph, PropertyGraph)]
  // bound the cache: a long hunt visits thousands of graphs (one per 10
  // cases) and each holds cached DataFrames
  private val maxGraphs = 64
  private def gname(seed: Long): String = s"dg$seed"
  // identity view: FROM GRAPH dview(g) must behave exactly like g —
  // exercises catalog resolution + view-parameter binding on every query
  // routed through it (round 7 catalog surface)
  locally {
    gs.cypher("CATALOG CREATE VIEW dview($g) { FROM $g RETURN GRAPH }")
  }
  private def graphFor(seed: Long): (Model.MGraph, PropertyGraph) =
    synchronized {
      if (graphCache.size > maxGraphs) graphCache.clear()
      graphCache.getOrElseUpdate(seed, {
        val g = DiffGen.genGraph.pureApply(
          org.scalacheck.Gen.Parameters.default,
          org.scalacheck.rng.Seed(seed))
        val pg = gs.createGraphFromCypher(g.toCreate)
        gs.register(gname(seed), pg)
        (g, pg)
      })
    }

  // ---- canonical value rendering (strict types: Long ≠ Double)
  private def norm(v: Any): Any = v match {
    case null => null
    case n: Int => n.toLong
    case n: Long => n
    case f: Float => f.toDouble
    case d: Double => d
    case d: java.math.BigDecimal => d.doubleValue()
    case d: BigDecimal => d.doubleValue
    case s: String => s
    case b: Boolean => b
    case d: java.sql.Date => d.toLocalDate
    case d: java.time.LocalDate => d
    case s: scala.collection.Seq[_] => s.map(norm).toList
    case a: Array[_] => a.map(norm).toList
    // the engine's tagged-union struct for mixed-family values
    // (@k: 0 null, 1 integer→i, 2 float→f, 3 string→s, 4 boolean→b) —
    // decode back to the scalar the tag names
    case r: org.apache.spark.sql.Row
      if r.schema != null && r.schema.fieldNames.headOption.contains("@k") =>
      if (r.isNullAt(0)) null
      else r.getInt(0) match {
        case 1 => norm(r.get(1))
        case 2 => norm(r.get(2))
        case 3 => norm(r.get(3))
        case 4 => norm(r.get(4))
        case _ => null
      }
    // the engine's zoned-datetime struct → the model's MZdt (zid is a
    // deterministic rendering of off for the offset-only grammar pools)
    case r: org.apache.spark.sql.Row
      if r.schema != null && r.schema.fieldNames.headOption.contains("@zdt") =>
      if (r.isNullAt(0)) null
      else {
        val ts = r.getTimestamp(0)
        Model.MZdt(java.lang.Math.floorDiv(ts.getTime, 1000L) * 1000000L +
          ts.getNanos / 1000L, r.getInt(1))
      }
    // the engine's point struct → the model's MPoint
    case r: org.apache.spark.sql.Row
      if r.schema != null && r.schema.fieldNames.headOption.contains("@crs") =>
      if (r.isNullAt(0)) null
      else Model.MPoint(r.getString(0), r.getDouble(1), r.getDouble(2))
    case r: org.apache.spark.sql.Row =>
      r.schema.fieldNames.zip(r.toSeq.map(norm)).toMap
    case other => other.toString
  }

  private def render(v: Any): String = v match {
    case null => "null"
    case l: Long => "i" + l
    case d: Double =>
      "f" + BigDecimal(d).bigDecimal.stripTrailingZeros.toPlainString
    case s: String => "s" + s
    case b: Boolean => "b" + b
    case d: java.time.LocalDate => "e" + d
    case z: Model.MZdt => "z" + z.inst + "@" + z.off
    case p: Model.MPoint => "g" + p.crs + "@" + p.x + "," + p.y
    case xs: List[_] => xs.map(render).mkString("[", ",", "]")
    case m: Map[_, _] => m.toSeq.map { case (k, x) => s"$k=${render(x)}" }
      .sorted.mkString("{", ",", "}")
    case other => "?" + other.toString
  }

  /** run one case; None = agreement, Some(diagnostic) = divergence */
  def runCase(i: Long): Option[String] = {
    val t0 = System.nanoTime()
    try runCaseInner(i)
    finally {
      // surface pathological DRIVER-side cases (planning blowups): the
      // hunt's per-500 cadence hides a single 10-minute case entirely
      val sec = (System.nanoTime() - t0) / 1e9
      if (sec > 30) println(f"[hunt] SLOW case $i: $sec%.1f s")
    }
  }

  private def runCaseInner(i: Long): Option[String] = {
    val (model, pg) = graphFor(i / 10)
    val q = DiffGen.genQuery.pureApply(
      org.scalacheck.Gen.Parameters.default, org.scalacheck.rng.Seed(i))
    val text = q.render
    val aliases = q.ret.items.map(_.alias)
    val msAliases = q.multisetAliases
    // numeric-compared: typed empty sums + union-widened numeric columns
    val numAliases = q.sumAliases ++ q.unionNumAliases
    def diag(msg: String): Some[String] = Some(
      s"case $i: $msg\n--- graph\n${model.toCreate}--- query\n$text\n")

    val naive: List[List[Any]] = try NaiveEval.run(model, q) catch {
      case e: Throwable => return diag(s"NAIVE EVAL CRASH: $e")
    }
    val (cols, engine): (Array[String], List[List[Any]]) = try {
      val df = q.driving match {
        case Some((dcols, drows)) =>
          // driving-table correlation: columns arrive as a real DataFrame
          import org.apache.spark.sql.types._
          val schema = StructType(dcols.map { case (n, f) =>
            StructField(n, if (f == 'L') LongType else StringType,
              nullable = true)
          })
          val ddf = spark.createDataFrame(
            spark.sparkContext.parallelize(
              drows.map(r => org.apache.spark.sql.Row(r: _*)), 2), schema)
          gs.cypher(pg, text, Map.empty, ddf)
        case None => (i % 8) match {
          // catalog surface: name resolution and identity-view
          // invocation must not change any result
          case 3 => gs.cypher(s"FROM GRAPH ${gname(i / 10)}\n" + text)
          case 7 => gs.cypher(s"FROM GRAPH dview(${gname(i / 10)})\n" + text)
          case _ => gs.cypher(pg, text)
        }
      }
      (df.columns, df.collect().toList.map(_.toSeq.map(norm).toList))
    } catch {
      case e: Throwable =>
        return diag(s"ENGINE ERROR: ${e.getClass.getSimpleName}: " +
          s"${Option(e.getMessage).getOrElse("").take(400)}")
    }
    if (cols.toList != aliases)
      return diag(s"COLUMNS: engine ${cols.toList} vs $aliases")

    // canonical row rendering; collect() columns element-sorted
    def renderRow(r: List[Any]): String =
      r.zip(aliases).map { case (v, a) =>
        val vv = if (msAliases(a)) v match {
          case xs: List[_] => xs.map(render).sorted
          case other => other
        } else if (numAliases(a)) v match {
          // sum(): typed-zero corner — compare numerically (see
          // Model.Query.sumAliases)
          case l: Long => l.toDouble
          case other => other
        } else v
        vv match {
          case xs: List[_] if msAliases(a) => xs.mkString("[", ",", "]")
          case other => render(other)
        }
      }.mkString("|")

    val eRows = engine.map(renderRow)
    val nRows = naive.map(renderRow)
    if (eRows.sorted != nRows.sorted)
      return diag(s"ROWS (multiset): engine ${eRows.sorted.take(25)} vs " +
        s"naive ${nRows.sorted.take(25)} " +
        s"(sizes ${eRows.size}/${nRows.size})")

    if (q.ret.orderBy.nonEmpty) {
      val keyIdx = q.ret.orderBy.map { case (a, _) => aliases.indexOf(a) }
      def keys(rows: List[List[Any]]): List[String] =
        rows.map(r => keyIdx.map { ix =>
          // sum()'s typed zero (engine: integer 0 over no values; naive:
          // 0.0 for a float column) compares numerically here exactly as
          // in the multiset pass (hunt case 3900)
          val v = r(ix) match {
            case l: Long if numAliases(aliases(ix)) => l.toDouble
            case other => other
          }
          render(v)
        }.mkString("|"))
      val (ek, nk) = (keys(engine), keys(naive))
      if (ek != nk)
        return diag(s"ORDER: engine keys ${ek.take(25)} vs naive ${nk.take(25)}")
    }
    None
  }
}

/** Out-of-CI bug hunt: `Test/runMain graft.differential.DiffHuntMain
  * <from> <to>` runs cases [from, to) and prints every divergence. */
object DiffHuntMain {
  def main(args: Array[String]): Unit = {
    val from = if (args.length > 0) args(0).toLong else 1000L
    val to = if (args.length > 1) args(1).toLong else 6000L
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val runner = new DiffRunner(spark)
    val failures = new java.util.concurrent.atomic.AtomicInteger(0)
    val done = new java.util.concurrent.atomic.AtomicInteger(0)
    val t0 = System.nanoTime()
    // cases are independent; the engine is a shared thread-safe Spark
    // session, NaiveEval keeps its per-case graph in a ThreadLocal, and
    // consecutive seeds share graphs (i / 10) so chunks of 10 stay on one
    // thread to keep the graph cache effective
    import scala.collection.parallel.CollectionConverters._
    val chunks = (from until to).grouped(10).toVector.par
    chunks.tasksupport = new scala.collection.parallel.ForkJoinTaskSupport(
      new java.util.concurrent.ForkJoinPool(8))
    // Shared-subtree cache hygiene: the planner persists shared scans per
    // case, and Spark's CacheManager does a LINEAR canonicalized-plan
    // scan on every persist/lookup — left to accumulate, a 15k-case run
    // crawled to a halt past ~10k cases (30+ min per 500, one thread
    // parked in Dataset.persist). Caches only pay off WITHIN a chunk
    // (cases i/10 share one graph), so drop them after each chunk — but
    // NEVER while another case is mid-flight: unpersisting under a
    // running query produced SILENTLY WRONG results on Spark 4.1.2
    // (BlockNotFoundException + missing rows; three phantom hunt
    // divergences that vanished solo). A read-write lock serializes
    // releases against cases: cases hold the read lock, the release
    // takes the write lock between cases.
    val caseLock = new java.util.concurrent.locks.ReentrantReadWriteLock()
    chunks.foreach { chunk =>
      chunk.foreach { i =>
        caseLock.readLock().lock()
        val res = try runner.runCase(i) finally caseLock.readLock().unlock()
        res match {
          case Some(d) => failures.incrementAndGet()
            println(s"\nDIVERGENCE $d")
          case None => ()
        }
        val n = done.incrementAndGet()
        if (n % 500 == 0) {
          val dt = (System.nanoTime() - t0) / 1e9
          println(f"[hunt] $n cases, ${failures.get} divergences, $dt%.0f s")
        }
      }
      caseLock.writeLock().lock()
      try runner.gs.releaseQueryCaches()
      finally caseLock.writeLock().unlock()
    }
    println(s"[hunt] DONE cases $from..$to: ${failures.get} divergences")
    spark.stop()
  }
}
