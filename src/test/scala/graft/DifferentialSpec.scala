package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.api.GraftSession
import graft.differential.{DiffGen, Model, NaiveEval}
import graft.graph.PropertyGraph

/** Randomized differential testing: the DataFrame engine vs a naive
  * row-at-a-time interpreter over the same generated (graph, query) cases
  * (see differential/Differential.scala for the generator + evaluator;
  * precedent: okapi-api/.../value/GenCypherValue.scala).
  *
  * 1000 deterministic cases (seeded ScalaCheck), 10 queries per generated
  * graph (graphs are cached by seed). Every case asserts:
  *  - the engine ran (no exception on a grammar-valid query),
  *  - column names/order match the RETURN aliases,
  *  - result multisets match under canonical rendering (collect() columns
  *    compare element-sorted),
  *  - if ORDER BY is present, the projected order-key column sequences
  *    match exactly (validates null-placement + direction semantics).
  */
class DifferentialSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val gs = GraftSession(spark)

  private val graphCache =
    scala.collection.mutable.HashMap.empty[Long, (Model.MGraph, PropertyGraph)]
  private def graphFor(seed: Long): (Model.MGraph, PropertyGraph) =
    synchronized {
      graphCache.getOrElseUpdate(seed, {
        val g = DiffGen.genGraph.pureApply(
          org.scalacheck.Gen.Parameters.default,
          org.scalacheck.rng.Seed(seed))
        (g, gs.createGraphFromCypher(g.toCreate))
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
    case s: scala.collection.Seq[_] => s.map(norm).toList
    case a: Array[_] => a.map(norm).toList
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
    case xs: List[_] => xs.map(render).mkString("[", ",", "]")
    case m: Map[_, _] => m.toSeq.map { case (k, x) => s"$k=${render(x)}" }
      .sorted.mkString("{", ",", "}")
    case other => "?" + other.toString
  }

  /** run one case; None = agreement, Some(diagnostic) = divergence */
  private def runCase(i: Long): Option[String] = {
    val (model, pg) = graphFor(i / 10)
    val q = DiffGen.genQuery.pureApply(
      org.scalacheck.Gen.Parameters.default, org.scalacheck.rng.Seed(i))
    val text = q.render
    val aliases = q.ret.items.map(_.alias)
    val msAliases = q.multisetAliases
    val numAliases = q.sumAliases
    def diag(msg: String): Some[String] = Some(
      s"case $i: $msg\n--- graph\n${model.toCreate}--- query\n$text\n")

    val naive: List[List[Any]] = try NaiveEval.run(model, q) catch {
      case e: Throwable => return diag(s"NAIVE EVAL CRASH: $e")
    }
    val (cols, engine): (Array[String], List[List[Any]]) = try {
      val df = gs.cypher(pg, text)
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
        rows.map(r => keyIdx.map(ix => render(r(ix))).mkString("|"))
      val (ek, nk) = (keys(engine), keys(naive))
      if (ek != nk)
        return diag(s"ORDER: engine keys ${ek.take(25)} vs naive ${nk.take(25)}")
    }
    None
  }

  private val batchSize = 50
  private val nBatches = 20 // 1000 cases

  (0 until nBatches).foreach { b =>
    test(s"differential batch $b (cases ${b * batchSize}..${(b + 1) * batchSize - 1})") {
      val failures = (b * batchSize until (b + 1) * batchSize)
        .flatMap(i => runCase(i.toLong))
      assert(failures.isEmpty,
        s"\n${failures.size} divergent case(s):\n" +
          failures.take(3).mkString("\n======\n"))
    }
  }
}
