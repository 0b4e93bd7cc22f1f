package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.differential.DiffRunner

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
  *
  * The case executor lives in differential/DiffRunner.scala, shared with
  * DiffHuntMain (large out-of-CI hunts over fresh seed ranges).
  */
class DifferentialSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val runner = new DiffRunner(spark)

  private val batchSize = 50
  private val nBatches = 20 // 1000 cases

  (0 until nBatches).foreach { b =>
    test(s"differential batch $b (cases ${b * batchSize}..${(b + 1) * batchSize - 1})") {
      val failures = (b * batchSize until (b + 1) * batchSize)
        .flatMap(i => runner.runCase(i.toLong))
      assert(failures.isEmpty,
        s"\n${failures.size} divergent case(s):\n" +
          failures.take(3).mkString("\n======\n"))
    }
  }
}
