package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.cypher.Ast._
import graft.graph.PropertyGraph
import graft.plans.{Header, Planner}

/** Unit tests for the planner's selectivity-driven pattern-part reversal
  * (Planner.maybeReversePart): a chain whose WRITTEN start is
  * unconstrained but whose end carries labels/props (or is already bound)
  * is planned from the constrained end, bounding every intermediate
  * join's cardinality. End-to-end correctness of reversed shapes is
  * covered by TckStyleSpec ("reversal-*" scenarios).
  */
class PartReversalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def planner(): Planner = {
    val g = new PropertyGraph(Nil, Nil, spark)
    new Planner(spark, Map.empty, _ => g, g)
  }

  private def node(v: String, labels: Seq[String] = Nil,
      props: Seq[(String, Expr)] = Nil): NodePattern =
    NodePattern(Some(v), labels, props)
  private def rel(dir: Direction, types: Seq[String] = Seq("R"),
      varLen: Option[(Int, Option[Int])] = None,
      v: Option[String] = None): RelPattern =
    RelPattern(v, types, Nil, dir, varLen)

  private def unitState(pl: Planner): pl.PState =
    pl.PState(spark.range(1).toDF().select(), Header.empty, isUnit = true)

  test("WHERE equality against a bound value anchors the chain there") {
    // (a:L)-->(n) WHERE n.key = <bound value var>: the WHERE bonus makes
    // the written END out-score the labeled start, so the part reverses
    // and the equality plans as an equi-join at the anchor (the
    // driving-table shape, gate c34)
    val pl = planner()
    val part = PatternPart(None, node("a", Seq("L")),
      Seq((rel(Outgoing), node("n"))))
    val r = pl.maybeReversePart(part, unitState(pl),
      whereBonus = Map("n" -> 1))
    assert(r.start.variable.contains("n"))
    assert(r.chain.map(_._2.variable.get) == Seq("a"))
    // without the bonus the labeled start wins and order is kept
    val kept = pl.maybeReversePart(part, unitState(pl))
    assert(kept.start.variable.contains("a"))
  }

  test("unconstrained start, labeled+prop end: reversed with flipped dirs") {
    val pl = planner()
    val part = PatternPart(None, node("a"),
      Seq((rel(Outgoing), node("m")),
        (rel(Incoming), node("b", Seq("L"), Seq("k" -> IntLit(1))))))
    val r = pl.maybeReversePart(part, unitState(pl))
    assert(r.start.variable.contains("b"))
    assert(r.chain.map(_._1.direction) == Seq(Outgoing, Incoming))
    assert(r.chain.map(_._2.variable.get) == Seq("m", "a"))
  }

  test("equal selectivity keeps written order") {
    val pl = planner()
    val part = PatternPart(None, node("a", Seq("L")),
      Seq((rel(Outgoing), node("b", Seq("L")))))
    assert(pl.maybeReversePart(part, unitState(pl)) eq part)
  }

  test("selective start beats less-selective end: kept") {
    val pl = planner()
    val part = PatternPart(None,
      node("a", Seq("L"), Seq("k" -> IntLit(1))),
      Seq((rel(Outgoing), node("b", Seq("L")))))
    assert(pl.maybeReversePart(part, unitState(pl)) eq part)
  }

  test("named path is never reversed (positional order observable)") {
    val pl = planner()
    val part = PatternPart(Some("p"), node("a"),
      Seq((rel(Outgoing), node("b", Seq("L")))))
    assert(pl.maybeReversePart(part, unitState(pl)) eq part)
  }

  test("var-length rel with a variable is never reversed (list order)") {
    val pl = planner()
    val part = PatternPart(None, node("a"),
      Seq((rel(Outgoing, varLen = Some((1, Some(2))), v = Some("rs")),
        node("b", Seq("L")))))
    assert(pl.maybeReversePart(part, unitState(pl)) eq part)
  }

  test("anonymous var-length CAN reverse (order unobservable)") {
    val pl = planner()
    val part = PatternPart(None, node("a"),
      Seq((rel(Outgoing, varLen = Some((1, Some(2)))),
        node("b", Seq("L")))))
    val r = pl.maybeReversePart(part, unitState(pl))
    assert(r.start.variable.contains("b"))
    assert(r.chain.head._1.direction == Incoming)
  }

  test("undirected rels keep Undirected on reversal") {
    val pl = planner()
    val part = PatternPart(None, node("a"),
      Seq((rel(Undirected), node("b", Seq("L")))))
    val r = pl.maybeReversePart(part, unitState(pl))
    assert(r.start.variable.contains("b"))
    assert(r.chain.head._1.direction == Undirected)
  }
}
