package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import graft.api.GraftSession
import graft.sources.TpchGraph

/** Round-10 lock: the planner lowers `MATCH (a), (b) WHERE
  * distance(a.p, b.p) < r` over DISCONNECTED patterns to the
  * grid-bucketed DistanceJoin (Planner.planPartViaDistanceJoin) instead of
  * crossJoin + filter. Parity is checked against the SAME predicate
  * evaluated the brute-force way (distance projected through WITH first,
  * which keeps the cross-join plan), so any superset/dedup defect in the
  * grid prefilter shows up as a row diff.
  */
class DistanceRewriteSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val gs = GraftSession(spark)
  lazy val g = TpchGraph.load(spark, "/root/testdata/sf0.001")

  private def rows(df: DataFrame): Seq[Row] = df.collect().toSeq

  private def parity(routed: String, brute: String,
      params: Map[String, Any] = Map.empty): Unit = {
    val a = rows(gs.cypher(g, routed, params))
    val b = rows(gs.cypher(g, brute, params))
    assert(a == b, s"routed=${a.size} rows vs brute=${b.size} rows")
    assert(a.nonEmpty, "fixture produced zero matching pairs — not a test")
  }

  test("cartesian crs: grid route matches brute-force cross+filter") {
    parity(
      """MATCH (s:Supplier), (c:Customer)
        |WHERE distance(point({x: s.s_acctbal, y: toFloat(s.s_nationkey)}),
        |               point({x: c.c_acctbal, y: toFloat(c.c_nationkey)}))
        |      < 100.0
        |RETURN s.s_suppkey AS sk, c.c_custkey AS ck
        |ORDER BY sk, ck""".stripMargin,
      """MATCH (s:Supplier), (c:Customer)
        |WITH s.s_suppkey AS sk, c.c_custkey AS ck,
        |     distance(point({x: s.s_acctbal, y: toFloat(s.s_nationkey)}),
        |              point({x: c.c_acctbal, y: toFloat(c.c_nationkey)})) AS d
        |WHERE d < 100.0
        |RETURN sk, ck ORDER BY sk, ck""".stripMargin)
  }

  test("wgs-84 crs: latitude-band route matches brute force") {
    parity(
      """MATCH (s:Supplier), (c:Customer)
        |WHERE distance(
        |        point({latitude: toFloat(s.s_nationkey),
        |               longitude: s.s_acctbal / 100.0}),
        |        point({latitude: toFloat(c.c_nationkey),
        |               longitude: c.c_acctbal / 100.0})) < 300000.0
        |RETURN s.s_suppkey AS sk, c.c_custkey AS ck
        |ORDER BY sk, ck""".stripMargin,
      """MATCH (s:Supplier), (c:Customer)
        |WITH s.s_suppkey AS sk, c.c_custkey AS ck,
        |     distance(
        |       point({latitude: toFloat(s.s_nationkey),
        |              longitude: s.s_acctbal / 100.0}),
        |       point({latitude: toFloat(c.c_nationkey),
        |              longitude: c.c_acctbal / 100.0})) AS d
        |WHERE d < 300000.0
        |RETURN sk, ck ORDER BY sk, ck""".stripMargin)
  }

  test("mixed crs + null points: cross-crs pairs and nulls never match") {
    // a third of each side is null, the rest splits cartesian/wgs-84 by
    // key parity — the grid must reproduce the filter's null semantics
    // exactly (null point / crs mismatch ⇒ distance null ⇒ no row)
    val mk = (v: String, bal: String, nk: String) =>
      s"""CASE WHEN $v.$nk % 3 = 0 THEN null
         |     WHEN $v.$nk % 2 = 0
         |       THEN point({x: $v.$bal, y: toFloat($v.$nk)})
         |     ELSE point({latitude: toFloat($v.$nk), longitude: $v.$bal / 100.0})
         |END""".stripMargin
    val sp = mk("s", "s_acctbal", "s_nationkey")
    val cp = mk("c", "c_acctbal", "c_nationkey")
    parity(
      s"""MATCH (s:Supplier), (c:Customer)
         |WHERE distance($sp, $cp) < 200000.0
         |RETURN s.s_suppkey AS sk, c.c_custkey AS ck
         |ORDER BY sk, ck""".stripMargin,
      s"""MATCH (s:Supplier), (c:Customer)
         |WITH s.s_suppkey AS sk, c.c_custkey AS ck,
         |     distance($sp, $cp) AS d
         |WHERE d < 200000.0
         |RETURN sk, ck ORDER BY sk, ck""".stripMargin)
  }

  test("inclusive and flipped comparison forms route and match") {
    parity(
      """MATCH (s:Supplier), (c:Customer)
        |WHERE $r >= distance(
        |        point({x: s.s_acctbal, y: toFloat(s.s_nationkey)}),
        |        point({x: c.c_acctbal, y: toFloat(c.c_nationkey)}))
        |RETURN s.s_suppkey AS sk, c.c_custkey AS ck
        |ORDER BY sk, ck""".stripMargin,
      """MATCH (s:Supplier), (c:Customer)
        |WITH s.s_suppkey AS sk, c.c_custkey AS ck,
        |     distance(point({x: s.s_acctbal, y: toFloat(s.s_nationkey)}),
        |              point({x: c.c_acctbal, y: toFloat(c.c_nationkey)})) AS d
        |WHERE d <= $r
        |RETURN sk, ck ORDER BY sk, ck""".stripMargin,
      params = Map("r" -> 80.0))
  }

  test("c42 gate plans with no cartesian and no nested loop") {
    val df = CypherQueries.queries("c42_distance_join")(
      spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian survived:\n$plan")
    assert(!plan.contains("BroadcastNestedLoop"), s"nested loop:\n$plan")
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      s"expected the grid equi-join:\n$plan")
  }

  test("row-varying radius falls back to filter and stays correct") {
    // radius depends on the supplier row → no constant cell size; the
    // rewrite must decline (leaving the plain cross+filter plan) without
    // corrupting shared planner state
    val df = gs.cypher(g,
      """MATCH (s:Supplier), (c:Customer)
        |WHERE distance(point({x: s.s_acctbal, y: 0.0}),
        |               point({x: c.c_acctbal, y: 0.0}))
        |      < toFloat(s.s_nationkey)
        |RETURN count(*) AS n""".stripMargin)
    val brute = gs.cypher(g,
      """MATCH (s:Supplier), (c:Customer)
        |WITH distance(point({x: s.s_acctbal, y: 0.0}),
        |              point({x: c.c_acctbal, y: 0.0})) AS d,
        |     toFloat(s.s_nationkey) AS r
        |WHERE d < r
        |RETURN count(*) AS n""".stripMargin)
    assert(rows(df) == rows(brute))
  }

  test("connected patterns keep the expand plan (no isolation regression)") {
    // distance conjunct over vars of ONE connected pattern — the rewrite
    // must not fire (parts share vars); results unchanged
    val df = gs.cypher(g,
      """MATCH (c:Customer)-[:PLACED]->(o:Order)
        |WHERE distance(point({x: c.c_acctbal, y: 0.0}),
        |               point({x: o.o_totalprice, y: 0.0})) < 1000.0
        |RETURN count(*) AS n""".stripMargin)
    val n = rows(df).head.getLong(0)
    assert(n > 0)
  }
}
