package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.api.GraftSession

/** Multi-graph interaction shapes: cross-graph correlated matches,
  * CONSTRUCT over unions of catalog graphs, constructed graphs as
  * inputs to further var-length matches, and catalog DDL round-trips
  * (reference: multiple-graph features of RelationalCypherSession /
  * ConstructGraphPlanner).
  */
class MultiGraphSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder().master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false").getOrCreate()
  lazy val gs = GraftSession(spark)
  lazy val g1 = gs.createGraphFromCypher(
    "CREATE (:X {v: 1, tag: 'a'}), (:X {v: 2, tag: 'b'})")
  lazy val g2 = gs.createGraphFromCypher(
    "CREATE (:Y {v: 1, w: 10}), (:Y {v: 2, w: 20}), (:Y {v: 3, w: 30})")
  private def registered: Unit = synchronized {
    if (!gs.graphNames.contains("mg1")) {
      gs.register("mg1", g1); gs.register("mg2", g2)
    }
  }

  test("cross-graph correlated value match: WITH carries values across FROM GRAPH") {
    registered
    val rows = gs.cypherStatement(
      """FROM GRAPH mg1 MATCH (a:X) WITH a.v AS v, a.tag AS tag
        |FROM GRAPH mg2 MATCH (b:Y) WHERE b.v = v
        |RETURN tag, b.w AS w ORDER BY tag""".stripMargin, Map.empty)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows == Seq(("a", 10L), ("b", 20L)))
  }

  test("CONSTRUCT ON unions two catalog graphs; result queryable") {
    registered
    val u = gs.cypherGraph(g1, "CONSTRUCT ON mg1, mg2 RETURN GRAPH")
    gs.register("mgu", u)
    val c = gs.cypherStatement(
      "FROM GRAPH mgu MATCH (n) RETURN count(*) AS c", Map.empty)
      .collect().head.getLong(0)
    assert(c == 5L)
  }

  test("cross-graph CONSTRUCT: per-pair nodes from a two-graph join") {
    registered
    val pairs = gs.cypherGraph(g1,
      """MATCH (a:X)
        |FROM GRAPH mg2 MATCH (b:Y) WHERE b.v = a.v
        |CONSTRUCT NEW (:PairNode {v: a.v, w: b.w})
        |RETURN GRAPH""".stripMargin)
    gs.register("mgpairs", pairs)
    val rows = gs.cypherStatement(
      "FROM GRAPH mgpairs MATCH (p:PairNode) RETURN p.v AS v, p.w AS w ORDER BY v",
      Map.empty).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows == Seq((1L, 10L), (2L, 20L)))
  }

  test("constructed graph feeds a var-length match") {
    registered
    val built = gs.cypherGraph(g1,
      """MATCH (a:X), (b:X) WHERE a.v < b.v
        |CONSTRUCT NEW (:C {v: a.v})-[:E]->(:C {v: b.v})
        |RETURN GRAPH""".stripMargin)
    gs.register("mgbuilt", built)
    val rows = gs.cypherStatement(
      """FROM GRAPH mgbuilt MATCH (s:C)-[:E*1..2]->(t:C)
        |RETURN s.v AS sv, t.v AS tv ORDER BY sv, tv""".stripMargin, Map.empty)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows == Seq((1L, 2L)))
  }

  test("CONSTRUCT ON base with SET flags only the matched clone (others keep null)") {
    registered
    val flagged = gs.cypherGraph(g1,
      """MATCH (a:X) WHERE a.v = 1
        |CONSTRUCT ON mg1 CLONE a SET a.flag = true
        |RETURN GRAPH""".stripMargin)
    gs.register("mgflag", flagged)
    val rows = gs.cypherStatement(
      "FROM GRAPH mgflag MATCH (n:X) RETURN n.v AS v, n.flag AS f ORDER BY v",
      Map.empty).collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getBoolean(1))).toSeq
    assert(rows == Seq((1L, true), (2L, null)))
  }

  test("UNION ALL across FROM GRAPH branches") {
    registered
    val vs = gs.cypherStatement(
      """FROM GRAPH mg1 MATCH (a:X) RETURN a.v AS v
        |UNION ALL
        |FROM GRAPH mg2 MATCH (b:Y) RETURN b.v AS v""".stripMargin, Map.empty)
      .collect().map(_.getLong(0)).toSeq.sorted
    assert(vs == Seq(1L, 1L, 2L, 2L, 3L))
  }

  test("CATALOG CREATE GRAPH from a cross-graph body; DROP removes it") {
    registered
    gs.cypherStatement(
      """CATALOG CREATE GRAPH mgsnap {
        |  FROM GRAPH mg2 MATCH (b:Y) WHERE b.v <= 2
        |  CONSTRUCT NEW (:S {v: b.v}) RETURN GRAPH
        |}""".stripMargin, Map.empty)
    val c = gs.cypherStatement(
      "FROM GRAPH mgsnap MATCH (s:S) RETURN count(*) AS c", Map.empty)
      .collect().head.getLong(0)
    assert(c == 2L)
    gs.cypherStatement("CATALOG DROP GRAPH mgsnap", Map.empty)
    assert(!gs.graphNames.contains("mgsnap"))
  }

  // --- round 8: shapes mined from the reference's CatalogDDLTests ---

  test("nested view invocation with CLONE + anonymous COPY OF (42 nodes)") {
    // CatalogDDLTests "supports nested CREATE VIEW with two parameters
    // and empty constructed nodes": bar($g1,$g2) = |g1| clones +
    // |g1|·|g2| per-row copies, so bar(bar(b,a), bar(a,b)) = 6 + 36 = 42
    // — exercises anonymous `CREATE (COPY OF m)`, the CREATE synonym
    // inside CONSTRUCT, and fresh-id disjointness across nested
    // constructs (the round-8 session-global id-tag fix)
    val ga = gs.createGraphFromCypher(
      "CREATE ({name: 'A1'}) CREATE ({name: 'A2'})")
    val gb = gs.createGraphFromCypher(
      "CREATE ({name: 'B1'}) CREATE ({name: 'B2'})")
    gs.register("cda", ga); gs.register("cdb", gb)
    gs.cypherStatement(
      """CATALOG CREATE VIEW cdbar($g1, $g2) {
        | FROM GRAPH $g1
        | MATCH (n)
        | FROM GRAPH $g2
        | MATCH (m)
        | CONSTRUCT
        |   CLONE n AS n
        |   CREATE (COPY OF m)
        | RETURN GRAPH
        |}""".stripMargin, Map.empty)
    def count(ref: String): Long = gs.cypherStatement(
      s"FROM GRAPH $ref MATCH (x) RETURN count(*) AS c", Map.empty)
      .collect().head.getLong(0)
    assert(count("cdbar(cda, cdb)") == 6L)
    assert(count("cdbar(cdbar(cdb, cda), cdbar(cda, cdb))") == 42L)
  }

  test("graph and view under the same name coexist; DROP VIEW is idempotent") {
    // CatalogDDLTests "can still resolve a graph when a view with the
    // same name exists" (+ the view via invocation syntax), "dropping a
    // view is idempotent"
    val ga = gs.createGraphFromCypher("CREATE ({name: 'GA'})")
    val gb = gs.createGraphFromCypher("CREATE ({name: 'GB'})")
    gs.register("colA", ga); gs.register("colB", gb)
    gs.cypherStatement(
      "CATALOG CREATE VIEW colA { FROM GRAPH colB RETURN GRAPH }",
      Map.empty)
    def names(ref: String): Seq[String] = gs.cypherStatement(
      s"FROM GRAPH $ref MATCH (x) RETURN x.name AS n ORDER BY n",
      Map.empty).collect().map(_.getString(0)).toSeq
    assert(names("colA") == Seq("GA"), "bare name must resolve the GRAPH")
    assert(names("colA()") == Seq("GB"),
      "invocation must resolve the parameterless VIEW")
    gs.cypherStatement("CATALOG DROP VIEW colA", Map.empty)
    assert(names("colA") == Seq("GA"), "graph survives the view drop")
    // idempotent: dropping an absent view is a no-op, not an error
    gs.cypherStatement("CATALOG DROP VIEW colA", Map.empty)
  }

  test("escaped qualified graph names (QualifiedGraphNameAcceptance)") {
    // backtick-escaped namespaces and graph names, incl. spaces and
    // dots inside segments; CATALOG CREATE with an escaped target
    val g = gs.createGraphFromCypher("CREATE (:A {k: 1}) CREATE (:A {k: 2})")
    gs.register("my best graph", g)
    gs.register("foo.bar.my graph", g)
    def cnt(ref: String): Long = gs.cypherStatement(
      s"FROM GRAPH $ref MATCH (n) RETURN count(n) AS cnt", Map.empty)
      .collect().head.getLong(0)
    assert(cnt("`my best graph`") == 2L)
    assert(cnt("`foo.bar`.`my graph`") == 2L)
    gs.cypherStatement("CATALOG CREATE GRAPH `snap shot` { " +
      "FROM GRAPH `my best graph` RETURN GRAPH }", Map.empty)
    assert(cnt("`snap shot`") == 2L)
    gs.cypherStatement("CATALOG DROP GRAPH `snap shot`", Map.empty)
    assert(!gs.graphNames.contains("snap shot"))
  }

  test("FROM GRAPH $param reads the graph name from value parameters") {
    // MultipleGraphTests "can read graph via parameter"
    registered
    val rows = gs.cypherStatement(
      "FROM GRAPH $graphParam MATCH (n) RETURN count(*) AS c",
      Map("graphParam" -> "mg2")).collect()
    assert(rows.head.getLong(0) == 3L)
    val err = intercept[IllegalArgumentException] {
      gs.cypherStatement("FROM GRAPH $nope MATCH (n) RETURN 1 AS x",
        Map.empty).collect()
    }
    assert(err.getMessage.contains("unbound graph parameter"))
  }
}
