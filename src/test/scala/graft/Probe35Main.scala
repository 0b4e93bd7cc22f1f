package graft

import org.apache.spark.sql.SparkSession
import graft.api.GraftSession

/** Probe batch 26: shapes the REFERENCE blacklists (failing_blacklist)
  * could not run — WITH bound endpoints, var-length edge shapes, type
  * conversions over mixed values, UNWIND scoping, list concat, DISTINCT
  * aggregation over nested structures. Each confirmed behavior gets a
  * TckStyleSpec lock.
  */
object Probe35Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gs = GraftSession(spark)
    val g = gs.createGraphFromCypher("""
      CREATE (a:A {v: 1, name: 'a'})
      CREATE (b:B {v: 2, name: 'b'})
      CREATE (c:C {v: 3, name: 'c'})
      CREATE (a)-[:R {w: 1}]->(b)
      CREATE (b)-[:R {w: 2}]->(c)
      CREATE (a)-[:S {w: 9}]->(c)
    """)
    def probe(name: String, q: String): Unit = {
      val r = try {
        gs.cypher(g, q).collect().map(_.toSeq.mkString(",")).mkString(" | ")
      } catch { case e: Throwable =>
        s"ERROR(${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(90)})"
      }
      println(f"$name%-46s -> $r")
    }

    // WithAcceptance: bound endpoint + bound rel re-match
    probe("with-bound-endpoint-rematch",
      """MATCH (a:A)-[r:R]->(b) WITH a, r LIMIT 1
        |MATCH (a)-[r]->(b2) RETURN b2.name AS n""".stripMargin)
    probe("with-limit-rebound-rel-and-node",
      """MATCH (a)-[r:R]->(b) WITH r, b ORDER BY b.v LIMIT 1
        |MATCH (x)-[r]->(b) RETURN x.name AS xn, b.name AS bn""".stripMargin)
    // VarLength: unbounded / explicit unbounded / lower bounded
    probe("varlength-unbounded", "MATCH (a:A)-[:R*]->(x) RETURN count(x) AS n")
    probe("varlength-explicit-unbounded",
      "MATCH (a:A)-[:R*..]->(x) RETURN count(x) AS n")
    probe("varlength-lower-bounded",
      "MATCH (a:A)-[:R*2..]->(x) RETURN x.name AS n")
    probe("varlength-bound-rel-error",
      "MATCH (a)-[r:R]->(b) MATCH (a)-[r*1..2]->(c) RETURN count(*) AS n")
    // var-length + standard rel chain, zero length
    probe("varlength-zero-then-rel",
      """MATCH (a:A)-[:R*0..1]->(m)-[:S]->(c)
        |RETURN a.name AS an, m.name AS mn, c.name AS cn""".stripMargin)
    probe("varlength-then-incoming",
      """MATCH (a:A)-[:R*1..2]->(m)<-[:S]-(x)
        |RETURN m.name AS mn, x.name AS xn""".stripMargin)
    probe("fixed-length-varlength",
      "MATCH (a:A)-[:R*2]->(x) RETURN x.name AS n")
    // Unwind scoping
    probe("unwind-collected",
      "MATCH (n) WITH collect(n.v) AS vs UNWIND vs AS v RETURN v ORDER BY v")
    probe("unwind-keeps-scope",
      """MATCH (n:A) UNWIND [1, 2] AS x
        |RETURN n.name AS nm, x ORDER BY x""".stripMargin)
    // Type conversions over mixed values
    probe("tointeger-mixed",
      "UNWIND [1, 2.7, '4', 'no', true] AS x RETURN toInteger(x) AS i")
    probe("tofloat-mixed",
      "UNWIND [1, 2.5, '3.5', 'no'] AS x RETURN toFloat(x) AS f")
    probe("tostring-mixed",
      "UNWIND [1, 2.5, 'x', true] AS x RETURN toString(x) AS s")
    probe("toboolean-valid",
      "UNWIND ['true', 'FALSE', ' true'] AS x RETURN toBoolean(x) AS b")
    probe("toboolean-int", "RETURN toBoolean(1) AS b")
    probe("toboolean-mixed",
      "UNWIND [true, 'false', 'nope'] AS x RETURN toBoolean(x) AS b")
    // STARTS WITH / CONTAINS / ENDS WITH non-string operands
    probe("startswith-nonstring", "RETURN 1 STARTS WITH 'a' AS x")
    probe("contains-nonstring", "WITH 5 AS n RETURN n CONTAINS '5' AS x")
    probe("endswith-null", "RETURN 'abc' ENDS WITH null AS x")
    // ReturnAcceptance2 shapes
    probe("arith-with-aggregation",
      "MATCH (n) RETURN n.v + count(*) AS x ORDER BY x")
    probe("multiple-aliasing-backref",
      "WITH 1 AS a WITH a AS b, a + 1 AS c RETURN b, c")
    probe("concat-lists-same-type", "RETURN [1,2] + [3] AS l")
    probe("nested-expr-list-prop",
      "WITH [1,2,3] AS l RETURN size(l) + l[0] AS x")
    probe("distinct-agg-nested-maps",
      """UNWIND [{k: {m: [1]}}, {k: {m: [1]}}, {k: {m: [2]}}] AS x
        |RETURN count(DISTINCT x) AS n""".stripMargin)
    // OptionalMatch shapes
    probe("optional-named-path",
      """MATCH (c:C) OPTIONAL MATCH p = (c)-[:R]->(x)
        |RETURN c.name AS cn, length(p) AS len""".stripMargin)
    probe("optional-varlength",
      """MATCH (a:A) OPTIONAL MATCH (a)-[:R*1..2]->(x)
        |RETURN a.name AS an, count(x) AS n""".stripMargin)
    probe("optional-varlength-no-match",
      """MATCH (c:C) OPTIONAL MATCH (c)-[:R*1..2]->(x)
        |RETURN c.name AS cn, x.name AS xn""".stripMargin)
    probe("optional-varlength-length-pred",
      """MATCH (a:A) OPTIONAL MATCH p = (a)-[:R*1..2]->(x)
        |WHERE length(p) = 2
        |RETURN a.name AS an, x.name AS xn""".stripMargin)
    // MatchAcceptance2
    probe("aggregation-with-named-path",
      """MATCH p = (a:A)-[:R*1..2]->(x)
        |RETURN length(p) AS len, count(*) AS n ORDER BY len""".stripMargin)
    probe("zero-length-named-path",
      "MATCH p = (a:A) RETURN length(p) AS len, nodes(p)[0].name AS n")
    probe("named-path-direction",
      """MATCH p = (b)<-[:R]-(a:A) RETURN length(p) AS len,
        |nodes(p)[0].name AS first""".stripMargin)
    spark.stop()
  }
}
