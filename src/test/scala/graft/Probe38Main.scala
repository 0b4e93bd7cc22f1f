package graft

import org.apache.spark.sql.SparkSession
import graft.api.GraftSession

/** Probe batch 30: shapes from the REFERENCE's failing_blacklist
  * (morpheus-tck/src/test/resources/failing_blacklist) — var-length +
  * standard rel chains, mixed directions, lower-bounded/unbounded
  * var-length, UNWIND scoping, bound-endpoint re-match. Passing these
  * means we exceed the reference on its own known failures.
  */
object Probe38Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gs = GraftSession(spark)
    // a -T-> b -T-> c -S-> d   plus  e -T-> a
    val g = gs.createGraphFromCypher(
      """CREATE (a:N {n: 'a'}), (b:N {n: 'b'}), (c:N {n: 'c'}),
        |       (d:N {n: 'd'}), (e:N {n: 'e'}),
        |       (a)-[:T]->(b), (b)-[:T]->(c), (c)-[:S]->(d), (e)-[:T]->(a)""".stripMargin)

    def probe(name: String, q: String): Unit = {
      val r = try {
        gs.cypher(g, q).collect().map(_.toSeq.mkString(",")).mkString(" | ")
      } catch { case e: Throwable =>
        s"ERROR(${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(100)})"
      }
      println(f"$name%-46s -> $r")
    }

    // var-length + standard rel in one chain
    probe("varlength-then-standard-zero",
      "MATCH (a:N {n: 'b'})-[:T*0..1]->(x)-[:S]->(y) RETURN x.n AS x, y.n AS y")
    probe("varlength-then-standard",
      "MATCH (a:N {n: 'a'})-[:T*1..2]->(x)-[:S]->(y) RETURN x.n AS x, y.n AS y")
    probe("standard-then-varlength",
      "MATCH (x)-[:S]->(y)<-[:T*1..2]-(z) RETURN x.n AS x, z.n AS z ORDER BY z")
    // mixed directions in chains with var-length
    probe("varlength-incoming",
      "MATCH (c:N {n: 'c'})<-[:T*1..2]-(s) RETURN s.n AS s ORDER BY s")
    probe("varlength-mixed-chain",
      """MATCH (s)-[:T*1..2]->(c:N {n: 'c'})-[:S]->(d)
        |RETURN s.n AS s, d.n AS d ORDER BY s""".stripMargin)
    // lower-bounded and explicitly unbounded var-length
    probe("varlength-lower-bound-only",
      "MATCH (e:N {n: 'e'})-[:T*2..]->(x) RETURN x.n AS x ORDER BY x")
    probe("varlength-star-dotdot",
      "MATCH (e:N {n: 'e'})-[:T*..]->(x) RETURN x.n AS x ORDER BY x")
    // UNWIND scoping
    probe("unwind-keeps-scope",
      """MATCH (a:N {n: 'a'}) UNWIND [1, 2] AS i
        |RETURN a.n AS n, i ORDER BY i""".stripMargin)
    probe("unwind-collected-expression",
      """MATCH (x:N) WHERE x.n IN ['a', 'b']
        |WITH collect(x.n) AS ns UNWIND ns AS n RETURN n ORDER BY n""".stripMargin)
    probe("unwind-twice-cross",
      "UNWIND [1, 2] AS a UNWIND [10, 20] AS b RETURN a, b ORDER BY a, b")
    // bound endpoint re-match (WithAcceptance shape)
    probe("bound-endpoint-rematch",
      """MATCH (a:N {n: 'a'}) WITH a
        |MATCH (a)-[:T]->(b) RETURN b.n AS b""".stripMargin)
    probe("bound-both-endpoints-rematch",
      """MATCH (a:N {n: 'a'})-[:T]->(b) WITH a, b
        |MATCH (a)-[r:T]->(b) RETURN count(r) AS n""".stripMargin)
    spark.stop()
  }
}
