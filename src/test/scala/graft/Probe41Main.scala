package graft

import org.apache.spark.sql.SparkSession
import graft.api.GraftSession

/** Probe batch 35+: engine shapes the round-6 differential-grammar
  * extension will generate — map literals/projection, date values +
  * duration arithmetic, path nodes()/relationships() consumers, and
  * CONSTRUCT CLONE rematch — verifying semantics BEFORE wiring the
  * generator (probe-first cadence).
  */
object Probe41Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gs = GraftSession(spark)
    val g = gs.createGraphFromCypher(
      """CREATE (a:A {k: 1, s: 'x', uid: 0})
        |CREATE (b:B {k: 2, uid: 1})
        |CREATE (a)-[:T {w: 5, uid: 1000}]->(b)
        |CREATE (b)-[:S {w: 7, uid: 1001}]->(a)""".stripMargin)
    def q(s: String): Unit = {
      print(s.replace('\n', ' ') + "  ==>  ")
      try {
        val rows = gs.cypher(g, s).collect()
        println(rows.map(_.toString).mkString("; "))
      } catch { case e: Throwable =>
        println(s"ERROR ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(120)}")
      }
    }
    // ---- maps
    q("RETURN {a: 1, b: 'x'} AS m")
    q("RETURN {a: 1, b: 'x'}.a AS v")
    q("MATCH (n:A) RETURN {k: n.k, s: n.s} AS m")
    q("MATCH (n:A) RETURN {k: n.k, s: n.s} = {k: 1, s: 'x'} AS eq")
    q("MATCH (n:A) RETURN {k: n.k} = {k: n.missing} AS eqnull")
    q("MATCH (n) RETURN n {.k, .s} AS mp ORDER BY n.uid")
    q("MATCH (n) RETURN n {.k, .missing} AS mp ORDER BY n.uid")
    q("MATCH (n:A) RETURN {a: n.k, b: 2}['a'] AS dyn")
    // ---- dates
    q("RETURN date('2024-01-15') AS d")
    q("RETURN date('2024-01-15') + duration({days: 3}) AS d")
    q("RETURN date('2024-01-15') - duration({days: 20}) AS d")
    q("RETURN date('2024-01-15') < date('2024-02-01') AS lt")
    q("RETURN date('2024-01-15') = date('2024-01-15') AS eq")
    q("RETURN date('2024-01-15').year AS y, date('2024-01-15').month AS m, date('2024-01-15').day AS dd")
    q("CREATE-FIXTURE-UNUSED RETURN 1") // marker (expected parse error)
    // date property round-trip through a CREATE fixture
    val g2 = gs.createGraphFromCypher(
      "CREATE (:E {d: date('2024-03-05'), uid: 0})\nCREATE (:E {uid: 1})")
    def q2(s: String): Unit = {
      print(s.replace('\n', ' ') + "  ==>  ")
      try println(gs.cypher(g2, s).collect().map(_.toString).mkString("; "))
      catch { case e: Throwable =>
        println(s"ERROR ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(120)}")
      }
    }
    q2("MATCH (n:E) RETURN n.d AS d ORDER BY n.uid")
    q2("MATCH (n:E) WHERE n.d >= date('2024-01-01') RETURN n.uid AS u")
    q2("MATCH (n:E) RETURN n.d + duration({days: 2}) AS d2 ORDER BY n.uid")
    q2("MATCH (n:E) RETURN n.d = null AS x")
    // ---- paths
    q("MATCH p = (a:A)-[*1..2]->(b) RETURN [x IN nodes(p) | x.uid] AS nu, size(relationships(p)) AS nr")
    q("MATCH p = (a:A)-[:T]->(b) RETURN [x IN nodes(p) | x.uid] AS nu, length(p) AS l")
    // ---- var-length quantifiers
    q("MATCH (a)-[rs*1..2]->(b) RETURN a.uid AS au, b.uid AS bu, all(r IN rs WHERE r.w >= 5) AS q ORDER BY au, bu")
    q("MATCH (a)-[rs*1..2]->(b) RETURN a.uid AS au, any(r IN rs WHERE r.w = 7) AS q ORDER BY au")
    // ---- CONSTRUCT CLONE then re-match
    q("""MATCH (a:A)-[r:T]->(b)
        |CONSTRUCT CLONE a, r, b
        |MATCH (x)-[y]->(z) RETURN x.uid AS xu, y.uid AS yu, z.uid AS zu""".stripMargin)
    q("""MATCH (a:A)
        |CONSTRUCT CLONE a
        |MATCH (x) RETURN x.uid AS xu, labels(x) AS ls""".stripMargin)
    q("""MATCH (a)-[r]->(b)
        |CONSTRUCT CLONE r
        |MATCH (x)-[y]->(z) RETURN x.uid AS xu, z.uid AS zu ORDER BY xu""".stripMargin)
    q("""MATCH (a)
        |CONSTRUCT CLONE a
        |MATCH (x)-[y]->(z) RETURN count(*) AS n""".stripMargin)
    spark.stop()
  }
}
