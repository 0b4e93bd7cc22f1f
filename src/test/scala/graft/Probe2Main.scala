package graft

import org.apache.spark.sql.SparkSession

import graft.api.GraftSession

/** Scratch prober #2: multi-graph FROM/CONSTRUCT interactions and
  * var-length over constructed graphs (test scope; not in the suite).
  */
object Probe2Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gs = GraftSession(spark)
    val g1 = gs.createGraphFromCypher(
      "CREATE (:X {v: 1, tag: 'a'}), (:X {v: 2, tag: 'b'})")
    val g2 = gs.createGraphFromCypher(
      "CREATE (:Y {v: 1, w: 10}), (:Y {v: 2, w: 20}), (:Y {v: 3, w: 30})")
    gs.register("g1", g1)
    gs.register("g2", g2)

    def probe(name: String)(body: => Unit): Unit =
      try { println(s"PROBE| $name"); body }
      catch { case e: Throwable => println(
        s"  ERROR ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(300)}") }

    probe("cross-graph correlated value match") {
      val df = gs.cypherStatement(
        """FROM GRAPH g1 MATCH (a:X) WITH a.v AS v, a.tag AS tag
          |FROM GRAPH g2 MATCH (b:Y) WHERE b.v = v
          |RETURN tag, b.w AS w ORDER BY tag""".stripMargin, Map.empty)
      df.collect().foreach(r => println(s"  ROW $r"))
    }
    probe("construct over union of two graphs, then query it") {
      val gg = gs.cypherGraph(g1,
        """CONSTRUCT ON g1, g2 RETURN GRAPH""".stripMargin)
      gs.register("u", gg)
      val df = gs.cypherStatement(
        "FROM GRAPH u MATCH (n) RETURN count(*) AS c", Map.empty)
      df.collect().foreach(r => println(s"  ROW $r"))
    }
    probe("cross-graph construct: NEW rels linking matches from two graphs") {
      val gg = gs.cypherStatement(
        """FROM GRAPH g1 MATCH (a:X)
          |FROM GRAPH g2 MATCH (b:Y) WHERE b.v = a.v
          |CONSTRUCT NEW (a2:XC {v: a.v})-[:PAIR]->(b2:YC {w: b.w})
          |RETURN GRAPH""".stripMargin, Map.empty)
      ()
    }
    probe("cross-graph construct via cypherGraph") {
      val gg = gs.cypherGraph(g1,
        """MATCH (a:X)
          |FROM GRAPH g2 MATCH (b:Y) WHERE b.v = a.v
          |CONSTRUCT NEW (:PairNode {v: a.v, w: b.w})
          |RETURN GRAPH""".stripMargin)
      gs.register("pairs", gg)
      val df = gs.cypherStatement(
        "FROM GRAPH pairs MATCH (p:PairNode) RETURN p.v AS v, p.w AS w ORDER BY v",
        Map.empty)
      df.collect().foreach(r => println(s"  ROW $r"))
    }
    probe("var-length over a constructed graph") {
      val built = gs.cypherGraph(g1,
        """MATCH (a:X), (b:X) WHERE a.v < b.v
          |CONSTRUCT NEW (a1:C {v: a.v})-[:E]->(b1:C {v: b.v})
          |RETURN GRAPH""".stripMargin)
      gs.register("built", built)
      val df = gs.cypherStatement(
        """FROM GRAPH built MATCH (s:C)-[:E*1..2]->(t:C)
          |RETURN s.v AS sv, t.v AS tv ORDER BY sv, tv""".stripMargin, Map.empty)
      df.collect().foreach(r => println(s"  ROW $r"))
    }
    probe("CONSTRUCT ON with SET over base elements, then re-query") {
      val gg = gs.cypherGraph(g1,
        """MATCH (a:X) WHERE a.v = 1
          |CONSTRUCT ON g1 CLONE a SET a.flag = true
          |RETURN GRAPH""".stripMargin)
      gs.register("flagged", gg)
      val df = gs.cypherStatement(
        "FROM GRAPH flagged MATCH (n:X) RETURN n.v AS v, n.flag AS f ORDER BY v",
        Map.empty)
      df.collect().foreach(r => println(s"  ROW $r"))
    }
    probe("union all across graphs in one statement") {
      val df = gs.cypherStatement(
        """FROM GRAPH g1 MATCH (a:X) RETURN a.v AS v
          |UNION ALL
          |FROM GRAPH g2 MATCH (b:Y) RETURN b.v AS v""".stripMargin, Map.empty)
      df.collect().foreach(r => println(s"  ROW $r"))
    }
    probe("catalog DDL statement round-trip") {
      gs.cypherStatement(
        """CATALOG CREATE GRAPH snapshot {
          |  FROM GRAPH g2 MATCH (b:Y) WHERE b.v <= 2
          |  CONSTRUCT NEW (:S {v: b.v}) RETURN GRAPH
          |}""".stripMargin, Map.empty)
      val df = gs.cypherStatement(
        "FROM GRAPH snapshot MATCH (s:S) RETURN count(*) AS c", Map.empty)
      df.collect().foreach(r => println(s"  ROW $r"))
    }
    spark.stop()
  }
}
