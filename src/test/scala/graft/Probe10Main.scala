package graft

import org.apache.spark.sql.SparkSession

import graft.api.GraftSession

/** Scratch semantics prober batch 10: aggregate composition, entity
  * collect round-trips, temporal aggregates, pattern predicates with
  * property maps, CONSTRUCT over matched subgraphs.
  */
object Probe10Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gs = GraftSession(spark)
    val g = gs.createGraphFromCypher(
      """CREATE (a:P {name: 'Ann', age: 30}), (b:P {name: 'Bob', age: 25}),
        |(c:P {name: 'Cid', age: 35}),
        |(a)-[:K {w: 1}]->(b), (b)-[:K {w: 2}]->(c), (a)-[:K {w: 3}]->(c)""".stripMargin)
    val qs: Seq[String] = Seq(
      // aggregate arithmetic composition
      "MATCH (n:P) RETURN sum(n.age) / count(*) AS mean, max(n.age) - min(n.age) AS spread",
      "MATCH (n:P) RETURN CASE WHEN count(*) > 2 THEN 'many' ELSE 'few' END AS c",
      "MATCH (n:P) RETURN count(DISTINCT n.age % 10) AS cd",
      // collect round-trips
      "MATCH (n:P) WITH collect(n.name) AS names RETURN head(names) AS h, names[-1] AS t, size(names) AS s",
      "MATCH (n:P) WITH collect(n) AS ps UNWIND ps AS p RETURN p.name AS nm ORDER BY nm",
      "MATCH (n:P) WITH collect(n) AS ps RETURN ps[0].name AS first",
      "MATCH (n:P) WITH n ORDER BY n.age LIMIT 2 RETURN collect(n.name) AS youngest",
      // pattern predicate with inline props
      "MATCH (a:P) WHERE (a)-[:K]->({name: 'Cid'}) RETURN a.name AS nm ORDER BY nm",
      "MATCH (a:P) WHERE (a)-[:K {w: 3}]->() RETURN a.name AS nm",
      "MATCH (a:P) WHERE NOT (a)<-[:K]-() RETURN a.name AS nm",
      // size() of pattern
      "MATCH (a:P) RETURN a.name AS nm, size((a)-[:K]->()) AS deg ORDER BY nm",
      // temporal aggregates
      "UNWIND [date('2020-01-01'), date('2021-06-15')] AS d RETURN min(d) AS mn, max(d) AS mx",
      "UNWIND [duration({hours: 1}), duration({hours: 3})] AS x RETURN sum(x) AS s, avg(x) AS a, min(x) AS mn, max(x) AS mx",
      // percentile per group
      "MATCH (p:P)-[r:K]->() RETURN p.name AS nm, percentileCont(r.w, 0.5) AS med ORDER BY nm",
      // nested comprehension over pattern comprehension
      "MATCH (a:P {name: 'Ann'}) RETURN [x IN [(a)-[:K]->(b) | b.age] WHERE x > 26 | x * 2] AS xs",
      // var-length rel property list in RETURN
      "MATCH (a:P {name: 'Ann'})-[rs:K*1..2]->(x) RETURN x.name AS nm, [r IN rs | r.w] AS ws ORDER BY nm, ws",
      // aggregation grouped by compound expression
      "MATCH (n:P) RETURN n.age % 2 = 0 AS even, count(*) AS c ORDER BY even",
      // CONSTRUCT from aggregated WITH
      """MATCH (a:P)-[:K]->(b:P) WITH a, count(b) AS deg WHERE deg > 1
        |CONSTRUCT NEW (:Hub {name: a.name, deg: deg}) RETURN GRAPH
        |MATCH (h:Hub) RETURN h.name AS nm, h.deg AS d""".stripMargin,
      // CONSTRUCT cloning matched var-length endpoints
      """MATCH (a:P {name:'Ann'})-[rs:K*2..2]->(c) CONSTRUCT CLONE a, c
        |NEW (a)-[:REACH {hops: 2}]->(c) RETURN GRAPH
        |MATCH (x)-[r:REACH]->(y) RETURN x.name AS f, y.name AS t, r.hops AS h""".stripMargin,
      // DISTINCT entities then property
      "MATCH (a:P)-[:K]->() WITH DISTINCT a RETURN a.name AS nm ORDER BY nm",
      // order by aggregate not in return
      "MATCH (a:P)-[r:K]->() RETURN a.name AS nm ORDER BY sum(r.w) DESC",
      // chained aggregation stages
      "MATCH (a:P)-[r:K]->() WITH a, sum(r.w) AS tw WITH avg(tw) AS avgw RETURN avgw")
    qs.foreach { q =>
      try {
        val df = gs.cypher(g, q)
        val rows = df.collect().map(_.toString).mkString(" | ")
        println(s"PROBE10 OK   ${q.replace('\n', ' ')}\n  => $rows")
      } catch {
        case e: Throwable =>
          println(s"PROBE10 FAIL ${q.replace('\n', ' ')}\n  => ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
      }
    }
    spark.stop()
  }
}
