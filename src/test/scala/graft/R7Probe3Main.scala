package graft

import org.apache.spark.sql.SparkSession

/** Round-7 probe: engine semantics for the morpheus-examples-mined
  * scenario batch — bound rel vars in CONSTRUCT, inline prop maps
  * referencing earlier vars, label predicate expressions, mixed-union
  * representatives, and the round-7 temporal/duration additions. */
object R7Probe3Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gs = graft.api.GraftSession(spark)
    val g = gs.createGraphFromCypher(
      """CREATE (b1:Business {name: 'Cafe', city: 'Berlin'})
        |CREATE (b2:Business {name: 'Bar', city: 'Berlin'})
        |CREATE (u1:User {name: 'Ann', since: 2015})
        |CREATE (u2:User {name: 'Ben', since: 2017})
        |CREATE (i1:Interest {name: 'coffee'})
        |CREATE (p1:Product {title: 'Beans', category: 'coffee', rank: 2})
        |CREATE (p2:Product {title: 'Mug', category: 'coffee', rank: 1})
        |CREATE (u1)-[:REVIEWS {stars: 5, year: 2017}]->(b1)
        |CREATE (u2)-[:REVIEWS {stars: 3, year: 2017}]->(b1)
        |CREATE (u1)-[:REVIEWS {stars: 4, year: 2018}]->(b2)
        |CREATE (u1)-[:HAS_INTEREST]->(i1)
        |CREATE (u2)-[:BOUGHT {rating: 5, helpful: 4, votes: 5}]->(p1)
        |CREATE (u2)-[:BOUGHT {rating: 2, helpful: 1, votes: 9}]->(p2)""".stripMargin)
    def run(name: String, q: String): Unit =
      try {
        val rows = gs.cypher(g, q).collect()
        println(s"OK   $name -> ${rows.mkString(";")}")
      } catch { case e: Throwable =>
        println(s"FAIL $name -> ${e.getClass.getSimpleName}: " +
          Option(e.getMessage).getOrElse("").linesIterator.take(2).mkString(" "))
      }

    run("bound-rel-in-construct",
      """MATCH (u:User)-[r:REVIEWS]->(b:Business) WHERE r.year = 2017
        |CONSTRUCT CREATE (u)-[r]->(b)
        |MATCH (x:User)-[e:REVIEWS]->(y:Business)
        |RETURN x.name AS x, e.stars AS s, y.name AS y""".stripMargin)
    run("construct-rel-agg-prop",
      """MATCH (b:Business)<-[:REVIEWS]-(u:User)
        |WITH b, count(u) AS c
        |CONSTRUCT CREATE (b)-[:POP {n: c}]->(b)
        |MATCH (x)-[e:POP]->() RETURN x.name AS n, e.n AS c""".stripMargin)
    run("inline-prop-cross-var",
      """MATCH (u:User)-[:HAS_INTEREST]->(i:Interest),
        |      (u2:User)-[:BOUGHT]->(p:Product {category: i.name})
        |RETURN u.name AS u, p.title AS t ORDER BY t""".stripMargin)
    run("label-predicate-expr",
      "MATCH (n) WHERE n:User RETURN n.name AS n ORDER BY n")
    run("with-star-orderby",
      """MATCH (u:User)-[b:BOUGHT]->(p:Product)
        |WHERE b.rating >= 4 AND (b.helpful * 1.0) / b.votes > 0.6
        |WITH * ORDER BY p.rank
        |RETURN DISTINCT p.title AS t, u.name AS n LIMIT 3""".stripMargin)
    run("not-reversed-pattern",
      """MATCH (u:User), (b:Business {name: 'Bar'})
        |WHERE NOT((u)-[:REVIEWS]->(b)) RETURN u.name AS n""".stripMargin)
    run("union-int-preserved",
      "RETURN 1 AS x UNION ALL RETURN 'a' AS x")
    run("union-distinct-int-float",
      "RETURN 1 AS x UNION RETURN 1.0 AS x")
    run("union-distinct-float-first",
      "RETURN 1.0 AS x UNION RETURN 1 AS x")
    run("zoned-time-distinct",
      "UNWIND [time('13:00+01:00'), time('12:00Z')] AS t " +
        "RETURN count(DISTINCT t) AS c")
    run("duration-subsecond-eq",
      "RETURN duration({seconds: 1, milliseconds: 500}) = " +
        "duration({milliseconds: 1500}) AS eq")
    run("duration-quarters",
      "RETURN duration({quarters: 1}) = duration({months: 3}) AS eq")
    run("duration-bad-key",
      "RETURN duration({lightyears: 1}) AS d")
    run("time-lowercase-z",
      "RETURN time('12:00z').hour AS h")
    run("time-odd-compact",
      "RETURN localtime('123') AS t")
    run("clone-set-chain",
      """MATCH (b:Business {name: 'Cafe'})
        |WITH b, 2.5 AS trend
        |CONSTRUCT CLONE b AS nb SET nb.trend = trend
        |MATCH (x:Business) RETURN x.name AS n, x.trend AS t""".stripMargin)
    run("undirected-two-hop-agg",
      """MATCH (u:User)--(b:Business)--(u2:User)
        |WHERE u.name < u2.name
        |WITH u, u2, count(b) AS c RETURN u.name AS a, u2.name AS b, c""".stripMargin)
    run("collect-distinct-size",
      """MATCH (u:User)-[:REVIEWS]->(b:Business)
        |RETURN u.name AS n, size(collect(DISTINCT b.name)) AS c
        |ORDER BY n""".stripMargin)
    spark.stop()
  }
}
