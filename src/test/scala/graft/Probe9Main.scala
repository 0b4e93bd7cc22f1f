package graft

import org.apache.spark.sql.SparkSession

import graft.api.GraftSession

/** Scratch semantics prober batch 9: ordering over collections, UNWIND
  * corners, DISTINCT on compound values, temporal edges, WITH scoping.
  */
object Probe9Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gs = GraftSession(spark)
    val g = gs.createGraphFromCypher(
      """CREATE (a:P {name: 'Ann', age: 30}), (b:P {name: 'Bob'}),
        |(c:P {name: 'Cid', age: 30}), (a)-[:K {w: 1}]->(b), (b)-[:K {w: 2}]->(c)""".stripMargin)
    val qs: Seq[String] = Seq(
      // UNWIND corners
      "UNWIND [] AS x RETURN x",
      "UNWIND null AS x RETURN x",
      "UNWIND [[1,2],[3]] AS x UNWIND x AS y RETURN y",
      "UNWIND [1, null, 2] AS x RETURN x",
      "WITH [1,2] AS l UNWIND range(0, size(l)-1) AS i RETURN i, l[i] AS v",
      // DISTINCT over lists/maps
      "UNWIND [[1,2],[1,2],[3]] AS x RETURN DISTINCT x",
      "UNWIND [{a:1},{a:1},{a:2}] AS m RETURN DISTINCT m",
      // ORDER BY lists and null placement
      "UNWIND [3, null, 1] AS x RETURN x ORDER BY x",
      "UNWIND [3, null, 1] AS x RETURN x ORDER BY x DESC",
      "UNWIND [[2],[1,5],[1]] AS x RETURN x ORDER BY x",
      // aggregation + DISTINCT on collections
      "UNWIND [[1],[1],[2]] AS x RETURN count(DISTINCT x) AS c, collect(DISTINCT x) AS l",
      // temporal
      "RETURN date('2020-02-29') AS d, date('2020-02-29') + duration({days: 1}) AS nxt",
      "RETURN date('2020-01-31') + duration({months: 1}) AS clamp",
      "RETURN duration({months: 14}) AS m14, duration('P1Y2M3DT4H5M6S') AS iso",
      "RETURN date('2021-03-01') - date('2021-02-01') AS diff",
      "RETURN localdatetime('2020-01-01T10:30:00') < localdatetime('2020-01-01T11:00:00') AS lt",
      "RETURN date('2020-06-15').year AS y, date('2020-06-15').month AS m, date('2020-06-15').day AS d",
      "RETURN duration.between(date('2020-01-01'), date('2020-03-15')) AS bw",
      // WITH scoping / shadowing
      "MATCH (n:P) WITH n.age AS n RETURN n ORDER BY n",
      "WITH 1 AS x WITH x AS y, 2 AS x RETURN x, y",
      "MATCH (n:P {name:'Ann'}) WITH n, n.age AS a MATCH (m:P) WHERE m.age = a RETURN m.name AS mn ORDER BY mn",
      // ORDER BY expression not in RETURN
      "MATCH (n:P) RETURN n.name AS name ORDER BY n.age, n.name",
      // ORDER BY aggregate by alias and by expression
      "MATCH (n:P) RETURN n.age AS age, count(*) AS c ORDER BY count(*) DESC, age",
      // LIMIT 0 / SKIP beyond
      "MATCH (n:P) RETURN n.name AS nm LIMIT 0",
      "MATCH (n:P) RETURN n.name AS nm ORDER BY nm SKIP 10",
      // startNode/endNode
      "MATCH (x)-[r:K {w: 1}]->() RETURN startNode(r).name AS s, endNode(r).name AS e",
      // properties() and map projection with missing
      "MATCH (b:P {name:'Bob'}) RETURN properties(b) AS p, b {.name, .age} AS mp",
      // shortestPath same-node
      "MATCH p = shortestPath((a:P {name:'Ann'})-[:K*0..2]->(a)) RETURN length(p) AS l",
      // exists() on property vs pattern
      "MATCH (n:P) RETURN n.name AS nm, exists(n.age) AS ha ORDER BY nm",
      // id() stability / type
      "MATCH (n:P {name:'Ann'})-[r]->() RETURN id(n) = id(n) AS t, id(n) = id(r) AS diff")
    qs.foreach { q =>
      try {
        val df = gs.cypher(g, q)
        val rows = df.collect().map(_.toString).mkString(" | ")
        println(s"PROBE9 OK   $q\n  => $rows")
      } catch {
        case e: Throwable =>
          println(s"PROBE9 FAIL $q\n  => ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
      }
    }
    spark.stop()
  }
}
