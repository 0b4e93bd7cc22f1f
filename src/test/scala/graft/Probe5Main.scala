package graft

import org.apache.spark.sql.SparkSession

import graft.api.GraftSession

/** Scratch prober #5: bug isolation for re-MATCH after ordered WITH and
  * comprehensions over aggregates. */
object Probe5Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gs = GraftSession(spark)
    val g = gs.createGraphFromCypher(
      """CREATE (a:P {name: 'Ann', age: 30, team: 'x'}),
        |(b:P {name: 'Bob', age: 20, team: 'x'}),
        |(c:P {name: 'Cid', age: 25, team: 'y'}),
        |(a)-[:K]->(b), (a)-[:K]->(c), (b)-[:K]->(c)""".stripMargin)
    def probe(q: String): Unit =
      try {
        val df = gs.cypher(g, q)
        println(s"PROBE| $q")
        df.collect().take(8).foreach(r => println(s"  ROW $r"))
      } catch {
        case e: Throwable =>
          println(s"PROBE| $q")
          println(s"  ERROR ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}")
      }
    probe("MATCH (n:P) WITH n MATCH (n)-[:K]->(m) RETURN n.name AS a, m.name AS b ORDER BY a, b")
    probe("MATCH (n:P) WITH n ORDER BY n.age DESC MATCH (n)-[:K]->(m) RETURN n.name AS a, m.name AS b ORDER BY a, b")
    probe("MATCH (n:P) WITH n LIMIT 3 MATCH (n)-[:K]->(m) RETURN n.name AS a, m.name AS b ORDER BY a, b")
    probe("MATCH (n:P) WITH n ORDER BY n.age DESC LIMIT 1 RETURN n.name AS a")
    probe("MATCH (n:P) WITH n ORDER BY n.age DESC LIMIT 1 MATCH (n)-[:K]->(m) RETURN n.name AS a, m.name AS b ORDER BY b")
    probe("MATCH (n:P) WITH n AS p ORDER BY p.age DESC LIMIT 1 MATCH (p)-[:K]->(m) RETURN p.name AS a, m.name AS b ORDER BY b")
    probe("MATCH (n:P)-[:K]->(m) RETURN n.name AS nm, collect(m.team) AS teams ORDER BY nm")
    probe("MATCH (n:P)-[:K]->(m) RETURN n.name AS nm, [x IN collect(m.team) | x] AS teams ORDER BY nm")
    probe("MATCH (n:P)-[:K]->(m) RETURN n.name AS nm, size(collect(m.team)) AS c ORDER BY nm")
    probe("MATCH (n:P)-[:K]->(m) RETURN n.name AS nm, [x IN collect(DISTINCT m.team) WHERE x IS NOT NULL | x] AS teams ORDER BY nm")
    probe("UNWIND [1,2,2] AS v RETURN [x IN collect(DISTINCT v) | x * 10] AS l")
    probe("MATCH (n:P)-[:K]->(m) RETURN n.name AS nm, reduce(acc = 0, x IN collect(m.age) | acc + x) AS tot ORDER BY nm")
    spark.stop()
  }
}
