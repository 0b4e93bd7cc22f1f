package graft

import org.apache.spark.sql.SparkSession

import graft.api.GraftSession

/** Scratch prober #4: aggregation shapes, WITH scoping, ORDER BY
  * visibility rules, temporal aggregation. */
object Probe4Main {
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
        |(d:P {name: 'Dee'}),
        |(a)-[:K]->(b), (a)-[:K]->(c), (b)-[:K]->(c)""".stripMargin)
    def probe(q: String): Unit =
      try {
        val df = gs.cypher(g, q)
        println(s"PROBE| $q")
        df.collect().take(8).foreach(r => println(s"  ROW $r"))
      } catch {
        case e: Throwable =>
          println(s"PROBE| $q")
          println(s"  ERROR ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(160)}")
      }

    // ORDER BY on a non-projected property (legal in Cypher)
    probe("MATCH (n:P) RETURN n.name AS nm ORDER BY n.age")
    // ordered WITH + LIMIT then expand (top-k pattern)
    probe("MATCH (n:P) WITH n ORDER BY n.age DESC LIMIT 1 MATCH (n)-[:K]->(m) RETURN n.name AS a, m.name AS b ORDER BY b")
    // WITH * carries everything
    probe("MATCH (n:P {team:'y'}) WITH * RETURN n.name AS nm")
    // RETURN * after WITH of values
    probe("MATCH (n:P {team:'y'}) WITH n.name AS nm, n.age AS ag RETURN *")
    // grouping by expression
    probe("MATCH (n:P) WHERE n.age IS NOT NULL RETURN n.age % 2 AS parity, count(*) AS c ORDER BY parity")
    // aggregate with no non-aggregate keys but expression OF aggregates
    probe("MATCH (n:P) RETURN max(n.age) - min(n.age) AS spread")
    // aggregates in WHERE should error
    probe("MATCH (n:P) WHERE count(*) > 1 RETURN n.name")
    // nested aggregate should error
    probe("MATCH (n:P) RETURN max(count(n)) AS x")
    // collect DISTINCT sorted
    probe("MATCH (n:P)-[:K]->(m) RETURN n.name AS nm, [x IN collect(DISTINCT m.team) WHERE x IS NOT NULL | x] AS teams ORDER BY nm")
    // min/max over strings
    probe("MATCH (n:P) RETURN min(n.name) AS mn, max(n.name) AS mx")
    // sum/avg over durations
    probe("UNWIND [duration({days: 1}), duration({days: 2})] AS d RETURN sum(d) AS s, avg(d) AS a")
    // min/max over dates
    probe("UNWIND [date('2024-01-01'), date('2023-05-05')] AS d RETURN min(d) AS mn, max(d) AS mx")
    // percentile boundaries
    probe("MATCH (n:P) WHERE n.age IS NOT NULL RETURN percentileDisc(n.age, 0.0) AS lo, percentileDisc(n.age, 1.0) AS hi")
    // count(*) vs count(prop) over nulls
    probe("MATCH (n:P) RETURN count(*) AS all, count(n.age) AS aged")
    // DISTINCT whole node then count
    probe("MATCH (n:P)-[:K]->() WITH DISTINCT n RETURN count(*) AS c")
    // grouped OPTIONAL nulls
    probe("MATCH (n:P) OPTIONAL MATCH (n)-[:K]->(m) RETURN n.name AS nm, count(m) AS c ORDER BY nm")
    // SKIP expression + param-free
    probe("MATCH (n:P) RETURN n.name AS nm ORDER BY nm SKIP 1 + 1")
    // stdev single row -> 0 or null?
    probe("UNWIND [5] AS x RETURN stDev(x) AS s, stDevP(x) AS p")
    // avg integer stays double
    probe("UNWIND [1, 2] AS x RETURN avg(x) AS a")
    // unwind empty list kills row
    probe("UNWIND [] AS x RETURN count(*) AS c")
    // unwind null kills row
    probe("UNWIND null AS x RETURN count(*) AS c")
    // WITH aggregate then HAVING-style filter then second aggregate
    probe("MATCH (n:P) WITH n.team AS t, count(*) AS c WHERE c > 1 RETURN count(*) AS teams")
    // ORDER BY inside WITH with alias shadowing outer name
    probe("MATCH (n:P) WITH n.name AS name, n.age AS age ORDER BY age DESC LIMIT 2 RETURN name ORDER BY name")
    // expression over a grouping alias in the same RETURN
    probe("MATCH (n:P) WHERE n.age IS NOT NULL RETURN n.team AS t, sum(n.age) AS s, sum(n.age) / count(*) AS mean ORDER BY t")
    spark.stop()
  }
}
