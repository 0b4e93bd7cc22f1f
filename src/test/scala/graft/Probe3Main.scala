package graft

import org.apache.spark.sql.SparkSession

import graft.api.GraftSession

/** Scratch prober #3: syntax/semantics dark corners. */
object Probe3Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gs = GraftSession(spark)
    val g = gs.createGraphFromCypher(
      """CREATE (a:P {name: 'Ann', age: 30}), (b:P:Q {name: 'Bob', age: 20}),
        |(c:R {name: 'Cid'}), (a)-[:K {w: 1}]->(b), (b)-[:K {w: 2}]->(c)""".stripMargin)
    def probe(q: String, params: Map[String, Any] = Map.empty): Unit =
      try {
        val df = gs.cypher(g, q, params)
        val rows = df.collect().take(6)
        println(s"PROBE| $q")
        rows.foreach(r => println(s"  ROW $r"))
      } catch {
        case e: Throwable =>
          println(s"PROBE| $q")
          println(s"  ERROR ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(160)}")
      }

    // chained comparisons = pairwise conjunction in openCypher
    probe("RETURN 1 < 2 < 3 AS x")
    probe("RETURN 3 > 2 > 1 AS x")
    probe("RETURN 1 < 2 > 3 AS x")
    // XOR
    probe("RETURN true XOR false AS a, true XOR true AS b, true XOR null AS c")
    // label predicate in WHERE (conjunction and negation)
    probe("MATCH (n) WHERE n:P:Q RETURN n.name")
    probe("MATCH (n) WHERE NOT n:P RETURN n.name")
    probe("MATCH (n) WHERE n:P OR n:R RETURN count(*) AS c")
    // full EXISTS subquery with WHERE
    probe("MATCH (n:P) WHERE EXISTS { MATCH (n)-[:K]->(m) WHERE m.age < 25 } RETURN n.name")
    // parameters in LIMIT / SKIP / IN / property
    probe("MATCH (n) RETURN n.name AS nm ORDER BY nm LIMIT $lim", Map("lim" -> 2))
    probe("MATCH (n) WHERE n.name IN $names RETURN count(*) AS c", Map("names" -> Seq("Ann", "Cid")))
    probe("MATCH (n {age: $m.age}) RETURN n.name", Map("m" -> Map("age" -> 30)))
    // UNION distinct
    probe("MATCH (n:P) RETURN n.name AS nm UNION MATCH (m) WHERE m.name = 'Ann' RETURN m.name AS nm")
    // null ordering: ASC puts null last, DESC first (Cypher: null is largest)
    probe("MATCH (n) RETURN n.age AS a ORDER BY a")
    probe("MATCH (n) RETURN n.age AS a ORDER BY a DESC")
    // string escapes
    probe("RETURN 'it\\'s' AS a, \"q\\\"q\" AS b, 'tab\\tx' AS c")
    // searched CASE without ELSE -> null
    probe("RETURN CASE WHEN false THEN 1 END AS x")
    // negative / expression LIMIT
    probe("MATCH (n) RETURN n.name LIMIT -1")
    probe("MATCH (n) RETURN n.name ORDER BY n.name LIMIT 1 + 1")
    // integer overflow literal
    probe("RETURN 9223372036854775808 AS x")
    // whole-element return shapes
    probe("MATCH (a:P {name:'Ann'})-[r:K]->(b) RETURN a, r, b")
    // map projection variants
    probe("MATCH (n:P {name:'Ann'}) RETURN n {.name, .age, extra: 1} AS m")
    probe("MATCH (n:P {name:'Ann'}) RETURN n {.*} AS m")
    // DISTINCT + ORDER BY + SKIP/LIMIT pipeline
    probe("MATCH (n) WITH DISTINCT n.age AS a ORDER BY a SKIP 1 LIMIT 1 RETURN a")
    // aggregation grouped by whole node
    probe("MATCH (a)-[r:K]->() RETURN a.name AS nm, count(r) AS c ORDER BY nm")
    // exists() inside CASE
    probe("MATCH (n) RETURN CASE WHEN n.age IS NOT NULL THEN n.age ELSE -1 END AS x ORDER BY x")
    // startNode/endNode round-trip property
    probe("MATCH ()-[r:K {w: 1}]->() RETURN startNode(r).name AS s, endNode(r).name AS e")
    // nested list index chains
    probe("RETURN [[1,2],[3,4]][1][0] AS x")
    // unicode + special chars in identifiers (backticks)
    probe("MATCH (n:P {name:'Ann'}) RETURN n.age AS `my col`")
    // WHERE with pattern + property predicate conjunction
    probe("MATCH (n:P) WHERE (n)-[:K]->(:Q) AND n.age > 10 RETURN n.name")
    // timestamp()/randomUUID-style volatile fns
    probe("RETURN timestamp() > 0 AS x")
    // string comparison in predicates over mixed null
    probe("MATCH (n) WHERE n.name STARTS WITH 'A' OR n.age > 25 RETURN n.name ORDER BY n.name")
    spark.stop()
  }
}
