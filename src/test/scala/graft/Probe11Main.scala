package graft

import org.apache.spark.sql.SparkSession

import graft.api.GraftSession

/** Scratch semantics prober batch 11: grouping by entities, parameters in
  * every position, duration arithmetic, error shapes.
  */
object Probe11Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gs = GraftSession(spark)
    val g = gs.createGraphFromCypher(
      """CREATE (a:P {name: 'Ann', age: 30}), (b:P {name: 'Bob', age: 25}),
        |(a)-[:K {w: 1}]->(b), (a)-[:K {w: 2}]->(b)""".stripMargin)
    def run(q: String, params: Map[String, Any] = Map.empty): Unit = {
      try {
        val df = gs.cypher(g, q, params)
        val rows = df.collect().map(_.toString).mkString(" | ")
        println(s"PROBE11 OK   ${q.replace('\n', ' ')}\n  => $rows")
      } catch {
        case e: Throwable =>
          println(s"PROBE11 FAIL ${q.replace('\n', ' ')}\n  => ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(180)}")
      }
    }
    // grouping by entity variables
    run("MATCH (n:P)-[r:K]->() RETURN n, count(r) AS c")
    run("MATCH (n:P)-[r:K]->() RETURN n.name AS nm, count(r) AS c ORDER BY nm")
    run("MATCH (n:P)-[r:K]->(m) RETURN n, m, count(r) AS c")
    run("MATCH (n:P) WITH n, count(*) AS c RETURN n.name AS nm, c ORDER BY nm")
    // parameters in every position
    run("RETURN $x AS v", Map("x" -> 42L))
    run("MATCH (n:P) WHERE n.age > $min RETURN n.name AS nm", Map("min" -> 26L))
    run("MATCH (n:P {name: $nm}) RETURN n.age AS a", Map("nm" -> "Ann"))
    run("MATCH (n:P) RETURN n.name AS nm ORDER BY nm SKIP $s LIMIT $l",
      Map("s" -> 1L, "l" -> 1L))
    run("UNWIND $xs AS x RETURN x * 2 AS d", Map("xs" -> Seq(1L, 2L, 3L)))
    run("RETURN $m.a AS a, $m['b'] AS b", Map("m" -> Map("a" -> 1L, "b" -> 2L)))
    run("MATCH (n:P) WHERE n.name IN $names RETURN count(*) AS c",
      Map("names" -> Seq("Ann", "Zed")))
    run("MATCH (n:P) WHERE n.name STARTS WITH $p RETURN n.name AS nm", Map("p" -> "A"))
    run("RETURN $null_param AS v", Map("null_param" -> null))
    // duration arithmetic
    run("RETURN duration({days: 1}) + duration({hours: 6}) AS s, duration({days: 1}) - duration({hours: 6}) AS d")
    run("RETURN duration({hours: 6}) * 4 AS m, duration({hours: 6}) / 2 AS dv")
    run("RETURN -duration({hours: 3}) AS neg")
    run("RETURN duration({hours: 26}) > duration({days: 1}) AS gt")
    run("RETURN localdatetime('2020-01-01T00:00:00') + duration({hours: 36}) AS t")
    run("RETURN duration({seconds: 90}).seconds AS s, duration({days: 40}).days AS d")
    // error shapes / graceful nulls
    run("RETURN toInteger([1]) AS bad") // type error or null?
    run("MATCH (n:P) RETURN n.age + n.name AS mixed ORDER BY mixed") // num + string
    run("RETURN 1 + null AS np, null * 2 AS nm2, null + 'x' AS ns")
    spark.stop()
  }
}
