package graft

import org.apache.spark.sql.SparkSession
import graft.api.GraftSession

/** Probe batch 16: WITH/aggregation interactions, pattern corners. */
object Probe16Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gs = GraftSession(spark)
    val g = gs.createGraphFromCypher("""
      CREATE (a:P {n: 'a', v: 1})
      CREATE (b:P {n: 'b', v: 2})
      CREATE (c:P {n: 'c', v: 3})
      CREATE (a)-[:R {w: 1}]->(b)
      CREATE (b)-[:R {w: 2}]->(c)
      CREATE (a)-[:R {w: 9}]->(c)
    """)
    def run(q: String): Unit = {
      print(q.replaceAll("\\s+", " ").take(100) + "  ==>  ")
      try println(gs.cypher(g, q).collect().map(r =>
        r.toSeq.map(v => if (v == null) "NULL" else v.toString).mkString("(", ",", ")"))
        .mkString("[", " ", "]"))
      catch { case e: Exception => println("ERR " + e.getMessage.take(110)) }
    }
    // aggregation inside WITH then reused in WHERE and arithmetic
    run("MATCH (x:P) WITH sum(x.v) AS s, count(*) AS c WHERE s > c RETURN s, c")
    run("MATCH (x:P) WITH x.n AS n, sum(x.v) AS s ORDER BY s DESC LIMIT 2 RETURN collect(n) AS ns")
    // DISTINCT + aggregation combined
    run("MATCH (a:P)-[r:R]->() WITH DISTINCT a RETURN count(a) AS n")
    // aggregate of an aggregate should error (nested aggregation)
    run("MATCH (x:P) RETURN sum(count(x)) AS bad")
    // grouping by an entity (node) itself
    run("MATCH (a:P)-[r:R]->() RETURN a.n AS n, count(r) AS c ORDER BY n")
    run("MATCH (a:P)-[r:R]->() RETURN a, count(r) AS c ORDER BY c DESC LIMIT 1")
    // pattern reuse of the same rel variable twice (should be invalid or join)
    run("MATCH (a)-[r:R]->(b), (b)-[r:R]->(c) RETURN count(*) AS n")
    // same node var in two patterns (valid: join on it)
    run("MATCH (a:P {n:'a'})-[:R]->(x), (x)-[:R]->(y) RETURN x.n AS xn, y.n AS yn")
    // zero-hop plus predicate on rel list
    run("MATCH (a:P {n:'a'})-[rs:R*0..2]->(x) RETURN x.n AS n, size(rs) AS h ORDER BY n, h")
    // var-length with per-step property AND where on last node
    run("MATCH (a:P {n:'a'})-[rs:R*1..2 {w: 1}]->(x) WHERE x.v > 1 RETURN x.n AS n")
    // OPTIONAL MATCH with pattern already fully bound
    run("MATCH (a:P {n:'a'})-[:R]->(b {n:'b'}) OPTIONAL MATCH (a)-[:R]->(b) RETURN count(*) AS n")
    // WITH list then UNWIND then re-aggregate
    run("MATCH (x:P) WITH collect(x.v) AS vs UNWIND vs AS v WITH v WHERE v > 1 RETURN sum(v) AS s")
    // exists() on property vs pattern
    run("MATCH (x:P) WHERE exists(x.v) RETURN count(*) AS n")
    // path in WHERE
    run("MATCH (a:P {n:'a'}) WHERE exists((a)-[:R]->({n:'c'})) RETURN a.n AS n")
    // count(DISTINCT a, b)? multi-arg count
    run("MATCH (a:P)-[:R]->(b) RETURN count(DISTINCT b.n) AS n")
    // ORDER BY on expression over aggregate alias
    run("MATCH (a:P)-[r:R]->() RETURN a.n AS n, sum(r.w) AS s ORDER BY s + 1 DESC")
    // parameters in var-length bounds? (static ints only)
    run("WITH 2 AS k MATCH (a:P {n:'a'})-[:R*1..2]->(x) RETURN count(x) AS n")
    // labels() on rel / type() on node should error gracefully
    run("MATCH (a:P)-[r:R]->() RETURN labels(r) AS bad LIMIT 1")
    run("MATCH (a:P) RETURN type(a) AS bad LIMIT 1")
    // string concatenation of list
    run("RETURN toString([1,2]) AS s")
    spark.stop()
  }
}
