package graft

import org.apache.spark.sql.SparkSession

import graft.api.GraftSession

/** Scratch prober #7: entity-valued collect, uncorrelated pattern
  * predicates/comprehensions. */
object Probe7Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gs = GraftSession(spark)
    val g = gs.createGraphFromCypher(
      """CREATE (a:P {name: 'Ann', age: 30}),
        |(b:P {name: 'Bob', age: 20}),
        |(c:Q {name: 'Cid'}),
        |(a)-[:K {w: 1}]->(b), (b)-[:K {w: 2}]->(c)""".stripMargin)
    def probe(q: String): Unit =
      try {
        val df = gs.cypher(g, q)
        println(s"PROBE| $q")
        df.collect().take(6).foreach(r => println(s"  ROW $r"))
      } catch {
        case e: Throwable =>
          println(s"PROBE| $q")
          println(s"  ERROR ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(140)}")
      }

    probe("MATCH (n:P) WITH collect(n) AS ns UNWIND ns AS x RETURN x.name AS nm, x.age AS ag ORDER BY nm")
    probe("MATCH (n:P) WITH collect(n) AS ns UNWIND ns AS x RETURN labels(x) AS ls, id(x) IS NOT NULL AS hasId ORDER BY ls[0]")
    probe("MATCH ()-[r:K]->() WITH collect(r) AS rs UNWIND rs AS x RETURN type(x) AS t, x.w AS w ORDER BY w")
    probe("MATCH (n:P) RETURN collect(n.name) AS names") // plain value collect unchanged
    probe("MATCH (n:P) OPTIONAL MATCH (n)-[:K]->(m:Q) RETURN count(collect(m)) AS bad") // nested → error
    probe("MATCH (n:P) OPTIONAL MATCH (n)-[:K]->(m:Q) WITH n, collect(m) AS ms RETURN n.name AS nm, size(ms) AS c ORDER BY nm") // null skipped
    probe("RETURN exists((:P {name:'Ann'})-[:K]->()) AS e")
    probe("RETURN exists((:P {name:'Zed'})-[:K]->()) AS e")
    probe("MATCH (n:Q) WHERE (:P {name:'Ann'})-[:K]->() RETURN n.name AS nm")
    probe("MATCH (n:Q) WHERE NOT (:P {name:'Zed'})-[:K]->() RETURN n.name AS nm")
    probe("RETURN [(p:P)-[:K]->(q) | q.name] AS names")
    probe("RETURN size([(p:P)-[:K]->() | 1]) AS deg")
    probe("MATCH (n:P) WITH collect(DISTINCT n) AS ns RETURN size(ns) AS c")
    spark.stop()
  }
}
