package graft

import org.apache.spark.sql.SparkSession
import graft.api.GraftSession

/** Probe batch 51: WHERE-after-WITH scope, ORDER BY over maps/entities in
  * lists, UNION trailing order, and WITH-WHERE pattern predicates. Neo4j
  * reference: WHERE after WITH sees ONLY the projected scope (unlike
  * ORDER BY, which sees the input scope for plain projections). */
object Probe51Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gs = GraftSession(spark)
    val create =
      """CREATE (a:A {uid: 0, k: 2})
        |CREATE (b:A {uid: 1, k: 1})
        |CREATE (c:A {uid: 2, k: 1})
        |CREATE (a)-[:R {w: 5}]->(b)
        |CREATE (b)-[:R {w: 7}]->(c)
        |""".stripMargin
    def run(q: String): Unit = {
      print(q.replace('\n', ' ').take(118) + "  ==>  ")
      try {
        val g = gs.createGraphFromCypher(create)
        println(gs.cypher(g, q).collect().map(_.toString).mkString("; "))
      } catch { case e: Throwable =>
        println(s"ERROR ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(130)}")
      }
    }
    // 1. WHERE after WITH referencing an UNPROJECTED var (Neo4j: error)
    run("MATCH (n:A) WITH n.k AS x WHERE n.uid > 0 RETURN x")
    // 2. WHERE after WITH on the projected alias (legal)
    run("MATCH (n:A) WITH n.k AS x WHERE x = 1 RETURN x")
    // 3. pattern predicate in WITH ... WHERE
    run("MATCH (n:A) WITH n WHERE (n)-[:R]->() RETURN n.uid AS u")
    // 4. NOT pattern predicate in WITH ... WHERE
    run("MATCH (n:A) WITH n WHERE NOT (n)-[:R]->() RETURN n.uid AS u")
    // 5. ORDER BY a map value (Neo4j: maps order key-wise)
    run("MATCH (n:A) RETURN n.uid AS u ORDER BY {a: n.k} ASC")
    // 6. ORDER BY a map property-projection
    run("MATCH (n:A) WITH n {.k} AS m ORDER BY m ASC RETURN m")
    // 7. trailing ORDER BY after UNION (Neo4j: applies to last branch only / error?)
    run("MATCH (n:A) RETURN n.k AS x UNION ALL MATCH (n:A) RETURN n.uid AS x ORDER BY x")
    // 8. ORDER BY a collected list of entities
    run("MATCH (n:A) WITH n.k AS k, collect(n) AS ns ORDER BY ns ASC RETURN k")
    // 9. aggregating WITH + WHERE on the aggregate (HAVING shape)
    run("MATCH (n:A) WITH n.k AS x, count(*) AS c WHERE c > 1 RETURN x, c")
    // 10. aggregating WITH + WHERE with an aggregate EXPRESSION (Neo4j: error)
    run("MATCH (n:A) WITH n.k AS x WHERE count(*) > 1 RETURN x")
    // 11. ORDER BY in a WITH with DISTINCT + unprojected (Neo4j: error)
    run("MATCH (n:A) WITH DISTINCT n.k AS x ORDER BY n.uid RETURN x")
    // 12. double cut: WITH ORDER BY LIMIT then RETURN ORDER BY LIMIT
    run("MATCH (n:A) WITH n ORDER BY n.uid DESC LIMIT 2 RETURN n.uid AS u ORDER BY u ASC LIMIT 1")
    // 13. SKIP/LIMIT without ORDER BY in WITH (legal, row set defined)
    run("MATCH (n:A) WITH n.k AS x LIMIT 10 RETURN count(x) AS c")
    // 14. ORDER BY rel property through a preserved rel var
    run("MATCH (a:A)-[r:R]->(b) WITH b ORDER BY r.w DESC LIMIT 1 RETURN b.uid AS u")
    spark.stop()
  }
}
