package graft

import org.apache.spark.sql.SparkSession

/** Round-7 probe: engine support for the widened differential surfaces —
  * EXISTS inside CASE, identity views, FROM GRAPH over unions, driving
  * tables with null columns. */
object R7ProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gs = graft.api.GraftSession(spark)
    val g = gs.createGraphFromCypher(
      """CREATE (a:A {k: 1, s: 'x'})-[:T {w: 1}]->(b:B {k: 2})
        |CREATE (c:A {k: 3})""".stripMargin)
    def run(name: String, q: String): Unit =
      try {
        val rows = gs.cypher(g, q).collect()
        println(s"OK   $name -> ${rows.mkString(";")}")
      } catch { case e: Throwable =>
        println(s"FAIL $name -> ${e.getClass.getSimpleName}: " +
          Option(e.getMessage).getOrElse("").linesIterator.take(2).mkString(" "))
      }
    def runS(name: String, q: String): Unit =
      try {
        val rows = gs.cypher(q).collect()
        println(s"OK   $name -> ${rows.mkString(";")}")
      } catch { case e: Throwable =>
        println(s"FAIL $name -> ${e.getClass.getSimpleName}: " +
          Option(e.getMessage).getOrElse("").linesIterator.take(2).mkString(" "))
      }

    run("case-exists-block-return",
      "MATCH (n:A) RETURN (CASE WHEN EXISTS { MATCH (n)-[:T]->() } THEN 1 ELSE 0 END) AS x, n.k AS k")
    run("case-exists-pattern-return",
      "MATCH (n:A) RETURN (CASE WHEN (n)-[:T]->(:B) THEN 1 ELSE 0 END) AS x, n.k AS k")
    run("case-exists-in-where",
      "MATCH (n:A) WHERE (CASE WHEN EXISTS { MATCH (n)-[:T]->() } THEN true ELSE false END) RETURN n.k AS k")
    run("case-exists-in-with",
      "MATCH (n:A) WITH (CASE WHEN (n)-[:T]->() THEN n.k ELSE -1 END) AS x RETURN x")
    run("nested-optional",
      """MATCH (n:A) OPTIONAL MATCH (n)-[:T]->(m:B)
        |OPTIONAL MATCH (m)-[:T]->(z) RETURN n.k AS k, m.k AS mk, z.k AS zk""".stripMargin)

    gs.register("pg7", g)
    runS("from-graph", "FROM GRAPH pg7 MATCH (n:A) RETURN n.k AS k")
    gs.cypher("CATALOG CREATE VIEW idview7($g) { FROM $g RETURN GRAPH }")
    runS("from-identity-view",
      "FROM GRAPH idview7(pg7) MATCH (n:A) RETURN n.k AS k")
    runS("from-graph-union",
      """FROM GRAPH pg7 MATCH (n:A) RETURN n.k AS k
        |UNION ALL MATCH (n:B) RETURN n.k AS k""".stripMargin)
    runS("from-view-construct",
      """FROM GRAPH idview7(pg7)
        |MATCH (a:A)-[r:T]->(b) CONSTRUCT CLONE a, r, b
        |MATCH (x:A) RETURN x.k AS k""".stripMargin)

    // driving table with a null column value
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("d0", LongType, nullable = true),
      StructField("d1", StringType, nullable = true)))
    val ddf = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      org.apache.spark.sql.Row(1L, "x"), org.apache.spark.sql.Row(null, "y"),
      org.apache.spark.sql.Row(3L, null)), 2), schema)
    try {
      val rows = gs.cypher(g,
        "MATCH (n:A) WHERE n.k = d0 RETURN n.k AS k, d1 AS s",
        Map.empty, ddf).collect()
      println(s"OK   driving -> ${rows.mkString(";")}")
    } catch { case e: Throwable =>
      println(s"FAIL driving -> ${e.getClass.getSimpleName}: " +
        Option(e.getMessage).getOrElse("").linesIterator.take(2).mkString(" "))
    }
    // parser: positioned errors instead of raw throws
    runS("parse-int-overflow", "RETURN 99999999999999999999999 AS x")
    runS("parse-union-mix",
      "RETURN 1 AS x UNION RETURN 2 AS x UNION ALL RETURN 3 AS x")
    spark.stop()
  }
}
