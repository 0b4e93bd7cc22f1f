package graft

import org.apache.spark.sql.SparkSession

/** Round-8 probe batch 5: catalog/view shapes mined from the reference's
  * CatalogDDLTests (nested views with CLONE + COPY OF, graph/view name
  * coexistence, idempotent drops). */
object R8Probe5Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gs = graft.api.GraftSession(spark)
    val ga = gs.createGraphFromCypher(
      "CREATE ({name: 'A1'}) CREATE ({name: 'A2'})")
    val gb = gs.createGraphFromCypher(
      "CREATE ({name: 'B1'}) CREATE ({name: 'B2'})")
    gs.register("a", ga); gs.register("b", gb)
    def run(name: String, q: String): Unit =
      try {
        val rows = gs.cypherStatement(q, Map.empty).collect()
        println(s"OK   $name -> ${rows.take(6).mkString(";")}")
      } catch { case e: Throwable =>
        println(s"FAIL $name -> ${e.getClass.getSimpleName}: " +
          Option(e.getMessage).getOrElse("").linesIterator.take(2).mkString(" "))
      }

    run("create-view-clone-copyof",
      """CATALOG CREATE VIEW bar($g1, $g2) {
        | FROM GRAPH $g1
        | MATCH (n)
        | FROM GRAPH $g2
        | MATCH (m)
        | CONSTRUCT
        |   CLONE n AS n
        |   CREATE (COPY OF m)
        | RETURN GRAPH
        |}""".stripMargin)
    run("flat-view-count",
      "FROM GRAPH bar(a, b) MATCH (x) RETURN count(*) AS c")
    run("nested-view-42",
      "FROM GRAPH bar(bar(b, a), bar(a, b)) MATCH (x) RETURN count(*) AS c")
    // graph and view under the SAME name coexist: bare name = graph,
    // invocation = view
    run("create-view-named-a",
      "CATALOG CREATE VIEW a { FROM GRAPH b RETURN GRAPH }")
    run("bare-name-resolves-graph",
      "FROM GRAPH a MATCH (x) RETURN x.name AS n ORDER BY n")
    run("invocation-resolves-view",
      "FROM GRAPH a() MATCH (x) RETURN x.name AS n ORDER BY n")
    run("drop-view-a", "CATALOG DROP VIEW a")
    run("graph-a-survives-view-drop",
      "FROM GRAPH a MATCH (x) RETURN count(*) AS c")
    run("drop-view-idempotent", "CATALOG DROP VIEW a")

    spark.stop()
  }
}
