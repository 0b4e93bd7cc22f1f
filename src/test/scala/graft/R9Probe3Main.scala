package graft

import org.apache.spark.sql.SparkSession

/** Round-9 probe 3: c38-shape (COPY OF) plan — fresh ids are join keys,
  * so the rowkey window must run; is its exchange reused across the
  * three derived-table legs? */
object R9Probe3Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gs = graft.api.GraftSession(spark)
    val g = graft.sources.TpchGraph.load(spark, "/root/testdata/sf0.001")
    val res = gs.cypher(g,
      """MATCH (n:Nation)-[:IN_REGION]->(r:Region)
        |WITH n, r, n.n_nationkey * 10 AS score
        |CONSTRUCT CREATE (cn COPY OF n)-[:IN_COPY {s: score}]->(cr COPY OF r)
        |MATCH (n2:Nation)-[e:IN_COPY]->(r2:Region)
        |RETURN n2.n_name AS nn, r2.r_name AS rn, e.s AS s
        |ORDER BY nn""".stripMargin)
    res.collect()
    val plan = res.queryExecution.executedPlan.toString
    println("== c38-shape AQE-final plan stats ==")
    println("rows: " + res.count())
    println("Exchange:       " + "(?m)Exchange hashpartitioning".r.findAllIn(plan).size)
    println("ReusedExchange: " + "ReusedExchange".r.findAllIn(plan).size)
    println("Window:         " + "\\bWindow\\b".r.findAllIn(plan).size)
    println(plan.linesIterator.filter(l =>
      l.contains("Window") || l.contains("ReusedExchange") ||
      l.contains("Exchange hashpartitioning")).mkString("\n"))
    spark.stop()
  }
}
