package graft

import org.apache.spark.sql.SparkSession

/** Round-9 probe 2: plan shape of CONSTRUCT-derived queries under the
  * deterministic fresh-id scheme — is the rowkey window exchange reused
  * across derived tables, and do CLONE tables prune the window away? */
object R9Probe2Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gs = graft.api.GraftSession(spark)
    val g = graft.sources.TpchGraph.load(spark, "/root/testdata/sf0.001")
    val derived = gs.cypherGraph(g,
      """MATCH (c:Customer)-[:PLACED]->(o:Order)
        |CONSTRUCT NEW (c)-[:HAS_ORDER {price: o.o_totalprice}]->(o)
        |RETURN GRAPH""".stripMargin)
    val res = gs.cypher(derived,
      """MATCH (c:Customer)-[h:HAS_ORDER]->(:Order)
        |RETURN c.c_custkey AS ck, count(*) AS n, min(h.price) AS lo
        |ORDER BY ck""".stripMargin)
    val plan = res.queryExecution.executedPlan.toString
    println("== c21-shape physical plan stats ==")
    println("Exchange count:        " + "(?m)^\\s*[+:]?-? ?Exchange".r.findAllIn(plan).size)
    println("ReusedExchange count:  " + "ReusedExchange".r.findAllIn(plan).size)
    println("Window count:          " + "\\bWindow\\b".r.findAllIn(plan).size)
    println("Checkpoint/RDDScan:    " + "Scan ExistingRDD".r.findAllIn(plan).size)
    res.collect()
    // after execution AQE has finalized: recount
    val planAfter = res.queryExecution.executedPlan.toString
    println("-- after execution (AQE final) --")
    println("ReusedExchange count:  " + "ReusedExchange".r.findAllIn(planAfter).size)
    println("Window count:          " + "\\bWindow\\b".r.findAllIn(planAfter).size)
    println(planAfter.linesIterator.take(80).mkString("\n"))
    spark.stop()
  }
}
