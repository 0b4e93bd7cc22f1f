package graft
import org.apache.spark.sql.SparkSession
import graft.api.GraftSession
import graft.sources.TpchGraph
object Probe34bMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gs = GraftSession(spark)
    val g = TpchGraph.load(spark, "/root/testdata/sf0.001")
    println("patterns: " + g.schemaPatterns.mkString("; "))
    println("dstCombos: " + g.reachableDstCombos(Set("IN_NATION", "IN_REGION")))
    val q = gs.cypher(g,
      """MATCH (c:Customer)-[:IN_NATION]->(x)
        |RETURN c.c_custkey AS ck, x.n_name AS xname""".stripMargin)
    val files = "(\\w+)\\.parquet".r.findAllMatchIn(
      q.queryExecution.executedPlan.toString).map(_.group(1)).toSet
    println(s"one-hop files: ${files.toSeq.sorted.mkString(",")}")
    spark.stop()
  }
}
