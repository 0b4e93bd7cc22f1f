package graft
import org.apache.spark.sql.SparkSession
import graft.api.GraftSession
import graft.sources.TpchGraph
object Probe34Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gs = GraftSession(spark)
    val g = TpchGraph.load(spark, "/root/testdata/sf0.001")
    val q13 = gs.cypher(g,
      """MATCH (c:Customer)-[:IN_NATION|IN_REGION*1..2]->(x)
        |RETURN c.c_custkey AS ck, coalesce(x.n_name, x.r_name) AS xname""".stripMargin)
    val files13 = "(\\w+)\\.parquet".r.findAllMatchIn(
      q13.queryExecution.executedPlan.toString).map(_.group(1)).toSet
    println(s"c13 files: ${files13.toSeq.sorted.mkString(",")}  rows=${q13.count()}")
    val q31 = gs.cypher(g,
      """MATCH p = (c:Customer)-[:IN_NATION|IN_REGION*1..2]->(x)
        |RETURN c.c_custkey AS ck, length(p) AS len,
        |       reduce(s = '', x IN [n IN nodes(p) |
        |                coalesce(n.n_name, n.r_name, n.c_name)] |
        |              s + '|' + x) AS names""".stripMargin)
    val files31 = "(\\w+)\\.parquet".r.findAllMatchIn(
      q31.queryExecution.executedPlan.toString).map(_.group(1)).toSet
    println(s"c31 files: ${files31.toSeq.sorted.mkString(",")}  rows=${q31.count()}")
    spark.stop()
  }
}
