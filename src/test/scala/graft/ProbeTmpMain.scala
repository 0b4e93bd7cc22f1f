package graft
import org.apache.spark.sql.SparkSession
import graft.api.GraftSession
import graft.sources.TpchGraph
object ProbeTmpMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gs = GraftSession(spark)
    val g = TpchGraph.load(spark, "/root/testdata/sf0.001")
    val df = gs.cypher(g, "MATCH (:Order)-[li:CONTAINS]->() RETURN li.l_shipdate AS d LIMIT 1")
    println("shipdate type: " + df.schema.head.dataType)
    val df2 = gs.cypher(g, "RETURN localdatetime('2000-01-01T00:00:00') AS x, date('2000-01-01') AS y")
    println("literal types: " + df2.schema.map(_.dataType).mkString(", "))
    println("raw read: " + spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").schema("l_shipdate").dataType)
    spark.stop()
  }
}
