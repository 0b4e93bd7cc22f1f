package graft
import org.apache.spark.sql.SparkSession
object R9P22Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    for (route <- Seq("auto", "auto", "graphx", "sql")) {
      spark.conf.set("graft.bfs.route", route)
      val t0 = System.nanoTime()
      val n = PipelineQueries.queries("p22_graph_distances")(spark, dir).count()
      println(f"route=$route resolved=${graft.interop.GraphXExport.lastBfsResolved} ${(System.nanoTime()-t0)/1e9}%.3f s rows=$n")
    }
    spark.stop()
  }
}
