package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-10 probe: p22_graph_distances per-invocation cost breakdown
  * (graph load / landmark collect / BFS / join-back). */
object R10Probe5Main {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"P22 $label ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    // warm
    SparkEntry.queries("p22_graph_distances")(spark, "/root/testdata/sf0.001")
      .count()
    (1 to 3).foreach { rep =>
      println(s"--- rep $rep")
      val g = time("load")(graft.sources.TpchGraph.load(spark, sfDir))
      val regions = g.nodeTables.find(_.labels == Set("Region")).get
      val landmarks = time("landmarks")(
        regions.df.select(col(regions.idCol))
          .collect().map(_.getLong(0)).toSeq)
      val dists = time("bfs")(
        graft.interop.GraphXExport.shortestPathLengths(g, landmarks,
          relTypes = Set("IN_NATION", "IN_REGION")))
      println("P22 route=" + graft.interop.GraphXExport.lastBfsResolved)
      val cust = g.nodeTables.find(_.labels == Set("Customer")).get
      time("joinback+count")(
        dists.join(cust.df, dists("id") === col(cust.idCol))
          .select(col("c_custkey").as("ck"), col("dist"))
          .orderBy("ck").count())
    }
    spark.stop()
  }
}
