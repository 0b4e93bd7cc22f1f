package graft

import org.apache.spark.sql.SparkSession

/** Probe: does the reliable-checkpoint knob actually write rdd-* dirs? */
object CkptProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val gs = graft.api.GraftSession(spark)
    val g = gs.createGraphFromCypher(
      "CREATE (a:N {v: 1})-[:R]->(b:N {v: 2})-[:R]->(c:N {v: 3})")
    val q = "MATCH (a:N {v: 1})-[rs*1..50]->(b) RETURN b.v AS v"
    println("base rows: " + gs.cypher(g, q).collect().mkString(","))
    spark.conf.set(graft.plans.Planner.CheckpointDirKey, dir)
    println("conf read-back: " +
      spark.conf.getOption(graft.plans.Planner.CheckpointDirKey))
    val rows = gs.cypher(g, q).collect()
    println("rows: " + rows.mkString(","))
    println("sc checkpoint dir: " + spark.sparkContext.getCheckpointDir)
    def walk(p: java.io.File): Unit =
      Option(p.listFiles()).toSeq.flatten.foreach { f =>
        println("  " + f); if (f.isDirectory) walk(f)
      }
    walk(new java.io.File(dir))
    spark.stop()
    def rm(p: java.io.File): Unit = {
      Option(p.listFiles()).toSeq.flatten.foreach(rm); p.delete()
    }
    rm(new java.io.File(dir))
  }
}
