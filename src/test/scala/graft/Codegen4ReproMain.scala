package graft

import org.apache.spark.sql.SparkSession
import graft.api.GraftSession

/** repro for differential hunt 32296: r1_inner unresolved on an optional
  * named path whose var-length hop chain ends on a bound cyclic var. */
object Codegen4ReproMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gs = GraftSession(spark)
    val g = gs.createGraphFromCypher(
      """CREATE (v0:A:B {k: 1, uid: 0})
        |CREATE (v2:A:B {k: 3, s: 'c', uid: 2})
        |CREATE (v4:B {s: 'ab', uid: 4})
        |CREATE (v0)-[:T {uid: 1000, w: 4}]->(v2)
        |CREATE (v2)-[:S {uid: 1007, w: 1}]->(v4)
        |CREATE (v2)-[:S {uid: 1008, w: 9}]->(v2)""".stripMargin)
    val variants = Seq(
      // the hunt shape
      """OPTIONAL MATCH pth4 = (n0)<-[r1:S*1..1]-(n2 {k: 3})-[*1..1]->(n2:A)
        |UNWIND [0, 5, 0] AS u1
        |RETURN coalesce(length(pth4), size(r1)) AS g0, sum(DISTINCT n0.k) AS a0
        |ORDER BY a0 ASC""".stripMargin,
      // non-optional
      """MATCH pth4 = (n0)<-[r1:S*1..1]-(n2 {k: 3})-[*1..1]->(n2:A)
        |RETURN length(pth4) AS l, size(r1) AS s""".stripMargin,
      // non-cyclic terminal
      """OPTIONAL MATCH pth4 = (n0)<-[r1:S*1..1]-(n2 {k: 3})-[*1..1]->(n3)
        |RETURN coalesce(length(pth4), size(r1)) AS g0""".stripMargin,
      // optional + cyclic + simple return
      """OPTIONAL MATCH pth4 = (n0)<-[r1:S*1..1]-(n2 {k: 3})-[*1..1]->(n2:A)
        |RETURN length(pth4) AS l, size(r1) AS s""".stripMargin,
      // optional + cyclic + unwind, no agg
      """OPTIONAL MATCH pth4 = (n0)<-[r1:S*1..1]-(n2 {k: 3})-[*1..1]->(n2:A)
        |UNWIND [0, 5] AS u1
        |RETURN length(pth4) AS l""".stripMargin,
      // single var-length hop
      """OPTIONAL MATCH pth4 = (n0)<-[r1:S*1..1]-(n2 {k: 3})
        |UNWIND [0, 5] AS u1
        |RETURN coalesce(length(pth4), size(r1)) AS g0""".stripMargin)
    variants.foreach { q =>
      print(q.replace('\n', ' ').take(100) + "  ==>  ")
      try println(gs.cypher(g, q).collect().map(_.toString).mkString("; "))
      catch { case e: Throwable =>
        println(s"ERROR ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}")
      }
    }
    spark.stop()
  }
}
