package graft
import org.apache.spark.sql.SparkSession
import graft.api.GraftSession
object ProbeAbsTypeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gs = GraftSession(spark)
    val g = gs.createGraphFromCypher(
      """CREATE (v0:A {f: 3.0, s: 'a', uid: 0})
        |CREATE (v1:A:B {b: false, f: 2.0, k: 2, s: 'd', uid: 1})
        |CREATE (v2:A {uid: 2})
        |CREATE (v1)-[:S {uid: 1005, w: 0}]->(v2)
        |""".stripMargin)
    def sch(name: String, q: String): Unit =
      try { val df = gs.cypher(g, q)
        println(s"$name: ${df.schema.map(f => f.name + ":" + f.dataType.simpleString).mkString(",")} rows=" +
          df.collect().toList.map(_.toSeq.mkString("|")))
      } catch { case e: Throwable => println(s"$name: ERROR ${e.getMessage.take(120)}") }
    sch("k", "MATCH (n) RETURN n.k AS x ORDER BY x")
    sch("absK", "MATCH (n) RETURN abs(n.k) AS x ORDER BY x")
    sch("signK", "MATCH (n) RETURN sign(n.k) AS x ORDER BY x")
    sch("absKPattern", "MATCH (n504)<-[:S]-(n506:A) RETURN abs(n504.k) AS x")
    spark.stop()
  }
}
