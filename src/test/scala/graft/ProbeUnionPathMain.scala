package graft
import org.apache.spark.sql.SparkSession
import graft.api.GraftSession
object ProbeUnionPathMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gs = GraftSession(spark)
    val g = gs.createGraphFromCypher(
      """CREATE (a:A {k: 1, s: 'x'})
        |CREATE (b:A {k: 2})
        |CREATE (c:B {k: 1})
        |CREATE (a)-[:T]->(b)
        |CREATE (b)-[:T]->(c)
        |CREATE (c)-[:S]->(a)
        |""".stripMargin)
    def show(name: String, q: String): Unit =
      try {
        val df = gs.cypher(g, q)
        println(s"$name: [${df.schema.map(_.dataType.simpleString).mkString(",")}] " +
          df.collect().toList.map(_.toSeq.map(v => if (v == null) "null" else v.toString).mkString("|")))
      } catch { case e: Throwable =>
        println(s"$name: ERROR ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(160)}") }
    show("unionAll", "MATCH (n:A) RETURN n.k AS x UNION ALL MATCH (n:B) RETURN n.k AS x")
    show("unionDedup", "MATCH (n:A) RETURN n.k AS x UNION MATCH (n:B) RETURN n.k AS x")
    show("unionDedupWithin", "MATCH (n) RETURN 1 AS x UNION MATCH (n:B) RETURN 2 AS x")
    show("unionMixedFam", "MATCH (n:A) RETURN n.k AS x UNION ALL MATCH (n:A) RETURN n.s AS x")
    show("unionNullCol", "MATCH (n:A) RETURN n.missing AS x UNION ALL MATCH (n:B) RETURN n.k AS x")
    show("unionLongDouble", "RETURN 1 AS x UNION ALL RETURN 1.5 AS x")
    show("unionLongDoubleDedup", "RETURN 1 AS x UNION RETURN 1.0 AS x")
    show("pathLen1", "MATCH p = (a:A {k:1})-[:T]->(b) RETURN length(p) AS l")
    show("pathLenVar", "MATCH p = (a:A {k:1})-[:T*1..2]->(b) RETURN length(p) AS l ORDER BY l")
    show("pathLenZero", "MATCH p = (a:A {k:1})-[:T*0..1]->(b) RETURN length(p) AS l ORDER BY l")
    show("pathLenTwoHop", "MATCH p = (a:A {k:1})-[:T]->(b)-[:T]->(c) RETURN length(p) AS l")
    show("pathNodesSize", "MATCH p = (a:A {k:1})-[:T]->(b) RETURN size(nodes(p)) AS n, size(relationships(p)) AS r")
    show("pathUndirected", "MATCH p = (a:A {k:1})-[:T]-(b) RETURN length(p) AS l")
    spark.stop()
  }
}
