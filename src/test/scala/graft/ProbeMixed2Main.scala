package graft
import org.apache.spark.sql.SparkSession
import graft.api.GraftSession
object ProbeMixed2Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gs = GraftSession(spark)
    val g = gs.createGraphFromCypher("CREATE (a:A {k: 1, s: 'ab'})")
    def show(name: String, q: String): Unit =
      try {
        val df = gs.cypher(g, q)
        println(s"$name: schema=${df.schema.map(_.dataType.simpleString).mkString(",")} rows=" +
          df.collect().toList.map(_.toSeq.mkString("|")))
      } catch { case e: Throwable => println(s"$name: ERROR ${e.getMessage.take(120)}") }
    show("mixedIdx", "RETURN [1, 'a'][0] AS x")
    show("mixedIdx1", "RETURN [1, 'a'][1] AS x")
    show("mixedList", "RETURN [1, 'a'] AS x")
    show("mixedCase", "MATCH (n:A) RETURN (CASE WHEN n.k = 1 THEN 1 ELSE 'a' END) AS x")
    show("homoList", "RETURN [1, 2] AS x")
    show("mixedEq", "RETURN [1,'a'][0] = 1 AS x, [1,'a'][1] = 'a' AS y")
    show("mixedIn", "RETURN 1 IN [1, 'a'] AS x, 'b' IN [1,'a'] AS y")
    spark.stop()
  }
}
