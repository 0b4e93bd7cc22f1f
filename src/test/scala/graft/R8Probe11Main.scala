package graft
import org.apache.spark.sql.SparkSession
object R8Probe11Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gs = graft.api.GraftSession(spark)
    val g = gs.createGraphFromCypher("CREATE (:A {k: 1}) CREATE (:A {k: 2})")
    gs.register("my best graph", g)
    gs.register("foo.bar.my graph", g)
    def run(name: String, q: String): Unit =
      try println(s"OK   $name -> ${gs.cypherStatement(q, Map.empty).collect().mkString(";")}")
      catch { case e: Throwable =>
        println(s"FAIL $name -> ${e.getClass.getSimpleName}: " +
          Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString(" ")) }
    run("escaped-name", "FROM GRAPH `my best graph` MATCH (n) RETURN count(n) AS cnt")
    run("escaped-ns-and-name", "FROM GRAPH `foo.bar`.`my graph` MATCH (n) RETURN count(n) AS cnt")
    run("construct-on-escaped", "CONSTRUCT ON `my best graph` RETURN GRAPH")
    run("catalog-create-escaped", "CATALOG CREATE GRAPH `snap shot` { FROM GRAPH `my best graph` RETURN GRAPH }")
    run("read-back-escaped", "FROM GRAPH `snap shot` MATCH (n) RETURN count(n) AS cnt")
    spark.stop()
  }
}
