package graft
import org.apache.spark.sql.SparkSession
object R8Probe10Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gs = graft.api.GraftSession(spark)
    val g = gs.createGraphFromCypher("CREATE (:A {k: 1})")
    def run(name: String, q: String): Unit =
      try println(s"OK   $name -> ${gs.cypher(g, q).collect().mkString(";")}")
      catch { case e: Throwable =>
        println(s"FAIL $name -> ${e.getClass.getSimpleName}: " +
          Option(e.getMessage).getOrElse("").linesIterator.take(2).mkString(" ")) }
    run("pt-eq-int", "RETURN point({x: 1, y: 2}) = 1 AS a")
    run("pt-ne-str", "RETURN point({x: 1, y: 2}) <> 'a' AS a")
    run("pt-lt-int", "RETURN point({x: 1, y: 2}) < 1 AS a")
    run("pt-eq-null", "RETURN point({x: 1, y: 2}) = null AS a")
    run("pt-eq-map", "RETURN point({x: 1, y: 2}) = {x: 1, y: 2} AS a")
    run("pt-in-mixed", "RETURN point({x: 1, y: 2}) IN [1, 'a'] AS a")
    run("min-point", "UNWIND [point({x: 2, y: 1}), point({x: 1, y: 9})] AS p RETURN min(p).x AS x")
    run("order-by-point-var", "UNWIND [point({x: 2, y: 1}), point({x: 1, y: 9})] AS p WITH p AS q ORDER BY q RETURN q.x AS x")
    spark.stop()
  }
}
