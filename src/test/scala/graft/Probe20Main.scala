package graft
import org.apache.spark.sql.SparkSession
import graft.api.GraftSession

/** Round-3b probe: math-function boundary inputs, float-literal parser
  * exotica, miscellaneous Neo4j-vs-Spark built-in divergence candidates. */
object Probe20Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gs = GraftSession(spark)
    val g = gs.createGraphFromCypher("CREATE (:Z {k: 1})")
    def one(tag: String, q: String): Unit =
      try println(s"$tag => " + gs.cypher(g, q).collect().head.get(0))
      catch { case e: Exception => println(s"$tag ERR: ${e.getMessage.take(160)}") }
    one("sqrt(-1)", "RETURN sqrt(-1.0) AS x")
    one("log(0)", "RETURN log(0.0) AS x")
    one("log(-1)", "RETURN log(-1.0) AS x")
    one("log10(0)", "RETURN log10(0.0) AS x")
    one("acos(2)", "RETURN acos(2.0) AS x")
    one("asin(2)", "RETURN asin(2.0) AS x")
    one("exp(1000)", "RETURN exp(1000.0) AS x")
    one("0.0/0.0", "RETURN 0.0/0.0 AS x")
    one("1.0/0.0", "RETURN 1.0/0.0 AS x")
    one("-1.0/0.0", "RETURN -1.0/0.0 AS x")
    one("exp-only-float", "RETURN 1e3 AS x")
    one("exp-neg-float", "RETURN 1e-3 AS x")
    one("leading-dot-float", "RETURN .5 AS x")
    one("exp-cap-E", "RETURN 2E2 AS x")
    one("float-in-map", "MATCH (n:Z {k: 1}) RETURN {a: 1e2}.a AS x")
    one("prop-map-exp-float", "WITH {b: .25} AS m RETURN m.b AS x")
    one("tostring-1e3", "RETURN toString(1e3) AS x")
    one("tostring-int", "RETURN toString(10) AS x")
    one("tostring-true", "RETURN toString(true) AS x")
    one("tostring-float-int", "RETURN toString(3.0) AS x")
    one("sign-double", "RETURN sign(-2.5) AS x")
    one("abs-long-min+1", "RETURN abs(-9223372036854775807) AS x")
    one("haversin", "RETURN haversin(0.5) AS x")
    one("degrees", "RETURN degrees(3.141592653589793) AS x")
    one("radians", "RETURN radians(180) AS x")
    one("atan2", "RETURN atan2(1.0, 2.0) AS x")
    one("cot(0)", "RETURN cot(0.0) AS x")
    one("e()", "RETURN e() AS x")
    one("pi()", "RETURN pi() AS x")
    spark.stop()
  }
}
