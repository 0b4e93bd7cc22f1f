package graft

import org.apache.spark.sql.SparkSession

import graft.api.GraftSession

/** Scratch semantics prober batch 14: aggregate typing and null corners. */
object Probe14Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gs = GraftSession(spark)
    val g = gs.createGraphFromCypher(
      "CREATE (:N {v: 1}), (:N {v: 2}), (:N {w: 1.5}), (:N)")
    def run(q: String): Unit = {
      try {
        val df = gs.cypher(g, q)
        val tps = df.schema.fields.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(",")
        val rows = df.collect().map(_.toString).mkString(" | ")
        println(s"PROBE14 OK   $q\n  => [$tps] $rows")
      } catch {
        case e: Throwable =>
          println(s"PROBE14 FAIL $q\n  => ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(140)}")
      }
    }
    run("MATCH (n:N) RETURN sum(n.v) AS s, avg(n.v) AS a, min(n.v) AS mn")
    run("MATCH (n:N) RETURN count(n.v) AS c, count(*) AS all")
    run("MATCH (n:N) RETURN sum(n.v + n.w) AS mixed") // null-poisoned adds
    run("MATCH (n:N) RETURN min(n.nope) AS mn, max(n.nope) AS mx, avg(n.nope) AS av, sum(n.nope) AS s")
    run("MATCH (n:N) RETURN percentileDisc(n.v, 0.0) AS p0, percentileDisc(n.v, 1.0) AS p1, percentileDisc(n.v, 0.5) AS p5")
    run("MATCH (n:N) RETURN percentileCont(n.v, 0.5) AS pc")
    run("MATCH (n:N) RETURN stDev(n.v) AS sd, stDevP(n.v) AS sp")
    run("MATCH (n:N) RETURN count(DISTINCT n.v) AS cd, sum(DISTINCT n.v) AS sd")
    run("MATCH (n:N) RETURN count(*) + 1 AS c1, toFloat(count(*)) / 2 AS half")
    run("MATCH (n:N) WITH count(*) AS c MATCH (m:N) WHERE m.v <= c RETURN count(m) AS under")
    run("MATCH (n:N) RETURN collect(n.v + 0.5) AS shifted")
    run("UNWIND [1, 2.5] AS x RETURN sum(x) AS s") // int+float widen
    run("MATCH (n:N) RETURN labels(n) AS l, count(*) AS c ORDER BY c") // group by list
    spark.stop()
  }
}
