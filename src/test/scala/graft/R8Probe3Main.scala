package graft

import org.apache.spark.sql.SparkSession

/** Round-8 probe batch 3: the POINT type — construction, accessors,
  * equality/grouping, ordering-null, distance() euclidean + haversine,
  * crs mismatch, error shapes. */
object R8Probe3Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gs = graft.api.GraftSession(spark)
    val g = gs.createGraphFromCypher(
      """CREATE (:P {uid: 0, x: 3.0, y: 4.0})
        |CREATE (:P {uid: 1, x: 0.0, y: 0.0})
        |CREATE (:P {uid: 2})
        |""".stripMargin)
    def run(name: String, q: String): Unit =
      try {
        val rows = gs.cypher(g, q).collect()
        println(s"OK   $name -> ${rows.mkString(";")}")
      } catch { case e: Throwable =>
        println(s"FAIL $name -> ${e.getClass.getSimpleName}: " +
          Option(e.getMessage).getOrElse("").linesIterator.take(2).mkString(" "))
      }

    run("construct-cartesian",
      "RETURN toString(point({x: 1.5, y: -2.0})) AS s")
    run("construct-crs",
      "RETURN point({x: 1, y: 2, crs: 'cartesian'}).srid AS srid, " +
        "point({x: 1, y: 2}).crs AS crs")
    run("construct-geo",
      "WITH point({latitude: 52.5, longitude: 13.4}) AS p " +
        "RETURN p.latitude AS lat, p.longitude AS lon, p.x AS x, " +
        "p.y AS y, p.crs AS crs, p.srid AS srid")
    run("construct-geo-xy",
      "WITH point({x: 13.4, y: 52.5, crs: 'wgs-84'}) AS p " +
        "RETURN p.latitude AS lat, p.srid AS srid")
    run("equality",
      "RETURN point({x: 1, y: 2}) = point({x: 1.0, y: 2.0}) AS eq, " +
        "point({x: 1, y: 2}) = point({x: 2, y: 1}) AS ne, " +
        "point({x: 1, y: 2}) = point({latitude: 2, longitude: 1}) AS crs")
    run("ordering-comparison-null",
      "RETURN point({x: 1, y: 2}) < point({x: 2, y: 3}) AS lt")
    run("order-by-and-distinct",
      "UNWIND [point({x: 2, y: 1}), point({x: 1, y: 9}), " +
        "point({x: 1, y: 9})] AS p " +
        "RETURN count(DISTINCT p) AS c")
    run("distance-euclidean",
      "MATCH (n:P) WHERE n.uid = 0 " +
        "RETURN distance(point({x: n.x, y: n.y}), " +
        "point({x: 0.0, y: 0.0})) AS d")
    run("distance-haversine-equator-degree",
      // 1 degree of longitude at the equator = R * pi/180 ≈ 111319.45 m
      "RETURN round(distance(point({latitude: 0, longitude: 0}), " +
        "point({latitude: 0, longitude: 1}))) AS d")
    run("distance-crs-mismatch-null",
      "RETURN distance(point({x: 1, y: 2}), " +
        "point({latitude: 2, longitude: 1})) IS NULL AS n")
    run("distance-null-operand",
      "MATCH (n:P) WHERE n.uid = 2 " +
        "RETURN distance(point({x: n.x, y: n.y}), " +
        "point({x: 0.0, y: 0.0})) IS NULL AS n")
    run("point-null-coordinate",
      "MATCH (n:P) WHERE n.uid = 2 " +
        "RETURN point({x: n.x, y: n.y}) IS NULL AS n")
    run("point-of-null", "RETURN point(null) IS NULL AS n")
    run("where-distance-filter",
      "MATCH (n:P) WITH n, point({x: n.x, y: n.y}) AS p " +
        "WHERE distance(p, point({x: 0.0, y: 0.0})) < 1.0 " +
        "RETURN n.uid AS u")
    run("latitude-on-cartesian-raises",
      "RETURN point({x: 1, y: 2}).latitude AS l")
    run("lat-out-of-range-raises",
      "RETURN point({latitude: 99, longitude: 0}) AS p")
    run("3d-raises", "RETURN point({x: 1, y: 2, z: 3}) AS p")
    run("bad-keys-raises", "RETURN point({a: 1}) AS p")
    run("collect-points",
      "UNWIND [point({x: 1, y: 2}), point({x: 3, y: 4})] AS p " +
        "RETURN size(collect(p)) AS n")
    run("point-min-max-group",
      "UNWIND [point({x: 1, y: 2}), point({x: 1, y: 2}), " +
        "point({x: 3, y: 4})] AS p " +
        "RETURN p.x AS x, count(*) AS c ORDER BY x")
    run("order-by-point",
      "UNWIND [point({x: 2, y: 1}), point({x: 1, y: 9})] AS p " +
        "RETURN p.x AS x ORDER BY p")

    spark.stop()
  }
}
