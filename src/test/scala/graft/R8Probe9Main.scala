package graft

import org.apache.spark.sql.SparkSession

/** Round-8 probe batch 9: MultipleGraphTests-mined construct shapes —
  * double COPY OF with a connecting rel, rel copy with type override,
  * SET label in CONSTRUCT. */
object R8Probe9Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gs = graft.api.GraftSession(spark)
    val g = gs.createGraphFromCypher(
      """CREATE (a:N {uid: 1})
        |CREATE (x:X {uid: 8})-[:FOO {val: 1, val2: 2}]->(y:Y {uid: 9})
        |CREATE (x2:X {uid: 18})-[:BAR {val: 1, val2: 3}]->(y2:Y {uid: 19})
        |""".stripMargin)
    def run(name: String, q: String): Unit =
      try {
        val rows = gs.cypher(g, q).collect()
        println(s"OK   $name -> ${rows.mkString(";")}")
      } catch { case e: Throwable =>
        println(s"FAIL $name -> ${e.getClass.getSimpleName}: " +
          Option(e.getMessage).getOrElse("").linesIterator.take(2).mkString(" "))
      }

    run("double-copy-with-rel",
      "MATCH (a:N) CONSTRUCT CREATE (f COPY OF a)-[:FOO]->(g2 COPY OF a) " +
        "MATCH (n) RETURN count(*) AS c")
    run("double-copy-rel-endpoints",
      "MATCH (a:N) CONSTRUCT CREATE (f COPY OF a)-[:FOO]->(g2 COPY OF a) " +
        "MATCH (s)-[:FOO]->(t) RETURN s.uid AS su, t.uid AS tu, s = t AS eq")
    run("rel-copy-type-override",
      "MATCH ()-[s]->() CONSTRUCT " +
        "CREATE ()-[t COPY OF s :BAZ {val2: 'Donald'}]->() " +
        "MATCH ()-[r]->() RETURN r.val AS v, r.val2 AS v2, type(r) AS tp")
    run("set-node-label",
      "CONSTRUCT CREATE (a) SET a: FOO MATCH (n) " +
        "RETURN labels(n) AS ls, count(*) AS c")
    run("set-label-on-clone",
      "MATCH (a:N) CONSTRUCT CLONE a AS b SET b: Extra MATCH (n) " +
        "RETURN labels(n) AS ls")
    run("anon-endpoints-new",
      "MATCH ()-[s:FOO]->() CONSTRUCT CREATE ()-[t COPY OF s]->() " +
        "MATCH (n) RETURN count(*) AS c")
    spark.stop()
  }
}
