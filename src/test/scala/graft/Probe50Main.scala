package graft

import org.apache.spark.sql.SparkSession
import graft.api.GraftSession

/** Probe batch 50: ORDER BY scope rules. Neo4j reference semantics:
  *  - non-DISTINCT, non-aggregating WITH/RETURN: ORDER BY sees BOTH the
  *    projected aliases and the underlying input scope (`WITH n.k AS k
  *    ORDER BY n.uid` is legal);
  *  - DISTINCT or aggregating projections: ORDER BY sees only the
  *    projected items (unprojected access is a SyntaxError);
  *  - ORDER BY accepts arbitrary expressions over the visible scope,
  *    including aggregate expressions that repeat a projected aggregate
  *    (`RETURN k, count(*) ORDER BY count(*)`).
  */
object Probe50Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gs = GraftSession(spark)
    val create =
      """CREATE (:A {uid: 0, k: 2})
        |CREATE (:A {uid: 1, k: 1})
        |CREATE (:A {uid: 2, k: 1})
        |CREATE (:A {uid: 3})
        |""".stripMargin
    def run(q: String): Unit = {
      print(q.replace('\n', ' ').take(118) + "  ==>  ")
      try {
        val g = gs.createGraphFromCypher(create)
        println(gs.cypher(g, q).collect().map(_.toString).mkString("; "))
      } catch { case e: Throwable =>
        println(s"ERROR ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(140)}")
      }
    }
    // 1. expression over the projected alias
    run("MATCH (n:A) RETURN n.uid AS u ORDER BY u % 2 ASC, u ASC")
    // 2. ORDER BY an UNPROJECTED var (legal in Neo4j for plain RETURN)
    run("MATCH (n:A) RETURN n.k AS x ORDER BY n.uid DESC")
    // 3. same through WITH
    run("MATCH (n:A) WITH n.k AS x ORDER BY n.uid DESC LIMIT 2 RETURN x")
    // 4. DISTINCT + unprojected ORDER BY → SyntaxError in Neo4j
    run("MATCH (n:A) RETURN DISTINCT n.k AS x ORDER BY n.uid")
    // 5. aggregating + unprojected ORDER BY → SyntaxError in Neo4j
    run("MATCH (n:A) RETURN n.k AS x, count(*) AS c ORDER BY n.uid")
    // 6. ORDER BY repeating a projected aggregate expression
    run("MATCH (n:A) RETURN n.k AS x, count(*) AS c ORDER BY count(*) DESC, x ASC")
    // 7. ORDER BY an aggregate NOT projected (Neo4j: SyntaxError — fixed
    // after this probe found the engine silently aggregating)
    run("MATCH (n:A) RETURN n.k AS x ORDER BY count(*) DESC")
    // 8. expression mixing alias and unprojected var (plain RETURN)
    run("MATCH (n:A) RETURN n.k AS x ORDER BY x + n.uid ASC")
    // 9. RETURN * ORDER BY prop
    run("MATCH (n:A) RETURN * ORDER BY n.uid DESC LIMIT 1")
    // 10. WITH * ORDER BY + cut, then continue
    run("MATCH (n:A) WITH * ORDER BY n.uid ASC LIMIT 2 RETURN n.uid AS u")
    // 11. WITH *, extra item + ORDER BY the extra
    run("MATCH (n:A) WITH *, n.uid * 10 AS m ORDER BY m DESC LIMIT 1 RETURN m")
    // 12. ORDER BY the entity itself (Neo4j: orders by node id)
    run("MATCH (n:A) RETURN n.uid AS u ORDER BY n ASC")
    // 13. ORDER BY a list value (lists order lexicographically)
    run("MATCH (n:A) RETURN n.uid AS u, [n.k, n.uid] AS l ORDER BY l ASC")
    // 14. alias SHADOWS a var: WITH n.k AS n ORDER BY n (alias wins)
    run("MATCH (n:A) WITH n.k AS n ORDER BY n ASC LIMIT 2 RETURN n")
    // 15. ORDER BY inside a union branch is illegal (only trailing)
    run("MATCH (n:A) RETURN n.k AS x ORDER BY x UNION MATCH (n:A) RETURN n.k AS x")
    // 16. SKIP/LIMIT expressions: arithmetic + toInteger
    run("MATCH (n:A) RETURN n.uid AS u ORDER BY u SKIP 1 + 1 LIMIT toInteger('2')")
    // 17. ORDER BY with a CASE expression
    run("MATCH (n:A) RETURN n.uid AS u ORDER BY CASE WHEN n.k IS NULL THEN 0 ELSE n.k END ASC, u ASC")
    // 18. aggregating WITH + ORDER BY repeated aggregate, then RETURN
    run("MATCH (n:A) WITH n.k AS x, count(*) AS c ORDER BY count(*) DESC LIMIT 1 RETURN x, c")
    spark.stop()
  }
}
