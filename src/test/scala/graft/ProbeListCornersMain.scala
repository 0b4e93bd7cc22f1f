package graft

import org.apache.spark.sql.SparkSession

import graft.api.GraftSession

/** Probe batch 35: list-value corner semantics ahead of the differential
  * grammar's list extension — indexing (negative / out-of-range / null),
  * slices, head/last/range, IN over expression lists, entity equality,
  * UNWIND of a projected list, WITH entity aliasing. Each printed corner
  * gets locked as a scenario once confirmed.
  */
object ProbeListCornersMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gs = GraftSession(spark)
    val g = gs.createGraphFromCypher(
      """CREATE (a:A {k: 1, s: 'ab'})
        |CREATE (b:A {k: 2})
        |CREATE (c:B {k: 3})
        |CREATE (a)-[:T {w: 5}]->(b)
        |CREATE (b)-[:T {w: 6}]->(c)
        |""".stripMargin)

    def show(name: String, q: String): Unit =
      try {
        val rows = gs.cypher(g, q).collect().toList
          .map(_.toSeq.map {
            case null => "null"
            case s: scala.collection.Seq[_] => s.mkString("[", ",", "]")
            case x => x.toString
          }.mkString("|"))
        println(s"$name: $rows")
      } catch {
        case e: Throwable =>
          println(s"$name: ERROR ${e.getClass.getSimpleName}: " +
            Option(e.getMessage).getOrElse("").take(160))
      }

    show("idx0", "RETURN [1,2,3][0] AS x")
    show("idxNeg", "RETURN [1,2,3][-1] AS x")
    show("idxNeg3", "RETURN [1,2,3][-3] AS x")
    show("idxNeg4", "RETURN [1,2,3][-4] AS x")
    show("idxOOR", "RETURN [1,2,3][5] AS x")
    show("idxNull", "RETURN [1,2,3][null] AS x")
    show("idxOnNull", "WITH null AS l RETURN l[0] AS x")
    show("idxExprList", "MATCH (n:A) RETURN [n.k, 9][0] AS x ORDER BY x")
    show("sliceBasic", "RETURN [1,2,3,4][1..3] AS x")
    show("sliceOpenFrom", "RETURN [1,2,3,4][..2] AS x")
    show("sliceOpenTo", "RETURN [1,2,3,4][2..] AS x")
    show("sliceNegFrom", "RETURN [1,2,3,4][-2..] AS x")
    show("sliceNegTo", "RETURN [1,2,3,4][..-1] AS x")
    show("sliceOOR", "RETURN [1,2,3][1..9] AS x")
    show("sliceBackwards", "RETURN [1,2,3][2..1] AS x")
    show("sliceNull", "RETURN [1,2,3][null..2] AS x")
    show("head", "RETURN head([2,1]) AS x, last([2,1]) AS y")
    show("headEmpty", "RETURN head([]) AS x, last([]) AS y")
    show("headNull", "RETURN head(null) AS x")
    show("range", "RETURN range(1,3) AS x")
    show("rangeStep", "RETURN range(0,6,2) AS x")
    show("rangeNeg", "RETURN range(3,1,-1) AS x")
    show("rangeEmpty", "RETURN range(3,1) AS x")
    show("inVarList", "WITH [1,2] AS xs RETURN 2 IN xs AS a, 3 IN xs AS b")
    show("inNullList", "WITH null AS xs RETURN 2 IN xs AS a")
    show("inListWithNull", "RETURN 2 IN [1,null] AS a, 1 IN [1,null] AS b")
    show("sizeList", "RETURN size([1,2,3]) AS x, size(range(0,9)) AS y")
    show("mixedList", "MATCH (n:A) RETURN [n.k, n.s, true][1] AS x ORDER BY n.k")
    show("nodeEq",
      "MATCH (a:A {k:1}), (b) WHERE a = b RETURN b.k AS x")
    show("nodeNeq",
      "MATCH (a:A {k:1}), (b:A) WHERE a <> b RETURN b.k AS x")
    show("nodeEqNull",
      "MATCH (a:A {k:1}) OPTIONAL MATCH (m:B {k:99}) " +
        "RETURN (m = a) AS x, (m = m) AS y")
    show("relEq",
      "MATCH (x)-[r1:T]->(), (y)-[r2:T]->() WHERE r1 = r2 " +
        "RETURN r1.w AS w ORDER BY w")
    show("unwindProjected",
      "MATCH (n:A) WITH collect(n.k) AS xs UNWIND xs AS y " +
        "RETURN y ORDER BY y")
    show("unwindListVar",
      "WITH [3,1,2] AS xs UNWIND xs AS y RETURN y ORDER BY y")
    show("unwindNullVar", "WITH null AS xs UNWIND xs AS y RETURN y")
    show("unwindEmpty", "WITH [] AS xs UNWIND xs AS y RETURN y")
    show("withEntityAlias",
      "MATCH (n:A) WITH n AS m RETURN m.k AS k ORDER BY k")
    show("withEntityAliasMatch",
      "MATCH (n:A {k:1}) WITH n AS m MATCH (m)-[:T]->(b) RETURN b.k AS k")
    show("listEq", "RETURN [1,2] = [1,2] AS a, [1,2] = [1,3] AS b, " +
      "[1,null] = [1,2] AS c, [1,null] = [1,null] AS d")
    show("listIdxIdx", "RETURN [[1,2],[3]][0][1] AS x")
    show("collectDouble",
      "MATCH (n) WITH collect(n.k) AS xs RETURN xs[0] + xs[2] AS x")
    spark.stop()
  }
}
