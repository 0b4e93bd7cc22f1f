package graft

import org.apache.spark.sql.SparkSession

import graft.api.GraftSession

/** Probe batch 36: ternary semantics of the list quantifiers
  * (all/any/none/single) with unknown predicate outcomes, list
  * comprehensions with null projections, and size(pattern comprehension) —
  * ahead of differential grammar batch 2.
  */
object ProbeQuantMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gs = GraftSession(spark)
    val g = gs.createGraphFromCypher(
      """CREATE (a:A {k: 1})
        |CREATE (b:A {k: 2})
        |CREATE (c:B {k: 3})
        |CREATE (a)-[:T]->(b)
        |CREATE (a)-[:T]->(c)
        |CREATE (b)-[:S]->(c)
        |""".stripMargin)
    def show(name: String, q: String): Unit =
      try {
        val rows = gs.cypher(g, q).collect().toList
          .map(_.toSeq.map {
            case null => "null"
            case s: scala.collection.Seq[_] => s.map(x =>
              if (x == null) "null" else x.toString).mkString("[", ",", "]")
            case x => x.toString
          }.mkString("|"))
        println(s"$name: $rows")
      } catch { case e: Throwable =>
        println(s"$name: ERROR ${e.getClass.getSimpleName}: " +
          Option(e.getMessage).getOrElse("").take(160)) }

    // ---- quantifiers, definite lists
    show("anyT", "RETURN any(x IN [1,2] WHERE x = 2) AS r")
    show("anyF", "RETURN any(x IN [1,2] WHERE x = 9) AS r")
    show("anyEmpty", "RETURN any(x IN [] WHERE x = 1) AS r")
    show("allT", "RETURN all(x IN [1,2] WHERE x < 9) AS r")
    show("allF", "RETURN all(x IN [1,2] WHERE x < 2) AS r")
    show("allEmpty", "RETURN all(x IN [] WHERE x = 1) AS r")
    show("noneT", "RETURN none(x IN [1,2] WHERE x = 9) AS r")
    show("noneF", "RETURN none(x IN [1,2] WHERE x = 1) AS r")
    show("single1", "RETURN single(x IN [1,2] WHERE x = 1) AS r")
    show("single2", "RETURN single(x IN [1,1] WHERE x = 1) AS r")
    show("single0", "RETURN single(x IN [1,2] WHERE x = 9) AS r")
    // ---- quantifiers, unknown outcomes (null element → null pred)
    show("anyUnk", "RETURN any(x IN [1,null] WHERE x = 9) AS r")
    show("anyUnkT", "RETURN any(x IN [1,null] WHERE x = 1) AS r")
    show("allUnk", "RETURN all(x IN [1,null] WHERE x < 9) AS r")
    show("allUnkF", "RETURN all(x IN [2,null] WHERE x < 2) AS r")
    show("noneUnk", "RETURN none(x IN [1,null] WHERE x = 9) AS r")
    show("singleUnk0", "RETURN single(x IN [1,null] WHERE x = 9) AS r")
    show("singleUnk1", "RETURN single(x IN [1,null] WHERE x = 1) AS r")
    show("singleUnk2", "RETURN single(x IN [1,1,null] WHERE x = 1) AS r")
    show("quantNullList", "RETURN any(x IN null WHERE x = 1) AS r")
    // ---- list comprehension
    show("lcBasic", "RETURN [x IN [1,2,3] WHERE x > 1 | x * 10] AS r")
    show("lcNoWhere", "RETURN [x IN [1,2,3] | x + 1] AS r")
    show("lcNoProj", "RETURN [x IN [1,2,3] WHERE x <> 2] AS r")
    show("lcNullElem", "RETURN [x IN [1,null,3] WHERE x > 0 | x] AS r")
    show("lcNullProj", "MATCH (n:A {k:1}) RETURN [x IN [1,2] | n.missing] AS r")
    show("lcNullList", "RETURN [x IN null | x] AS r")
    show("lcOnVar",
      "MATCH (n:A) WITH collect(n.k) AS xs RETURN [x IN xs WHERE x > 1 | x] AS r")
    show("lcSize", "RETURN size([x IN [1,2,3] WHERE x > 1]) AS r")
    // ---- pattern comprehension under size()
    show("patCompSize",
      "MATCH (n:A {k:1}) RETURN size([(n)-[:T]->(m) | 1]) AS r")
    show("patCompSizeLbl",
      "MATCH (n:A {k:1}) RETURN size([(n)-[:T]->(m:B) | m.k]) AS r")
    show("patCompVals",
      "MATCH (n:A {k:1}) RETURN [(n)-[:T]->(m) | m.k] AS r")
    show("patCompNullAnchor",
      "OPTIONAL MATCH (z:Z) RETURN size([(z)-[:T]->(m) | 1]) AS r")
    spark.stop()
  }
}
