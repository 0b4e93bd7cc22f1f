package graft

import org.apache.spark.sql.SparkSession
import graft.api.GraftSession

/** Probe batch 28: UNION column rules, list comparability, regex flags,
  * property access on arbitrary expressions, parameter corners,
  * OPTIONAL-aggregation interplay, WITH * shadowing.
  */
object Probe36Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gs = GraftSession(spark)
    val g = gs.createGraphFromCypher(
      """CREATE (a:P {x: 1, name: 'a'}), (b:P {x: 2, name: 'b'}),
        |       (a)-[:R]->(b)""".stripMargin)

    def probe(name: String, q: String, params: Map[String, Any] = Map.empty): Unit = {
      val r = try {
        gs.cypher(g, q, params).collect().map(_.toSeq.mkString(",")).mkString(" | ")
      } catch { case e: Throwable =>
        s"ERROR(${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(100)})"
      }
      println(f"$name%-44s -> $r")
    }

    // --- UNION column rules
    probe("union-different-columns-errors",
      "RETURN 1 AS a UNION RETURN 2 AS b")
    probe("union-same-columns-different-order",
      "RETURN 1 AS a, 'x' AS b UNION RETURN 'y' AS b, 2 AS a")
    probe("union-distinct-dedups",
      "RETURN 1 AS a UNION RETURN 1 AS a")
    probe("union-all-keeps",
      "RETURN 1 AS a UNION ALL RETURN 1 AS a")
    probe("union-entity-dedup",
      "MATCH (n:P) RETURN n.name AS m UNION MATCH (n:P) RETURN n.name AS m")

    // --- list comparability with < (Neo4j: null unless comparable?)
    probe("list-lt-list", "RETURN [1,2] < [1,3] AS r")
    probe("list-lt-shorter-prefix", "RETURN [1] < [1,0] AS r")
    probe("string-lt-number", "RETURN 'a' < 1 AS r")
    probe("bool-lt-bool", "RETURN false < true AS r")

    // --- regex with inline flags
    probe("regex-case-insensitive-flag", "RETURN 'ABC' =~ '(?i)abc' AS r")
    probe("regex-dotall-flag", "RETURN 'a\\nb' =~ '(?s)a.b' AS r")

    // --- property access on arbitrary expressions
    probe("prop-on-map-literal", "RETURN ({a: 1}).a AS r")
    probe("prop-on-case", "RETURN (CASE WHEN true THEN {a: 7} END).a AS r")
    probe("prop-on-head-of-list", "RETURN head([{a: 3}]).a AS r")
    probe("prop-chain-nested-map", "RETURN {o: {i: 5}}.o.i AS r")

    // --- parameter corners
    probe("param-map-field", "RETURN $m.k AS r", Map("m" -> Map("k" -> 9)))
    probe("param-dynamic-key", "RETURN $m[$k] AS r",
      Map("m" -> Map("k" -> 9), "k" -> "k"))
    probe("param-in-inline-props", "MATCH (n:P {x: $v}) RETURN n.name AS r",
      Map("v" -> 2))
    probe("param-list-index", "RETURN $xs[1] AS r", Map("xs" -> Seq(10, 20)))

    // --- OPTIONAL + aggregation interplay
    probe("optional-count-star-vs-expr",
      """MATCH (n:P {name: 'b'}) OPTIONAL MATCH (n)-[:R]->(m)
        |RETURN count(*) AS stars, count(m) AS ms""".stripMargin)
    probe("optional-collect-skips-null",
      """MATCH (n:P {name: 'b'}) OPTIONAL MATCH (n)-[:R]->(m)
        |RETURN collect(m.x) AS xs""".stripMargin)
    probe("optional-props-of-null-rel",
      """MATCH (n:P {name: 'b'}) OPTIONAL MATCH (n)-[r:R]->()
        |RETURN r.w AS w, type(r) AS t, id(r) AS i""".stripMargin)

    // --- WITH * forms
    probe("with-star-plus-alias",
      "MATCH (n:P {name: 'a'}) WITH *, 1 AS one RETURN n.name AS r, one")
    probe("with-star-then-entity",
      "MATCH (n:P) WITH * RETURN count(n) AS r")

    // --- misc
    probe("order-by-after-union-errors",
      "RETURN 2 AS a UNION RETURN 1 AS a ORDER BY a")
    probe("size-pattern-in-where",
      "MATCH (n:P) WHERE size([(n)-[:R]->(m) | m]) > 0 RETURN n.name AS r")
    probe("int-overflow-errors", "RETURN 9223372036854775807 + 1 AS r")
    probe("unary-minus-param", "RETURN -$v AS r", Map("v" -> 5))
    probe("nested-comprehension",
      "RETURN [x IN [1,2] | [y IN [10] | x + y]] AS r")
    probe("varlength-zero-exact",
      "MATCH (a:P {name: 'a'})-[:R*0]->(x) RETURN x.name AS r")
    probe("varlength-unbounded",
      "MATCH (a:P {name: 'a'})-[:R*]->(x) RETURN x.name AS r")
    spark.stop()
  }
}
