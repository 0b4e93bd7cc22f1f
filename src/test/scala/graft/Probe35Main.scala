package graft

import org.apache.spark.sql.SparkSession
import graft.api.GraftSession

/** Probe batch 27: literal split delimiters, pattern predicates in
  * disjunctions / as boolean values, simple CASE null subject, temporal
  * cross-type comparison, nested-list IN, null map projection, parser
  * exotica (surrogate pairs, leading-dot floats), WITH ORDER BY scoping,
  * exists(n.prop), empty-group aggregates.
  */
object Probe35Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gs = GraftSession(spark)
    val g = gs.createGraphFromCypher(
      """CREATE (a:P {x: 1, name: 'a'}), (b:P {x: 2, name: 'b'}),
        |       (c:Q {y: 3}), (a)-[:R {w: 1}]->(b), (b)-[:S]->(c)""".stripMargin)

    def probe(name: String, q: String): Unit = {
      val r = try {
        gs.cypher(g, q).collect().map(_.toSeq.mkString(",")).mkString(" | ")
      } catch { case e: Throwable =>
        s"ERROR(${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(100)})"
      }
      println(f"$name%-42s -> $r")
    }

    // --- split: Cypher delimiters are LITERAL, not regex
    probe("split-dot-literal", "RETURN split('a.b.c', '.') AS r")
    probe("split-pipe-literal", "RETURN split('a|b|c', '|') AS r")
    probe("split-bracket-literal", "RETURN split('a[b[c', '[') AS r")
    probe("split-empty-delim", "RETURN split('abc', '') AS r")

    // --- pattern predicates in disjunctions / as values
    probe("pattern-pred-or",
      "MATCH (n:P) WHERE (n)-[:R]->() OR n.x = 2 RETURN n.name AS r ORDER BY r")
    probe("pattern-pred-or-both-patterns",
      "MATCH (n:P) WHERE (n)-[:R]->() OR (n)-[:S]->() RETURN n.name AS r ORDER BY r")
    probe("pattern-pred-and-not",
      "MATCH (n:P) WHERE (n)-[:R]->() AND NOT (n)-[:S]->() RETURN n.name AS r")
    probe("exists-pattern-projection",
      "MATCH (n:P) RETURN n.name AS name, exists((n)-[:R]->()) AS has ORDER BY name")
    probe("pattern-pred-xor",
      "MATCH (n:P) WHERE (n)-[:R]->() XOR (n)-[:S]->() RETURN n.name AS r ORDER BY r")

    // --- simple CASE null subject: null WHEN null never matches
    probe("simple-case-null-subject",
      "WITH null AS v RETURN CASE v WHEN null THEN 'a' ELSE 'b' END AS r")
    probe("simple-case-no-else-null",
      "RETURN CASE 5 WHEN 1 THEN 'a' END AS r")

    // --- temporal cross-type comparison
    probe("date-lt-datetime",
      "RETURN date('2020-01-01') < localdatetime('2020-01-02T00:00:00') AS r")
    probe("date-eq-datetime",
      "RETURN date('2020-01-01') = localdatetime('2020-01-01T00:00:00') AS r")

    // --- nested-list IN (ternary semantics)
    probe("nested-list-in-true", "RETURN [1,2] IN [[1,2],[3]] AS r")
    probe("nested-list-in-false", "RETURN [1,3] IN [[1,2]] AS r")
    probe("nested-list-in-null", "RETURN [1,null] IN [[1,2]] AS r")
    probe("nested-list-in-null-match", "RETURN [1,null] IN [[1,null]] AS r")

    // --- map projection / keys / properties on null
    probe("keys-null", "WITH null AS n RETURN keys(n) AS r")
    probe("properties-null", "WITH null AS n RETURN properties(n) AS r")
    probe("map-projection-null",
      "OPTIONAL MATCH (n:Nope) RETURN n{.x} AS r")
    probe("properties-map-literal", "RETURN properties({a: 1}) AS r")

    // --- parser exotica
    probe("surrogate-pair-escape", "RETURN '\\uD83D\\uDE00' AS r")
    probe("surrogate-pair-size", "RETURN size('\\uD83D\\uDE00') AS r")
    probe("surrogate-pair-roundtrip",
      "RETURN '\\uD83D\\uDE00' = 'x' AS ne, substring('a\\uD83D\\uDE00b', 3, 1) AS tail")
    probe("leading-dot-float", "RETURN .5 AS r")
    probe("leading-dot-float-exp", "RETURN .5e2 AS r")

    // --- WITH ORDER BY scoping
    probe("with-orderby-alias",
      "MATCH (n:P) WITH n.x AS y ORDER BY y RETURN collect(y) AS r")
    probe("with-orderby-underlying",
      "MATCH (n:P) WITH n.x AS y ORDER BY n.x RETURN collect(y) AS r")
    probe("with-var-orderby-prop",
      "MATCH (n:P) WITH n ORDER BY n.x DESC RETURN collect(n.x) AS r")
    probe("return-orderby-agg-expr",
      "MATCH (n:P) RETURN n.x AS x, count(*) AS c ORDER BY count(*), x")
    probe("with-distinct-limit",
      "UNWIND [1,1,2,2,3] AS v WITH DISTINCT v ORDER BY v SKIP 1 LIMIT 1 RETURN v")

    // --- exists(n.prop) function form
    probe("exists-prop-true", "MATCH (n:P {x: 1}) RETURN exists(n.x) AS r")
    probe("exists-prop-false", "MATCH (n:P {x: 1}) RETURN exists(n.zz) AS r")

    // --- empty-group aggregates
    probe("empty-agg-sum", "MATCH (n:Nope) RETURN sum(n.x) AS r")
    probe("empty-agg-avg", "MATCH (n:Nope) RETURN avg(n.x) AS r")
    probe("empty-agg-min", "MATCH (n:Nope) RETURN min(n.x) AS r")
    probe("empty-agg-collect", "MATCH (n:Nope) RETURN collect(n.x) AS r")
    probe("empty-agg-count", "MATCH (n:Nope) RETURN count(n) AS r")

    // --- misc
    probe("reverse-string", "RETURN reverse('abc') AS r")
    probe("reverse-list", "RETURN reverse([1,2,3]) AS r")
    probe("any-over-null-list", "RETURN any(x IN null WHERE x) AS r")
    probe("label-conjunction", "MATCH (n) WHERE n:P:Q RETURN count(n) AS r")
    probe("not-label", "MATCH (n) WHERE NOT n:P RETURN count(n) AS r")
    probe("pow-associativity", "RETURN 2^3^2 AS r")
    spark.stop()
  }
}
