package graft

import org.apache.spark.sql.SparkSession
import graft.api.GraftSession

/** Probe batch 34: the remaining unmined `failure_reporting_blacklist`
  * families (reference morpheus-tck/src/test/resources/
  * failure_reporting_blacklist) — function argument-type errors
  * (TypeConversionFunctions, FunctionsAcceptance), invalid indexing
  * (ExpressionAcceptance, ListOperations), procedure calls
  * (ProcedureCallAcceptance — unsupported here, needs a typed error),
  * syntax exotica (SyntaxErrorAcceptance), variable-dependent
  * SKIP/LIMIT, and the one tolerance scenario (OR'd predicate must NOT
  * fail when the true disjunct short-circuits the illegal one).
  * Prints current behavior; findings get locked as scenarios.
  */
object Probe41Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gs = GraftSession(spark)
    val g = gs.createGraphFromCypher(
      "CREATE (a:A {k: 1, s: 'x', ls: [1, 2]})-[:T {w: 1}]->(b:B {k: 2})")

    def probe(name: String, q: String): Unit = {
      try {
        val rows = gs.cypher(g, q).collect()
        println(s"$name: OK rows=${rows.length} " +
          rows.take(3).map(_.toString).mkString(" "))
      } catch {
        case e: Throwable =>
          def msgs(t: Throwable): Seq[String] =
            if (t == null) Nil
            else Option(t.getMessage).toSeq ++ msgs(t.getCause)
          val m = msgs(e).mkString(" | ").linesIterator.take(1)
            .mkString.take(160)
          println(s"$name: ERR ${e.getClass.getSimpleName}: $m")
      }
    }

    println("==== SyntaxErrorAcceptance ====")
    probe("s1_unknown_fn", "RETURN foo(1) AS x")
    probe("s2_rand_in_agg", "MATCH (n:A) RETURN count(rand()) AS x")
    probe("s3_bad_hex1", "RETURN 0x23G34 AS x")
    probe("s4_bad_hex2", "RETURN 0x23j AS x")
    probe("s5_unicode_hyphen", "RETURN 1 − 1 AS x")
    probe("s6_bad_unicode_escape", "RETURN '\\uH' AS x")
    probe("s7_float_too_large", "RETURN 1.34E999 AS x")

    println("==== VarLength / pattern syntax ====")
    probe("v1_missing_asterisk", "MATCH (a:A)-[r 1..2]->(b) RETURN 1 AS x")
    probe("v2_negative_bound", "MATCH (a:A)-[*-2..2]->(b) RETURN 1 AS x")
    probe("v3_varlen_as_single",
      "MATCH (a)-[r*1..2]->(b) MATCH (c)-[r]->(d) RETURN 1 AS x")
    probe("v4_rel_reuse_same_pattern",
      "MATCH (a)-[r]->(b)-[r]->(c) RETURN 1 AS x")
    probe("v5_list_as_node", "WITH [1, 2] AS l MATCH (l) RETURN 1 AS x")
    probe("v6_param_node_predicate",
      "MATCH (n $param) RETURN n.k AS x")

    println("==== indexing (ExpressionAcceptance / ListOperations) ====")
    probe("i1_int_into_map", "WITH {a: 1} AS m RETURN m[0] AS x")
    probe("i2_string_into_list", "WITH [1, 2] AS l RETURN l['a'] AS x")
    probe("i3_list_into_list", "WITH [1, 2] AS l RETURN l[[0]] AS x")
    probe("i4_float_into_list", "WITH [1, 2] AS l RETURN l[1.5] AS x")
    probe("i5_index_into_int", "WITH 100 AS i RETURN i[0] AS x")
    probe("i6_index_into_string", "WITH 'abc' AS s RETURN s[0] AS x")
    probe("i7_prop_on_primitive", "WITH 1 AS n RETURN n.prop AS x")
    probe("i8_prop_on_string", "WITH 'a' AS n RETURN n.prop AS x")
    probe("i9_prop_on_any_ok",
      "WITH [{prop: 1}, 1] AS l RETURN l[0].prop AS x")

    println("==== function arg types ====")
    probe("p1_properties_int", "RETURN properties(1) AS x")
    probe("p2_properties_string", "RETURN properties('a') AS x")
    probe("p3_properties_list", "RETURN properties([true, false]) AS x")
    probe("f1_labels_path", "MATCH p = (n:A) RETURN labels(p) AS x")
    probe("f2_labels_int", "RETURN labels(1) AS x")
    probe("f3_type_int", "RETURN type(1) AS x")
    probe("f4_type_string", "RETURN type('a') AS x")
    probe("f5_type_node", "MATCH (n:A) RETURN type(n) AS x")
    probe("f6_type_list", "RETURN type([1]) AS x")
    probe("f7_length_node", "MATCH (n:A) RETURN length(n) AS x")
    probe("f8_length_string_ok", "RETURN length('abc') AS x")
    probe("t1_toInteger_bool", "RETURN toInteger(true) AS x")
    probe("t2_toInteger_list", "RETURN toInteger([1]) AS x")
    probe("t3_toInteger_node", "MATCH (n:A) RETURN toInteger(n) AS x")
    probe("t4_toFloat_bool", "RETURN toFloat(true) AS x")
    probe("t5_toFloat_list", "RETURN toFloat([1.0]) AS x")
    probe("t6_toBoolean_int", "RETURN toBoolean(1) AS x")
    probe("pc1_percentile_string_q",
      "MATCH (n:A) RETURN percentileCont(n.k, 'nope') AS x")
    probe("pc2_percentile_nonnum_col",
      "MATCH (n:A) RETURN percentileCont(n.s, 0.5) AS x")
    probe("pc3_percentile_disc_string_q",
      "MATCH (n:A) RETURN percentileDisc(n.k, 'nope') AS x")
    probe("r1_range_bad_args", "RETURN range('a', 'b') AS x")
    probe("e1_exists_expr",
      "MATCH (n:A) WHERE exists(n.k + 1) RETURN n.k AS x")

    println("==== SKIP/LIMIT non-constants ====")
    probe("k1_skip_var", "MATCH (n:A) RETURN n.k AS k SKIP n.k")
    probe("k2_limit_var", "MATCH (n:A) RETURN n.k AS k LIMIT n.k")
    probe("k3_orderby_neg_limit",
      "MATCH (n:A) RETURN n.k AS k ORDER BY k LIMIT -1")
    probe("k4_skip_expr_ok", "MATCH (n) RETURN n AS n SKIP 1 + 1")

    println("==== procedures ====")
    probe("c1_standalone_call", "CALL db.labels()")
    probe("c2_inquery_call",
      "CALL db.labels() YIELD label RETURN label")
    probe("c3_unknown_proc", "CALL foo.bar(1)")

    println("==== tolerance: OR short-circuit ====")
    probe("o1_or_shortcircuit",
      "MATCH (n:A) WHERE n.s = 'x' OR n.ls[n.s] = 1 RETURN n.k AS x")
    probe("o2_union_diff_cols",
      "MATCH (n:A) RETURN n.k AS k UNION MATCH (n:B) RETURN n.k AS q")

    spark.stop()
  }
}
