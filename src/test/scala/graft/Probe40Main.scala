package graft

import org.apache.spark.sql.SparkSession
import graft.api.GraftSession

/** Probe batch 33: error-shape parity with the reference's two unmined
  * blacklists — `wont_fix_blacklist` (write clauses: the reference is
  * read-only and blacklists ALL of CREATE/MERGE/DELETE/SET/REMOVE in
  * queries) and `failure_reporting_blacklist` (scenarios whose expected
  * outcome is a SPECIFIC error; the reference reports failures loosely).
  * We can beat the reference on both: clear, typed errors for every
  * write clause and for the semantic/syntax error shapes. This probe
  * prints current behavior; findings get locked as expectError scenarios.
  */
object Probe40Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gs = GraftSession(spark)
    val g = gs.createGraphFromCypher(
      "CREATE (a:A {k: 1, s: 'x'})-[:T {w: 1}]->(b:B {k: 2})")

    def probe(name: String, q: String): Unit = {
      try {
        val rows = gs.cypher(g, q).collect()
        println(s"$name: OK rows=${rows.length} " +
          rows.take(3).map(_.toString).mkString(" "))
      } catch {
        case e: Throwable =>
          def root(t: Throwable): Throwable =
            if (t.getCause == null || t.getCause == t) t else root(t.getCause)
          val m = Option(e.getMessage).getOrElse("").linesIterator
            .take(1).mkString.take(140)
          println(s"$name: ERR ${e.getClass.getSimpleName}: $m")
      }
    }

    println("==== write clauses (wont_fix family) ====")
    probe("w1_create", "CREATE (n:X) RETURN n")
    probe("w2_match_create", "MATCH (a:A) CREATE (a)-[:R]->(:X) RETURN a.k AS k")
    probe("w3_merge", "MERGE (n:X {k: 1}) RETURN n")
    probe("w4_delete", "MATCH (n:A) DELETE n")
    probe("w5_detach_delete", "MATCH (n:A) DETACH DELETE n")
    probe("w6_set", "MATCH (n:A) SET n.k = 2 RETURN n.k AS k")
    probe("w7_remove", "MATCH (n:A) REMOVE n.k RETURN n.k AS k")
    probe("w8_set_label", "MATCH (n:A) SET n:Z RETURN n.k AS k")

    println("==== failure_reporting shapes ====")
    probe("f1_agg_in_where", "MATCH (n:A) WHERE count(n) > 0 RETURN n.k AS k")
    probe("f2_unaliased_with", "MATCH (n:A) WITH n.k RETURN 1 AS x")
    probe("f3_undefined_var_return", "MATCH (n:A) RETURN foo AS x")
    probe("f4_undefined_var_cmp", "MATCH (n:A) WHERE n.k = foo RETURN 1 AS x")
    probe("f5_union_mixed", "MATCH (n:A) RETURN n.k AS k UNION MATCH (n:B) RETURN n.k AS k UNION ALL MATCH (n:A) RETURN n.k AS k")
    probe("f6_dup_columns", "MATCH (n:A) RETURN n.k AS a, n.s AS a")
    probe("f7_return_star_empty", "RETURN *")
    probe("f8_in_on_literal", "RETURN 1 IN 'a' AS x")
    probe("f9_node_as_rel", "MATCH (n:A) MATCH ()-[n]->() RETURN 1 AS x")
    probe("f10_rel_as_node", "MATCH ()-[r:T]->() MATCH (r) RETURN 1 AS x")
    probe("f11_type_on_node", "MATCH (n:A) RETURN type(n) AS t")
    probe("f12_labels_on_rel", "MATCH ()-[r:T]->() RETURN labels(r) AS l")
    probe("f13_bad_hex", "RETURN 0x3j AS x")
    probe("f14_unknown_fn", "RETURN frobnicate(1) AS x")
    probe("f15_neg_limit", "MATCH (n) RETURN n.k AS k LIMIT -1")
    probe("f16_float_limit", "MATCH (n) RETURN n.k AS k LIMIT 1.5")
    probe("f17_neg_skip", "MATCH (n) RETURN n.k AS k SKIP -2")
    probe("f18_varlength_no_star", "MATCH (a)-[r 1..2]->(b) RETURN 1 AS x")
    probe("f19_varlength_neg", "MATCH (a)-[*-2..2]->(b) RETURN 1 AS x")
    probe("f20_prop_on_primitive", "WITH 1 AS i RETURN i.prop AS x")
    probe("f21_index_map_with_int", "WITH {a: 1} AS m RETURN m[0] AS x")
    probe("f22_index_list_with_string", "WITH [1,2] AS l RETURN l['a'] AS x")
    probe("f23_percentile_oob", "MATCH (n) RETURN percentileCont(n.k, 1.5) AS p")
    probe("f24_properties_on_int", "RETURN properties(1) AS p")
    probe("f25_tostring_on_list", "RETURN toString([1,2]) AS s")
    probe("f26_agg_in_list_compr", "MATCH (n:A) RETURN [x IN [1,2] | count(*)] AS l")
    probe("f27_match_after_optional", "OPTIONAL MATCH (n:A) MATCH (m:B) RETURN m.k AS k")
    probe("f28_size_on_path", "MATCH p = (a:A)-->(b) RETURN size(p) AS s")
    probe("f29_rel_reuse_same_pattern", "MATCH (a)-[r]->(b)-[r]->(c) RETURN 1 AS x")
    probe("f30_var_path_rebound", "MATCH p = (a:A)-->(b) MATCH p = (x:B)-->(y) RETURN 1 AS x")
    probe("f31_nonconst_limit", "MATCH (n) RETURN n.k AS k LIMIT n.k")
    probe("f32_not_on_string", "RETURN NOT 'foo' AS x")
    probe("f33_varlength_as_single", "MATCH (a)-[r*1..2]->(b) RETURN r.w AS w")
    probe("f34_length_on_node", "MATCH (n:A) RETURN length(n) AS l")

    spark.stop()
  }
}
