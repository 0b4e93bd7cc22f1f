package graft

import org.apache.spark.sql.SparkSession

import graft.api.GraftSession

/** Scratch semantics prober batch 8 (test scope; not part of the suite):
  * regex full-match, list/map equality with nulls, IN ternary logic,
  * conversions, quantifier vacuity, container indexing corners.
  */
object Probe8Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gs = GraftSession(spark)
    val g = gs.createGraphFromCypher(
      "CREATE (a:P {name: 'Ann'}), (b:P {name: 'Bob'}), (a)-[:K]->(b)")
    val qs: Seq[String] = Seq(
      // regex is a FULL match in Cypher
      "RETURN 'abc' =~ 'a.' AS partial_false, 'abc' =~ 'a.c' AS full_true, 'abc' =~ '(?i)A.C' AS flags_true",
      "RETURN 'hello world' =~ 'world' AS contains_false",
      // IN ternary logic
      "RETURN 1 IN [null] AS n1, null IN [] AS f1, 1 IN [1, null] AS t1, 2 IN [1, null] AS n2, null IN [1] AS n3",
      "RETURN [1,2] IN [[1,2]] AS t2, 3 IN null AS n4",
      // list/map equality with nulls
      "RETURN [1, null] = [1, null] AS ln, [1] = [2] AS lf, [1,2] = [1,2] AS lt, [1, null] = [2, null] AS lf2",
      "RETURN {a: 1} = {a: 1} AS mt, {a: 1} = {a: 2} AS mf, {a: 1} = {b: 1} AS mf2",
      // conversions
      "RETURN toInteger('4.2') AS i1, toInteger('foo') AS inull, toFloat('1e3') AS f1, toBoolean('TRUE') AS b1, toBoolean('x') AS bnull",
      "RETURN toInteger(true) AS it, toInteger(3.99) AS itr, toString(1.5) AS s1, toString(true) AS s2",
      // quantifier vacuity and empty ranges
      "RETURN all(x IN [] WHERE x > 0) AS at, any(x IN [] WHERE x > 0) AS af, none(x IN [] WHERE x > 0) AS nt, single(x IN [] WHERE x > 0) AS sf",
      "RETURN range(0, 10, 3) AS r1, range(0, -3, -1) AS r2, range(3, 1) AS rempty",
      // container indexing corners
      "RETURN [1,2,3][-1] AS neg, [1,2,3][5] AS oob, {a: 1}['a'] AS byname, {a: 1}['z'] AS miss",
      "WITH [1,2,3] AS l RETURN l[toInteger('1')] AS dyn",
      // string ops corners
      "RETURN substring('hello', 2) AS s1, substring('hello', 2, 100) AS s2, substring('hello', 0, 0) AS s3",
      "RETURN '' STARTS WITH '' AS e1, 'x' CONTAINS '' AS e2, reverse('abc') AS r, reverse([1,2,3]) AS rl",
      "RETURN split('a,b,c', ',')[1] AS sp, trim('  x ') AS tr",
      // CASE with null subject / null WHEN
      "RETURN CASE WHEN null THEN 1 ELSE 2 END AS c1, CASE null WHEN null THEN 1 ELSE 2 END AS c2",
      // arithmetic corners
      "RETURN 0.1 + 0.2 = 0.3 AS fp, 5 % 3 AS m1, -5 % 3 AS m2, 5.5 % 2 AS m3",
      "RETURN 2 ^ 10 AS p1, 2 ^ 0.5 AS p2, (-2) ^ 2 AS p3",
      "RETURN abs(-5) AS a1, sign(-0.0) AS sg, sign(-3) AS sg2",
      // size/length on various
      "RETURN size('abc') AS ss, size([1,2]) AS sl, size(null) AS sn",
      // collect skips nulls; count(null)
      "MATCH (n:P) RETURN collect(n.missing) AS cm, count(n.missing) AS cnt",
      // labels/type/keys on entities
      "MATCH (a:P {name:'Ann'})-[r]->() RETURN labels(a) AS ls, type(r) AS t, keys(a) AS ks",
      // exponent literal forms
      "RETURN 1e3 AS e3, 1.5e-2 AS em, 0x10 AS hex",
      // min/max over strings
      "MATCH (n:P) RETURN min(n.name) AS mn, max(n.name) AS mx")
    qs.foreach { q =>
      try {
        val df = gs.cypher(g, q)
        val rows = df.collect().map(_.toString).mkString(" | ")
        println(s"PROBE8 OK   $q\n  => $rows")
      } catch {
        case e: Throwable =>
          println(s"PROBE8 FAIL $q\n  => ${e.getClass.getSimpleName}: ${e.getMessage.take(160)}")
      }
    }
    spark.stop()
  }
}
