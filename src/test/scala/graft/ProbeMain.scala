package graft

import org.apache.spark.sql.SparkSession

import graft.api.GraftSession

/** Scratch semantics prober (test scope; not part of the suite): runs a
  * batch of tricky openCypher shapes and prints actual results for
  * inspection. Queries that look wrong get fixed and promoted into
  * TckStyleSpec / EdgeSemantics specs.
  */
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gs = GraftSession(spark)
    val g = gs.createGraphFromCypher(
      """CREATE (a:P {name: 'Ann', age: 30}), (b:P {name: 'Bob'}),
        |(c:Q {name: 'Cid', age: 25}), (a)-[:K {w: 1}]->(b),
        |(b)-[:K {w: 2}]->(c)""".stripMargin)
    val qs: Seq[String] = Seq(
      // type ordering / mixed comparisons
      "RETURN 1 < 'a' AS x",
      "RETURN [1,2] < [1,3] AS x",
      "RETURN 'a' < 'b' AS x",
      "RETURN 1 <= 1.0 AS x",
      // aggregates over empties / nulls
      "MATCH (n:NoSuch) RETURN count(n) AS c, sum(n.age) AS s, avg(n.age) AS a, min(n.age) AS mn, collect(n.age) AS l",
      "MATCH (n:P) RETURN sum(n.age) AS s, avg(n.age) AS a, count(n.age) AS c",
      // ORDER BY aggregate expression (un-aliased)
      "MATCH (n:P) RETURN n.name AS name, count(*) ORDER BY count(*) DESC",
      // distinct on computed lists
      "UNWIND [[1,2],[1,2],[2,1]] AS l RETURN DISTINCT l",
      // accessing missing map key / chained
      "RETURN {a: {b: 1}}.a.b AS x, {a: 1}.missing AS y",
      // null propagation through accessors
      "MATCH (n:P) WHERE n.name = 'Bob' RETURN n.age IS NULL AS x",
      "OPTIONAL MATCH (n:NoSuch) RETURN labels(n) AS l, id(n) AS i",
      // CASE null subject
      "RETURN CASE null WHEN null THEN 'y' ELSE 'n' END AS x",
      // string functions edge
      "RETURN substring('abc', 5) AS a, left('ab', 5) AS b, split('a,b', ',') AS c",
      "RETURN toUpper(null) AS a, size(null) AS b, reverse(null) AS c",
      // toInteger on junk
      "RETURN toInteger('4.9') AS a, toInteger('abc') AS b, toFloat('x') AS c",
      // list slice negatives
      "RETURN [1,2,3][-2..] AS a, [1,2,3][..-1] AS b, [1,2,3][-1] AS c",
      // range step
      "RETURN range(0, 10, 3) AS a, range(3, 0, -1) AS b, range(1, 1) AS c",
      // reduce / comprehension interplay
      "RETURN reduce(acc = 0, x IN [1,2,3] | acc + x) AS s",
      "RETURN [x IN range(1,5) WHERE x % 2 = 0 | x * 10] AS l",
      // quantifiers with nulls
      "RETURN any(x IN [null, true] WHERE x) AS a, all(x IN [null, true] WHERE x) AS b, none(x IN [null] WHERE x) AS c, single(x IN [true, null] WHERE x) AS d",
      // exists on missing vs present
      "MATCH (n:P) RETURN n.name AS name, exists(n.age) AS has ORDER BY name",
      // arithmetic null propagation
      "RETURN 1 + null AS a, null * 2 AS b, abs(null) AS c",
      // unary minus on property
      "MATCH (n:P) WHERE n.name='Ann' RETURN -n.age AS x",
      // IS NOT NULL in projections
      "MATCH (n) RETURN n.age IS NOT NULL AS x ORDER BY x",
      // string concat with non-strings
      "RETURN 'a' + 1 AS x, 1 + 'a' AS y, 'a' + null AS z",
      // list concat
      "RETURN [1] + [2] AS a, [1] + 2 AS b, null + [1] AS c",
      // equality of lists/maps
      "RETURN [1,2] = [1,2] AS a, {x:1} = {x:1} AS b, [1,null] = [1,null] AS c, [1] = [1,2] AS d",
      // min/max over strings and mixed
      "UNWIND ['b','a','c'] AS s RETURN min(s) AS mn, max(s) AS mx",
      // count distinct of multiple
      "MATCH (n) RETURN count(DISTINCT n.name) AS c",
      // WITH + WHERE on aggregate alias
      "MATCH (n) WITH n.name AS name, count(*) AS c WHERE c >= 1 RETURN name, c ORDER BY name",
      // nested aggregates guard / expressions OF aggregates
      "MATCH (n:P) RETURN count(*) + 1 AS c, 2 * count(n.age) AS d",
      // ORDER BY on expression of projected alias
      "MATCH (n:P) RETURN n.name AS nm ORDER BY toUpper(nm) DESC",
      // LIMIT 0
      "MATCH (n) RETURN n.name LIMIT 0",
      // var-length zero-length with labels
      "MATCH (a:P {name:'Ann'})-[:K*0..1]->(b) RETURN b.name ORDER BY b.name",
      // relationship property on undirected match
      "MATCH (a {name:'Bob'})-[r:K]-(x) RETURN x.name AS n, r.w AS w ORDER BY n",
      // type() and startNode/endNode
      "MATCH (a)-[r]->(b) RETURN DISTINCT type(r) AS t",
      // id uniqueness across labels
      "MATCH (n) RETURN count(DISTINCT id(n)) AS c",
      // percentile
      "MATCH (n) WHERE n.age IS NOT NULL RETURN percentileCont(n.age, 0.5) AS p, percentileDisc(n.age, 0.5) AS d",
      // keys/properties
      "MATCH (n:P {name:'Ann'}) RETURN keys(n) AS k, properties(n) AS p",
      // timestamp-ish / temporal accessors
      "RETURN date('2024-02-29').year AS y, date('2024-02-29').month AS m, date('2024-02-29').day AS d",
      "RETURN date('2024-01-31') + duration({months: 1}) AS x",
      "RETURN duration.between(date('2024-01-01'), date('2025-03-01')).months AS m",
      // string predicates null
      "RETURN null STARTS WITH 'a' AS a, 'abc' CONTAINS null AS b",
      // regex
      "RETURN 'abc' =~ 'a.*' AS a, 'abc' =~ null AS b",
      // math funcs
      "RETURN round(2.5) AS a, round(-2.5) AS b, round(2.4567, 2) AS c",
      "RETURN 2 ^ 10 AS a, 2.0 ^ 0.5 AS b",
      // modulo negative
      "RETURN -7 % 3 AS a, 7 % -3 AS b, 7.5 % 2 AS c"
    )
    qs.foreach { q =>
      try {
        val df = gs.cypher(g, q)
        val rows = df.collect().take(8)
        println(s"PROBE| $q")
        println(s"  SCHEMA ${df.schema.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", ")}")
        rows.foreach(r => println(s"  ROW $r"))
      } catch {
        case e: Throwable =>
          println(s"PROBE| $q")
          println(s"  ERROR ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}")
      }
    }
    spark.stop()
  }
}
