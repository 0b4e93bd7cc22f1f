package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import graft.api.GraftSession
import graft.graph.PropertyGraph

/** TCK-style acceptance corpus (SURVEY §5: the openCypher TCK is the
  * reference's primary correctness oracle — morpheus-tck/.../
  * TckSparkCypherTest.scala:40-120). The real TCK feature files are not
  * vendored here (zero-egress build), so this suite reproduces its shape:
  * each scenario is (given CREATE-fixture graph, query, expected rows,
  * unordered unless stated), run through the full parse → plan → collect
  * path, with a blacklist file (src/test/resources/tck_blacklist.txt)
  * mirroring the reference's scenario blacklists.
  */
class TckStyleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val gs = GraftSession(spark)

  private val graphCache =
    scala.collection.mutable.HashMap.empty[String, PropertyGraph]
  private def graphFor(create: String): PropertyGraph = synchronized {
    graphCache.getOrElseUpdate(create, gs.createGraphFromCypher(create))
  }

  case class Scenario(name: String, given: String, query: String,
      expect: Seq[Map[String, Any]], ordered: Boolean = false,
      params: Map[String, Any] = Map.empty,
      expectError: Option[String] = None)

  private def row(kvs: (String, Any)*): Map[String, Any] = Map(kvs: _*)

  // ---------------------------------------------------------- fixtures
  val social: String = """
    CREATE (a:Person {name: 'Alice', age: 30, city: 'Berlin'})
    CREATE (b:Person {name: 'Bob', age: 25, city: 'Paris'})
    CREATE (c:Person {name: 'Carol', age: 35})
    CREATE (d:Person:Admin {name: 'Dave', age: 40, city: 'Berlin'})
    CREATE (r:Robot {name: 'R2'})
    CREATE (a)-[:KNOWS {since: 2010}]->(b)
    CREATE (b)-[:KNOWS {since: 2015}]->(c)
    CREATE (a)-[:KNOWS {since: 2012}]->(c)
    CREATE (c)-[:KNOWS {since: 2020}]->(d)
    CREATE (a)-[:LIKES]->(r)
  """
  val chain: String =
    "CREATE (:N {v: 1})-[:R {w: 1}]->(:N {v: 2})-[:R {w: 2}]->(:N {v: 3})-[:R {w: 3}]->(:N {v: 4})"
  val nulls: String = """
    CREATE (:X {k: 1, s: 'a'})
    CREATE (:X {k: 2})
    CREATE (:X {s: 'b'})
  """
  val loops: String = """
    CREATE (a:L {v: 1})
    CREATE (b:L {v: 2})
    CREATE (a)-[:S]->(a)
    CREATE (a)-[:S]->(b)
  """
  val empty: String = ""
  // 2-cycle with differing labels (differential case 321 lock)
  val twoCycleAB: String = """
    CREATE (a:B {uid: 0})
    CREATE (b:A {uid: 1})
    CREATE (a)-[:T]->(b)
    CREATE (b)-[:T]->(a)
  """
  // small mixed-type triad: two R hops a→b→c plus an S shortcut a→c
  val triad: String = """
    CREATE (a:P {n: 'a', v: 1})
    CREATE (b:P {n: 'b', v: 2})
    CREATE (c:P {n: 'c', v: 3})
    CREATE (a)-[:R {w: 1}]->(b)
    CREATE (b)-[:R {w: 2}]->(c)
    CREATE (a)-[:S {w: 9}]->(c)
  """
  // two equal-length routes a→d (via b, via c): shortest-path tie
  val tie: String = """
    CREATE (a:T {n: 'a'}), (b:T {n: 'b'}), (c:T {n: 'c'}), (d:T {n: 'd'})
    CREATE (a)-[:E]->(b)
    CREATE (a)-[:E]->(c)
    CREATE (b)-[:E]->(d)
    CREATE (c)-[:E]->(d)
  """

  // --------------------------------------------------------- normalize
  /** canonical JVM form: integers → Long, fp → Double, structs → sorted
    * maps, temporal → ISO string, arrays → List. */
  private def norm(v: Any): Any = v match {
    case null => null
    case b: Boolean => b
    case n: Byte => n.toLong
    case n: Short => n.toLong
    case n: Int => n.toLong
    case n: Long => n
    case f: Float => f.toDouble
    case d: Double => d
    case d: java.math.BigDecimal => d.doubleValue()
    case d: BigDecimal => d.doubleValue
    case s: String => s
    case d: java.sql.Date => d.toString
    case t: java.sql.Timestamp => t.toString
    case t: java.time.LocalDateTime => t.toString
    case t: java.time.LocalDate => t.toString
    case r: Row
        if r.schema != null &&
          r.schema.fieldNames.sameElements(Array("@k", "i", "f", "s", "b")) =>
      // mixed-tagged list element (heterogeneous list encoding): unwrap
      r.getAs[Int]("@k") match {
        case 1 => r.getAs[Long]("i")
        case 2 => r.getAs[Double]("f")
        case 3 => r.getAs[String]("s")
        case 4 => r.getAs[Boolean]("b")
        case _ => null
      }
    case r: Row =>
      r.schema.fieldNames.zip(r.toSeq.map(norm)).toMap
    case m: Map[_, _] =>
      m.map { case (k, x) => k.toString -> norm(x) }
    case s: scala.collection.Seq[_] => s.map(norm).toList
    case a: Array[_] => a.map(norm).toList
    case other => other.toString
  }

  private def render(v: Any): String = v match {
    case null => "null"
    case m: Map[_, _] => m.asInstanceOf[Map[String, Any]].toSeq.sortBy(_._1)
      .map { case (k, x) => s"$k: ${render(x)}" }.mkString("{", ", ", "}")
    case s: List[_] => s.map(render).mkString("[", ", ", "]")
    case d: Double if d.isNaN || d.isInfinite => d.toString
    case d: Double => BigDecimal(d).bigDecimal.stripTrailingZeros.toPlainString
    case other => other.toString
  }

  private def check(sc: Scenario): Unit = {
    val g = graphFor(sc.given)
    sc.expectError.foreach { frag =>
      val e = intercept[Throwable] {
        gs.cypher(g, sc.query, sc.params).collect()
      }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil
        else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(e).exists(_.contains(frag)),
        s"\nquery: ${sc.query}\nexpected error containing '$frag', " +
          s"got: ${e.getClass.getSimpleName}: ${e.getMessage}")
      return
    }
    val df = gs.cypher(g, sc.query, sc.params)
    val cols = df.columns
    val actual = df.collect().toSeq
      .map(r => render(cols.zip(r.toSeq.map(norm)).toMap))
    val expected = sc.expect
      .map(m => render(m.map { case (k, v) => k -> norm(v) }))
    if (sc.ordered)
      assert(actual === expected, s"\nquery: ${sc.query}")
    else
      assert(actual.sorted === expected.sorted, s"\nquery: ${sc.query}")
  }

  // --------------------------------------------------------- scenarios
  val scenarios: Seq[Scenario] = Seq(
    // ---- MATCH basics
    Scenario("match-all-nodes-count", social,
      "MATCH (n) RETURN count(*) AS n", Seq(row("n" -> 5))),
    Scenario("match-label-scan", social,
      "MATCH (p:Person) RETURN count(*) AS n", Seq(row("n" -> 4))),
    Scenario("match-multi-label", social,
      "MATCH (p:Person:Admin) RETURN p.name AS name",
      Seq(row("name" -> "Dave"))),
    Scenario("match-inline-prop-map", social,
      "MATCH (p:Person {city: 'Berlin'}) RETURN p.name AS name",
      Seq(row("name" -> "Alice"), row("name" -> "Dave"))),
    Scenario("match-missing-prop-is-null", social,
      "MATCH (p:Person) WHERE p.city IS NULL RETURN p.name AS name",
      Seq(row("name" -> "Carol"))),
    Scenario("match-labels-function", social,
      "MATCH (p:Admin) RETURN labels(p) AS ls",
      Seq(row("ls" -> List("Admin", "Person")))),
    Scenario("match-rel-type-filter", social,
      "MATCH ()-[r:LIKES]->() RETURN count(*) AS n", Seq(row("n" -> 1))),
    Scenario("match-type-function", social,
      "MATCH (:Person {name: 'Alice'})-[r]->(:Robot) RETURN type(r) AS t",
      Seq(row("t" -> "LIKES"))),
    Scenario("match-incoming-direction", social,
      """MATCH (p:Person)<-[:KNOWS]-(q:Person) WHERE p.name = 'Carol'
        |RETURN q.name AS name""".stripMargin,
      Seq(row("name" -> "Alice"), row("name" -> "Bob"))),
    Scenario("match-undirected", social,
      "MATCH (:Person {name: 'Bob'})-[:KNOWS]-(x) RETURN x.name AS name",
      Seq(row("name" -> "Alice"), row("name" -> "Carol"))),
    Scenario("match-two-hop", social,
      """MATCH (:Person {name: 'Alice'})-[:KNOWS]->()-[:KNOWS]->(c)
        |RETURN c.name AS name""".stripMargin,
      Seq(row("name" -> "Carol"), row("name" -> "Dave"))),
    Scenario("match-cartesian-product", social,
      "MATCH (a:Robot), (b:Admin) RETURN a.name AS an, b.name AS bn",
      Seq(row("an" -> "R2", "bn" -> "Dave"))),
    Scenario("match-anonymous-everything", social,
      "MATCH ()-[:KNOWS]->() RETURN count(*) AS n", Seq(row("n" -> 4))),
    Scenario("match-shared-var-two-parts", social,
      """MATCH (a:Person)-[:KNOWS]->(b:Person), (a)-[:LIKES]->(r:Robot)
        |RETURN DISTINCT a.name AS name""".stripMargin,
      Seq(row("name" -> "Alice"))),
    Scenario("match-expand-into", social,
      """MATCH (a:Person {name: 'Alice'})-[:KNOWS]->(b), (a)-[:KNOWS]->(c)
        |WHERE b.name < c.name RETURN b.name AS b, c.name AS c""".stripMargin,
      Seq(row("b" -> "Bob", "c" -> "Carol"))),

    // ---- WHERE predicates
    Scenario("where-comparison", social,
      "MATCH (p:Person) WHERE p.age > 28 RETURN p.name AS name",
      Seq(row("name" -> "Alice"), row("name" -> "Carol"), row("name" -> "Dave"))),
    Scenario("where-and-or-precedence", social,
      """MATCH (p:Person)
        |WHERE p.age > 28 AND p.city = 'Berlin' OR p.name = 'Bob'
        |RETURN p.name AS name""".stripMargin,
      Seq(row("name" -> "Alice"), row("name" -> "Dave"), row("name" -> "Bob"))),
    Scenario("where-in-list", social,
      "MATCH (p:Person) WHERE p.name IN ['Alice', 'Bob', 'Zed'] RETURN count(*) AS n",
      Seq(row("n" -> 2))),
    Scenario("where-starts-with", social,
      "MATCH (p:Person) WHERE p.name STARTS WITH 'Al' RETURN p.name AS name",
      Seq(row("name" -> "Alice"))),
    Scenario("where-ends-with-or-contains", social,
      """MATCH (p:Person) WHERE p.name ENDS WITH 'e' OR p.name CONTAINS 'aro'
        |RETURN p.name AS name""".stripMargin,
      Seq(row("name" -> "Alice"), row("name" -> "Dave"), row("name" -> "Carol"))),
    Scenario("where-regex", social,
      "MATCH (p:Person) WHERE p.name =~ 'B.*' RETURN p.name AS name",
      Seq(row("name" -> "Bob"))),
    Scenario("where-is-not-null", social,
      "MATCH (p:Person) WHERE p.city IS NOT NULL RETURN count(*) AS n",
      Seq(row("n" -> 3))),
    Scenario("where-not", social,
      "MATCH (p:Person) WHERE NOT p.age > 28 RETURN p.name AS name",
      Seq(row("name" -> "Bob"))),
    Scenario("where-null-comparison-drops-row", social,
      "MATCH (p:Person) WHERE p.city > 'A' RETURN count(*) AS n",
      Seq(row("n" -> 3))),
    Scenario("where-rel-property", social,
      """MATCH (a)-[k:KNOWS]->(b) WHERE k.since > 2011
        |RETURN a.name AS a, b.name AS b""".stripMargin,
      Seq(row("a" -> "Bob", "b" -> "Carol"),
        row("a" -> "Alice", "b" -> "Carol"),
        row("a" -> "Carol", "b" -> "Dave"))),
    Scenario("where-xor", empty,
      "RETURN true XOR false AS a, true XOR true AS b",
      Seq(row("a" -> true, "b" -> false))),
    Scenario("where-parameter", social,
      "MATCH (p:Person) WHERE p.age = $a RETURN p.name AS name",
      Seq(row("name" -> "Bob")), params = Map("a" -> 25)),
    Scenario("where-exists-property", social,
      "MATCH (p:Person) WHERE exists(p.city) RETURN count(*) AS n",
      Seq(row("n" -> 3))),

    // ---- OPTIONAL MATCH
    Scenario("optional-no-match-gives-null", social,
      """MATCH (r:Robot) OPTIONAL MATCH (r)-[:KNOWS]->(x)
        |RETURN r.name AS rn, x.name AS xn""".stripMargin,
      Seq(row("rn" -> "R2", "xn" -> null))),
    Scenario("optional-match-present", social,
      """MATCH (p:Person {name: 'Alice'}) OPTIONAL MATCH (p)-[:KNOWS]->(x)
        |RETURN x.name AS name""".stripMargin,
      Seq(row("name" -> "Bob"), row("name" -> "Carol"))),
    Scenario("optional-count-zero", social,
      """MATCH (p:Person) OPTIONAL MATCH (p)-[:KNOWS]->(x)
        |RETURN p.name AS name, count(x) AS n""".stripMargin,
      Seq(row("name" -> "Alice", "n" -> 2), row("name" -> "Bob", "n" -> 1),
        row("name" -> "Carol", "n" -> 1), row("name" -> "Dave", "n" -> 0))),
    Scenario("optional-first-clause-null-row", social,
      "OPTIONAL MATCH (z:Zed) RETURN z", Seq(row("z" -> null))),
    Scenario("optional-bound-var-no-expand", social,
      """MATCH (a:Person {name: 'Dave'}) OPTIONAL MATCH (a)-[:KNOWS]->(b)
        |RETURN b.name AS bn""".stripMargin,
      Seq(row("bn" -> null))),

    // ---- aggregation
    Scenario("agg-count-star", social,
      "MATCH (p:Person) RETURN count(*) AS n", Seq(row("n" -> 4))),
    Scenario("agg-count-skips-null", social,
      "MATCH (p:Person) RETURN count(p.city) AS n", Seq(row("n" -> 3))),
    Scenario("agg-sum-avg", social,
      "MATCH (p:Person) RETURN sum(p.age) AS s, avg(p.age) AS a",
      Seq(row("s" -> 130, "a" -> 32.5))),
    Scenario("agg-min-max", social,
      "MATCH (p:Person) RETURN min(p.age) AS lo, max(p.age) AS hi",
      Seq(row("lo" -> 25, "hi" -> 40))),
    Scenario("agg-collect-size", social,
      "MATCH (p:Person) WHERE p.city = 'Berlin' RETURN size(collect(p.name)) AS n",
      Seq(row("n" -> 2))),
    Scenario("agg-count-distinct", social,
      "MATCH (a)-[:KNOWS]->() RETURN count(DISTINCT a.name) AS n",
      Seq(row("n" -> 3))),
    Scenario("agg-group-by-includes-null-key", social,
      "MATCH (p:Person) RETURN p.city AS city, count(*) AS n",
      Seq(row("city" -> "Berlin", "n" -> 2), row("city" -> "Paris", "n" -> 1),
        row("city" -> null, "n" -> 1))),
    Scenario("agg-avg-double", chain,
      "MATCH (n:N) RETURN avg(n.v) AS a", Seq(row("a" -> 2.5))),
    Scenario("agg-min-string", social,
      "MATCH (p:Person) RETURN min(p.name) AS m", Seq(row("m" -> "Alice"))),
    Scenario("agg-sum-distinct-intdiv", social,
      "MATCH (p:Person) RETURN sum(DISTINCT p.age / 10) AS s",
      Seq(row("s" -> 9))),
    Scenario("agg-percentile-cont", social,
      "MATCH (p:Person) RETURN percentileCont(p.age, 0.5) AS med",
      Seq(row("med" -> 32.5))),
    Scenario("agg-having-via-with", social,
      """MATCH (a:Person)-[:KNOWS]->() WITH a.name AS name, count(*) AS c
        |WHERE c > 1 RETURN name""".stripMargin,
      Seq(row("name" -> "Alice"))),

    // ---- WITH / ORDER BY / SKIP / LIMIT
    Scenario("order-by-asc", social,
      "MATCH (p:Person) RETURN p.name AS name ORDER BY p.age",
      Seq(row("name" -> "Bob"), row("name" -> "Alice"),
        row("name" -> "Carol"), row("name" -> "Dave")), ordered = true),
    Scenario("order-by-desc-limit", social,
      "MATCH (p:Person) RETURN p.name AS name ORDER BY p.age DESC LIMIT 2",
      Seq(row("name" -> "Dave"), row("name" -> "Carol")), ordered = true),
    Scenario("order-skip-limit", social,
      "MATCH (p:Person) RETURN p.name AS name ORDER BY p.age SKIP 1 LIMIT 2",
      Seq(row("name" -> "Alice"), row("name" -> "Carol")), ordered = true),
    Scenario("order-by-nulls-last", social,
      "MATCH (p:Person) RETURN p.name AS name ORDER BY p.city, p.name",
      Seq(row("name" -> "Alice"), row("name" -> "Dave"),
        row("name" -> "Bob"), row("name" -> "Carol")), ordered = true),
    Scenario("with-rename-filter", social,
      """MATCH (p:Person) WITH p.name AS nm, p.age AS a WHERE a < 30
        |RETURN nm""".stripMargin,
      Seq(row("nm" -> "Bob"))),
    Scenario("with-distinct", social,
      "MATCH (p:Person) WITH DISTINCT p.city AS c RETURN count(*) AS n",
      Seq(row("n" -> 3))),
    Scenario("with-order-limit-then-match", social,
      """MATCH (p:Person) WITH p ORDER BY p.age DESC LIMIT 1
        |MATCH (p)<-[:KNOWS]-(y) RETURN y.name AS name""".stripMargin,
      Seq(row("name" -> "Carol"))),
    Scenario("return-distinct-expression", social,
      "MATCH ()-[k:KNOWS]->() RETURN DISTINCT k.since >= 2015 AS recent",
      Seq(row("recent" -> true), row("recent" -> false))),
    Scenario("limit-zero", social,
      "MATCH (p:Person) RETURN p.name AS name LIMIT 0", Seq.empty),
    Scenario("order-by-unaliased-aggregate", social,
      """MATCH (a:Person)-[:KNOWS]->() RETURN a.name AS name, count(*) AS c
        |ORDER BY count(*) DESC, name LIMIT 1""".stripMargin,
      Seq(row("name" -> "Alice", "c" -> 2)), ordered = true),

    // ---- UNWIND
    Scenario("unwind-literal-list", empty,
      "UNWIND [1, 2, 3] AS x RETURN x",
      Seq(row("x" -> 1), row("x" -> 2), row("x" -> 3))),
    Scenario("unwind-expression", empty,
      "UNWIND [1, 2, 3] AS x RETURN x * 2 AS d",
      Seq(row("d" -> 2), row("d" -> 4), row("d" -> 6))),
    Scenario("unwind-nested-lists", empty,
      "UNWIND [[1, 2], [3]] AS xs RETURN size(xs) AS n",
      Seq(row("n" -> 2), row("n" -> 1))),
    Scenario("unwind-parameter", empty,
      "UNWIND $xs AS x RETURN sum(x) AS s",
      Seq(row("s" -> 6)), params = Map("xs" -> Seq(1L, 2L, 3L))),
    Scenario("unwind-range", empty,
      "UNWIND range(1, 5) AS x RETURN count(*) AS n", Seq(row("n" -> 5))),
    Scenario("unwind-cross-product", empty,
      "UNWIND [1, 2] AS x UNWIND ['a', 'b'] AS y RETURN x, y",
      Seq(row("x" -> 1, "y" -> "a"), row("x" -> 1, "y" -> "b"),
        row("x" -> 2, "y" -> "a"), row("x" -> 2, "y" -> "b"))),

    // ---- lists
    Scenario("list-index-positive-negative", empty,
      "RETURN [1, 2, 3][0] AS h, [1, 2, 3][-1] AS l",
      Seq(row("h" -> 1, "l" -> 3))),
    Scenario("list-slice", empty,
      "RETURN [1, 2, 3, 4][1..3] AS s", Seq(row("s" -> List(2, 3)))),
    Scenario("list-head-last-tail", empty,
      "RETURN head([5, 6, 7]) AS h, last([5, 6, 7]) AS l, tail([5, 6, 7]) AS t",
      Seq(row("h" -> 5, "l" -> 7, "t" -> List(6, 7)))),
    Scenario("list-range-with-step", empty,
      "RETURN range(0, 10, 5) AS r", Seq(row("r" -> List(0, 5, 10)))),
    Scenario("list-comprehension-filter-map", empty,
      "RETURN [x IN range(1, 5) WHERE x % 2 = 0 | x * 10] AS l",
      Seq(row("l" -> List(20, 40)))),
    Scenario("list-reduce", empty,
      "RETURN reduce(acc = 1, x IN [2, 3, 4] | acc * x) AS p",
      Seq(row("p" -> 24))),
    Scenario("list-quantifiers", empty,
      """RETURN all(x IN [1, 2] WHERE x > 0) AS a,
        |       any(x IN [1, 2] WHERE x > 1) AS b,
        |       none(x IN [1, 2] WHERE x > 5) AS c,
        |       single(x IN [1, 2] WHERE x = 2) AS d""".stripMargin,
      Seq(row("a" -> true, "b" -> true, "c" -> true, "d" -> true))),
    Scenario("list-in-operator", empty,
      "RETURN 2 IN [1, 2] AS a, 5 IN [1, 2] AS b",
      Seq(row("a" -> true, "b" -> false))),
    Scenario("list-concatenation", empty,
      "RETURN [1, 2] + [3] AS a, [1] + 2 AS b",
      Seq(row("a" -> List(1, 2, 3), "b" -> List(1, 2)))),
    Scenario("list-size-vs-string-size", empty,
      "RETURN size('hello') AS s, size([1, 2]) AS l",
      Seq(row("s" -> 5, "l" -> 2))),

    // ---- CASE
    Scenario("case-simple-form", social,
      """MATCH (p:Person)
        |RETURN p.name AS name,
        |       CASE p.city WHEN 'Berlin' THEN 'de' WHEN 'Paris' THEN 'fr'
        |            ELSE 'unknown' END AS cc""".stripMargin,
      Seq(row("name" -> "Alice", "cc" -> "de"), row("name" -> "Bob", "cc" -> "fr"),
        row("name" -> "Carol", "cc" -> "unknown"),
        row("name" -> "Dave", "cc" -> "de"))),
    Scenario("case-searched-form", social,
      """MATCH (p:Person)
        |RETURN p.name AS name,
        |       CASE WHEN p.age < 30 THEN 'young' ELSE 'old' END AS bucket""".stripMargin,
      Seq(row("name" -> "Alice", "bucket" -> "old"),
        row("name" -> "Bob", "bucket" -> "young"),
        row("name" -> "Carol", "bucket" -> "old"),
        row("name" -> "Dave", "bucket" -> "old"))),
    Scenario("case-without-default-is-null", empty,
      "RETURN CASE WHEN false THEN 1 END AS v", Seq(row("v" -> null))),
    Scenario("case-in-where", social,
      """MATCH (p:Person)
        |WHERE CASE WHEN p.age > 30 THEN true ELSE false END
        |RETURN p.name AS name""".stripMargin,
      Seq(row("name" -> "Carol"), row("name" -> "Dave"))),

    // ---- scalar functions
    Scenario("fn-string-basics", empty,
      """RETURN toUpper('ab') AS u, toLower('AB') AS lo, trim('  x ') AS t,
        |       reverse('abc') AS r, replace('aaa', 'a', 'b') AS rp,
        |       substring('hello', 1, 3) AS ss, left('hello', 2) AS le,
        |       right('hello', 2) AS ri""".stripMargin,
      Seq(row("u" -> "AB", "lo" -> "ab", "t" -> "x", "r" -> "cba",
        "rp" -> "bbb", "ss" -> "ell", "le" -> "he", "ri" -> "lo"))),
    Scenario("fn-split", empty,
      "RETURN split('a,b,c', ',') AS parts",
      Seq(row("parts" -> List("a", "b", "c")))),
    Scenario("fn-numeric-basics", empty,
      """RETURN abs(-3) AS a, sign(-2) AS sg, ceil(1.2) AS c, floor(1.8) AS f,
        |       round(2.4) AS r, sqrt(16.0) AS q""".stripMargin,
      Seq(row("a" -> 3, "sg" -> -1, "c" -> 2.0, "f" -> 1.0,
        "r" -> 2.0, "q" -> 4.0))),
    Scenario("fn-conversions", empty,
      """RETURN toString(42) AS s, toInteger('7') AS i, toInteger('3.9') AS t,
        |       toFloat('2.5') AS f, toBoolean('true') AS b""".stripMargin,
      Seq(row("s" -> "42", "i" -> 7, "t" -> 3, "f" -> 2.5, "b" -> true))),
    Scenario("fn-coalesce", empty,
      "RETURN coalesce(null, 2) AS a, coalesce(null, null, 3) AS b",
      Seq(row("a" -> 2, "b" -> 3))),
    Scenario("fn-log-exp", empty,
      "RETURN log(e()) AS l, exp(0) AS x", Seq(row("l" -> 1.0, "x" -> 1.0))),
    Scenario("fn-trig", empty,
      "RETURN sin(0) AS s, cos(0) AS c, atan2(0, 1) AS a",
      Seq(row("s" -> 0.0, "c" -> 1.0, "a" -> 0.0))),
    Scenario("fn-mod-pow", empty,
      "RETURN 7 % 3 AS m, 2 ^ 10 AS p", Seq(row("m" -> 1, "p" -> 1024.0))),
    Scenario("fn-keys-of-map", empty,
      // INSERTION order, not sorted (reference FunctionTests "works with
      // literal maps2"; r9 flip — entity keys stay sorted)
      "RETURN keys({b: 1, a: 2}) AS ks", Seq(row("ks" -> List("b", "a")))),
    Scenario("fn-element-identities", social,
      """MATCH (a:Person {name: 'Alice'})-[r:KNOWS]->(b {name: 'Bob'})
        |RETURN id(a) <> id(b) AS diff, startNode(r) = id(a) AS s,
        |       endNode(r) = id(b) AS e""".stripMargin,
      Seq(row("diff" -> true, "s" -> true, "e" -> true))),
    Scenario("fn-properties-map", social,
      "MATCH (r:Robot) RETURN properties(r) AS p",
      Seq(row("p" -> Map("name" -> "R2")))),
    Scenario("fn-keys-of-entity", social,
      "MATCH (p:Person {name: 'Carol'}) RETURN keys(p) AS ks",
      Seq(row("ks" -> List("age", "name")))),

    // ---- var-length paths
    Scenario("varlength-1-to-2", chain,
      "MATCH (:N {v: 1})-[:R*1..2]->(b) RETURN b.v AS v",
      Seq(row("v" -> 2), row("v" -> 3))),
    Scenario("varlength-exactly-2", chain,
      "MATCH (:N {v: 1})-[:R*2..2]->(b) RETURN b.v AS v",
      Seq(row("v" -> 3))),
    Scenario("varlength-zero-to-1", chain,
      "MATCH (:N {v: 1})-[:R*0..1]->(b) RETURN b.v AS v",
      Seq(row("v" -> 1), row("v" -> 2))),
    Scenario("varlength-unbounded", chain,
      "MATCH (:N {v: 1})-[:R*]->(b) RETURN b.v AS v",
      Seq(row("v" -> 2), row("v" -> 3), row("v" -> 4))),
    Scenario("varlength-property-map-filters-steps", chain,
      "MATCH (:N {v: 1})-[:R*1..3 {w: 1}]->(b) RETURN b.v AS v",
      Seq(row("v" -> 2))),
    Scenario("varlength-rel-list-size", chain,
      "MATCH (:N {v: 1})-[rs:R*2..3]->(b) RETURN b.v AS v, size(rs) AS n",
      Seq(row("v" -> 3, "n" -> 2), row("v" -> 4, "n" -> 3))),
    Scenario("varlength-incoming", chain,
      "MATCH (:N {v: 3})<-[:R*1..2]-(b) RETURN b.v AS v",
      Seq(row("v" -> 2), row("v" -> 1))),

    // ---- UNION
    Scenario("union-all-keeps-duplicates", social,
      """MATCH (p:Person {city: 'Berlin'}) RETURN p.name AS name
        |UNION ALL MATCH (p:Admin) RETURN p.name AS name""".stripMargin,
      Seq(row("name" -> "Alice"), row("name" -> "Dave"), row("name" -> "Dave"))),
    Scenario("union-distinct", social,
      """MATCH (p:Person {city: 'Berlin'}) RETURN p.name AS name
        |UNION MATCH (p:Admin) RETURN p.name AS name""".stripMargin,
      Seq(row("name" -> "Alice"), row("name" -> "Dave"))),
    Scenario("union-of-literals", empty,
      "RETURN 1 AS x UNION RETURN 1 AS x", Seq(row("x" -> 1))),

    // ---- EXISTS / pattern predicates
    Scenario("exists-pattern-predicate", social,
      "MATCH (p:Person) WHERE (p)-[:LIKES]->() RETURN p.name AS name",
      Seq(row("name" -> "Alice"))),
    Scenario("not-exists-pattern-predicate", social,
      "MATCH (p:Person) WHERE NOT (p)-[:KNOWS]->() RETURN p.name AS name",
      Seq(row("name" -> "Dave"))),
    Scenario("exists-subquery-with-where", social,
      """MATCH (p:Person)
        |WHERE EXISTS { MATCH (p)-[:KNOWS]->(x) WHERE x.age > 30 }
        |RETURN p.name AS name""".stripMargin,
      Seq(row("name" -> "Alice"), row("name" -> "Bob"), row("name" -> "Carol"))),
    Scenario("exists-as-return-value", social,
      """MATCH (p:Person)
        |RETURN p.name AS name, exists((p)-[:LIKES]->()) AS likes""".stripMargin,
      Seq(row("name" -> "Alice", "likes" -> true),
        row("name" -> "Bob", "likes" -> false),
        row("name" -> "Carol", "likes" -> false),
        row("name" -> "Dave", "likes" -> false))),
    Scenario("pattern-comprehension-count", social,
      """MATCH (p:Person)
        |RETURN p.name AS name, size([(p)-[:KNOWS]->(x) | x.name]) AS n""".stripMargin,
      Seq(row("name" -> "Alice", "n" -> 2), row("name" -> "Bob", "n" -> 1),
        row("name" -> "Carol", "n" -> 1), row("name" -> "Dave", "n" -> 0))),

    // ---- null semantics
    Scenario("null-equals-null-is-null", empty,
      "RETURN null = null AS a, null <> null AS b",
      Seq(row("a" -> null, "b" -> null))),
    Scenario("null-predicate-drops-row", nulls,
      "MATCH (x:X) WHERE x.k > 0 RETURN count(*) AS n", Seq(row("n" -> 2))),
    Scenario("null-arithmetic-propagates", empty,
      "RETURN 1 + null AS a, null * 2 AS b", Seq(row("a" -> null, "b" -> null))),
    Scenario("null-size-is-null", empty,
      "RETURN size(null) AS s", Seq(row("s" -> null))),
    Scenario("null-filter-is-null", nulls,
      "MATCH (x:X) WHERE x.s IS NULL RETURN x.k AS k", Seq(row("k" -> 2))),
    Scenario("null-ternary-logic", empty,
      """RETURN (null AND false) AS a, (null OR true) AS b,
        |       (null AND true) AS c""".stripMargin,
      Seq(row("a" -> false, "b" -> true, "c" -> null))),

    // ---- maps, strings, temporal odds and ends
    Scenario("map-projection", social,
      "MATCH (p:Person {name: 'Bob'}) RETURN p {.name, .age} AS m",
      Seq(row("m" -> Map("name" -> "Bob", "age" -> 25)))),
    Scenario("map-literal-field-access", empty,
      "RETURN {a: 1, b: 'x'}.b AS v", Seq(row("v" -> "x"))),
    Scenario("map-dynamic-index", empty,
      "RETURN {a: 5}['a'] AS v", Seq(row("v" -> 5))),
    Scenario("string-plus-number-concat", empty,
      "RETURN 'a' + 1 AS s", Seq(row("s" -> "a1"))),
    Scenario("temporal-accessor-on-literal-date", empty,
      "RETURN date('2020-06-15').month AS m, date('2020-06-15').year AS y",
      Seq(row("m" -> 6, "y" -> 2020))),
    Scenario("temporal-date-plus-duration", empty,
      "RETURN date('2020-01-01') + duration('P1M') AS d",
      Seq(row("d" -> "2020-02-01"))),
    Scenario("distinct-order-combo", chain,
      "MATCH (n:N) RETURN DISTINCT n.v % 2 AS p ORDER BY p",
      Seq(row("p" -> 0), row("p" -> 1)), ordered = true),

    // ---- null propagation edge cases
    Scenario("null-in-list-membership", empty,
      "RETURN (3 IN [3, null]) AS hit, (3 IN [1, null]) AS miss",
      Seq(row("hit" -> true, "miss" -> null))),
    Scenario("null-in-where-drops-row", nulls,
      "MATCH (x:X) WHERE x.k IN [2, null] RETURN x.k AS k",
      Seq(row("k" -> 2))),
    Scenario("null-string-ops-propagate", empty,
      """RETURN (null STARTS WITH 'a') AS sw, ('abc' CONTAINS null) AS ct,
        |       toUpper(null) AS up""".stripMargin,
      Seq(row("sw" -> null, "ct" -> null, "up" -> null))),
    Scenario("null-case-operand-falls-through", empty,
      "RETURN CASE null WHEN 1 THEN 'one' ELSE 'other' END AS v",
      Seq(row("v" -> "other"))),
    Scenario("coalesce-chain", nulls,
      "MATCH (x:X) RETURN coalesce(x.s, toString(x.k), 'none') AS v",
      Seq(row("v" -> "a"), row("v" -> "2"), row("v" -> "b"))),
    Scenario("count-prop-skips-nulls", social,
      "MATCH (p:Person) RETURN count(p.city) AS cc, count(*) AS all",
      Seq(row("cc" -> 3, "all" -> 4))),
    Scenario("collect-skips-nulls", social,
      "MATCH (p:Person) RETURN size(collect(p.city)) AS n",
      Seq(row("n" -> 3))),
    Scenario("avg-ignores-nulls", nulls,
      "MATCH (x:X) RETURN avg(x.k) AS a", Seq(row("a" -> 1.5))),
    Scenario("quantifier-over-null-elements", empty,
      "RETURN all(x IN [1, 2] WHERE x > 0) AS a, any(x IN [] WHERE x > 0) AS b",
      Seq(row("a" -> true, "b" -> false))),

    // ---- WITH pipelines: aggregate then filter/continue
    Scenario("with-aggregate-then-where", social,
      """MATCH (p:Person) WITH p.city AS c, count(*) AS n WHERE n > 1
        |RETURN c""".stripMargin,
      Seq(row("c" -> "Berlin"))),
    Scenario("with-aggregate-then-match-on", social,
      """MATCH (a:Person)-[:KNOWS]->(b:Person)
        |WITH a, count(b) AS outdeg WHERE outdeg >= 2
        |MATCH (a)-[:KNOWS]->(f:Person)
        |RETURN a.name AS n, count(f) AS again""".stripMargin,
      Seq(row("n" -> "Alice", "again" -> 2))),
    Scenario("with-order-limit-then-expand", social,
      """MATCH (p:Person) WITH p ORDER BY p.age DESC LIMIT 1
        |OPTIONAL MATCH (p)-[:KNOWS]->(q)
        |RETURN p.name AS n, q.name AS q""".stripMargin,
      Seq(row("n" -> "Dave", "q" -> null))),
    Scenario("with-alias-shadowing", social,
      """MATCH (p:Person {name: 'Alice'}) WITH p.age AS p
        |RETURN p + 1 AS v""".stripMargin,
      Seq(row("v" -> 31))),
    Scenario("with-distinct-counts-once", social,
      """MATCH (a:Person)-[:KNOWS]->(:Person)
        |WITH DISTINCT a RETURN count(*) AS n""".stripMargin,
      Seq(row("n" -> 3))),

    // ---- UNION
    Scenario("union-distinct-dedups-across-branches", social,
      """MATCH (p:Person {city: 'Berlin'}) RETURN p.name AS n
        |UNION
        |MATCH (p:Admin) RETURN p.name AS n""".stripMargin,
      Seq(row("n" -> "Alice"), row("n" -> "Dave"))),
    Scenario("union-all-same-branch-twice", social,
      """MATCH (p:Admin) RETURN p.name AS n
        |UNION ALL
        |MATCH (p:Admin) RETURN p.name AS n""".stripMargin,
      Seq(row("n" -> "Dave"), row("n" -> "Dave"))),
    Scenario("union-three-branches", empty,
      """RETURN 1 AS v UNION RETURN 2 AS v UNION RETURN 1 AS v""",
      Seq(row("v" -> 1), row("v" -> 2))),

    // ---- UNWIND edge cases
    Scenario("unwind-empty-list-no-rows", empty,
      "UNWIND [] AS x RETURN x", Seq.empty),
    Scenario("unwind-range-step", empty,
      "UNWIND range(0, 10, 3) AS x RETURN x ORDER BY x",
      Seq(row("x" -> 0), row("x" -> 3), row("x" -> 6), row("x" -> 9)),
      ordered = true),
    Scenario("unwind-nested", empty,
      """UNWIND [[1, 2], [3]] AS xs UNWIND xs AS x
        |RETURN sum(x) AS s""".stripMargin,
      Seq(row("s" -> 6))),
    Scenario("unwind-then-aggregate-distinct", empty,
      "UNWIND [1, 1, 2, 2, 3] AS x RETURN count(DISTINCT x) AS n",
      Seq(row("n" -> 3))),

    // ---- list functions
    Scenario("head-last-on-empty-is-null", empty,
      "RETURN head([]) AS h, last([]) AS l",
      Seq(row("h" -> null, "l" -> null))),
    Scenario("tail-and-slice", empty,
      "RETURN tail([1, 2, 3]) AS t, [1, 2, 3, 4][1..3] AS s",
      Seq(row("t" -> List(2, 3), "s" -> List(2, 3)))),
    Scenario("reduce-sum", empty,
      "RETURN reduce(acc = 0, x IN [1, 2, 3] | acc + x) AS s",
      Seq(row("s" -> 6))),
    Scenario("list-comprehension-filter-project", empty,
      "RETURN [x IN range(1, 6) WHERE x % 2 = 0 | x * 10] AS l",
      Seq(row("l" -> List(20, 40, 60)))),
    Scenario("reverse-string-and-list", empty,
      "RETURN reverse('abc') AS s, reverse([1, 2, 3]) AS l",
      Seq(row("s" -> "cba", "l" -> List(3, 2, 1)))),

    // ---- ORDER BY semantics
    Scenario("order-by-asc-nulls-last", nulls,
      "MATCH (x:X) RETURN x.k AS k ORDER BY k ASC",
      Seq(row("k" -> 1), row("k" -> 2), row("k" -> null)), ordered = true),
    Scenario("order-by-aggregate-unaliased", social,
      """MATCH (p:Person) RETURN p.city AS c, count(*) AS n
        |ORDER BY count(*) DESC, c ASC""".stripMargin,
      Seq(row("c" -> "Berlin", "n" -> 2), row("c" -> "Paris", "n" -> 1),
        row("c" -> null, "n" -> 1)), ordered = true),
    Scenario("order-by-expression-of-alias", chain,
      "MATCH (n:N) RETURN n.v AS v ORDER BY -v LIMIT 2",
      Seq(row("v" -> 4), row("v" -> 3)), ordered = true),

    // ---- var-length extras
    Scenario("varlength-zero-includes-self", chain,
      """MATCH (a:N {v: 1})-[:R*0..1]->(b)
        |RETURN b.v AS v""".stripMargin,
      Seq(row("v" -> 1), row("v" -> 2))),
    Scenario("varlength-exact-two", chain,
      "MATCH (a:N {v: 1})-[:R*2]->(b) RETURN b.v AS v",
      Seq(row("v" -> 3))),
    Scenario("varlength-incoming-from-end", chain,
      "MATCH (a:N {v: 4})<-[:R*1..2]-(b) RETURN b.v AS v",
      Seq(row("v" -> 3), row("v" -> 2))),

    // ---- EXISTS forms
    Scenario("exists-block-with-where", social,
      """MATCH (p:Person)
        |WHERE EXISTS { MATCH (p)-[k:KNOWS]->(:Person) WHERE k.since > 2014 }
        |RETURN p.name AS n""".stripMargin,
      Seq(row("n" -> "Bob"), row("n" -> "Carol"))),
    Scenario("exists-as-value", social,
      """MATCH (p:Person {name: 'Dave'})
        |RETURN exists((p)-[:KNOWS]->()) AS out,
        |       exists(()-[:KNOWS]->(p)) AS in""".stripMargin,
      Seq(row("out" -> false, "in" -> true))),

    // ---- coercions and scalars
    Scenario("type-coercion-functions", empty,
      """RETURN toInteger('42') AS i, toFloat('3.5') AS f,
        |       toBoolean('true') AS b, toInteger(3.9) AS t""".stripMargin,
      Seq(row("i" -> 42, "f" -> 3.5, "b" -> true, "t" -> 3))),
    Scenario("min-max-over-strings", social,
      "MATCH (p:Person) RETURN min(p.name) AS lo, max(p.name) AS hi",
      Seq(row("lo" -> "Alice", "hi" -> "Dave"))),
    Scenario("sign-and-abs", empty,
      "RETURN sign(-5) AS s, abs(-2.5) AS a, sign(0) AS z",
      Seq(row("s" -> -1, "a" -> 2.5, "z" -> 0))),
    Scenario("integer-division-truncates", empty,
      "RETURN 7 / 2 AS q, -7 / 2 AS nq, 7.0 / 2 AS f",
      Seq(row("q" -> 3, "nq" -> -3, "f" -> 3.5))),
    Scenario("parameter-in-property-map", social,
      "MATCH (p:Person {name: $who}) RETURN p.age AS a",
      Seq(row("a" -> 25)), params = Map("who" -> "Bob")),
    Scenario("comments-line-and-block", social,
      """MATCH (p:Person) // line comment
        |/* block
        |   comment */ WHERE p.age > 35 /* inline */ RETURN p.name AS n""".stripMargin,
      Seq(row("n" -> "Dave"))),
    Scenario("with-star-plus-item", social,
      """MATCH (p:Person {name: 'Bob'}) WITH *, p.age * 2 AS dbl
        |RETURN p.name AS n, dbl""".stripMargin,
      Seq(row("n" -> "Bob", "dbl" -> 50))),
    Scenario("arithmetic-over-aggregate", social,
      "MATCH (p:Person) RETURN count(*) * 2 + 1 AS n",
      Seq(row("n" -> 9))),
    Scenario("aggregate-of-expression", social,
      "MATCH (p:Person) RETURN sum(p.age * 2) AS s",
      Seq(row("s" -> 260))),
    Scenario("two-aggregates-combined", social,
      "MATCH (p:Person) RETURN max(p.age) - min(p.age) AS spread",
      Seq(row("spread" -> 15))),
    Scenario("unwind-collected-roundtrip", social,
      """MATCH (p:Person) WITH collect(p.age) AS ages
        |UNWIND ages AS a RETURN count(a) AS n, sum(a) AS s""".stripMargin,
      Seq(row("n" -> 4, "s" -> 130))),
    Scenario("correlated-rematch-via-with", social,
      """MATCH (a:Person {name: 'Alice'}) WITH a.city AS city
        |MATCH (b:Person {city: city}) RETURN b.name AS n ORDER BY n""".stripMargin,
      Seq(row("n" -> "Alice"), row("n" -> "Dave"))),
    Scenario("nested-list-indexing", empty,
      "RETURN [[1, 2], [3]][0][1] AS v, [[1, 2], [3]][1][0] AS w",
      Seq(row("v" -> 2, "w" -> 3))),
    Scenario("distinct-entity-ids", social,
      """MATCH (a:Person)-[:KNOWS]->(:Person)
        |RETURN count(DISTINCT id(a)) AS n""".stripMargin,
      Seq(row("n" -> 3))),
    Scenario("map-projection-in-exists-where", social,
      """MATCH (p:Person)
        |WHERE EXISTS { MATCH (p)-[:KNOWS]->(:Person)
        |               WHERE p {.city}.city = 'Berlin' }
        |RETURN p.name AS n""".stripMargin,
      Seq(row("n" -> "Alice"))),
    Scenario("case-searched-with-null-branch", nulls,
      """MATCH (x:X)
        |RETURN CASE WHEN x.k IS NULL THEN 'nk' ELSE toString(x.k) END AS v""".stripMargin,
      Seq(row("v" -> "1"), row("v" -> "2"), row("v" -> "nk"))),

    // ---- structural: shared vars across pattern parts, loops, uniqueness
    Scenario("triangle-via-pattern-parts", social,
      """MATCH (a)-[:KNOWS]->(b), (b)-[:KNOWS]->(c), (a)-[:KNOWS]->(c)
        |RETURN a.name AS a, b.name AS b, c.name AS c""".stripMargin,
      Seq(row("a" -> "Alice", "b" -> "Bob", "c" -> "Carol"))),
    Scenario("self-loop-match", loops,
      "MATCH (x)-[:S]->(x) RETURN x.v AS v", Seq(row("v" -> 1))),
    Scenario("self-loop-not-matched-by-two-node-pattern", loops,
      // (a)->(a) and (a)->(b): the two-distinct-var pattern still matches
      // the loop (vars may bind the same node in openCypher)
      "MATCH (x)-[:S]->(y) RETURN x.v AS x, y.v AS y",
      Seq(row("x" -> 1, "y" -> 1), row("x" -> 1, "y" -> 2))),
    Scenario("undirected-two-hop-rel-uniqueness", chain,
      // without relationship isomorphism, bounce-backs like 1-2-1 leak in
      """MATCH (x)-[r1:R]-(y)-[r2:R]-(z)
        |RETURN x.v AS x, y.v AS y, z.v AS z""".stripMargin,
      Seq(row("x" -> 1, "y" -> 2, "z" -> 3), row("x" -> 3, "y" -> 2, "z" -> 1),
        row("x" -> 2, "y" -> 3, "z" -> 4), row("x" -> 4, "y" -> 3, "z" -> 2))),
    Scenario("where-label-predicate-expression", social,
      "MATCH (n) WHERE n:Admin RETURN n.name AS name",
      Seq(row("name" -> "Dave"))),
    Scenario("optional-match-with-inner-where", social,
      """MATCH (p:Person)
        |OPTIONAL MATCH (p)-[k:KNOWS]->(q) WHERE k.since > 2014
        |RETURN p.name AS p, q.name AS q""".stripMargin,
      Seq(row("p" -> "Alice", "q" -> null), row("p" -> "Bob", "q" -> "Carol"),
        row("p" -> "Carol", "q" -> "Dave"), row("p" -> "Dave", "q" -> null))),

    // ---- expression edge cases
    Scenario("int-float-equality", empty,
      "RETURN 1 = 1.0 AS a, 2 = 2.5 AS b", Seq(row("a" -> true, "b" -> false))),
    Scenario("exponent-and-parenthesized-base", empty,
      "RETURN 2 ^ 10 AS p, (-3) ^ 2 AS q",
      Seq(row("p" -> 1024.0, "q" -> 9.0))),
    Scenario("modulo-negative-operands", empty,
      "RETURN 7 % 3 AS a, -7 % 3 AS b, 7 % -3 AS c",
      Seq(row("a" -> 1, "b" -> -1, "c" -> 1))),
    Scenario("round-half-away-from-zero", empty,
      "RETURN round(2.5) AS a, round(-2.5) AS b, round(2.4) AS c",
      Seq(row("a" -> 3.0, "b" -> -3.0, "c" -> 2.0))),
    Scenario("substring-beyond-length", empty,
      "RETURN substring('abc', 1, 10) AS a, left('ab', 5) AS b, right('ab', 5) AS c",
      Seq(row("a" -> "bc", "b" -> "ab", "c" -> "ab"))),
    Scenario("tostring-of-scalars", empty,
      "RETURN toString(true) AS b, toString(3.5) AS d, toString(7) AS i",
      Seq(row("b" -> "true", "d" -> "3.5", "i" -> "7"))),
    Scenario("string-escape-quote", empty,
      "RETURN 'it\\'s' AS a, \"qu\\\"ote\" AS b",
      Seq(row("a" -> "it's", "b" -> "qu\"ote"))),
    Scenario("nested-case-expressions", social,
      """MATCH (p:Person) RETURN p.name AS name,
        |CASE WHEN p.age >= 40 THEN 'senior'
        |     ELSE CASE WHEN p.age >= 30 THEN 'mid' ELSE 'junior' END
        |END AS band""".stripMargin,
      Seq(row("name" -> "Alice", "band" -> "mid"),
        row("name" -> "Bob", "band" -> "junior"),
        row("name" -> "Carol", "band" -> "mid"),
        row("name" -> "Dave", "band" -> "senior"))),

    // ---- projection / paging edges
    Scenario("skip-beyond-rowcount", social,
      "MATCH (p:Person) RETURN p.name AS name SKIP 100", Seq.empty),
    Scenario("limit-beyond-rowcount", social,
      "MATCH (p:Person) RETURN count(*) AS n LIMIT 10", Seq(row("n" -> 4))),
    Scenario("order-by-two-keys-mixed-direction", social,
      """MATCH (p:Person) WHERE p.city IS NOT NULL
        |RETURN p.city AS city, p.name AS name
        |ORDER BY city ASC, name DESC""".stripMargin,
      Seq(row("city" -> "Berlin", "name" -> "Dave"),
        row("city" -> "Berlin", "name" -> "Alice"),
        row("city" -> "Paris", "name" -> "Bob")), ordered = true),
    Scenario("return-star-after-with-projection", social,
      """MATCH (p:Person) WITH p.name AS name, p.age AS age
        |WHERE age < 31 RETURN * ORDER BY age""".stripMargin,
      Seq(row("name" -> "Bob", "age" -> 25), row("name" -> "Alice", "age" -> 30)),
      ordered = true),

    // ---- parameters
    Scenario("parameter-list-in-membership", social,
      "MATCH (p:Person) WHERE p.name IN $names RETURN p.age AS age",
      Seq(row("age" -> 30), row("age" -> 25)),
      params = Map("names" -> List("Alice", "Bob"))),
    Scenario("parameter-in-limit", social,
      "MATCH (p:Person) RETURN p.name AS n ORDER BY n LIMIT $lim",
      Seq(row("n" -> "Alice"), row("n" -> "Bob")), ordered = true,
      params = Map("lim" -> 2)),

    // ---- aggregation edges
    Scenario("count-distinct-vs-plain", social,
      """MATCH (p:Person)
        |RETURN count(p.city) AS plain, count(DISTINCT p.city) AS dist""".stripMargin,
      Seq(row("plain" -> 3, "dist" -> 2))),
    Scenario("collect-distinct-size", social,
      "MATCH (p:Person) RETURN size(collect(DISTINCT p.city)) AS n",
      Seq(row("n" -> 2))),
    Scenario("stdev-of-known-values", empty,
      "UNWIND [2, 4, 4, 4, 5, 5, 7, 9] AS x RETURN stDevP(x) AS sd",
      Seq(row("sd" -> 2.0))),
    Scenario("percentile-disc-picks-member", empty,
      "UNWIND [10, 20, 30, 40] AS x RETURN percentileDisc(x, 0.5) AS p",
      Seq(row("p" -> 20))),
    Scenario("aggregate-grouped-by-two-keys", social,
      """MATCH (a:Person)-[:KNOWS]->(b:Person)
        |RETURN a.city AS city, b.city IS NULL AS dst_nocity, count(*) AS n""".stripMargin,
      Seq(row("city" -> "Berlin", "dst_nocity" -> false, "n" -> 1),
        row("city" -> "Berlin", "dst_nocity" -> true, "n" -> 1),
        row("city" -> "Paris", "dst_nocity" -> true, "n" -> 1),
        row("city" -> null, "dst_nocity" -> false, "n" -> 1))),

    // ---- lists / maps edges
    Scenario("distinct-over-map-values", empty,
      "UNWIND [{a: 1}, {a: 1}, {a: 2}] AS m RETURN DISTINCT m",
      Seq(row("m" -> Map("a" -> 1)), row("m" -> Map("a" -> 2)))),
    Scenario("in-over-list-of-lists", empty,
      "RETURN [1, 2] IN [[1, 2], [3]] AS a, [1] IN [[1, 2]] AS b",
      Seq(row("a" -> true, "b" -> false))),

    // ---- harder shapes: var-length composition, scope-order projection
    Scenario("varlength-undirected", chain,
      "MATCH (a {v: 2})-[:R*1..1]-(b) RETURN b.v AS v",
      Seq(row("v" -> 1), row("v" -> 3))),
    Scenario("varlength-alternate-types", social,
      "MATCH (a {name: 'Alice'})-[:KNOWS|LIKES*1..1]->(b) RETURN b.name AS n",
      Seq(row("n" -> "Bob"), row("n" -> "Carol"), row("n" -> "R2"))),
    Scenario("two-varlength-hops-in-one-pattern", chain,
      """MATCH (a {v: 1})-[:R*1..2]->(b)-[:R*1..2]->(c)
        |RETURN b.v AS b, c.v AS c""".stripMargin,
      Seq(row("b" -> 2, "c" -> 3), row("b" -> 2, "c" -> 4),
        row("b" -> 3, "c" -> 4))),
    Scenario("optional-varlength-no-match", chain,
      """MATCH (a {v: 4}) OPTIONAL MATCH (a)-[:R*1..2]->(b)
        |RETURN a.v AS a, b.v AS b""".stripMargin,
      Seq(row("a" -> 4, "b" -> null))),
    Scenario("exists-with-varlength-pattern", chain,
      "MATCH (a) WHERE (a)-[:R*2..2]->() RETURN a.v AS v",
      Seq(row("v" -> 1), row("v" -> 2))),
    Scenario("pattern-predicate-with-prop-map", social,
      "MATCH (a) WHERE (a)-[:KNOWS]->({name: 'Bob'}) RETURN a.name AS n",
      Seq(row("n" -> "Alice"))),
    Scenario("order-by-non-projected-variable", social,
      "MATCH (p:Person) RETURN p.age AS age ORDER BY p.name DESC",
      Seq(row("age" -> 40), row("age" -> 35), row("age" -> 25),
        row("age" -> 30)), ordered = true),
    Scenario("count-distinct-nodes", social,
      """MATCH (a:Person)-[:KNOWS]->(b)
        |RETURN count(DISTINCT a) AS n""".stripMargin,
      Seq(row("n" -> 3))),
    Scenario("unwind-then-varlength-match", chain,
      """UNWIND [1, 3] AS start
        |MATCH (a {v: start})-[:R*1..1]->(b)
        |RETURN start AS s, b.v AS b""".stripMargin,
      Seq(row("s" -> 1, "b" -> 2), row("s" -> 3, "b" -> 4))),
    Scenario("with-skip-and-limit-window", social,
      """MATCH (p:Person) WITH p ORDER BY p.age SKIP 1 LIMIT 2
        |RETURN p.name AS n ORDER BY n""".stripMargin,
      Seq(row("n" -> "Alice"), row("n" -> "Carol")), ordered = true),
    Scenario("return-distinct-whole-node", social,
      """MATCH (a:Person)-[:KNOWS]->(b:Person)
        |RETURN count(*) AS n
        |UNION
        |MATCH (x) RETURN count(DISTINCT x) AS n""".stripMargin,
      Seq(row("n" -> 4), row("n" -> 5))),
    Scenario("long-with-pipeline", social,
      """MATCH (p:Person) WITH p WHERE p.age > 24
        |WITH p.name AS name, p.age AS age WHERE age < 40
        |WITH name, age ORDER BY age DESC LIMIT 2
        |RETURN name, age ORDER BY name""".stripMargin,
      Seq(row("name" -> "Alice", "age" -> 30),
        row("name" -> "Carol", "age" -> 35)), ordered = true),

    // ---- named paths & shortest paths (extension; the reference
    // blacklists path scenarios in its TCK run)
    Scenario("path-length-single-hop", social,
      """MATCH p = (a:Person {name: 'Alice'})-[:KNOWS]->(b)
        |RETURN b.name AS name, length(p) AS len""".stripMargin,
      Seq(row("name" -> "Bob", "len" -> 1), row("name" -> "Carol", "len" -> 1))),
    Scenario("path-varlength-lengths", social,
      """MATCH p = (a:Person {name: 'Alice'})-[:KNOWS*1..2]->(x)
        |RETURN x.name AS name, length(p) AS len""".stripMargin,
      Seq(row("name" -> "Bob", "len" -> 1), row("name" -> "Carol", "len" -> 1),
        row("name" -> "Carol", "len" -> 2), row("name" -> "Dave", "len" -> 2))),
    Scenario("path-nodes-size-filter", social,
      """MATCH p = (a:Person {name: 'Alice'})-[:KNOWS*1..2]->(x)
        |WHERE size(nodes(p)) = 3 RETURN x.name AS name""".stripMargin,
      Seq(row("name" -> "Carol"), row("name" -> "Dave"))),
    Scenario("path-relationships-equals-length", social,
      """MATCH p = (a:Person {name: 'Alice'})-[:KNOWS*1..2]->(x)
        |RETURN size(relationships(p)) = length(p) AS same""".stripMargin,
      Seq(row("same" -> true), row("same" -> true),
        row("same" -> true), row("same" -> true))),
    Scenario("path-zero-length", loops,
      """MATCH p = (a:L {v: 1})-[:S*0..0]->(x)
        |RETURN length(p) AS len, x.v AS v""".stripMargin,
      Seq(row("len" -> 0, "v" -> 1))),
    Scenario("path-self-loop", loops,
      "MATCH p = (a:L {v: 1})-[:S*1..1]->(a) RETURN length(p) AS len",
      Seq(row("len" -> 1))),
    Scenario("path-optional-null", social,
      """MATCH (r:Robot) OPTIONAL MATCH p = (r)-[:KNOWS]->(x)
        |RETURN r.name AS rn, length(p) AS len""".stripMargin,
      Seq(row("rn" -> "R2", "len" -> null))),
    Scenario("path-multi-segment", chain,
      """MATCH p = (a:N {v: 1})-[:R]->(b)-[:R*1..2]->(c)
        |RETURN c.v AS v, length(p) AS len""".stripMargin,
      Seq(row("v" -> 3, "len" -> 2), row("v" -> 4, "len" -> 3))),
    Scenario("shortestpath-prefers-direct-edge", social,
      """MATCH p = shortestPath(
        |  (a:Person {name: 'Alice'})-[:KNOWS*1..2]->(c:Person {name: 'Carol'}))
        |RETURN length(p) AS len""".stripMargin,
      Seq(row("len" -> 1))),
    Scenario("allshortestpaths-keeps-ties", tie,
      """MATCH p = allShortestPaths((a:T {n: 'a'})-[:E*1..3]->(d:T {n: 'd'}))
        |RETURN length(p) AS len""".stripMargin,
      Seq(row("len" -> 2), row("len" -> 2))),
    Scenario("shortestpath-one-winner-among-ties", tie,
      """MATCH p = shortestPath((a:T {n: 'a'})-[:E*1..3]->(d:T {n: 'd'}))
        |RETURN length(p) AS len""".stripMargin,
      Seq(row("len" -> 2))),
    Scenario("shortestpath-per-endpoint-pair", tie,
      """MATCH p = shortestPath((a:T {n: 'a'})-[:E*1..3]->(x:T))
        |RETURN x.n AS n, length(p) AS len""".stripMargin,
      Seq(row("n" -> "b", "len" -> 1), row("n" -> "c", "len" -> 1),
        row("n" -> "d", "len" -> 2))),

    // ---- cross-type-family comparison semantics (openCypher: equality
    // of incomparable values is false, ordering is null — never an error)
    Scenario("cross-type-equality-is-false", empty,
      "RETURN '1' = 1 AS a, 1 = true AS b, 1 <> '1' AS c",
      Seq(row("a" -> false, "b" -> false, "c" -> true))),
    Scenario("cross-type-ordering-is-null", empty,
      "RETURN 'a' < 1 AS a, true > 0 AS b",
      Seq(row("a" -> null, "b" -> null))),
    Scenario("same-family-widths-compare", empty,
      "RETURN 1 = 1.0 AS a, 1 < 2.5 AS b, false < true AS c",
      Seq(row("a" -> true, "b" -> true, "c" -> true))),
    Scenario("null-comparison-stays-null-on-mismatch", nulls,
      """MATCH (x:X) WHERE x.k = 1
        |RETURN x.s = 1 AS a""".stripMargin,
      Seq(row("a" -> false))), // s='a': cross-family false, not error
    // ---- IN edge cases (3VL membership)
    Scenario("in-empty-list-false-even-for-null", empty,
      "RETURN null IN [] AS a, 1 IN [] AS b",
      Seq(row("a" -> false, "b" -> false))),
    Scenario("in-null-poisons-miss", empty,
      "RETURN 2 IN [1, null, 3] AS a, 3 IN [1, null, 3] AS b",
      Seq(row("a" -> null, "b" -> true))),
    Scenario("in-cross-family-never-matches", empty,
      "RETURN 1 IN ['a'] AS a, 1 IN ['a', null] AS b, 1 IN [1.0] AS c",
      Seq(row("a" -> false, "b" -> null, "c" -> true))),
    // ---- null-input list operations
    Scenario("comprehension-over-null-is-null", empty,
      "RETURN [x IN null | x] AS a, size(null) AS b",
      Seq(row("a" -> null, "b" -> null))),
    Scenario("unwind-null-no-rows", empty,
      "UNWIND null AS x RETURN x",
      Seq.empty),
    Scenario("unwind-empty-no-rows", empty,
      "UNWIND [] AS x RETURN x",
      Seq.empty),
    // ---- negative list indices and empty ranges
    Scenario("negative-slice-counts-from-end", empty,
      "RETURN [1,2,3][-2..] AS a, [1,2,3][..-1] AS b, [1,2,3][1..-1] AS c",
      Seq(row("a" -> List(2, 3), "b" -> List(1, 2), "c" -> List(2)))),
    Scenario("range-wrong-direction-is-empty", empty,
      "RETURN range(3, 1) AS a, range(3, 1, -1) AS b",
      Seq(row("a" -> List(), "b" -> List(3, 2, 1)))),
    // ---- aggregate and conversion edge semantics
    Scenario("sum-over-no-rows-is-zero", social,
      """MATCH (p:Person) WHERE p.age > 999
        |RETURN sum(p.age) AS s, count(p) AS c, min(p.age) AS mn""".stripMargin,
      Seq(row("s" -> 0, "c" -> 0, "mn" -> null))),
    Scenario("conversion-of-invalid-input-is-null", empty,
      """RETURN toInteger('abc') AS a, toFloat('x') AS b,
        |       toBoolean('nope') AS c, toInteger('42') AS d""".stripMargin,
      Seq(row("a" -> null, "b" -> null, "c" -> null, "d" -> 42))),
    Scenario("order-by-desc-puts-nulls-first", nulls,
      "MATCH (x:X) RETURN x.k AS k ORDER BY k DESC",
      Seq(row("k" -> null), row("k" -> 2), row("k" -> 1)), ordered = true),
    Scenario("order-by-asc-puts-nulls-last", nulls,
      "MATCH (x:X) RETURN x.k AS k ORDER BY k ASC",
      Seq(row("k" -> 1), row("k" -> 2), row("k" -> null)), ordered = true),
    // ---- null-input entity/value functions and accessors
    Scenario("entity-functions-of-null-are-null", empty,
      """RETURN keys(null) AS a, labels(null) AS b, properties(null) AS c,
        |       id(null) AS d, nodes(null) AS e, relationships(null) AS f""".stripMargin,
      Seq(row("a" -> null, "b" -> null, "c" -> null, "d" -> null,
        "e" -> null, "f" -> null))),
    Scenario("null-property-and-index-access", empty,
      "RETURN null.a AS a, null['a'] AS b",
      Seq(row("a" -> null, "b" -> null))),
    Scenario("labels-of-unmatched-optional-node-is-null", social,
      """MATCH (r:Robot) OPTIONAL MATCH (r)-[:KNOWS]->(m:Person)
        |RETURN labels(m) AS l, keys(m) AS k""".stripMargin,
      Seq(row("l" -> null, "k" -> null))),
    Scenario("chained-comparisons-are-conjunctions", empty,
      "RETURN 1 < 2 < 3 AS a, 1 < 2 > 3 AS b",
      Seq(row("a" -> true, "b" -> false))),
    Scenario("map-literal-access-forms", empty,
      "RETURN ({a: 1}).a AS a, {a: 1}['a'] AS b",
      Seq(row("a" -> 1, "b" -> 1))),

    // ---- round-2 widening: quantifier edges, fn nulls, optional chains
    Scenario("quantifier-empty-list-semantics", empty,
      """RETURN any(x IN [] WHERE x > 0) AS a, all(x IN [] WHERE x > 0) AS b,
        |none(x IN [] WHERE x > 0) AS c, single(x IN [] WHERE x > 0) AS d""".stripMargin,
      Seq(row("a" -> false, "b" -> true, "c" -> true, "d" -> false))),
    Scenario("single-true-exactly-once", empty,
      """RETURN single(x IN [1,2,3] WHERE x = 2) AS s,
        |single(x IN [2,2] WHERE x = 2) AS t""".stripMargin,
      Seq(row("s" -> true, "t" -> false))),
    Scenario("string-fn-null-propagation", empty,
      "RETURN toUpper(null) AS u, replace(null, 'a', 'b') AS r, split(null, ',') AS s",
      Seq(row("u" -> null, "r" -> null, "s" -> null))),
    Scenario("left-right-of-string", empty,
      "RETURN left('hello', 2) AS l, right('hello', 2) AS r",
      Seq(row("l" -> "he", "r" -> "lo"))),
    Scenario("replace-all-occurrences", empty,
      "RETURN replace('aaa', 'a', 'bc') AS r", Seq(row("r" -> "bcbcbc"))),
    Scenario("contains-empty-string-is-true", empty,
      "RETURN 'abc' CONTAINS '' AS a, '' CONTAINS '' AS b",
      Seq(row("a" -> true, "b" -> true))),
    Scenario("optional-match-trailing-where-belongs-to-it", social,
      """MATCH (a:Person {name: 'Alice'})
        |OPTIONAL MATCH (a)-[:KNOWS]->(b) WHERE b.age > 100
        |RETURN a.name AS an, b.name AS bn""".stripMargin,
      Seq(row("an" -> "Alice", "bn" -> null))),
    Scenario("chained-optional-match-null-seed", social,
      """MATCH (r:Robot)
        |OPTIONAL MATCH (r)-[:KNOWS]->(x)
        |OPTIONAL MATCH (x)-[:KNOWS]->(y)
        |RETURN r.name AS rn, x.name AS xn, y.name AS yn""".stripMargin,
      Seq(row("rn" -> "R2", "xn" -> null, "yn" -> null))),
    Scenario("with-aggregate-reused-in-arithmetic", social,
      "MATCH (p:Person) WITH count(*) AS n RETURN n, n * 2 AS d",
      Seq(row("n" -> 4, "d" -> 8))),
    Scenario("parameter-in-skip", social,
      "MATCH (p:Person) RETURN p.name AS name ORDER BY name SKIP $s",
      Seq(row("name" -> "Carol"), row("name" -> "Dave")),
      ordered = true, params = Map("s" -> 2)),
    Scenario("startnode-endnode-follow-storage-direction", social,
      """MATCH (a:Person {name: 'Alice'})-[r:KNOWS]->(b {name: 'Bob'})
        |RETURN id(startNode(r)) = id(a) AS s, id(endNode(r)) = id(b) AS t""".stripMargin,
      Seq(row("s" -> true, "t" -> true))),
    Scenario("startnode-on-undirected-keeps-storage-order", social,
      """MATCH (b:Person {name: 'Bob'})-[r:KNOWS]-(a {name: 'Alice'})
        |RETURN id(startNode(r)) = id(a) AS s""".stripMargin,
      Seq(row("s" -> true))),
    Scenario("collect-into-membership-check", social,
      """MATCH (p:Person) WITH collect(p.name) AS names
        |RETURN size(names) AS n, 'Alice' IN names AS has""".stripMargin,
      Seq(row("n" -> 4, "has" -> true))),
    Scenario("percentile-cont-bounds", social,
      """MATCH (p:Person)
        |RETURN percentileCont(p.age, 0.0) AS lo,
        |       percentileCont(p.age, 1.0) AS hi""".stripMargin,
      Seq(row("lo" -> 25.0, "hi" -> 40.0))),
    Scenario("list-equality-is-elementwise", empty,
      "RETURN [1,2] = [1,2] AS a, [1,2] = [1,3] AS b, [[1],[2]] = [[1],[2]] AS c",
      Seq(row("a" -> true, "b" -> false, "c" -> true))),
    Scenario("toboolean-conversions", empty,
      "RETURN toBoolean('true') AS t, toBoolean('FALSE') AS f, toBoolean('x') AS n",
      Seq(row("t" -> true, "f" -> false, "n" -> null))),
    Scenario("keys-of-relationship", social,
      """MATCH (:Person {name: 'Alice'})-[r:KNOWS {since: 2010}]->(:Person {name: 'Bob'})
        |RETURN keys(r) AS k""".stripMargin,
      Seq(row("k" -> List("since")))),
    Scenario("unwind-list-of-maps", empty,
      "UNWIND [{a: 1}, {a: 2}] AS m RETURN m.a AS a",
      Seq(row("a" -> 1), row("a" -> 2))),
    Scenario("pattern-comprehension-in-order-by", social,
      """MATCH (p:Person) RETURN p.name AS name
        |ORDER BY size([(p)-[:KNOWS]->(x) | x]) DESC, name""".stripMargin,
      Seq(row("name" -> "Alice"), row("name" -> "Bob"),
        row("name" -> "Carol"), row("name" -> "Dave")), ordered = true),
    Scenario("date-plus-month-duration-clamps", empty,
      "RETURN date('2020-01-31') + duration({months: 1}) AS d",
      Seq(row("d" -> "2020-02-29"))),
    Scenario("varlength-between-bound-endpoints", social,
      """MATCH (a:Person {name: 'Alice'}), (d:Person {name: 'Dave'})
        |MATCH (a)-[:KNOWS*2..3]->(d) RETURN count(*) AS n""".stripMargin,
      Seq(row("n" -> 2))),
    Scenario("rel-ids-are-distinct", social,
      "MATCH ()-[r]->() RETURN count(DISTINCT id(r)) AS n",
      Seq(row("n" -> 5))),
    Scenario("conditional-sum-via-case", social,
      """MATCH (p:Person)
        |RETURN sum(CASE WHEN p.city = 'Berlin' THEN 1 ELSE 0 END) AS n""".stripMargin,
      Seq(row("n" -> 2))),
    Scenario("min-max-skip-nulls", nulls,
      "MATCH (x:X) RETURN min(x.k) AS lo, max(x.k) AS hi",
      Seq(row("lo" -> 1, "hi" -> 2))),

    // ------------------------- correlation through outer VALUE variables
    // (optional/exists/comprehension subqueries may read enclosing-scope
    // values from their WHERE, not just shared pattern variables)
    Scenario("optional-match-correlated-value-var", social,
      """WITH 'Berlin' AS town
        |OPTIONAL MATCH (p:Person) WHERE p.city = town
        |RETURN town, p.name AS name ORDER BY name""".stripMargin,
      Seq(row("town" -> "Berlin", "name" -> "Alice"),
        row("town" -> "Berlin", "name" -> "Dave")), ordered = true),
    Scenario("optional-match-correlated-no-match-keeps-row", social,
      """WITH 'Atlantis' AS town
        |OPTIONAL MATCH (p:Person) WHERE p.city = town
        |RETURN town, p.name AS name""".stripMargin,
      Seq(row("town" -> "Atlantis", "name" -> null))),
    Scenario("optional-match-correlated-per-row", social,
      """MATCH (q:Person) WITH q.city AS town, q.name AS who
        |OPTIONAL MATCH (p:Person) WHERE p.city = town AND p.name <> who
        |RETURN who, p.name AS other ORDER BY who, other""".stripMargin,
      Seq(row("who" -> "Alice", "other" -> "Dave"),
        row("who" -> "Bob", "other" -> null),
        row("who" -> "Carol", "other" -> null),
        row("who" -> "Dave", "other" -> "Alice")), ordered = true),
    Scenario("optional-match-correlated-inline-props", social,
      """WITH 2015 AS y
        |OPTIONAL MATCH (a)-[r:KNOWS {since: y}]->(b)
        |RETURN y, a.name AS src, b.name AS dst""".stripMargin,
      Seq(row("y" -> 2015, "src" -> "Bob", "dst" -> "Carol"))),
    Scenario("exists-correlated-value-var-only", social,
      """MATCH (p:Person) WITH p.city AS town, count(*) AS n
        |WHERE exists((q:Person {city: town})-[:KNOWS]->())
        |RETURN town, n ORDER BY town""".stripMargin,
      Seq(row("town" -> "Berlin", "n" -> 2),
        row("town" -> "Paris", "n" -> 1)), ordered = true),
    Scenario("pattern-comprehension-outer-value", social,
      """WITH 2011 AS cutoff
        |MATCH (a:Person {name: 'Alice'})
        |RETURN [(a)-[r:KNOWS]->(b) WHERE r.since > cutoff | b.name] AS names""".stripMargin,
      Seq(row("names" -> Seq("Carol"))))
  ) ++ Seq(
    // ------------- quantifiers over var-length relationship lists push
    // into the unroll (per-step rel property predicates)
    // chain edges: 1-[w:1]->2-[w:2]->3-[w:3]->4
    Scenario("varlength-all-rel-props", chain,
      """MATCH (a:N)-[rs:R*1..3]->(b:N)
        |WHERE all(r IN rs WHERE r.w >= 2)
        |RETURN a.v AS av, b.v AS bv ORDER BY av, bv""".stripMargin,
      Seq(row("av" -> 2, "bv" -> 3), row("av" -> 2, "bv" -> 4),
        row("av" -> 3, "bv" -> 4)), ordered = true),
    Scenario("varlength-any-rel-props", chain,
      """MATCH (a:N)-[rs:R*1..3]->(b:N)
        |WHERE any(r IN rs WHERE r.w = 3)
        |RETURN a.v AS av, b.v AS bv ORDER BY av, bv""".stripMargin,
      Seq(row("av" -> 1, "bv" -> 4), row("av" -> 2, "bv" -> 4),
        row("av" -> 3, "bv" -> 4)), ordered = true),
    Scenario("varlength-none-rel-props", chain,
      """MATCH (a:N)-[rs:R*1..3]->(b:N)
        |WHERE none(r IN rs WHERE r.w > 1)
        |RETURN a.v AS av, b.v AS bv""".stripMargin,
      Seq(row("av" -> 1, "bv" -> 2))),
    Scenario("varlength-single-rel-props", chain,
      """MATCH (a:N)-[rs:R*1..3]->(b:N)
        |WHERE single(r IN rs WHERE r.w = 2)
        |RETURN a.v AS av, b.v AS bv ORDER BY av, bv""".stripMargin,
      Seq(row("av" -> 1, "bv" -> 3), row("av" -> 1, "bv" -> 4),
        row("av" -> 2, "bv" -> 3), row("av" -> 2, "bv" -> 4)),
      ordered = true),
    Scenario("varlength-all-with-outer-value", chain,
      """WITH 2 AS cutoff
        |MATCH (a:N)-[rs:R*1..3]->(b:N)
        |WHERE all(r IN rs WHERE r.w >= cutoff)
        |RETURN a.v AS av, b.v AS bv ORDER BY av, bv""".stripMargin,
      Seq(row("av" -> 2, "bv" -> 3), row("av" -> 2, "bv" -> 4),
        row("av" -> 3, "bv" -> 4)), ordered = true),
    Scenario("varlength-all-zero-length-vacuous", chain,
      """MATCH (a:N {v: 1})-[rs:R*0..2]->(b:N)
        |WHERE all(r IN rs WHERE r.w > 99)
        |RETURN b.v AS bv""".stripMargin,
      Seq(row("bv" -> 1))),
    Scenario("varlength-any-zero-length-fails", chain,
      """MATCH (a:N {v: 1})-[rs:R*0..2]->(b:N)
        |WHERE any(r IN rs WHERE r.w >= 1)
        |RETURN b.v AS bv ORDER BY bv""".stripMargin,
      Seq(row("bv" -> 2), row("bv" -> 3)), ordered = true),

    // ------------- var-length rel lists as relationship VALUES
    Scenario("varlength-rel-list-property-projection", chain,
      """MATCH (a:N {v: 1})-[rs:R*3]->(b:N)
        |RETURN [r IN rs | r.w] AS ws""".stripMargin,
      Seq(row("ws" -> Seq(1, 2, 3)))),
    Scenario("varlength-rel-list-reduce-props", chain,
      """MATCH (a:N {v: 1})-[rs:R*3]->(b:N)
        |RETURN reduce(acc = 0, r IN rs | acc + r.w) AS total""".stripMargin,
      Seq(row("total" -> 6))),
    Scenario("varlength-rel-list-type-in-lambda", chain,
      """MATCH (a:N {v: 1})-[rs:R*2]->(b:N)
        |RETURN [r IN rs | type(r)] AS ts""".stripMargin,
      Seq(row("ts" -> Seq("R", "R")))),
    Scenario("varlength-rel-list-filter-projection", chain,
      """MATCH (a:N {v: 1})-[rs:R*1..3]->(b:N {v: 4})
        |RETURN [r IN rs WHERE r.w >= 2 | r.w * 10] AS big""".stripMargin,
      Seq(row("big" -> Seq(20, 30)))),
    Scenario("varlength-unwind-rel-values", chain,
      """MATCH (a:N {v: 1})-[rs:R*2]->(b:N)
        |UNWIND rs AS r
        |RETURN r.w AS w ORDER BY w""".stripMargin,
      Seq(row("w" -> 1), row("w" -> 2)), ordered = true),
    Scenario("varlength-quantifier-under-or-not-pushed", chain,
      """MATCH (a:N)-[rs:R*1..2]->(b:N)
        |WHERE all(r IN rs WHERE r.w >= 3) OR size(rs) = 2
        |RETURN a.v AS av, b.v AS bv ORDER BY av, bv""".stripMargin,
      Seq(row("av" -> 1, "bv" -> 3), row("av" -> 2, "bv" -> 4),
        row("av" -> 3, "bv" -> 4)), ordered = true),
    Scenario("varlength-pushed-quantifier-with-named-path", chain,
      """MATCH p = (a:N)-[rs:R*1..3]->(b:N)
        |WHERE all(r IN rs WHERE r.w <= 2)
        |RETURN a.v AS av, b.v AS bv, length(p) AS len
        |ORDER BY av, bv""".stripMargin,
      Seq(row("av" -> 1, "bv" -> 2, "len" -> 1),
        row("av" -> 1, "bv" -> 3, "len" -> 2),
        row("av" -> 2, "bv" -> 3, "len" -> 1)), ordered = true),
    Scenario("varlength-rel-list-properties-in-lambda", chain,
      """MATCH (a:N {v: 1})-[rs:R*2]->(b:N)
        |RETURN [r IN rs | properties(r).w] AS ws""".stripMargin,
      Seq(row("ws" -> Seq(1, 2)))),
    Scenario("varlength-rel-list-quantifier-on-dst", chain,
      // predicate reads the (not-yet-bound) dst too → NOT pushed into the
      // unroll; evaluated as a value over the struct list instead
      """MATCH (a:N)-[rs:R*1..2]->(b:N)
        |WHERE all(r IN rs WHERE r.w = b.v - 1)
        |RETURN a.v AS av, b.v AS bv ORDER BY av, bv""".stripMargin,
      Seq(row("av" -> 1, "bv" -> 2), row("av" -> 2, "bv" -> 3),
        row("av" -> 3, "bv" -> 4)), ordered = true),

    // ---- node VALUES along paths (extension: the unroll carries ids,
    // value structs are materialized on demand — Planner demand analysis)
    Scenario("path-nodes-comprehension-property", chain,
      """MATCH p = (a:N {v: 1})-[:R*1..3]->(b:N)
        |RETURN [n IN nodes(p) | n.v] AS vs ORDER BY size(vs)""".stripMargin,
      Seq(row("vs" -> List(1L, 2L)), row("vs" -> List(1L, 2L, 3L)),
        row("vs" -> List(1L, 2L, 3L, 4L))), ordered = true),
    Scenario("path-nodes-quantifier", chain,
      """MATCH p = (a:N)-[:R*1..2]->(b:N)
        |WHERE all(n IN nodes(p) WHERE n.v <= 3)
        |RETURN a.v AS av, b.v AS bv ORDER BY av, bv""".stripMargin,
      Seq(row("av" -> 1, "bv" -> 2), row("av" -> 1, "bv" -> 3),
        row("av" -> 2, "bv" -> 3)), ordered = true),
    Scenario("path-nodes-reduce-sum", chain,
      """MATCH p = (a:N {v: 1})-[:R*2..2]->(b:N)
        |RETURN reduce(s = 0, n IN nodes(p) | s + n.v) AS total""".stripMargin,
      Seq(row("total" -> 6))),
    Scenario("path-nodes-unwind-labels", social,
      """MATCH p = (a:Person {name: 'Carol'})-[:KNOWS]->(d)
        |UNWIND nodes(p) AS n
        |RETURN labels(n)[0] AS l ORDER BY l""".stripMargin,
      Seq(row("l" -> "Admin"), row("l" -> "Person")), ordered = true),
    Scenario("path-nodes-id-lambda-equals-bare-ids", chain,
      // bare nodes(p) stays the id list even when a lambda elsewhere
      // materialized value structs — the two views must agree
      """MATCH p = (a:N {v: 1})-[:R*1..2]->(b:N)
        |RETURN [n IN nodes(p) | id(n)] = nodes(p) AS same""".stripMargin,
      Seq(row("same" -> true), row("same" -> true))),
    Scenario("path-nodes-missing-property-is-null", chain,
      """MATCH p = (a:N {v: 1})-[:R]->(b:N)
        |RETURN [n IN nodes(p) | n.nope] AS xs""".stripMargin,
      Seq(row("xs" -> List(null, null)))),
    Scenario("path-nodes-optional-nonmatch-null", social,
      """MATCH (r:Robot)
        |OPTIONAL MATCH p = (r)-[:KNOWS]->(x)
        |RETURN r.name AS name, [n IN nodes(p) | n.name] AS ns""".stripMargin,
      Seq(row("name" -> "R2", "ns" -> null))),
    Scenario("path-nodes-any-quantifier-label-mix", social,
      """MATCH p = (a:Person {name: 'Alice'})-[:KNOWS*1..2]->(x)
        |WHERE any(n IN nodes(p) WHERE n.age > 34)
        |RETURN x.name AS xn ORDER BY xn""".stripMargin,
      // Alice->Carol (35) and the 2-hop paths reaching Carol or Dave
      Seq(row("xn" -> "Carol"), row("xn" -> "Carol"), row("xn" -> "Dave")),
      ordered = true),

    // ---- null propagation through property access on null values
    Scenario("null-value-property-access", empty,
      "WITH null AS d RETURN d.year AS y, d.name AS n",
      Seq(row("y" -> null, "n" -> null)))
  ) ++ Seq(
    // ---- comparability families (openCypher: cross-family comparisons
    // are never ordered → null; equality across families is false)
    Scenario("incomparable-types-order-is-null", empty,
      "RETURN 'a' < 1 AS x", Seq(row("x" -> null))),
    Scenario("cross-family-equality-is-false", empty,
      "RETURN 1 = 'a' AS x", Seq(row("x" -> false))),
    Scenario("string-and-boolean-ordering", empty,
      "RETURN 'a' < 'b' AS x, true < false AS y",
      Seq(row("x" -> true, "y" -> false))),
    // ---- IN with nulls (ternary logic over list membership)
    Scenario("in-list-ternary-null-semantics", empty,
      "RETURN 1 IN [null, 1] AS a, 2 IN [null] AS b, null IN [] AS c",
      Seq(row("a" -> true, "b" -> null, "c" -> false))),

    // ---- list indexing / slicing
    Scenario("negative-list-index-counts-from-end", empty,
      "RETURN [1,2,3][-1] AS a, [1,2,3][0..-1] AS b",
      Seq(row("a" -> 3, "b" -> List(1L, 2L)))),
    Scenario("out-of-bounds-index-is-null", empty,
      "RETURN [1,2][5] AS a, [1,2][-5] AS b",
      Seq(row("a" -> null, "b" -> null))),
    Scenario("head-last-tail-on-empty-list", empty,
      "RETURN head([]) AS h, last([]) AS l, tail([]) AS t",
      Seq(row("h" -> null, "l" -> null, "t" -> List.empty[Any]))),
    Scenario("nested-list-double-index", empty,
      "WITH [[1,2],[3]] AS ll RETURN ll[0][1] AS x", Seq(row("x" -> 2))),
    Scenario("range-descending-bounds-is-empty", empty,
      "RETURN range(1, 0) AS r", Seq(row("r" -> List.empty[Any]))),
    Scenario("list-concatenation-plus", empty,
      "RETURN [1,2] + [3] AS a, [1] + 2 AS b, 1 + [2] AS c",
      Seq(row("a" -> List(1L, 2L, 3L), "b" -> List(1L, 2L),
        "c" -> List(1L, 2L)))),

    // ---- maps: missing keys are null, never an analysis error
    Scenario("missing-map-key-is-null", empty,
      "RETURN {a: 1}['b'] AS y, {a: 1}.b AS z",
      Seq(row("y" -> null, "z" -> null))),
    Scenario("map-projection-missing-key-is-null", empty,
      "WITH {a: 1, b: 2} AS m RETURN m{.a, .missing} AS p",
      Seq(row("p" -> Map("a" -> 1L, "missing" -> null)))),
    Scenario("dynamic-map-key-lookup", empty,
      "WITH {a: 1} AS m, 'b' AS miss, 'a' AS hit " +
        "RETURN m[hit] AS v, m[miss] AS w",
      Seq(row("v" -> 1, "w" -> null))),
    Scenario("keys-of-map-literal", empty,
      "WITH {a: 1} AS m RETURN keys(m) AS ks",
      Seq(row("ks" -> List("a")))),

    // ---- aggregates over zero rows
    Scenario("aggregates-over-no-rows", social,
      """MATCH (n:NoSuchLabel)
        |RETURN sum(n.age) AS s, count(*) AS c, min(n.age) AS mn,
        |       collect(n.age) AS cl""".stripMargin,
      Seq(row("s" -> 0, "c" -> 0, "mn" -> null, "cl" -> List.empty[Any]))),
    Scenario("stdev-of-single-value-is-zero", nulls,
      "MATCH (x:X {k: 1}) RETURN stDev(x.k) AS sd",
      Seq(row("sd" -> 0.0))),
    Scenario("percentile-extremes", nulls,
      """MATCH (x:X) WHERE x.k IS NOT NULL
        |RETURN percentileDisc(x.k, 0) AS p0,
        |       percentileCont(x.k, 1) AS p1""".stripMargin,
      Seq(row("p0" -> 1, "p1" -> 2.0))),

    // ---- UNWIND of null / empty list produces no rows
    Scenario("unwind-null-is-no-rows", empty,
      "UNWIND null AS x RETURN x", Seq.empty),
    Scenario("unwind-empty-list-is-no-rows", empty,
      "WITH [1,2] AS keep UNWIND [] AS x RETURN x", Seq.empty),

    // ---- ORDER BY null placement: null is largest (last ASC, first DESC)
    Scenario("order-by-unreturned-key-nulls-last", nulls,
      "MATCH (x:X) RETURN x.k AS k ORDER BY x.s ASC",
      Seq(row("k" -> 1), row("k" -> null), row("k" -> 2)), ordered = true),
    Scenario("order-by-desc-nulls-first", nulls,
      "MATCH (x:X) RETURN x.k AS k ORDER BY x.s DESC",
      Seq(row("k" -> 2), row("k" -> null), row("k" -> 1)), ordered = true),

    // ---- UNION distinct vs UNION ALL
    Scenario("union-distinct-deduplicates", empty,
      "RETURN 1 AS x UNION RETURN 1 AS x UNION RETURN 2 AS x",
      Seq(row("x" -> 1), row("x" -> 2))),

    // ---- simple CASE never matches via null (uses equality)
    Scenario("simple-case-null-never-matches", empty,
      "RETURN CASE null WHEN null THEN 'eq' ELSE 'no' END AS x",
      Seq(row("x" -> "no"))),

    // ---- quantifiers: vacuous truth and ternary predicates
    Scenario("quantifiers-on-empty-list", empty,
      "RETURN all(x IN [] WHERE x > 0) AS a, any(x IN [] WHERE x > 0) AS b",
      Seq(row("a" -> true, "b" -> false))),
    Scenario("quantifier-null-predicate-is-null", empty,
      "RETURN none(x IN [1] WHERE x > null) AS n", Seq(row("n" -> null))),
    Scenario("comprehension-filter-skips-null-predicate", empty,
      "RETURN [x IN [1,null,3] WHERE x > 0] AS f",
      Seq(row("f" -> List(1L, 3L)))),

    // ---- scalar conversions and null propagation
    Scenario("conversion-functions", empty,
      """RETURN toInteger('42') AS a, toInteger('abc') AS b,
        |toBoolean('true') AS c, toInteger(3.9) AS d,
        |toString(1.5) AS e, toString(null) AS f""".stripMargin,
      Seq(row("a" -> 42, "b" -> null, "c" -> true, "d" -> 3,
        "e" -> "1.5", "f" -> null))),
    Scenario("size-of-null-is-null", empty,
      "RETURN size(null) AS s, size('hello') AS n",
      Seq(row("s" -> null, "n" -> 5))),
    Scenario("string-predicates-with-null-are-null", empty,
      "RETURN 'abc' STARTS WITH null AS x, 'abc' =~ null AS m",
      Seq(row("x" -> null, "m" -> null))),

    // ---- WHERE on aliased aggregate after WITH (HAVING shape)
    Scenario("with-where-on-aliased-aggregate", social,
      """MATCH (p:Person)-[:KNOWS]->()
        |WITH p.name AS name, count(*) AS degree WHERE degree > 1
        |RETURN name, degree""".stripMargin,
      Seq(row("name" -> "Alice", "degree" -> 2))),

    // ---- parameters in inline property maps and predicates
    Scenario("parameter-in-prop-map-and-where", social,
      """MATCH (p:Person {city: $city}) WHERE p.age >= $min
        |RETURN p.name AS name ORDER BY name""".stripMargin,
      Seq(row("name" -> "Alice"), row("name" -> "Dave")), ordered = true,
      params = Map("city" -> "Berlin", "min" -> 25)),

    // ---- temporal parsing and accessors
    Scenario("temporal-parse-and-accessors", empty,
      """RETURN localdatetime('2020-06-15T12:30:45').hour AS h,
        |date('2020-01-31') + duration({months: 1}) = date('2020-02-29') AS clamped,
        |duration('P1DT2H').hours AS dh""".stripMargin,
      Seq(row("h" -> 12, "clamped" -> true, "dh" -> 2))),


    // ---- documented divergences (blacklisted, reference-style)
    Scenario("list-equality-with-null-element", empty,
      "RETURN [1,2] = [1,null] AS x", Seq(row("x" -> null))),
    Scenario("heterogeneous-list-literal", empty,
      "RETURN [1, 'a', true] AS mixed",
      Seq(row("mixed" -> List(1L, "a", true)))),
    Scenario("heterogeneous-list-indexing-compares-typed", empty,
      "RETURN [1, 'a'][0] = 1 AS i, [1, 'a'][1] = 'a' AS s, [1, 'a'][0] = 'a' AS x",
      Seq(row("i" -> true, "s" -> true, "x" -> false))),
    Scenario("heterogeneous-list-membership", empty,
      """RETURN 'a' IN [1, 'a'] AS hit, 2 IN [1, 'a'] AS miss,
        |true IN [1, 'a', true] AS b, 2 IN [1, 'a', null] AS maybe""".stripMargin,
      Seq(row("hit" -> true, "miss" -> false, "b" -> true, "maybe" -> null))),
    Scenario("heterogeneous-list-size-head-last", empty,
      "RETURN size([1, 'a', true]) AS n, head([1, 'a']) = 1 AS h, last([1, 'a']) = 'a' AS l",
      Seq(row("n" -> 3L, "h" -> true, "l" -> true))),
    Scenario("heterogeneous-list-with-nulls-and-floats", empty,
      "RETURN [1, 2.5, null, 'x'] AS mixed",
      Seq(row("mixed" -> List(1L, 2.5, null, "x")))),
    Scenario("unicode-escapes-bmp-surrogates-astral", empty,
      // size() counts CODE POINTS (Spark UTF8String semantics) — an
      // astral char is 1, not the 2 UTF-16 units Java String.length gives
      """RETURN 'é' AS bmp, '😀' AS pair,
        |'\U0001F600' AS astral, size('\U0001F600') AS n""".stripMargin,
      Seq(row("bmp" -> "é", "pair" -> "😀",
        "astral" -> "😀", "n" -> 1L))),
    Scenario("exponent-float-literals", empty,
      "RETURN 1e3 AS a, 2.5E-2 AS b, .5e1 AS c, 1e0 AS d",
      Seq(row("a" -> 1000.0, "b" -> 0.025, "c" -> 5.0, "d" -> 1.0))),
    Scenario("order-by-nulls-last-asc-first-desc", nulls,
      // Cypher null ordering: nulls sort LAST ascending, FIRST descending
      "MATCH (x:X) RETURN x.k AS k ORDER BY k",
      Seq(row("k" -> 1L), row("k" -> 2L), row("k" -> null)), ordered = true),
    Scenario("order-by-nulls-first-on-desc", nulls,
      "MATCH (x:X) RETURN x.k AS k ORDER BY k DESC",
      Seq(row("k" -> null), row("k" -> 2L), row("k" -> 1L)), ordered = true),
    Scenario("list-functions-of-null-are-null", empty,
      """RETURN [x IN null | x] AS a, size(null) AS b, head(null) AS c,
        |last(null) AS d, tail(null) AS e, reverse(null) AS f""".stripMargin,
      Seq(row("a" -> null, "b" -> null, "c" -> null, "d" -> null,
        "e" -> null, "f" -> null))),
    Scenario("collect-of-all-null-is-empty-list", empty,
      "RETURN collect(null) AS c, size(collect(null)) AS n",
      Seq(row("c" -> List(), "n" -> 0L))),
    Scenario("case-without-else-defaults-null", empty,
      "RETURN CASE WHEN false THEN 1 END AS x",
      Seq(row("x" -> null))),
    // instants of DIFFERENT temporal types are never equal and not
    // orderable (Neo4j; was the Spark date→timestamp coercion until
    // probe batch 27 caught it)
    Scenario("date-compares-with-datetime-in-temporal-family", empty,
      """RETURN date('2024-01-02') = localdatetime('2024-01-02T00:00:00') AS eq,
        |date('2024-01-02') < localdatetime('2024-01-03T00:00:00') AS lt""".stripMargin,
      Seq(row("eq" -> false, "lt" -> null))),
    Scenario("bound-relationship-reused-in-later-match", triad,
      // r pins its endpoints: the second MATCH recovers exactly a and b
      """MATCH (a:P {n: 'a'})-[r:R]->(b)
        |WITH r MATCH (x)-[r]->(y)
        |RETURN x.n AS xn, y.n AS yn""".stripMargin,
      Seq(row("xn" -> "a", "yn" -> "b"))),
    Scenario("bound-relationship-incoming-direction-swaps-endpoints", triad,
      """MATCH (a:P {n: 'a'})-[r:R]->(b)
        |WITH r MATCH (x)<-[r]-(y)
        |RETURN x.n AS xn, y.n AS yn""".stripMargin,
      Seq(row("xn" -> "b", "yn" -> "a"))),
    Scenario("bound-relationship-type-mismatch-yields-nothing", triad,
      """MATCH (a:P {n: 'a'})-[r:S]->(c)
        |WITH r MATCH (x)-[r:R]->(y) RETURN x.n AS xn""".stripMargin,
      Seq.empty)
  ) ++ Seq(
    // ---- pipeline shapes: WITH as a barrier, continuations after
    // aggregation / LIMIT (each clause sees only the previous projection)
    Scenario("with-order-limit-then-expand-triad", triad,
      """MATCH (x:P) WITH x ORDER BY x.v DESC LIMIT 2
        |MATCH (x)-[r]->(y)
        |RETURN x.n AS xn, y.n AS yn ORDER BY xn, yn""".stripMargin,
      Seq(row("xn" -> "b", "yn" -> "c")), ordered = true),
    Scenario("aggregate-then-match-on-result", triad,
      """MATCH (x:P) WITH count(*) AS total
        |MATCH (y:P) WHERE y.v = total RETURN y.n AS n""".stripMargin,
      Seq(row("n" -> "c"))),
    Scenario("with-distinct-expression", triad,
      "MATCH (x:P) WITH DISTINCT x.v % 2 AS parity RETURN parity ORDER BY parity",
      Seq(row("parity" -> 0), row("parity" -> 1)), ordered = true),
    Scenario("collect-respects-with-order", triad,
      "MATCH (x:P) WITH x.v AS v ORDER BY v DESC RETURN collect(v) AS vs",
      Seq(row("vs" -> List(3L, 2L, 1L)))),

    // ---- relationship-type alternation, also under var-length
    Scenario("rel-type-alternation", triad,
      "MATCH (a:P {n:'a'})-[:R|S]->(x) RETURN x.n AS n ORDER BY n",
      Seq(row("n" -> "b"), row("n" -> "c")), ordered = true),
    Scenario("rel-type-alternation-varlength", triad,
      """MATCH (a:P {n:'a'})-[rs:R|S*1..2]->(x)
        |RETURN x.n AS n, size(rs) AS l ORDER BY n, l""".stripMargin,
      Seq(row("n" -> "b", "l" -> 1), row("n" -> "c", "l" -> 1),
        row("n" -> "c", "l" -> 2)), ordered = true),
    Scenario("mixed-direction-chain", triad,
      "MATCH (a)-[:R]->(b)<-[:S]-(c) RETURN a.n AS an, b.n AS bn, c.n AS cn",
      Seq(row("an" -> "b", "bn" -> "c", "cn" -> "a"))),
    Scenario("zero-length-varlength-includes-self", triad,
      """MATCH (a:P)-[:R*0..1]->(b:P)
        |RETURN a.n AS an, b.n AS bn ORDER BY an, bn""".stripMargin,
      Seq(row("an" -> "a", "bn" -> "a"), row("an" -> "a", "bn" -> "b"),
        row("an" -> "b", "bn" -> "b"), row("an" -> "b", "bn" -> "c"),
        row("an" -> "c", "bn" -> "c")), ordered = true),

    // ---- pattern predicates in every expression position
    Scenario("exists-subquery-with-inner-where", triad,
      """MATCH (a:P {n:'a'})
        |WHERE EXISTS { MATCH (a)-[:S]->(z) WHERE z.v > 2 }
        |RETURN a.n AS n""".stripMargin,
      Seq(row("n" -> "a"))),
    Scenario("pattern-predicate-in-case-branch", triad,
      """MATCH (a:P) RETURN a.n AS n,
        |CASE WHEN (a)-[:S]->() THEN 'has' ELSE 'no' END AS s
        |ORDER BY n""".stripMargin,
      Seq(row("n" -> "a", "s" -> "has"), row("n" -> "b", "s" -> "no"),
        row("n" -> "c", "s" -> "no")), ordered = true),
    Scenario("exists-function-on-pattern", triad,
      "MATCH (a:P) RETURN a.n AS n, exists((a)-[:S]->()) AS e ORDER BY n",
      Seq(row("n" -> "a", "e" -> true), row("n" -> "b", "e" -> false),
        row("n" -> "c", "e" -> false)), ordered = true),
    Scenario("not-pattern-predicate", triad,
      "MATCH (x:P) WHERE NOT (x)-[:R]->() RETURN x.n AS n",
      Seq(row("n" -> "c"))),
    Scenario("pattern-predicate-with-dst-props", triad,
      "MATCH (x:P) WHERE (x)-[:R]->(:P {v: 2}) RETURN x.n AS n",
      Seq(row("n" -> "a"))),
    Scenario("size-of-pattern-as-degree", triad,
      "MATCH (a:P) RETURN a.n AS n, size((a)-[]->()) AS deg ORDER BY n",
      Seq(row("n" -> "a", "deg" -> 2), row("n" -> "b", "deg" -> 1),
        row("n" -> "c", "deg" -> 0)), ordered = true),
    Scenario("size-of-undirected-pattern", triad,
      "MATCH (a:P) RETURN a.n AS n, size((a)--()) AS deg ORDER BY n",
      Seq(row("n" -> "a", "deg" -> 2), row("n" -> "b", "deg" -> 2),
        row("n" -> "c", "deg" -> 2)), ordered = true),

    // ---- OPTIONAL MATCH WHERE applies inside the optional side
    Scenario("optional-match-where-stays-optional", triad,
      """MATCH (a:P {n:'a'}) OPTIONAL MATCH (a)-[:NOPE]->(z) WHERE z.v > 0
        |RETURN a.n AS n, z.v AS zv""".stripMargin,
      Seq(row("n" -> "a", "zv" -> null))),

    // ---- UNWIND interactions
    Scenario("unwind-map-list-property-access", empty,
      "UNWIND [{k: 1}, {k: 2}] AS m RETURN m.k AS k ORDER BY k",
      Seq(row("k" -> 1), row("k" -> 2)), ordered = true),
    Scenario("nested-double-unwind", empty,
      "UNWIND [[1,2],[3]] AS l UNWIND l AS x RETURN x ORDER BY x",
      Seq(row("x" -> 1), row("x" -> 2), row("x" -> 3)), ordered = true),
    Scenario("dynamic-list-index-expression", empty,
      "WITH [1,2,3] AS l RETURN l[toInteger('1')] AS x",
      Seq(row("x" -> 2))),

    // ---- startNode()/endNode() keep STORAGE orientation and expose the
    // endpoint's properties regardless of match direction
    Scenario("endpoint-properties-directed", triad,
      """MATCH (a:P {n:'a'})-[r:R]->(b)
        |RETURN startNode(r).n AS s, endNode(r).n AS e""".stripMargin,
      Seq(row("s" -> "a", "e" -> "b"))),
    Scenario("endpoint-properties-incoming", triad,
      """MATCH (c:P {n:'c'})<-[r:S]-(a)
        |RETURN startNode(r).n AS s, endNode(r).n AS e""".stripMargin,
      Seq(row("s" -> "a", "e" -> "c"))),
    // anonymous endpoints: the rel's endpoint nodes are still full
    // bindings when startNode()/endNode() demand them (the single-use
    // id-only pruning must yield)
    Scenario("endpoint-properties-anonymous", triad,
      """MATCH ()-[r:S]->()
        |RETURN startNode(r).n AS s, endNode(r).n AS e""".stripMargin,
      Seq(row("s" -> "a", "e" -> "c"))),
    Scenario("endpoint-properties-anonymous-chain", triad,
      """MATCH ()-[r1:R]->()-[r2:R]->()
        |RETURN startNode(r1).n AS s, endNode(r2).n AS e""".stripMargin,
      Seq(row("s" -> "a", "e" -> "c"))),
    Scenario("endpoint-properties-undirected", triad,
      """MATCH (c:P {n:'c'})-[r]-(x)
        |RETURN type(r) AS t, startNode(r).n AS s, endNode(r).n AS e
        |ORDER BY t""".stripMargin,
      Seq(row("t" -> "R", "s" -> "b", "e" -> "c"),
        row("t" -> "S", "s" -> "a", "e" -> "c")), ordered = true),
    Scenario("endpoint-missing-property-is-null", triad,
      """MATCH (a:P {n:'a'})-[r:R]->(b)
        |RETURN startNode(r).nope AS missing""".stripMargin,
      Seq(row("missing" -> null))),
    Scenario("isempty-function", empty,
      """RETURN isEmpty([]) AS a, isEmpty('x') AS b, isEmpty({m: 1}) AS c,
        |isEmpty(null) AS d""".stripMargin,
      Seq(row("a" -> true, "b" -> false, "c" -> false, "d" -> null))),

    // ---- grouping by relationship type
    Scenario("group-by-relationship-type", triad,
      "MATCH (a)-[r]->(b) RETURN type(r) AS t, count(*) AS n ORDER BY t",
      Seq(row("t" -> "R", "n" -> 2), row("t" -> "S", "n" -> 1)),
      ordered = true),

    // ---- relationship uniqueness is scoped to ONE MATCH clause:
    // comma-separated parts share it, separate MATCH clauses do not
    Scenario("rel-uniqueness-within-one-match", loops,
      """MATCH (x:L {v: 1})-[r1:S]->(), (x)-[r2:S]->()
        |RETURN count(*) AS n""".stripMargin,
      Seq(row("n" -> 2))),
    Scenario("rel-uniqueness-not-across-matches", loops,
      """MATCH (x:L {v: 1})-[r1:S]->()
        |MATCH (x)-[r2:S]->()
        |RETURN count(*) AS n""".stripMargin,
      Seq(row("n" -> 4))),

    // ---- operator semantics probes
    Scenario("exponent-is-right-associative", empty,
      "RETURN 2^3^2 AS x", Seq(row("x" -> 512.0))),
    Scenario("modulo-on-doubles", empty,
      "RETURN 5.5 % 2 AS x", Seq(row("x" -> 1.5))),
    Scenario("chained-comparison-null-middle", empty,
      "RETURN 1 < null < 3 AS x", Seq(row("x" -> null))),
    Scenario("xor-with-null-is-null", empty,
      "RETURN true XOR null AS a, false XOR null AS b",
      Seq(row("a" -> null, "b" -> null))),
    Scenario("order-by-list-column", empty,
      "UNWIND [[1,2],[1],[2]] AS l RETURN l ORDER BY l",
      Seq(row("l" -> List(1L)), row("l" -> List(1L, 2L)),
        row("l" -> List(2L))), ordered = true),
    Scenario("limit-accepts-constant-expression", empty,
      "UNWIND [1,2,3] AS x RETURN x ORDER BY x LIMIT 1 + 1",
      Seq(row("x" -> 1), row("x" -> 2)), ordered = true),
    Scenario("slice-with-null-bound-is-null", empty,
      "RETURN [1,2,3][0..null] AS x", Seq(row("x" -> null))),
    Scenario("keys-of-null-is-null", empty,
      "RETURN keys(null) AS k", Seq(row("k" -> null))),
    Scenario("substring-without-length", empty,
      "RETURN substring('hello', 2) AS x", Seq(row("x" -> "llo"))),

    // ---- projection / aggregation probes
    Scenario("label-predicate-after-with", social,
      "MATCH (n:Person) WITH n WHERE n:Admin RETURN n.name AS name",
      Seq(row("name" -> "Dave"))),
    Scenario("aggregate-inside-scalar-function", triad,
      "MATCH (p:P) RETURN coalesce(max(p.v), -1) AS m",
      Seq(row("m" -> 3))),
    Scenario("with-order-skip-limit-then-aggregate", social,
      """MATCH (n:Person) WITH n ORDER BY n.age DESC SKIP 1 LIMIT 2
        |RETURN sum(n.age) AS s""".stripMargin,
      Seq(row("s" -> 65))),
    Scenario("map-projection-all-properties", triad,
      "MATCH (a:P {n: 'a'}) RETURN a {.*, extra: 10} AS m",
      Seq(row("m" -> Map("n" -> "a", "v" -> 1L, "extra" -> 10L)))),

    // ---- id() plumbing across pattern parts
    Scenario("id-equality-joins-cartesian", triad,
      "MATCH (a:P), (b:P) WHERE id(a) = id(b) RETURN count(*) AS n",
      Seq(row("n" -> 3))),
    Scenario("id-in-collected-list", triad,
      """MATCH (n:P) WITH collect(id(n)) AS ids
        |MATCH (m:P) WHERE id(m) IN ids RETURN count(*) AS n""".stripMargin,
      Seq(row("n" -> 3))),

    // ---- subquery / comprehension probes
    Scenario("nested-exists-subqueries", social,
      """MATCH (a:Person)
        |WHERE EXISTS { MATCH (a)-[:KNOWS]->(b)
        |  WHERE EXISTS { MATCH (b)-[:KNOWS]->(c) } }
        |RETURN a.name AS name ORDER BY name""".stripMargin,
      Seq(row("name" -> "Alice"), row("name" -> "Bob")), ordered = true),
    Scenario("pattern-comprehension-varlength", triad,
      "MATCH (a:P {n: 'a'}) RETURN size([(a)-[*1..2]->(b) | b.n]) AS c",
      Seq(row("c" -> 3))),
    Scenario("varlength-alternation-with-prop-map", triad,
      "MATCH (a)-[:R|S*1..2 {w: 1}]->(b) RETURN b.n AS n",
      Seq(row("n" -> "b"))),

    // ---- second probe batch: maps, correlated inline props, aggregates
    Scenario("list-plus-element-appends", empty,
      "RETURN [1,2] + 3 AS x", Seq(row("x" -> List(1L, 2L, 3L)))),
    Scenario("nested-map-literal-chained-access", empty,
      "RETURN {a: {b: 1}}.a.b AS x", Seq(row("x" -> 1))),
    Scenario("map-literal-equality", empty,
      "RETURN {a: 1, b: 'x'} = {a: 1, b: 'x'} AS t, {a: 1} = {a: 2} AS f",
      Seq(row("t" -> true, "f" -> false))),
    Scenario("properties-of-relationship", triad,
      "MATCH (a:P {n: 'a'})-[r:R]->() RETURN properties(r) AS p",
      Seq(row("p" -> Map("w" -> 1L)))),
    Scenario("inline-prop-map-references-bound-var", triad,
      "MATCH (a:P {n: 'a'})-[:R]->(b {v: a.v + 1}) RETURN b.n AS n",
      Seq(row("n" -> "b"))),
    Scenario("inline-null-prop-map-matches-nothing", nulls,
      "MATCH (n:X {k: null}) RETURN count(*) AS n",
      Seq(row("n" -> 0))),
    Scenario("order-by-unprojected-aggregate", social,
      """MATCH (n:Person)
        |RETURN n.city AS city, count(*) AS c ORDER BY sum(n.age) DESC""".stripMargin,
      Seq(row("city" -> "Berlin", "c" -> 2), row("city" -> null, "c" -> 1),
        row("city" -> "Paris", "c" -> 1)), ordered = true),
    Scenario("with-order-by-unaliased-aggregate", social,
      """MATCH (n:Person) WITH n.city AS city, count(*) AS c
        |ORDER BY count(*) DESC, city RETURN city, c""".stripMargin,
      Seq(row("city" -> "Berlin", "c" -> 2), row("city" -> "Paris", "c" -> 1),
        row("city" -> null, "c" -> 1)), ordered = true),
    Scenario("left-right-length-edges", empty,
      "RETURN left('abc', 0) AS a, right('abc', 5) AS b",
      Seq(row("a" -> "", "b" -> "abc"))),
    Scenario("list-property-created-and-unwound", "CREATE (:LP {l: [1, 2, 3]})",
      "MATCH (n:LP) UNWIND n.l AS x RETURN x ORDER BY x",
      Seq(row("x" -> 1), row("x" -> 2), row("x" -> 3)), ordered = true),

    // ---- third probe batch: null lists in HOFs, rel-list indexing
    Scenario("quantifier-on-null-list-is-null", empty,
      "RETURN any(x IN null WHERE x > 0) AS a, all(x IN null WHERE x > 0) AS b",
      Seq(row("a" -> null, "b" -> null))),
    Scenario("reduce-on-null-list-is-null", empty,
      "RETURN reduce(s = 0, x IN null | s + x) AS r",
      Seq(row("r" -> null))),
    Scenario("tofloat-scientific-notation", empty,
      "RETURN toFloat('1e3') AS x", Seq(row("x" -> 1000.0))),
    Scenario("split-keeps-empty-tokens", empty,
      "RETURN split('a,b,,c', ',') AS x",
      Seq(row("x" -> List("a", "b", "", "c")))),
    Scenario("varlength-rel-list-index-property", chain,
      "MATCH ()-[rs:R*2]->() RETURN rs[0].w AS w ORDER BY w",
      Seq(row("w" -> 1), row("w" -> 2)), ordered = true),
    Scenario("varlength-rel-list-index-type", chain,
      "MATCH ()-[rs:R*2]->() RETURN type(rs[0]) AS t, type(rs[1]) AS u ORDER BY u",
      Seq(row("t" -> "R", "u" -> "R"), row("t" -> "R", "u" -> "R")),
      ordered = true),
    Scenario("path-nodes-index-property", triad,
      "MATCH p = (a:P {n: 'a'})-[:R*2]->(c) RETURN nodes(p)[1].n AS mid",
      Seq(row("mid" -> "b"))),

    // ---- fourth probe batch: scoping, nested maps, mixed expressions
    Scenario("collect-then-unwind-then-sum", triad,
      """MATCH (n:P) WITH collect(n.v) AS vs
        |UNWIND vs AS v RETURN sum(v) AS s""".stripMargin,
      Seq(row("s" -> 6))),
    Scenario("unwind-with-expression-rebind", empty,
      "UNWIND [1,2] AS x WITH x*2 AS y RETURN y ORDER BY y",
      Seq(row("y" -> 2), row("y" -> 4)), ordered = true),
    Scenario("rel-type-alternation-with-where", triad,
      "MATCH (a)-[r:R|S]->(b) WHERE r.w > 1 RETURN r.w AS w ORDER BY w",
      Seq(row("w" -> 2), row("w" -> 9)), ordered = true),
    Scenario("nested-map-node-property", "CREATE (:M {m: {a: 1}})",
      "MATCH (n:M) RETURN n.m.a AS x", Seq(row("x" -> 1))),
    Scenario("round-with-precision", empty,
      "RETURN round(3.14159, 2) AS x", Seq(row("x" -> 3.14))),
    Scenario("reduce-string-accumulator", empty,
      "RETURN reduce(s = '', x IN ['a','b','c'] | s + x) AS r",
      Seq(row("r" -> "abc"))),
    Scenario("order-by-base-expr-of-aliased-item", triad,
      "MATCH (n:P) RETURN n.v AS v ORDER BY n.v DESC",
      Seq(row("v" -> 3), row("v" -> 2), row("v" -> 1)), ordered = true),
    Scenario("case-mixed-numeric-branches", empty,
      "UNWIND [1,2] AS x RETURN CASE WHEN x = 1 THEN 1 ELSE 2.5 END AS y ORDER BY y",
      Seq(row("y" -> 1.0), row("y" -> 2.5)), ordered = true),
    Scenario("size-of-pattern-in-where", social,
      """MATCH (n:Person) WHERE size((n)-[:KNOWS]->()) >= 2
        |RETURN n.name AS name""".stripMargin,
      Seq(row("name" -> "Alice"))),
    Scenario("index-collected-list-by-unwound-range", triad,
      """MATCH (n:P) WITH collect(n.v) AS vs
        |UNWIND range(0, size(vs)-1) AS i
        |RETURN vs[i] AS v ORDER BY v""".stripMargin,
      Seq(row("v" -> 1), row("v" -> 2), row("v" -> 3)), ordered = true),
    Scenario("map-property-equality-filter", "CREATE (:M {m: {a: 1}}), (:M {m: {a: 2}})",
      "MATCH (n:M) WHERE n.m = {a: 1} RETURN n.m.a AS x",
      Seq(row("x" -> 1))),
    Scenario("pattern-comprehension-where-and-rel-projection", triad,
      """MATCH (a:P {n: 'a'})
        |RETURN [(a)-[r:R]->(b) WHERE b.v > 1 | r.w] AS ws""".stripMargin,
      Seq(row("ws" -> List(1L)))),
    Scenario("avg-of-integers-is-float", empty,
      "UNWIND [1,2] AS x RETURN avg(x) AS a", Seq(row("a" -> 1.5))),
    Scenario("order-by-boolean", empty,
      "UNWIND [true,false] AS b RETURN b ORDER BY b",
      Seq(row("b" -> false), row("b" -> true)), ordered = true),

    // ---- selectivity-driven part reversal (PartReversalSpec has the
    // AST-level unit tests; these lock end-to-end correctness of shapes
    // the planner now plans back-to-front)
    Scenario("reversal-directed-selective-end", triad,
      "MATCH (x)-[:R]->(b:P {n: 'c'}) RETURN x.n AS n",
      Seq(row("n" -> "b"))),
    Scenario("reversal-two-hop-selective-end", triad,
      "MATCH (x)-[:R]->()-[:R]->(c:P {n: 'c'}) RETURN x.n AS n",
      Seq(row("n" -> "a"))),
    Scenario("reversal-incoming-selective-end", triad,
      "MATCH (x)<-[:R]-(a:P {n: 'a'}) RETURN x.n AS n",
      Seq(row("n" -> "b"))),
    Scenario("reversal-undirected-startnode", triad,
      "MATCH (x)-[r:R]-(b:P {n: 'b'}) RETURN startNode(r).n AS s ORDER BY s",
      Seq(row("s" -> "a"), row("s" -> "b")), ordered = true),
    Scenario("reversal-rel-prop-selective-end", triad,
      "MATCH (x)-[r:R {w: 2}]->(c:P {n: 'c'}) RETURN x.n AS n",
      Seq(row("n" -> "b"))),
    Scenario("reversal-exists-anchored-at-end", social,
      """MATCH (p:Person) WHERE EXISTS { MATCH (x)-[:KNOWS]->(p) }
        |RETURN p.name AS name ORDER BY name""".stripMargin,
      Seq(row("name" -> "Bob"), row("name" -> "Carol"), row("name" -> "Dave")),
      ordered = true),
    Scenario("reversal-anon-varlength", triad,
      "MATCH (x)-[:R*1..2]->(c:P {n: 'c'}) RETURN x.n AS n ORDER BY n",
      Seq(row("n" -> "a"), row("n" -> "b")), ordered = true),

    // ----- regex =~ is a FULL-string match (Matcher.matches, not find)
    Scenario("regex-full-match-not-partial", empty,
      "RETURN 'abc' =~ 'a.' AS p, 'abc' =~ 'a.c' AS f, 'hello world' =~ 'world' AS c",
      Seq(row("p" -> false, "f" -> true, "c" -> false))),
    Scenario("regex-inline-flags-and-null", empty,
      "RETURN 'abc' =~ '(?i)A.C' AS i, 'abc' =~ null AS n, null =~ 'a.*' AS m",
      Seq(row("i" -> true, "n" -> null, "m" -> null))),
    Scenario("regex-anchored-pattern-still-works", social,
      "MATCH (p:Person) WHERE p.name =~ '^B.*$' RETURN p.name AS name",
      Seq(row("name" -> "Bob"))),
    Scenario("regex-alternation-full-match", empty,
      "RETURN 'ab' =~ 'a|ab' AS x, 'a' =~ 'a|ab' AS y",
      Seq(row("x" -> true, "y" -> true))),

    // ----- map equality compares BY KEY, not field position
    Scenario("map-equality-by-key", empty,
      "RETURN {a: 1} = {a: 1} AS t, {a: 1} = {b: 1} AS f, {a: 1} = {a: 2} AS f2",
      Seq(row("t" -> true, "f" -> false, "f2" -> false))),
    Scenario("map-equality-key-order-irrelevant", empty,
      "RETURN {a: 1, b: 2} = {b: 2, a: 1} AS t, {a: 1, b: 2} <> {b: 2, a: 1} AS f",
      Seq(row("t" -> true, "f" -> false))),
    Scenario("map-equality-nested-keys", empty,
      "RETURN {a: {x: 1}} = {a: {x: 1}} AS t, {a: {x: 1}} = {a: {y: 1}} AS f",
      Seq(row("t" -> true, "f" -> false))),
    Scenario("map-equality-width-mismatch", empty,
      "RETURN {a: 1} = {a: 1, b: 2} AS f, {a: 1} <> {a: 1, b: 2} AS t",
      Seq(row("f" -> false, "t" -> true))),
    Scenario("map-list-equality-by-key", empty,
      "RETURN [{a: 1}] = [{a: 1}] AS t, [{a: 1}] = [{b: 1}] AS f",
      Seq(row("t" -> true, "f" -> false))),

    // ----- CASE with null / unknowable conditions
    Scenario("case-null-condition-falls-through", empty,
      "RETURN CASE WHEN null THEN 1 ELSE 2 END AS c1, CASE null WHEN null THEN 1 ELSE 2 END AS c2",
      Seq(row("c1" -> 2L, "c2" -> 2L))),
    Scenario("case-null-condition-among-branches", empty,
      "RETURN CASE WHEN null THEN 1 WHEN true THEN 2 ELSE 3 END AS c",
      Seq(row("c" -> 2L))),
    Scenario("case-missing-prop-condition", nulls,
      "MATCH (x:X) RETURN CASE WHEN x.k > 1 THEN 'big' ELSE 'small' END AS c ORDER BY c",
      Seq(row("c" -> "big"), row("c" -> "small"), row("c" -> "small")),
      ordered = true),

    // ----- ordering and distinctness over compound values
    Scenario("order-by-null-first-desc", empty,
      "UNWIND [3, null, 1] AS x RETURN x ORDER BY x DESC",
      Seq(row("x" -> null), row("x" -> 3L), row("x" -> 1L)), ordered = true),
    Scenario("order-by-lists-lexicographic", empty,
      "UNWIND [[2],[1,5],[1]] AS x RETURN x ORDER BY x",
      Seq(row("x" -> List(1L)), row("x" -> List(1L, 5L)),
        row("x" -> List(2L))), ordered = true),
    Scenario("distinct-on-map-values", empty,
      "UNWIND [{a: 1}, {a: 1}, {a: 2}] AS m RETURN DISTINCT m",
      Seq(row("m" -> Map("a" -> 1L)), row("m" -> Map("a" -> 2L)))),
    Scenario("count-distinct-lists", empty,
      "UNWIND [[1],[1],[2]] AS x RETURN count(DISTINCT x) AS c",
      Seq(row("c" -> 2L))),
    Scenario("double-unwind-flattens", empty,
      "UNWIND [[1,2],[3]] AS x UNWIND x AS y RETURN y ORDER BY y",
      Seq(row("y" -> 1L), row("y" -> 2L), row("y" -> 3L)), ordered = true),
    Scenario("with-shadowing-same-clause", empty,
      "WITH 1 AS x WITH x AS y, 2 AS x RETURN x, y",
      Seq(row("x" -> 2L, "y" -> 1L))),

    // ----- duration scaling and component accessors (reference
    // TemporalUdfs.scala:118-142: time accessors are cumulative over the
    // sub-day remainder; ...OfX forms are the mixed-radix digits)
    Scenario("duration-scalar-multiply-divide", empty,
      // PT24H != P1D: duration equality is component-wise (Neo4j model)
      """RETURN duration({hours: 6}) * 4 = duration({days: 1}) AS m,
        |duration({hours: 6}) / 2 = duration({hours: 3}) AS d,
        |duration({months: 2}) * 3 = duration({months: 6}) AS cm""".stripMargin,
      Seq(row("m" -> false, "d" -> true, "cm" -> true))),
    Scenario("duration-cumulative-time-accessors", empty,
      """WITH duration({seconds: 90}) AS d
        |RETURN d.seconds AS s, d.minutes AS m,
        |d.secondsOfMinute AS som, d.minutesOfHour AS moh""".stripMargin,
      Seq(row("s" -> 90L, "m" -> 1L, "som" -> 30L, "moh" -> 1L))),
    Scenario("duration-month-group-accessors", empty,
      """WITH duration({years: 1, months: 2}) AS d
        |RETURN d.months AS tm, d.years AS y, d.quarters AS q,
        |d.monthsOfYear AS my""".stripMargin,
      Seq(row("tm" -> 14L, "y" -> 1L, "q" -> 4L, "my" -> 2L))),
    // ----- string literals keep interior whitespace; split is literal
    Scenario("string-literal-preserves-whitespace", empty,
      "RETURN ' ' AS sp, '  x' AS lead, 'x  ' AS trail, size(' a ') AS n",
      Seq(row("sp" -> " ", "lead" -> "  x", "trail" -> "x  ", "n" -> 3L))),
    Scenario("string-literal-comment-lookalike", empty,
      "RETURN '//not a comment' AS c, '/* nor this */' AS b",
      Seq(row("c" -> "//not a comment", "b" -> "/* nor this */"))),
    Scenario("split-separator-is-literal-not-regex", empty,
      """RETURN split('a b c', ' ') AS sp, split('a.b.c', '.') AS dot,
        |split('a|b', '|') AS pipe, split('a//b', '//') AS sl""".stripMargin,
      Seq(row("sp" -> List("a", "b", "c"), "dot" -> List("a", "b", "c"),
        "pipe" -> List("a", "b"), "sl" -> List("a", "b")))),
    Scenario("split-dynamic-separator", empty,
      "WITH '.' AS sep RETURN split('a.b.c', sep) AS xs",
      Seq(row("xs" -> List("a", "b", "c")))),

    // ----- lexical corners
    Scenario("trailing-semicolon-accepted", social,
      "MATCH (p:Person {name: 'Bob'}) RETURN p.age AS a;",
      Seq(row("a" -> 25L))),
    Scenario("min-long-literal", empty,
      "RETURN -9223372036854775808 AS mn, 9223372036854775807 AS mx",
      Seq(row("mn" -> Long.MinValue, "mx" -> Long.MaxValue))),
    Scenario("escaped-quotes-in-strings", empty,
      """RETURN 'it\'s' AS a, "say \"hi\"" AS b, 'A' AS u""",
      Seq(row("a" -> "it's", "b" -> "say \"hi\"", "u" -> "A"))),
    Scenario("backtick-identifiers-and-keyword-props", social,
      "MATCH (`the person`:Person {name: 'Alice'}) RETURN `the person`.age AS a",
      Seq(row("a" -> 30L))),
    Scenario("comments-inside-query", social,
      "MATCH (p:Person) // only Bob\nWHERE /* filter */ p.name = 'Bob' RETURN p.age AS a",
      Seq(row("a" -> 25L))),

    // ----- aggregate boundary values
    Scenario("percentile-disc-boundaries", empty,
      """UNWIND [1, 2, 3, 4] AS v
        |RETURN percentileDisc(v, 0.0) AS p0, percentileDisc(v, 1.0) AS p1,
        |percentileDisc(v, 0.5) AS p5, percentileCont(v, 0.5) AS pc""".stripMargin,
      Seq(row("p0" -> 1L, "p1" -> 4L, "p5" -> 2L, "pc" -> 2.5))),
    Scenario("aggregates-over-all-null-input", nulls,
      """MATCH (x:X) RETURN min(x.nope) AS mn, max(x.nope) AS mx,
        |avg(x.nope) AS av, sum(x.nope) AS s, count(x.nope) AS c""".stripMargin,
      Seq(row("mn" -> null, "mx" -> null, "av" -> null,
        "s" -> 0L, "c" -> 0L))),
    Scenario("aggregate-arithmetic-composition", empty,
      """UNWIND [10, 20, 30] AS v
        |RETURN sum(v) / count(*) AS mean, max(v) - min(v) AS spread,
        |count(*) + 1 AS c1""".stripMargin,
      Seq(row("mean" -> 20L, "spread" -> 20L, "c1" -> 4L))),

    Scenario("duration-week-and-subsecond-accessors", empty,
      """RETURN duration({days: 40}).weeks AS w,
        |duration('PT1.5S').milliseconds AS ms,
        |duration('PT1.5S').millisecondsOfSecond AS msos,
        |duration('PT1.5S').microseconds AS us""".stripMargin,
      Seq(row("w" -> 5L, "ms" -> 1500L, "msos" -> 500L, "us" -> 1500000L)))
  ) ++ scenariosRound3

  // split into a second method: a single Seq literal of 550+ scenarios
  // exceeds the JVM's 64k bytecode-per-method limit
  private def scenariosRound3: Seq[Scenario] = Seq(
    // ===== round-3 batch: WITH scoping (TCK WithAcceptance intents)
    Scenario("with-renames-and-drops-scope", triad,
      """MATCH (x:P) WITH x.v AS value
        |RETURN value ORDER BY value""".stripMargin,
      Seq(row("value" -> 1L), row("value" -> 2L), row("value" -> 3L)),
      ordered = true),
    Scenario("with-shadows-previous-binding", triad,
      """MATCH (x:P {n: 'a'}) WITH x.v AS v
        |WITH v + 10 AS v
        |RETURN v""".stripMargin,
      Seq(row("v" -> 11L))),
    Scenario("with-where-filters-mid-pipeline", triad,
      """MATCH (x:P) WITH x.v AS v WHERE v > 1
        |RETURN v ORDER BY v""".stripMargin,
      Seq(row("v" -> 2L), row("v" -> 3L)), ordered = true),
    Scenario("with-star-keeps-all-plus-extra", triad,
      """MATCH (x:P {n: 'b'}) WITH *, x.v * 2 AS dbl
        |RETURN x.n AS n, dbl""".stripMargin,
      Seq(row("n" -> "b", "dbl" -> 4L))),
    Scenario("with-limit-cuts-before-next-match", triad,
      """MATCH (x:P) WITH x ORDER BY x.v LIMIT 1
        |MATCH (x)-[:R]->(y) RETURN y.n AS n""".stripMargin,
      Seq(row("n" -> "b"))),
    Scenario("with-skip-then-return", triad,
      """MATCH (x:P) WITH x.v AS v ORDER BY v SKIP 1
        |RETURN v ORDER BY v""".stripMargin,
      Seq(row("v" -> 2L), row("v" -> 3L)), ordered = true),
    Scenario("with-distinct-dedups-rows", loops,
      """MATCH (a:L)-[:S]->() WITH DISTINCT a
        |RETURN a.v AS v""".stripMargin,
      Seq(row("v" -> 1L))),
    Scenario("with-aggregate-then-expand", triad,
      """MATCH (x:P) WITH max(x.v) AS top
        |MATCH (y:P {v: top}) RETURN y.n AS n""".stripMargin,
      Seq(row("n" -> "c"))),
    Scenario("chained-with-renames", triad,
      """MATCH (x:P {n: 'c'}) WITH x.v AS a
        |WITH a AS b WITH b AS c RETURN c""".stripMargin,
      Seq(row("c" -> 3L))),
    Scenario("with-expression-not-in-scope-after", triad,
      """MATCH (x:P) WITH x.v AS v, x.n AS n WHERE n = 'a'
        |RETURN v, n""".stripMargin,
      Seq(row("v" -> 1L, "n" -> "a"))),
    Scenario("with-order-by-aliased-expression", triad,
      """MATCH (x:P) WITH x.v * -1 AS neg ORDER BY neg
        |RETURN collect(neg) AS ns""".stripMargin,
      Seq(row("ns" -> List(-3L, -2L, -1L)))),
    Scenario("with-aggregation-groups-remaining-columns", social,
      """MATCH (p:Person)-[:KNOWS]->(q)
        |WITH p.name AS who, count(q) AS n
        |RETURN who, n ORDER BY who""".stripMargin,
      Seq(row("who" -> "Alice", "n" -> 2L), row("who" -> "Bob", "n" -> 1L),
        row("who" -> "Carol", "n" -> 1L)), ordered = true),
    Scenario("with-bound-node-usable-in-property-pattern", triad,
      """MATCH (a:P {n: 'a'}) WITH a
        |MATCH (a)-[:S]->(c) RETURN c.n AS n""".stripMargin,
      Seq(row("n" -> "c"))),
    Scenario("a-simple-pattern-with-one-bound-endpoint", triad,
      """MATCH (a:P {n: 'a'}) WITH a
        |MATCH (a)-[r:R]->(b) RETURN b.n AS n""".stripMargin,
      Seq(row("n" -> "b"))),

    // ===== aggregation edge cases (TCK AggregationAcceptance intents)
    Scenario("count-star-vs-count-prop-on-nulls", nulls,
      "MATCH (x:X) RETURN count(*) AS all, count(x.k) AS ks, count(x.s) AS ss",
      Seq(row("all" -> 3L, "ks" -> 2L, "ss" -> 2L))),
    Scenario("collect-drops-null-properties", nulls,
      "MATCH (x:X) RETURN size(collect(x.s)) AS n",
      Seq(row("n" -> 2L))),
    Scenario("collect-distinct-dedups", chain,
      """MATCH (:N)-[r:R]->() RETURN size(collect(DISTINCT r.w % 2)) AS n""",
      Seq(row("n" -> 2L))),
    Scenario("min-max-over-person-names", social,
      "MATCH (p:Person) RETURN min(p.name) AS mn, max(p.name) AS mx",
      Seq(row("mn" -> "Alice", "mx" -> "Dave"))),
    Scenario("avg-of-two-integers-is-float", empty,
      "UNWIND [1, 2] AS v RETURN avg(v) AS a",
      Seq(row("a" -> 1.5))),
    Scenario("sum-distinct", empty,
      "UNWIND [1, 1, 2, 3, 3] AS v RETURN sum(DISTINCT v) AS s",
      Seq(row("s" -> 6L))),
    Scenario("count-distinct-expression", social,
      "MATCH (p:Person) RETURN count(DISTINCT p.age % 10) AS n",
      Seq(row("n" -> 2L))),
    Scenario("grouping-key-is-expression", social,
      """MATCH (p:Person) RETURN p.age / 10 AS decade, count(*) AS n
        |ORDER BY decade""".stripMargin,
      Seq(row("decade" -> 2L, "n" -> 1L), row("decade" -> 3L, "n" -> 2L),
        row("decade" -> 4L, "n" -> 1L)), ordered = true),
    Scenario("aggregate-on-empty-match-global", empty,
      "MATCH (n:NoSuch) RETURN count(n) AS n, sum(n.v) AS s",
      Seq(row("n" -> 0L, "s" -> 0L))),
    Scenario("grouped-aggregate-on-empty-match-is-empty", empty,
      "MATCH (n:NoSuch) RETURN n.v AS v, count(*) AS c",
      Seq.empty),
    Scenario("min-max-of-mixed-null-and-value", nulls,
      "MATCH (x:X) RETURN min(x.k) AS mn, max(x.k) AS mx",
      Seq(row("mn" -> 1L, "mx" -> 2L))),
    Scenario("collect-inside-expression", social,
      "MATCH (p:Person) RETURN size(collect(p.name)) + 1 AS n",
      Seq(row("n" -> 5L))),
    Scenario("aggregates-with-limit-after", social,
      """MATCH (p:Person) RETURN p.city AS city, count(*) AS n
        |ORDER BY n DESC, city LIMIT 1""".stripMargin,
      Seq(row("city" -> "Berlin", "n" -> 2L)), ordered = true),
    Scenario("count-nodes-and-rels-together", triad,
      "MATCH (a:P)-[r]->(b:P) RETURN count(a) AS na, count(r) AS nr",
      Seq(row("na" -> 3L, "nr" -> 3L))),
    Scenario("avg-ignores-null-inputs", nulls,
      "MATCH (x:X) RETURN avg(x.k) AS a",
      Seq(row("a" -> 1.5))),
    Scenario("percentile-on-group", chain,
      """MATCH (n:N) RETURN percentileCont(n.v, 0.5) AS med""",
      Seq(row("med" -> 2.5))),

    // ===== OPTIONAL MATCH chains (TCK OptionalMatchAcceptance intents)
    Scenario("two-optional-matches-chained", triad,
      """MATCH (a:P {n: 'a'})
        |OPTIONAL MATCH (a)-[:R]->(b)
        |OPTIONAL MATCH (b)-[:R]->(c)
        |RETURN b.n AS bn, c.n AS cn""".stripMargin,
      Seq(row("bn" -> "b", "cn" -> "c"))),
    Scenario("optional-chain-stops-at-first-null", triad,
      """MATCH (c:P {n: 'c'})
        |OPTIONAL MATCH (c)-[:R]->(d)
        |OPTIONAL MATCH (d)-[:R]->(e)
        |RETURN d.n AS dn, e.n AS en""".stripMargin,
      Seq(row("dn" -> null, "en" -> null))),
    Scenario("optional-match-with-where-on-optional-var", social,
      """MATCH (p:Person {name: 'Alice'})
        |OPTIONAL MATCH (p)-[k:KNOWS]->(q) WHERE k.since > 2011
        |RETURN q.name AS qn""".stripMargin,
      Seq(row("qn" -> "Carol"))),
    Scenario("optional-match-where-false-keeps-row", social,
      """MATCH (p:Person {name: 'Alice'})
        |OPTIONAL MATCH (p)-[k:KNOWS]->(q) WHERE k.since > 9999
        |RETURN p.name AS pn, q.name AS qn""".stripMargin,
      Seq(row("pn" -> "Alice", "qn" -> null))),
    Scenario("optional-then-aggregate-counts-nulls-as-zero", social,
      """MATCH (p:Person)
        |OPTIONAL MATCH (p)-[:KNOWS]->(q:Admin)
        |RETURN p.name AS pn, count(q) AS n ORDER BY pn""".stripMargin,
      Seq(row("pn" -> "Alice", "n" -> 0L), row("pn" -> "Bob", "n" -> 0L),
        row("pn" -> "Carol", "n" -> 1L), row("pn" -> "Dave", "n" -> 0L)),
      ordered = true),
    Scenario("optional-null-propagates-through-expressions", triad,
      """MATCH (c:P {n: 'c'})
        |OPTIONAL MATCH (c)-[:R]->(d)
        |RETURN d.v + 1 AS dv, d.v IS NULL AS isn""".stripMargin,
      Seq(row("dv" -> null, "isn" -> true))),
    Scenario("optional-match-both-new-vars", social,
      """MATCH (r:Robot)
        |OPTIONAL MATCH (x:Person {name: 'Nobody'})-[:KNOWS]->(y)
        |RETURN r.name AS rn, x.name AS xn, y.name AS yn""".stripMargin,
      Seq(row("rn" -> "R2", "xn" -> null, "yn" -> null))),
    Scenario("optional-match-reuses-matched-rel-type", triad,
      """MATCH (a:P {n: 'a'})-[:S]->(c)
        |OPTIONAL MATCH (c)<-[:R]-(mid) RETURN c.n AS cn, mid.n AS mn""".stripMargin,
      Seq(row("cn" -> "c", "mn" -> "b"))),
    Scenario("optional-varlength-null-when-no-path", triad,
      """MATCH (c:P {n: 'c'})
        |OPTIONAL MATCH (c)-[rs:R*1..2]->(x)
        |RETURN x.n AS xn""".stripMargin,
      Seq(row("xn" -> null))),
    Scenario("optional-on-bound-null-stays-null", triad,
      """MATCH (c:P {n: 'c'}) OPTIONAL MATCH (c)-[:R]->(d)
        |WITH d OPTIONAL MATCH (d)-[:S]->(e)
        |RETURN d.n AS dn, e.n AS en""".stripMargin,
      Seq(row("dn" -> null, "en" -> null))),

    // ===== type conversions (TCK TypeConversionFunctions intents)
    Scenario("tointeger-truncates-floats", empty,
      "RETURN toInteger(3.9) AS a, toInteger(-3.9) AS b",
      Seq(row("a" -> 3L, "b" -> -3L))),
    Scenario("tointeger-parses-strings-or-nulls", empty,
      "RETURN toInteger('42') AS a, toInteger('not a number') AS b",
      Seq(row("a" -> 42L, "b" -> null))),
    Scenario("tofloat-parses-and-rejects", empty,
      "RETURN toFloat('2.5') AS a, toFloat('x') AS b, toFloat(7) AS c",
      Seq(row("a" -> 2.5, "b" -> null, "c" -> 7.0))),
    Scenario("toboolean-strings", empty,
      "RETURN toBoolean('true') AS t, toBoolean('false') AS f, toBoolean('nope') AS n",
      Seq(row("t" -> true, "f" -> false, "n" -> null))),
    Scenario("tostring-of-int-and-bool", empty,
      "RETURN toString(42) AS i, toString(true) AS b",
      Seq(row("i" -> "42", "b" -> "true"))),
    Scenario("conversions-preserve-null", empty,
      "RETURN toInteger(null) AS a, toFloat(null) AS b, toString(null) AS c",
      Seq(row("a" -> null, "b" -> null, "c" -> null))),

    // ===== list operations (TCK ListOperations intents)
    Scenario("list-concat-and-length", empty,
      "RETURN size([1, 2] + [3]) AS n, [1] + [] AS l",
      Seq(row("n" -> 3L, "l" -> List(1L)))),
    Scenario("list-in-nested-lists", empty,
      "RETURN [1, 2] IN [[1, 2], [3]] AS yes, [9] IN [[1, 2]] AS no",
      Seq(row("yes" -> true, "no" -> false))),
    Scenario("head-last-tail-on-lists", empty,
      "RETURN head([1, 2, 3]) AS h, last([1, 2, 3]) AS l, tail([1, 2, 3]) AS t",
      Seq(row("h" -> 1L, "l" -> 3L, "t" -> List(2L, 3L)))),
    Scenario("head-last-of-empty-list-null", empty,
      "RETURN head([]) AS h, last([]) AS l, size(tail([])) AS t",
      Seq(row("h" -> null, "l" -> null, "t" -> 0L))),
    Scenario("reverse-list-and-string", empty,
      "RETURN reverse([1, 2, 3]) AS l, reverse('abc') AS s",
      Seq(row("l" -> List(3L, 2L, 1L), "s" -> "cba"))),
    Scenario("list-index-out-of-bounds-null", empty,
      "RETURN [1, 2][5] AS over, [1, 2][-5] AS under",
      Seq(row("over" -> null, "under" -> null))),
    Scenario("list-slice-beyond-bounds-clamps", empty,
      "RETURN [1, 2, 3][1..99] AS a, [1, 2, 3][0..0] AS b",
      Seq(row("a" -> List(2L, 3L), "b" -> List()))),
    Scenario("range-endpoints-inclusive", empty,
      "RETURN range(2, 5) AS r, size(range(0, 9)) AS n",
      Seq(row("r" -> List(2L, 3L, 4L, 5L), "n" -> 10L))),
    Scenario("list-comprehension-filter-and-map", empty,
      "RETURN [x IN range(1, 6) WHERE x % 2 = 0 | x * 10] AS l",
      Seq(row("l" -> List(20L, 40L, 60L)))),
    Scenario("nested-list-comprehension", empty,
      "RETURN [x IN [1, 2] | [y IN [10] | x + y]] AS l",
      Seq(row("l" -> List(List(11L), List(12L))))),
    Scenario("reduce-sum-over-list", empty,
      "RETURN reduce(acc = 0, x IN [1, 2, 3, 4] | acc + x) AS s",
      Seq(row("s" -> 10L))),
    Scenario("reduce-string-fold-ordered", empty,
      "RETURN reduce(s = '', x IN ['a', 'b', 'c'] | s + x) AS s",
      Seq(row("s" -> "abc"))),
    Scenario("quantifiers-over-literal-lists", empty,
      """RETURN all(x IN [1, 2] WHERE x > 0) AS a,
        |any(x IN [1, 2] WHERE x > 1) AS b,
        |none(x IN [1, 2] WHERE x > 5) AS c,
        |single(x IN [1, 2] WHERE x = 2) AS d""".stripMargin,
      Seq(row("a" -> true, "b" -> true, "c" -> true, "d" -> true))),
    Scenario("list-of-nodes-size", triad,
      "MATCH (p:P) WITH collect(p) AS ps RETURN size(ps) AS n",
      Seq(row("n" -> 3L))),
    Scenario("split-and-join-roundtrip", empty,
      "RETURN split('a,b,c', ',') AS l, size(split('a,b,c', ',')) AS n",
      Seq(row("l" -> List("a", "b", "c"), "n" -> 3L))),
    Scenario("empty-list-literals-and-isempty", empty,
      "RETURN isEmpty([]) AS e, isEmpty([1]) AS ne, isEmpty('') AS es",
      Seq(row("e" -> true, "ne" -> false, "es" -> true))),

    // ===== UNWIND (TCK UnwindAcceptance intents)
    Scenario("unwind-collected-expression", triad,
      """MATCH (x:P) WITH collect(x.v) AS vs
        |UNWIND vs AS v RETURN v ORDER BY v""".stripMargin,
      Seq(row("v" -> 1L), row("v" -> 2L), row("v" -> 3L)), ordered = true),
    Scenario("unwind-keeps-other-variables-in-scope", triad,
      """MATCH (x:P {n: 'a'}) UNWIND [10, 20] AS u
        |RETURN x.n AS n, u ORDER BY u""".stripMargin,
      Seq(row("n" -> "a", "u" -> 10L), row("n" -> "a", "u" -> 20L)),
      ordered = true),
    Scenario("unwind-empty-list-produces-no-rows", empty,
      "UNWIND [] AS x RETURN x",
      Seq.empty),
    Scenario("unwind-null-produces-no-rows", empty,
      "UNWIND null AS x RETURN x",
      Seq.empty),
    Scenario("double-unwind-cross-product", empty,
      """UNWIND [1, 2] AS a UNWIND ['x', 'y'] AS b
        |RETURN a, b ORDER BY a, b""".stripMargin,
      Seq(row("a" -> 1L, "b" -> "x"), row("a" -> 1L, "b" -> "y"),
        row("a" -> 2L, "b" -> "x"), row("a" -> 2L, "b" -> "y")),
      ordered = true),
    Scenario("unwind-range-then-aggregate", empty,
      "UNWIND range(1, 100) AS x RETURN sum(x) AS s",
      Seq(row("s" -> 5050L))),
    Scenario("unwind-nested-list-one-level", empty,
      "UNWIND [[1, 2], [3]] AS l RETURN size(l) AS n ORDER BY n",
      Seq(row("n" -> 1L), row("n" -> 2L)), ordered = true),
    Scenario("unwind-distinct-aggregation", empty,
      "UNWIND [1, 1, 2] AS x RETURN count(DISTINCT x) AS n",
      Seq(row("n" -> 2L))),

    // ===== var-length bounds (TCK VarLengthAcceptance intents)
    Scenario("varlength-lower-bound-only", chain,
      """MATCH (s:N {v: 1})-[:R*2..3]->(x) RETURN x.v AS v ORDER BY v""".stripMargin,
      Seq(row("v" -> 3L), row("v" -> 4L)), ordered = true),
    Scenario("varlength-exact-length", chain,
      "MATCH (s:N {v: 1})-[:R*2]->(x) RETURN x.v AS v",
      Seq(row("v" -> 3L))),
    Scenario("varlength-zero-or-one", chain,
      """MATCH (s:N {v: 2})-[:R*0..1]->(x) RETURN x.v AS v ORDER BY v""".stripMargin,
      Seq(row("v" -> 2L), row("v" -> 3L)), ordered = true),
    Scenario("varlength-zero-length-binds-same-node", chain,
      "MATCH (s:N {v: 1})-[:R*0]->(x) RETURN x.v AS v",
      Seq(row("v" -> 1L))),
    Scenario("varlength-then-fixed-rel-in-chain", chain,
      """MATCH (s:N {v: 1})-[:R*1..2]->()-[:R]->(x)
        |RETURN x.v AS v ORDER BY v""".stripMargin,
      Seq(row("v" -> 3L), row("v" -> 4L)), ordered = true),
    Scenario("fixed-rel-then-varlength-in-chain", chain,
      """MATCH (s:N {v: 1})-[:R]->()-[:R*1..2]->(x)
        |RETURN x.v AS v ORDER BY v""".stripMargin,
      Seq(row("v" -> 3L), row("v" -> 4L)), ordered = true),
    Scenario("varlength-rel-list-length-matches-hops", chain,
      """MATCH (s:N {v: 1})-[rs:R*1..3]->(x)
        |RETURN size(rs) AS n, x.v AS v ORDER BY n""".stripMargin,
      Seq(row("n" -> 1L, "v" -> 2L), row("n" -> 2L, "v" -> 3L),
        row("n" -> 3L, "v" -> 4L)), ordered = true),
    Scenario("varlength-incoming-direction", chain,
      "MATCH (e:N {v: 4})<-[:R*2]-(x) RETURN x.v AS v",
      Seq(row("v" -> 2L))),
    Scenario("varlength-undirected-counts-both-ways", chain,
      """MATCH (m:N {v: 2})-[:R*1]-(x) RETURN x.v AS v ORDER BY v""".stripMargin,
      Seq(row("v" -> 1L), row("v" -> 3L)), ordered = true),
    Scenario("varlength-self-loop-respects-rel-uniqueness", loops,
      """MATCH (a:L {v: 1})-[:S*1..2]->(x)
        |RETURN x.v AS v ORDER BY v""".stripMargin,
      // paths: a→a, a→b, a→a→b (the self-loop edge can't repeat: a→a→a is out)
      Seq(row("v" -> 1L), row("v" -> 2L), row("v" -> 2L)), ordered = true),

    // ===== comparisons & expressions (Comparability / Equals intents)
    Scenario("numeric-widths-compare-within-family", empty,
      "RETURN 1 = 1.0 AS a, 2 > 1.5 AS b, 0.5 < 1 AS c",
      Seq(row("a" -> true, "b" -> true, "c" -> true))),
    Scenario("cross-family-equality-false-ordering-null", empty,
      "RETURN 1 = 'a' AS eq, 'a' < 1 AS lt",
      Seq(row("eq" -> false, "lt" -> null))),
    Scenario("boolean-equality-and-null", empty,
      "RETURN true = true AS t, true = null AS n, false <> true AS d",
      Seq(row("t" -> true, "n" -> null, "d" -> true))),
    Scenario("chained-arithmetic-precedence", empty,
      // openCypher grammar: unary minus binds TIGHTER than ^ (PowerOf
      // wraps UnaryAddOrSubtract), so -2 ^ 2 = (-2)^2 = 4
      "RETURN 2 + 3 * 4 AS a, (2 + 3) * 4 AS b, 2 - 3 - 4 AS c, -2 ^ 2 AS d",
      Seq(row("a" -> 14L, "b" -> 20L, "c" -> -5L, "d" -> 4.0))),
    Scenario("string-comparison-is-lexicographic", empty,
      "RETURN 'abc' < 'abd' AS a, 'Z' < 'a' AS b, 'abc' <= 'abc' AS c",
      Seq(row("a" -> true, "b" -> true, "c" -> true))),
    Scenario("is-null-on-expressions", nulls,
      """MATCH (x:X) WHERE (x.k + 1) IS NULL RETURN x.s AS s""",
      Seq(row("s" -> "b"))),
    Scenario("case-on-value-ranges", social,
      """MATCH (p:Person)
        |RETURN p.name AS n,
        |CASE WHEN p.age < 30 THEN 'young' WHEN p.age < 40 THEN 'mid'
        |ELSE 'senior' END AS band ORDER BY n""".stripMargin,
      Seq(row("n" -> "Alice", "band" -> "mid"),
        row("n" -> "Bob", "band" -> "young"),
        row("n" -> "Carol", "band" -> "mid"),
        row("n" -> "Dave", "band" -> "senior")), ordered = true),
    Scenario("simple-case-with-default", empty,
      """UNWIND [1, 2, 3] AS v
        |RETURN CASE v WHEN 1 THEN 'one' WHEN 2 THEN 'two' ELSE 'many' END AS w
        |ORDER BY w""".stripMargin,
      Seq(row("w" -> "many"), row("w" -> "one"), row("w" -> "two")),
      ordered = true),
    Scenario("null-arithmetic-propagates-everywhere", empty,
      "RETURN null + 1 AS a, null * 0 AS b, null = null AS c, null <> null AS d",
      Seq(row("a" -> null, "b" -> null, "c" -> null, "d" -> null))),
    Scenario("in-list-with-null-element-semantics", empty,
      "RETURN 1 IN [1, null] AS hit, 2 IN [1, null] AS maybe",
      Seq(row("hit" -> true, "maybe" -> null))),
    Scenario("not-in-and-negation", empty,
      "RETURN NOT 2 IN [1, 3] AS a, NOT true AS b, NOT null AS c",
      Seq(row("a" -> true, "b" -> false, "c" -> null))),
    Scenario("exponent-and-modulo", empty,
      "RETURN 2 ^ 10 AS p, 10 % 3 AS m, -10 % 3 AS nm",
      Seq(row("p" -> 1024.0, "m" -> 1L, "nm" -> -1L))),

    // ===== RETURN / column shapes (ReturnAcceptance2, ColumnName intents)
    Scenario("return-unaliased-property-keeps-name", triad,
      "MATCH (x:P {n: 'a'}) RETURN x.v",
      Seq(row("x.v" -> 1L))),
    Scenario("return-distinct-on-expressions", empty,
      "UNWIND [1, 2, 3, 4] AS v RETURN DISTINCT v % 2 AS p ORDER BY p",
      Seq(row("p" -> 0L), row("p" -> 1L)), ordered = true),
    Scenario("return-star-after-match", triad,
      // entities render as value structs: @id/@labels metadata + props
      "MATCH (x:P {n: 'b'}) RETURN * ",
      Seq(row("x" -> Map("@id" -> 2L, "@labels" -> List("P"),
        "n" -> "b", "v" -> 2L)))),
    Scenario("order-by-city-desc-age-asc", social,
      """MATCH (p:Person) RETURN p.city AS c, p.age AS a
        |ORDER BY c DESC, a ASC""".stripMargin,
      Seq(row("c" -> null, "a" -> 35L), row("c" -> "Paris", "a" -> 25L),
        row("c" -> "Berlin", "a" -> 30L), row("c" -> "Berlin", "a" -> 40L)),
      ordered = true),
    Scenario("limit-zero-returns-nothing", social,
      "MATCH (p:Person) RETURN p.name AS n LIMIT 0",
      Seq.empty),
    Scenario("skip-beyond-rows-returns-nothing", triad,
      "MATCH (x:P) RETURN x.v AS v ORDER BY v SKIP 10",
      Seq.empty),
    Scenario("order-by-column-used-only-for-sort", triad,
      "MATCH (x:P) RETURN x.n AS n ORDER BY x.v DESC",
      Seq(row("n" -> "c"), row("n" -> "b"), row("n" -> "a")), ordered = true)
  ) ++ scenariosRound3b

  private def scenariosRound3b: Seq[Scenario] = Seq(
    // ===== round-3b batch: OPTIONAL MATCH WHERE attachment (TCK
    // OptionalMatchAcceptance: the WHERE belongs to the OPTIONAL MATCH —
    // a failing predicate nulls the optional side, never drops the row)
    Scenario("optional-match-where-is-part-of-match", triad,
      """MATCH (a:P {n: 'a'}) OPTIONAL MATCH (a)-[:R]->(b) WHERE b.v > 5
        |RETURN a.n AS an, b.v AS bv""".stripMargin,
      Seq(row("an" -> "a", "bv" -> null))),
    Scenario("optional-match-where-keeps-partial", triad,
      """MATCH (a:P {n: 'a'}) OPTIONAL MATCH (a)-[:R]->(b) WHERE b.v > 1
        |RETURN a.n AS an, b.v AS bv""".stripMargin,
      Seq(row("an" -> "a", "bv" -> 2L))),
    Scenario("optional-count-star-counts-rows", social,
      """MATCH (r:Robot) OPTIONAL MATCH (r)-[k:KNOWS]->()
        |RETURN count(k) AS ck, count(*) AS cs""".stripMargin,
      Seq(row("ck" -> 0L, "cs" -> 1L))),
    // ===== pattern predicates with both endpoints bound
    Scenario("exists-pattern-both-endpoints-bound", triad,
      """MATCH (a:P {n: 'a'}), (c:P {n: 'c'}) WHERE (a)-[:S]->(c)
        |RETURN a.n AS an""".stripMargin,
      Seq(row("an" -> "a"))),
    Scenario("not-pattern-predicate-filters", triad,
      """MATCH (a:P) WHERE NOT (a)-[:S]->()
        |RETURN a.n AS n ORDER BY n""".stripMargin,
      Seq(row("n" -> "b"), row("n" -> "c")), ordered = true),
    // ===== named paths: single node and zero-length
    Scenario("single-node-named-path", triad,
      """MATCH p = (a:P {n: 'a'})
        |RETURN length(p) AS l, size(nodes(p)) AS n""".stripMargin,
      Seq(row("l" -> 0L, "n" -> 1L))),
    Scenario("zero-length-named-path-lengths", triad,
      """MATCH p = (a:P {n: 'a'})-[:R*0..1]->()
        |RETURN length(p) AS l ORDER BY l""".stripMargin,
      Seq(row("l" -> 0L), row("l" -> 1L)), ordered = true),
    Scenario("distinct-on-lists", empty,
      """UNWIND [[1, 2], [1, 2], [3]] AS l
        |RETURN DISTINCT l ORDER BY l""".stripMargin,
      Seq(row("l" -> List(1L, 2L)), row("l" -> List(3L))), ordered = true),
    Scenario("order-by-unprojected-property", triad,
      "MATCH (x:P) RETURN x.n AS n ORDER BY x.v DESC",
      Seq(row("n" -> "c"), row("n" -> "b"), row("n" -> "a")), ordered = true),
    // ===== map/list construction + access edge cases
    Scenario("map-projection-with-literal-entry", triad,
      "MATCH (x:P {n: 'a'}) RETURN x {.n, extra: 42} AS m",
      Seq(row("m" -> Map("n" -> "a", "extra" -> 42L)))),
    Scenario("negative-slice-bounds", empty,
      "RETURN [1, 2, 3, 4][-2..] AS s",
      Seq(row("s" -> List(3L, 4L)))),
    Scenario("slice-open-negative-end", empty,
      "RETURN [1, 2, 3, 4][..-1] AS s",
      Seq(row("s" -> List(1L, 2L, 3L)))),
    Scenario("nested-map-literal-field-chain", empty,
      "RETURN {a: {b: 2}}.a.b AS x",
      Seq(row("x" -> 2L))),
    Scenario("nested-list-literal-index-chain", empty,
      "RETURN [[1, 2], [3, 4]][1][0] AS x",
      Seq(row("x" -> 3L))),
    Scenario("list-plus-null-is-null", empty,
      "RETURN [1] + null AS x",
      Seq(row("x" -> null))),
    Scenario("index-into-null-list-is-null", empty,
      "WITH null AS l RETURN l[0] AS x",
      Seq(row("x" -> null))),
    // ===== strings
    Scenario("uppercase-before-lowercase-codepoint-order", empty,
      "RETURN 'B' < 'a' AS x",
      Seq(row("x" -> true))),
    Scenario("starts-ends-with-empty-string", empty,
      "RETURN 'abc' STARTS WITH '' AS s, 'abc' ENDS WITH '' AS e",
      Seq(row("s" -> true, "e" -> true))),
    Scenario("trim-ltrim-rtrim", empty,
      "RETURN trim('  a b  ') AS t, lTrim('  x') AS l, rTrim('y  ') AS r",
      Seq(row("t" -> "a b", "l" -> "x", "r" -> "y"))),
    Scenario("substring-length-clamps", empty,
      "RETURN substring('abc', 1, 10) AS s",
      Seq(row("s" -> "bc"))),
    // ===== aggregates
    Scenario("percentile-disc-median", empty,
      "UNWIND [1, 2, 3, 4, 5] AS v RETURN percentileDisc(v, 0.5) AS p",
      Seq(row("p" -> 3L))),
    Scenario("min-max-over-dates", empty,
      """UNWIND [date('2020-01-02'), date('2019-12-31')] AS d
        |RETURN min(d) AS mn, max(d) AS mx""".stripMargin,
      Seq(row("mn" -> "2019-12-31", "mx" -> "2020-01-02"))),
    Scenario("with-aggregate-entity-group-then-property", triad,
      """MATCH (a:P)-[r:R]->() WITH a, count(r) AS c
        |RETURN a.n AS n, c ORDER BY n""".stripMargin,
      Seq(row("n" -> "a", "c" -> 1L), row("n" -> "b", "c" -> 1L)),
      ordered = true),
    // ===== label predicates + literals + params
    Scenario("label-disjunction-in-where", social,
      """MATCH (n) WHERE n:Admin OR n:Robot
        |RETURN n.name AS name ORDER BY name""".stripMargin,
      Seq(row("name" -> "Dave"), row("name" -> "R2")), ordered = true),
    Scenario("unary-plus-and-negative-hex", empty,
      "RETURN +5 AS x, -0x10 AS y",
      Seq(row("x" -> 5L, "y" -> -16L))),
    Scenario("range-negative-step-descending", empty,
      "RETURN range(5, 1, -2) AS r",
      Seq(row("r" -> List(5L, 3L, 1L)))),
    Scenario("match-inline-param-map", triad,
      "MATCH (x:P {n: $name}) RETURN x.v AS v",
      Seq(row("v" -> 2L)), params = Map("name" -> "b")),
    // ===== ternary list equality (former blacklist divergence, now
    // element-wise 3VL: false beats null, length mismatch is false)
    Scenario("ternary-list-equality-definite-mismatch", empty,
      "RETURN [1,2] = [1,3] AS a, [1,2] = [1,null,3] AS b, [1,2] = [1,2] AS c",
      Seq(row("a" -> false, "b" -> false, "c" -> true))),
    Scenario("ternary-list-inequality-null-element", empty,
      "RETURN [1,2] <> [1,null] AS y",
      Seq(row("y" -> null))),
    Scenario("ternary-list-equality-false-beats-null", empty,
      "RETURN [1,2] = [null,3] AS x",
      Seq(row("x" -> false))),
    Scenario("ternary-list-equality-int-float", empty,
      "RETURN [1,2] = [1.0,2.0] AS x",
      Seq(row("x" -> true))),
    // ===== java.lang.Math boundary semantics (Neo4j evaluates these via
    // Math.*; Spark's builtins return null or raise ANSI errors instead)
    Scenario("log-of-zero-is-negative-infinity", empty,
      "RETURN log(0.0) AS a, log10(0.0) AS b",
      Seq(row("a" -> Double.NegativeInfinity,
        "b" -> Double.NegativeInfinity))),
    Scenario("log-of-negative-is-nan", empty,
      "RETURN log(-1.0) AS x",
      Seq(row("x" -> Double.NaN))),
    Scenario("cot-of-zero-is-infinity", empty,
      "RETURN cot(0.0) AS x",
      Seq(row("x" -> Double.PositiveInfinity))),
    // ===== differential-testing finds (DifferentialSpec, round 5)
    // case 321: label predicate on a PRE-BOUND terminal of a cyclic
    // var-length pattern was dropped (chain reversal cannot rescue a
    // same-var cycle; fixed by pushing HasLabels in expandVarLength's
    // bound-dst path, mirroring expandOne's ExpandInto)
    Scenario("varlength-bound-cyclic-terminal-label", twoCycleAB,
      "MATCH (n) MATCH (n)-[*2..2]-(n:A) RETURN n.uid AS u",
      Seq(row("u" -> 1), row("u" -> 1))),
    Scenario("varlength-bound-cyclic-terminal-label-negative", twoCycleAB,
      "MATCH (n) MATCH (n)-[*2..2]-(n:C) RETURN n.uid AS u",
      Seq.empty),
    Scenario("varlength-bound-terminal-label-first-occurrence", twoCycleAB,
      "MATCH (n) MATCH (n:A)-[*2..2]-(n) RETURN n.uid AS u",
      Seq(row("u" -> 1), row("u" -> 1)))
  )

  // probe batch 16 (Probe24Main): runtime/compile error parity and
  // CIP global sort order over mixed-family values — split out of the
  // main literal to stay under the JVM method-size limit
  private def probeBatch16: Seq[Scenario] = Seq(
    Scenario("error-int-division-by-zero", empty,
      "RETURN 1 / 0 AS r", Nil, expectError = Some("DIVIDE_BY_ZERO")),
    Scenario("error-int-modulo-by-zero", empty,
      "RETURN 1 % 0 AS r", Nil, expectError = Some("REMAINDER_BY_ZERO")),
    Scenario("float-modulo-by-zero-is-nan", empty,
      "RETURN 1.5 % 0.0 AS a, 1 % 0.0 AS b, -2.5 % 0.0 AS c",
      Seq(row("a" -> Double.NaN, "b" -> Double.NaN, "c" -> Double.NaN))),
    Scenario("float-modulo-normal-unchanged", empty,
      "RETURN 5.5 % 2.0 AS a, 5 % 2.5 AS b",
      Seq(row("a" -> 1.5, "b" -> 0.0))),
    Scenario("error-substring-negative-start", empty,
      "RETURN substring('abc', -1) AS r", Nil,
      expectError = Some("substring: start must be >= 0")),
    Scenario("error-substring-negative-length", empty,
      "RETURN substring('abc', 0, -2) AS r", Nil,
      expectError = Some("substring: length must be >= 0")),
    Scenario("error-left-negative-length", empty,
      "RETURN left('abc', -1) AS r", Nil,
      expectError = Some("left: length must be >= 0")),
    Scenario("error-right-negative-length", empty,
      "RETURN right('abc', -1) AS r", Nil,
      expectError = Some("right: length must be >= 0")),
    Scenario("error-range-step-zero", empty,
      "RETURN range(1, 3, 0) AS r", Nil,
      expectError = Some("range(): step must not be zero")),
    Scenario("error-list-index-non-integer", empty,
      "RETURN [1,2,3][1.5] AS r", Nil,
      expectError = Some("list index must be an integer")),
    Scenario("error-duplicate-return-alias", empty,
      "RETURN 1 AS a, 2 AS a", Nil,
      expectError = Some("same name `a`")),
    Scenario("error-duplicate-aggregate-alias", empty,
      "UNWIND [1,2] AS v RETURN count(v) AS a, sum(v) AS a", Nil,
      expectError = Some("same name `a`")),
    Scenario("error-id-of-plain-value", empty,
      "RETURN id(5) AS r", Nil,
      expectError = Some("id() expects a node or relationship")),
    Scenario("id-of-null-is-null", empty,
      "RETURN id(null) AS r", Seq(row("r" -> null))),
    // CIP global sort order over mixed-family values: ascending =
    // STRING, BOOLEAN, NUMBER; null last (min/max skip nulls)
    Scenario("min-max-mixed-follow-global-sort-order", empty,
      "UNWIND [1, 'a', true, null] AS v RETURN min(v) AS lo, max(v) AS hi",
      Seq(row("lo" -> "a", "hi" -> 1L))),
    Scenario("min-mixed-numbers-compare-across-int-float", empty,
      "UNWIND [2, 1.5, 'z'] AS v RETURN min(v) AS lo, max(v) AS hi",
      Seq(row("lo" -> "z", "hi" -> 2L))),
    Scenario("order-by-mixed-follows-global-sort-order", empty,
      "UNWIND [1, 'a', true, null, 2.5] AS v RETURN v ORDER BY v",
      Seq(row("v" -> "a"), row("v" -> true), row("v" -> 1L),
        row("v" -> 2.5), row("v" -> null)), ordered = true),
    Scenario("order-by-mixed-desc-nulls-first", empty,
      "UNWIND [1, 'a', true] AS v RETURN v ORDER BY v DESC",
      Seq(row("v" -> 1L), row("v" -> true), row("v" -> "a")),
      ordered = true),
    // mixed-vs-mixed: equality is typed ACROSS the int/float split;
    // ordering is comparability — cross-family comparison is null
    Scenario("mixed-scalar-equality-across-int-float", empty,
      """WITH [1, 'a'] AS l, [1.0, 'a'] AS r
        |RETURN l[0] = r[0] AS numEq, l[1] = r[1] AS strEq,
        |       l[0] = r[1] AS famMismatch""".stripMargin,
      Seq(row("numEq" -> true, "strEq" -> true, "famMismatch" -> false))),
    Scenario("mixed-list-equality-across-int-float", empty,
      """RETURN [1, 'a'] = [1.0, 'a'] AS eq, [1, 'a'] = [2.0, 'a'] AS ne,
        |[1, 'a'] = [1.0, 'b', true] AS len""".stripMargin,
      Seq(row("eq" -> true, "ne" -> false, "len" -> false))),
    Scenario("mixed-list-equality-null-element-ternary", empty,
      "RETURN [1, 'a'] = [1.0, null] AS x, [1, 'a'] = [2, null] AS y",
      Seq(row("x" -> null, "y" -> false))),
    Scenario("mixed-scalar-ordering-is-comparability", empty,
      """WITH [1, 'a', 2.5] AS l
        |RETURN l[0] < l[2] AS numNum, l[0] < l[1] AS numStr,
        |       l[1] < l[1] AS strStr""".stripMargin,
      Seq(row("numNum" -> true, "numStr" -> null, "strStr" -> false))),
    // batch 17 (Probe25Main)
    Scenario("percentile-cont-distinct-interpolates-distinct", empty,
      """UNWIND [1, 1, 1, 100] AS v
        |RETURN percentileCont(DISTINCT v, 0.5) AS c,
        |       percentileCont(v, 0.5) AS plain,
        |       percentileDisc(DISTINCT v, 0.5) AS d""".stripMargin,
      Seq(row("c" -> 50.5, "plain" -> 1.0, "d" -> 1L))),
    Scenario("division-by-negative-zero-is-negative-infinity", empty,
      """RETURN 1.0/-0.0 AS ninf, -1.0/-0.0 AS pinf, 1.0/0.0 AS inf,
        |0.0 = -0.0 AS eq""".stripMargin,
      Seq(row("ninf" -> Double.NegativeInfinity,
        "pinf" -> Double.PositiveInfinity,
        "inf" -> Double.PositiveInfinity, "eq" -> true))),
    Scenario("stacked-aggregation-via-with", empty,
      """UNWIND ['X', 'X', 'Y'] AS c
        |WITH c, count(*) AS n WITH max(n) AS m RETURN m""".stripMargin,
      Seq(row("m" -> 2L))),
    Scenario("error-distinct-order-by-unprojected", empty,
      "UNWIND [1, 2] AS v RETURN DISTINCT v % 2 AS p ORDER BY v", Nil,
      expectError = Some("not defined")),
    Scenario("error-return-star-empty-scope", empty,
      "RETURN *", Nil, expectError = Some("empty projection")),
    Scenario("varlength-cycle-back-to-start-var",
      """CREATE (a:P {name: 'a'}), (b:P {name: 'b'}), (c:P {name: 'c'})
        |CREATE (a)-[:K]->(b), (b)-[:K]->(a), (b)-[:K]->(c)""".stripMargin,
      "MATCH (a:P)-[:K*2..2]->(a) RETURN a.name AS n",
      Seq(row("n" -> "a"), row("n" -> "b"))),
    Scenario("fixed-length-cycle-back-to-start-var",
      """CREATE (a:P {name: 'a'}), (b:P {name: 'b'}), (c:P {name: 'c'})
        |CREATE (a)-[:K]->(b), (b)-[:K]->(a), (b)-[:K]->(c)""".stripMargin,
      "MATCH (a:P)-[:K]->(:P)-[:K]->(a) RETURN a.name AS n",
      Seq(row("n" -> "a"), row("n" -> "b"))),
    // batch 18 (Probe26Main): temporal accessor corners
    Scenario("iso-week-year-accessors", empty,
      """WITH date('2019-12-30') AS d
        |RETURN d.week AS w, d.weekYear AS wy,
        |       date('2024-01-01').week AS w2,
        |       date('2021-01-01').weekYear AS wy2""".stripMargin,
      Seq(row("w" -> 1L, "wy" -> 2020L, "w2" -> 1L, "wy2" -> 2020L))),
    Scenario("sub-second-accessors", empty,
      """WITH localdatetime('2020-01-01T00:00:00.123456') AS t
        |RETURN t.millisecond AS ms, t.microsecond AS us,
        |       t.nanosecond AS ns""".stripMargin,
      Seq(row("ms" -> 123L, "us" -> 123456L, "ns" -> 123456000L))),
    Scenario("duration-division-fractional-carry", empty,
      "RETURN (duration({days: 1}) / 2).hours AS h",
      Seq(row("h" -> 12L))),
    Scenario("full-iso-duration-literal-parses", empty,
      """WITH duration('P1Y2M3DT4H5M6.789S') AS du
        |RETURN du.months AS m, du.days AS d, du.seconds AS s,
        |       du.milliseconds AS ms""".stripMargin,
      Seq(row("m" -> 14L, "d" -> 3L, "s" -> 14706L, "ms" -> 14706789L))),
    Scenario("date-minus-month-duration-clamps", empty,
      "RETURN date('2024-03-31') - duration({months: 1}) AS d",
      Seq(row("d" -> java.sql.Date.valueOf("2024-02-29")))),
    Scenario("temporal-min-max-aggregate", empty,
      """UNWIND [date('2024-01-05'), date('2023-12-31')] AS d
        |RETURN min(d) AS lo, max(d) AS hi""".stripMargin,
      Seq(row("lo" -> java.sql.Date.valueOf("2023-12-31"),
        "hi" -> java.sql.Date.valueOf("2024-01-05")))),
    // batch 19 (Probe27Main): entity value semantics
    Scenario("dynamic-property-access-literal-key", social,
      """MATCH (p:Person {name: 'Alice'})
        |RETURN p['name'] AS n, p['age'] AS a, p['zzz'] AS z""".stripMargin,
      Seq(row("n" -> "Alice", "a" -> 30L, "z" -> null))),
    Scenario("dynamic-property-access-variable-key", social,
      """WITH 'age' AS k MATCH (p:Person {name: 'Bob'})
        |RETURN p[k] AS v""".stripMargin,
      Seq(row("v" -> 25L))),
    Scenario("entity-membership-in-collected-list", social,
      """MATCH (a:Person {name: 'Alice'}) MATCH (n:Person)
        |WITH a, collect(n) AS ns
        |RETURN a IN ns AS hit, size(ns) AS n""".stripMargin,
      Seq(row("hit" -> true, "n" -> 4L))),
    Scenario("collected-entity-equals-bound-entity", social,
      """MATCH (n:Person) WITH collect(n) AS ns
        |MATCH (a:Person {name: 'Alice'})
        |RETURN size([x IN ns WHERE x = a]) AS hits""".stripMargin,
      Seq(row("hits" -> 1L))),
    Scenario("node-equality-is-identity", social,
      """MATCH (a:Person {name: 'Alice'}), (b:Person)
        |WHERE a = b RETURN b.name AS n""".stripMargin,
      Seq(row("n" -> "Alice"))),
    Scenario("rel-vars-in-one-match-never-alias", social,
      // relationship uniqueness: two rel vars in ONE MATCH cannot bind
      // the same relationship, so r1 = r2 matches nothing
      """MATCH (:Person)-[r1:KNOWS]->(:Person),
        |      (:Person)-[r2:KNOWS]->(:Person)
        |WHERE r1 = r2 RETURN count(*) AS n""".stripMargin,
      Seq(row("n" -> 0L))),
    Scenario("replace-with-empty-search-is-identity", empty,
      "RETURN replace('abc', '', 'x') AS a, replace('aaa', 'a', '') AS b",
      Seq(row("a" -> "abc", "b" -> ""))),
    // batch 20 (Probe28Main)
    Scenario("error-with-expression-unaliased", social,
      "MATCH (p:Person) WITH p.name RETURN count(*) AS n", Nil,
      expectError = Some("must be aliased")),
    Scenario("with-bare-variable-needs-no-alias", social,
      "MATCH (p:Person) WITH p RETURN count(p) AS n",
      Seq(row("n" -> 4L))),
    Scenario("case-with-mixed-result-families", empty,
      """UNWIND [1, 2] AS v
        |RETURN CASE WHEN v = 1 THEN 'one' ELSE v END AS r ORDER BY r""".stripMargin,
      // CIP order: the string 'one' before the number 2
      Seq(row("r" -> "one"), row("r" -> 2L)), ordered = true),
    Scenario("collected-entities-survive-field-chains", social,
      """MATCH (n:Person) WITH collect(n) AS ns
        |WITH ns[0] AS first
        |RETURN first.name IS NOT NULL AS named""".stripMargin,
      Seq(row("named" -> true))),
    Scenario("limit-and-skip-accept-constant-arithmetic", social,
      """MATCH (p:Person) RETURN p.name AS n ORDER BY n
        |SKIP 2 - 1 LIMIT 1 + 1""".stripMargin,
      Seq(row("n" -> "Bob"), row("n" -> "Carol")), ordered = true),
    // batch 21 (Probe29Main)
    Scenario("split-on-list-of-delimiters", empty,
      "RETURN split('a,b;c', [',', ';']) AS r",
      Seq(row("r" -> List("a", "b", "c")))),
    Scenario("random-uuid-and-rand-shapes", empty,
      """WITH randomUUID() AS u, rand() AS r
        |RETURN size(u) AS n, r >= 0.0 AND r < 1.0 AS ok,
        |       timestamp() > 0 AS ts""".stripMargin,
      Seq(row("n" -> 36L, "ok" -> true, "ts" -> true))),
    Scenario("euler-pi-haversin-degrees", empty,
      """RETURN degrees(pi()) AS d, radians(180.0) = pi() AS r,
        |haversin(0) AS h0, haversin(pi()) AS hp,
        |e() > 2.718 AND e() < 2.719 AS e""".stripMargin,
      Seq(row("d" -> 180.0, "r" -> true, "h0" -> 0.0, "hp" -> 1.0,
        "e" -> true))),
    Scenario("min-max-over-lists-lexicographic", empty,
      """UNWIND [[1, 2], [1], [2]] AS l
        |RETURN min(l) AS lo, max(l) AS hi""".stripMargin,
      Seq(row("lo" -> List(1L), "hi" -> List(2L)))),
    Scenario("round-is-half-away-from-zero-both-signs", empty,
      "RETURN round(2.5) AS a, round(-2.5) AS b, round(2.4) AS c",
      Seq(row("a" -> 3.0, "b" -> -3.0, "c" -> 2.0))),
    Scenario("abs-preserves-numeric-family", empty,
      "RETURN abs(-5) AS i, abs(-5.5) AS f",
      Seq(row("i" -> 5L, "f" -> 5.5))),
    Scenario("left-zero-and-empty-list-index", empty,
      "RETURN left('abc', 0) AS l, [][0] AS i",
      Seq(row("l" -> "", "i" -> null))),
    Scenario("nested-reduce-over-nested-lists", empty,
      """RETURN reduce(acc = 0, x IN [[1,2],[3]] |
        |acc + reduce(a2 = 0, y IN x | a2 + y)) AS r""".stripMargin,
      Seq(row("r" -> 6L))),
    Scenario("clone-rel-pulls-endpoints",
      """CREATE (a:P {name: 'a'})-[:K {w: 1}]->(b:P {name: 'b'})""",
      // constructed-graph content is asserted in ConstructInteropSpec;
      // here: the base MATCH over rel + endpoints stays intact
      "MATCH (x:P)-[r:K]->(y:P) RETURN x.name AS xn, r.w AS w, y.name AS yn",
      Seq(row("xn" -> "a", "w" -> 1L, "yn" -> "b"))),
    // batch 23 (Probe31Main): OPTIONAL × var-length × quantifier
    Scenario("optional-varlength-pushed-quantifier",
      """CREATE (a:P {name: 'a'}), (b:P {name: 'b'}), (c:P {name: 'c'})
        |CREATE (a)-[:K {w: 1}]->(b), (b)-[:K {w: 5}]->(c)""".stripMargin,
      """MATCH (n {name: 'a'}) OPTIONAL MATCH (n)-[rs:K*1..2]->(m)
        |WHERE all(r IN rs WHERE r.w < 3)
        |RETURN m.name AS mn""".stripMargin,
      Seq(row("mn" -> "b"))),
    Scenario("optional-varlength-quantifier-no-match-keeps-row",
      """CREATE (a:P {name: 'a'}), (b:P {name: 'b'}), (c:P {name: 'c'})
        |CREATE (a)-[:K {w: 1}]->(b), (b)-[:K {w: 5}]->(c)""".stripMargin,
      """MATCH (n {name: 'a'}) OPTIONAL MATCH (n)-[rs:K*2..2]->(m)
        |WHERE any(r IN rs WHERE r.w > 10)
        |RETURN n.name AS nn, m.name AS mn""".stripMargin,
      Seq(row("nn" -> "a", "mn" -> null))),
    Scenario("optional-path-on-nonmatch-has-null-length",
      """CREATE (a:P {name: 'a'}), (d:Q {name: 'd'})
        |CREATE (a)-[:K {w: 1}]->(a)""".stripMargin,
      """MATCH (n:Q) OPTIONAL MATCH p = (n)-[:K*1..2]->(m)
        |RETURN length(p) AS len""".stripMargin,
      Seq(row("len" -> null))),
    Scenario("unwind-of-null-rel-list-drops-row",
      """CREATE (a:P {name: 'a'}), (d:Q {name: 'd'})
        |CREATE (a)-[:K {w: 1}]->(a)""".stripMargin,
      """MATCH (n:Q) OPTIONAL MATCH (n)-[rs:K*1..2]->()
        |UNWIND rs AS r RETURN count(r) AS c""".stripMargin,
      Seq(row("c" -> 0L))),
    // batch 24 (Probe32Main): mixed-family values as keys
    Scenario("group-by-mixed-family-key", empty,
      """UNWIND [1, 'a', 1] AS v
        |RETURN v, count(*) AS n ORDER BY n DESC""".stripMargin,
      Seq(row("v" -> 1L, "n" -> 2L), row("v" -> "a", "n" -> 1L)),
      ordered = true),
    Scenario("distinct-over-mixed-family-values", empty,
      "UNWIND [1, 'a', 1, 'a'] AS v RETURN DISTINCT v ORDER BY v",
      Seq(row("v" -> "a"), row("v" -> 1L)), ordered = true),
    Scenario("mixed-value-in-where-and-simple-case", empty,
      """UNWIND [1, 'a', 2] AS v WITH v WHERE v = 1
        |RETURN CASE v WHEN 1 THEN 'num' ELSE 'other' END AS k""".stripMargin,
      Seq(row("k" -> "num"))),
    // batch 25 (Probe33Main): grouping/DISTINCT use openCypher
    // EQUIVALENCE over mixed-family values — equal numbers are ONE
    // group/value across the int/float encodings; the integer
    // representative wins deterministically (lowest tag)
    Scenario("distinct-mixed-int-float-equivalent", empty,
      "UNWIND [1, 1.0, 'a'] AS v RETURN DISTINCT v ORDER BY v",
      Seq(row("v" -> "a"), row("v" -> 1L)), ordered = true),
    Scenario("distinct-mixed-float-first-still-int-repr", empty,
      "UNWIND [1.0, 1, 'a'] AS v RETURN DISTINCT v ORDER BY v",
      Seq(row("v" -> "a"), row("v" -> 1L)), ordered = true),
    Scenario("count-distinct-mixed-equivalence-skips-null", empty,
      "UNWIND [1, 1.0, 'x', null] AS v RETURN count(DISTINCT v) AS n",
      Seq(row("n" -> 2L))),
    Scenario("group-by-mixed-int-float-one-group", empty,
      """UNWIND [1, 1.0, 'a', 2] AS v
        |RETURN v, count(*) AS n ORDER BY n DESC, v""".stripMargin,
      Seq(row("v" -> 1L, "n" -> 2L), row("v" -> "a", "n" -> 1L),
        row("v" -> 2L, "n" -> 1L)), ordered = true),
    Scenario("collect-distinct-mixed-equivalence", empty,
      "UNWIND [1, 1.0, 'a', 1] AS v RETURN size(collect(DISTINCT v)) AS n",
      Seq(row("n" -> 2L))),
    Scenario("group-by-mixed-two-keys", empty,
      """UNWIND [1, 1.0, 'a'] AS v UNWIND ['p', 'q'] AS w
        |RETURN v, w, count(*) AS n ORDER BY w, v""".stripMargin,
      Seq(row("v" -> "a", "w" -> "p", "n" -> 1L),
        row("v" -> 1L, "w" -> "p", "n" -> 2L),
        row("v" -> "a", "w" -> "q", "n" -> 1L),
        row("v" -> 1L, "w" -> "q", "n" -> 2L)), ordered = true),
    Scenario("distinct-mixed-order-skip-limit", empty,
      """UNWIND [1, 1.0, 'a', 2, 'a'] AS v
        |RETURN DISTINCT v ORDER BY v SKIP 1 LIMIT 2""".stripMargin,
      Seq(row("v" -> 1L), row("v" -> 2L)), ordered = true),
    // null-dividend float modulo propagates null (not NaN)
    Scenario("null-mod-zero-float-is-null", empty,
      "WITH null AS x RETURN x % 0.0 AS r", Seq(row("r" -> null))),
    Scenario("float-mod-zero-still-nan", empty,
      "RETURN 1.5 % 0.0 AS r", Seq(row("r" -> Double.NaN))),
    // dynamic entity access with a statically non-string key is a type
    // error (mirrors the strict list-index check); null key stays null
    Scenario("dynamic-property-non-string-key-errors",
      "CREATE (:T {x: 1})",
      "MATCH (t:T) RETURN t[0] AS r", Seq.empty,
      expectError = Some("entity property key must be a string")),
    Scenario("dynamic-property-null-key-is-null",
      "CREATE (:T {x: 1})",
      "MATCH (t:T) RETURN t[null] AS r", Seq(row("r" -> null))),
    // a nested heterogeneous list Spark cannot type must ERROR, not
    // silently plan UNWIND as zero rows (typeOf's NullType fallback)
    // r8 update: an already-mixed inner list now promotes its siblings
    // (ADVICE r7), so this shape is a legal heterogeneous list-of-lists
    // instead of the round-4 DATATYPE_MISMATCH error
    Scenario("unwind-mixed-nested-list-promotes", empty,
      "UNWIND [[1, 10], ['a', 5]] AS p " +
        "RETURN p[0] = 1 AS a, p[1] = 10 AS b, size(p) AS n",
      Seq(row("a" -> true, "b" -> true, "n" -> 2L),
        row("a" -> false, "b" -> false, "n" -> 2L))),
    Scenario("unwind-null-still-no-rows", empty,
      "UNWIND null AS x RETURN count(x) AS n", Seq(row("n" -> 0L))),
    // a pure-time construction ≥ 24h keeps its groups: days stays 0
    // (durations are CalendarIntervalType — the raw (months, days,
    // micros) triple — so hours never fold into the day digit)
    Scenario("duration-26h-keeps-zero-days", empty,
      """RETURN duration({hours: 26}).days AS d,
        |duration({hours: 26}).hours AS h""".stripMargin,
      Seq(row("d" -> 0L, "h" -> 26L))),
    Scenario("duration-iso-pt26h-keeps-zero-days", empty,
      "RETURN duration('PT26H').days AS d, duration('PT26H').hours AS h",
      Seq(row("d" -> 0L, "h" -> 26L))),
    // batch 26 (Probe35Main): shapes from the REFERENCE's failing
    // blacklist — WITH-bound endpoint re-match, var-length edges, type
    // conversions over mixed values, implicit grouping keys
    Scenario("with-bound-endpoint-and-rel-rematch", triad,
      """MATCH (a:P {n: 'a'})-[r:R]->(b) WITH a, r LIMIT 1
        |MATCH (a)-[r]->(b2) RETURN b2.n AS n""".stripMargin,
      Seq(row("n" -> "b"))),
    Scenario("varlength-bound-rel-is-error", triad,
      """MATCH (a)-[r:R]->(b) MATCH (a)-[r*1..2]->(c)
        |RETURN count(*) AS n""".stripMargin, Seq.empty,
      expectError = Some("not allowed in a variable length pattern")),
    Scenario("varlength-zero-then-standard-rel", triad,
      """MATCH (a:P {n: 'a'})-[:R*0..1]->(m)-[:S]->(c)
        |RETURN m.n AS mn, c.n AS cn""".stripMargin,
      Seq(row("mn" -> "a", "cn" -> "c"))),
    Scenario("varlength-then-incoming-rel", triad,
      """MATCH (a:P {n: 'a'})-[:R*1..2]->(m)<-[:S]-(x)
        |RETURN m.n AS mn, x.n AS xn""".stripMargin,
      Seq(row("mn" -> "c", "xn" -> "a"))),
    Scenario("fixed-length-varlength-pattern", triad,
      "MATCH (a:P {n: 'a'})-[:R*2]->(x) RETURN x.n AS n",
      Seq(row("n" -> "c"))),
    Scenario("unwind-keeps-outer-scope", triad,
      """MATCH (n:P {n: 'a'}) UNWIND [1, 2] AS x
        |RETURN n.n AS nm, x ORDER BY x""".stripMargin,
      Seq(row("nm" -> "a", "x" -> 1L), row("nm" -> "a", "x" -> 2L)),
      ordered = true),
    // Neo4j 5 conversion signatures over mixed-family values: toInteger
    // takes bool/string/number (truncating, unparseable string → null);
    // toFloat takes string/number (boolean → null); toString any atomic;
    // toBoolean takes bool/string/integer (float → null) with the STRICT
    // string form — only case-insensitive 'true'/'false', no padding
    Scenario("tointeger-over-mixed-values", empty,
      "UNWIND [1, 2.7, '4', 'no', true] AS x RETURN toInteger(x) AS i",
      Seq(row("i" -> 1L), row("i" -> 2L), row("i" -> 4L), row("i" -> null),
        row("i" -> 1L))),
    Scenario("tofloat-over-mixed-values", empty,
      "UNWIND [1, 2.5, '3.5', 'no', true] AS x RETURN toFloat(x) AS f",
      Seq(row("f" -> 1.0), row("f" -> 2.5), row("f" -> 3.5),
        row("f" -> null), row("f" -> null))),
    Scenario("tostring-over-mixed-values", empty,
      "UNWIND [1, 2.5, 'x', true] AS x RETURN toString(x) AS s",
      Seq(row("s" -> "1"), row("s" -> "2.5"), row("s" -> "x"),
        row("s" -> "true"))),
    Scenario("toboolean-strict-string-form", empty,
      """RETURN toBoolean(' true') AS pad, toBoolean('yes') AS yes,
        |toBoolean('FALSE') AS f, toBoolean(1) AS one,
        |toBoolean(0) AS zero, toBoolean(2.5) AS flt""".stripMargin,
      Seq(row("pad" -> null, "yes" -> null, "f" -> false, "one" -> true,
        "zero" -> false, "flt" -> null))),
    Scenario("toboolean-over-mixed-values", empty,
      "UNWIND [true, 'false', 'nope', 3] AS x RETURN toBoolean(x) AS b",
      Seq(row("b" -> true), row("b" -> false), row("b" -> null),
        row("b" -> true))),
    // round 6: corrected to openCypher StartsWithAcceptance — a
    // NON-STRING operand yields NULL (Neo4j), not the definite false
    // this scenario previously locked (Spark's implicit cast had made
    // 1 STARTS WITH '1' true; see strPred in ExprCompiler)
    Scenario("starts-with-nonstring-operand-false", empty,
      """RETURN 1 STARTS WITH 'a' AS a,
        |'abc' ENDS WITH null AS b""".stripMargin,
      Seq(row("a" -> null, "b" -> null))),
    // implicit grouping keys: the non-aggregate subtree of a mixed
    // aggregating item groups the aggregation (Neo4j ReturnAcceptance2
    // "Projecting an arithmetic expression with aggregation")
    Scenario("arith-expression-with-aggregation-groups", triad,
      "MATCH (n:P) RETURN n.v + count(*) AS x ORDER BY x",
      Seq(row("x" -> 2L), row("x" -> 3L), row("x" -> 4L)), ordered = true),
    Scenario("multiple-aliasing-and-backreferencing", empty,
      "WITH 1 AS a WITH a AS b, a + 1 AS c RETURN b, c",
      Seq(row("b" -> 1L, "c" -> 2L))),
    Scenario("distinct-agg-nested-maps-in-maps", empty,
      """UNWIND [{k: {m: [1]}}, {k: {m: [1]}}, {k: {m: [2]}}] AS x
        |RETURN count(DISTINCT x) AS n""".stripMargin,
      Seq(row("n" -> 2L))),
    Scenario("optional-varlength-with-length-predicate", triad,
      """MATCH (a:P {n: 'a'}) OPTIONAL MATCH p = (a)-[:R*1..2]->(x)
        |WHERE length(p) = 2
        |RETURN a.n AS an, x.n AS xn""".stripMargin,
      Seq(row("an" -> "a", "xn" -> "c"))),
    Scenario("aggregation-with-named-paths", triad,
      """MATCH p = (a:P {n: 'a'})-[:R*1..2]->(x)
        |RETURN length(p) AS len, count(*) AS n ORDER BY len""".stripMargin,
      Seq(row("len" -> 1L, "n" -> 1L), row("len" -> 2L, "n" -> 1L)),
      ordered = true),
    // batch 27 (Probe35Main): literal split corners, cross-type temporal
    // comparison, ternary nested-list IN, null map projection,
    // properties() on maps, pattern predicates in disjunctions
    Scenario("split-empty-delimiter-is-chars", empty,
      "RETURN split('abc', '') AS r, split('', '') AS e",
      Seq(row("r" -> List("a", "b", "c"), "e" -> List("")))),
    Scenario("split-keeps-trailing-empty", empty,
      "RETURN split('a,b,', ',') AS r",
      Seq(row("r" -> List("a", "b", "")))),
    Scenario("temporal-cross-type-equality-false", empty,
      """RETURN date('2020-01-01') = localdatetime('2020-01-01T00:00:00') AS eq,
        |date('2020-01-01') <> localdatetime('2020-01-01T00:00:00') AS ne""".stripMargin,
      Seq(row("eq" -> false, "ne" -> true))),
    Scenario("temporal-cross-type-ordering-null", empty,
      """RETURN date('2020-01-01') < localdatetime('2020-01-02T00:00:00') AS lt,
        |date('2020-01-03') >= localdatetime('2020-01-02T00:00:00') AS ge""".stripMargin,
      Seq(row("lt" -> null, "ge" -> null))),
    Scenario("temporal-same-type-still-compares", empty,
      "RETURN date('2020-01-01') < date('2020-01-02') AS r",
      Seq(row("r" -> true))),
    Scenario("nested-list-in-ternary", empty,
      """RETURN [1,2] IN [[1,2],[3]] AS t, [1,3] IN [[1,2]] AS f,
        |[1,null] IN [[1,2]] AS u1, [1,null] IN [[1,null]] AS u2,
        |[1,2] IN [] AS emp""".stripMargin,
      Seq(row("t" -> true, "f" -> false, "u1" -> null, "u2" -> null,
        "emp" -> false))),
    Scenario("map-projection-on-null-entity", empty,
      "OPTIONAL MATCH (n:Nope) RETURN n{.x} AS r",
      Seq(row("r" -> null))),
    Scenario("properties-of-map-literal", empty,
      "RETURN properties({a: 1, b: 'x'}) AS r",
      Seq(row("r" -> Map("a" -> 1L, "b" -> "x")))),
    Scenario("pattern-predicate-in-disjunction",
      """CREATE (a:P {n: 'a'}), (b:P {n: 'b'}), (c:Q),
        |(a)-[:R]->(b), (b)-[:S]->(c)""".stripMargin,
      """MATCH (n:P) WHERE (n)-[:R]->() OR n.n = 'b'
        |RETURN n.n AS r ORDER BY r""".stripMargin,
      Seq(row("r" -> "a"), row("r" -> "b")), ordered = true),
    Scenario("pattern-predicate-xor-and-value",
      """CREATE (a:P {n: 'a'}), (b:P {n: 'b'}), (c:Q),
        |(a)-[:R]->(b), (b)-[:S]->(c)""".stripMargin,
      """MATCH (n:P) WHERE (n)-[:R]->() XOR (n)-[:S]->()
        |RETURN n.n AS r ORDER BY r""".stripMargin,
      Seq(row("r" -> "a"), row("r" -> "b")), ordered = true),
    Scenario("exists-pattern-as-projected-value",
      """CREATE (a:P {n: 'a'}), (b:P {n: 'b'}), (a)-[:R]->(b)""",
      """MATCH (n:P) RETURN n.n AS name, exists((n)-[:R]->()) AS has
        |ORDER BY name""".stripMargin,
      Seq(row("name" -> "a", "has" -> true),
        row("name" -> "b", "has" -> false)), ordered = true),
    Scenario("simple-case-null-subject-skips-null-branch", empty,
      "WITH null AS v RETURN CASE v WHEN null THEN 'a' ELSE 'b' END AS r",
      Seq(row("r" -> "b"))),
    Scenario("surrogate-pair-escapes-parse", empty,
      "RETURN size('\\uD83D\\uDE00' + 'x') AS n",
      Seq(row("n" -> 2L))),
    // date ± duration ignores sub-day components (Neo4j; Spark raises
    // INVALID_INTERVAL_WITH_MICROSECONDS_ADDITION without the rewrite)
    Scenario("date-plus-duration-ignores-time-part", empty,
      """RETURN date('2020-01-01') + duration({hours: 26}) AS same,
        |date('2020-01-01') + duration({days: 1, hours: 26}) AS plus1,
        |date('2020-03-31') - duration({months: 1, minutes: 30}) AS back""".stripMargin,
      Seq(row("same" -> "2020-01-01", "plus1" -> "2020-01-02",
        "back" -> "2020-02-29"))),
    // batch 28 (Probe36Main): compound comparability, UNION rules,
    // regex flags, property access on arbitrary expressions
    Scenario("lists-and-maps-incomparable-with-lt", empty,
      """RETURN [1,2] < [1,3] AS ll, [1] <= [1,0] AS lp,
        |{a: 1} < {a: 2} AS mm, [1] > null AS ln""".stripMargin,
      Seq(row("ll" -> null, "lp" -> null, "mm" -> null, "ln" -> null))),
    Scenario("union-different-columns-errors", empty,
      "RETURN 1 AS a UNION RETURN 2 AS b", Seq.empty,
      expectError = Some("same column names")),
    Scenario("union-aligns-columns-by-name", empty,
      """RETURN 1 AS a, 'x' AS b UNION RETURN 'y' AS b, 2 AS a""",
      Seq(row("a" -> 1L, "b" -> "x"), row("a" -> 2L, "b" -> "y"))),
    Scenario("union-distinct-dedups-union-all-keeps", empty,
      """UNWIND [1] AS v RETURN v AS a UNION ALL RETURN 1 AS a
        |UNION ALL RETURN 1 AS a""".stripMargin,
      Seq(row("a" -> 1L), row("a" -> 1L), row("a" -> 1L))),
    Scenario("regex-inline-flags", empty,
      """RETURN 'ABC' =~ '(?i)abc' AS ci, 'a
        |b' =~ '(?s)a.b' AS dot""".stripMargin,
      Seq(row("ci" -> true, "dot" -> true))),
    Scenario("property-access-on-expressions", empty,
      """RETURN ({a: 1}).a AS ml, (CASE WHEN true THEN {a: 7} END).a AS cs,
        |head([{a: 3}]).a AS hd, {o: {i: 5}}.o.i AS nest""".stripMargin,
      Seq(row("ml" -> 1L, "cs" -> 7L, "hd" -> 3L, "nest" -> 5L))),
    Scenario("optional-aggregation-null-handling",
      "CREATE (:P {name: 'b'})",
      """MATCH (n:P {name: 'b'}) OPTIONAL MATCH (n)-[:R]->(m)
        |RETURN count(*) AS stars, count(m) AS ms, collect(m.x) AS xs""".stripMargin,
      Seq(row("stars" -> 1L, "ms" -> 0L, "xs" -> List()))),
    Scenario("integer-addition-overflow-errors", empty,
      "RETURN 9223372036854775807 + 1 AS r", Seq.empty,
      expectError = Some("ARITHMETIC_OVERFLOW")),
    // batch 30 (Probe38Main): shapes from the REFERENCE's own
    // failing_blacklist (morpheus-tck/src/test/resources) — all pass
    // here, evidence we exceed the reference on its known failures
    Scenario("varlength-and-standard-rel-in-chain",
      """CREATE (a:N {n: 'a'}), (b:N {n: 'b'}), (c:N {n: 'c'}),
        |(d:N {n: 'd'}), (a)-[:T]->(b), (b)-[:T]->(c), (c)-[:S]->(d)""".stripMargin,
      """MATCH (a:N {n: 'a'})-[:T*1..2]->(x)-[:S]->(y)
        |RETURN x.n AS x, y.n AS y""".stripMargin,
      Seq(row("x" -> "c", "y" -> "d"))),
    Scenario("varlength-zero-or-one-then-standard-rel",
      """CREATE (b:N {n: 'b'}), (c:N {n: 'c'}), (d:N {n: 'd'}),
        |(b)-[:T]->(c), (c)-[:S]->(d)""".stripMargin,
      """MATCH (a:N {n: 'b'})-[:T*0..1]->(x)-[:S]->(y)
        |RETURN x.n AS x, y.n AS y""".stripMargin,
      Seq(row("x" -> "c", "y" -> "d"))),
    Scenario("varlength-lower-bound-only-unbounded",
      """CREATE (e:N {n: 'e'}), (a:N {n: 'a'}), (b:N {n: 'b'}),
        |(c:N {n: 'c'}), (e)-[:T]->(a), (a)-[:T]->(b), (b)-[:T]->(c)""".stripMargin,
      "MATCH (e:N {n: 'e'})-[:T*2..]->(x) RETURN x.n AS x ORDER BY x",
      Seq(row("x" -> "b"), row("x" -> "c")), ordered = true),
    Scenario("varlength-mixed-direction-chain",
      """CREATE (a:N {n: 'a'}), (b:N {n: 'b'}), (c:N {n: 'c'}),
        |(d:N {n: 'd'}), (a)-[:T]->(b), (b)-[:T]->(c), (c)-[:S]->(d)""".stripMargin,
      """MATCH (s)-[:T*1..2]->(c:N {n: 'c'})-[:S]->(d)
        |RETURN s.n AS s, d.n AS d ORDER BY s""".stripMargin,
      Seq(row("s" -> "a", "d" -> "d"), row("s" -> "b", "d" -> "d")),
      ordered = true),
    Scenario("unwind-does-not-remove-variables-from-scope",
      "CREATE (:N {n: 'a'})",
      """MATCH (a:N) UNWIND [1, 2] AS i
        |RETURN a.n AS n, i ORDER BY i""".stripMargin,
      Seq(row("n" -> "a", "i" -> 1L), row("n" -> "a", "i" -> 2L)),
      ordered = true),
    Scenario("unwinding-a-collected-expression",
      "CREATE (:N {n: 'a'}), (:N {n: 'b'})",
      """MATCH (x:N) WITH collect(x.n) AS ns
        |UNWIND ns AS n RETURN n ORDER BY n""".stripMargin,
      Seq(row("n" -> "a"), row("n" -> "b")), ordered = true),
    Scenario("simple-pattern-with-one-bound-endpoint",
      """CREATE (a:N {n: 'a'}), (b:N {n: 'b'}), (a)-[:T]->(b)""",
      """MATCH (a:N {n: 'a'}) WITH a
        |MATCH (a)-[:T]->(b) RETURN b.n AS b""".stripMargin,
      Seq(row("b" -> "b"))),
    // batch 31 (Probe39Main): the reference blacklists its ENTIRE
    // temporal TCK surface (920 scenarios); these shapes pass here
    Scenario("temporal-selection-constructors", empty,
      """RETURN date({date: date('2020-03-15'), day: 5}) AS ovr,
        |date({date: localdatetime('2020-03-15T10:00:00')}) AS fromdt,
        |date(localdatetime('2020-03-15T10:30:00')) AS trunc,
        |toString(localdatetime({date: date('2020-03-15'),
        |                        hour: 7, minute: 30})) AS comp""".stripMargin,
      Seq(row("ovr" -> "2020-03-05", "fromdt" -> "2020-03-15",
        "trunc" -> "2020-03-15", "comp" -> "2020-03-15T07:30:00"))),
    Scenario("temporal-week-and-ordinal-date-forms", empty,
      """RETURN date('2015-W30-2') AS wk, date('2015W302') AS wkc,
        |date('2015-202') AS ord, date('20150721') AS cmp,
        |date('2015-W30') AS wk1,
        |date({year: 2015, week: 30, dayOfWeek: 2}) AS wmap,
        |date({year: 2015, ordinalDay: 202}) AS omap""".stripMargin,
      Seq(row("wk" -> "2015-07-21", "wkc" -> "2015-07-21",
        "ord" -> "2015-07-21", "cmp" -> "2015-07-21", "wk1" -> "2015-07-20",
        "wmap" -> "2015-07-21", "omap" -> "2015-07-21"))),
    Scenario("temporal-truncate-large-units", empty,
      """RETURN date.truncate('decade', date('2017-03-15')) AS dec,
        |date.truncate('century', date('2017-03-15')) AS cen,
        |date.truncate('millennium', date('2017-03-15')) AS mil,
        |date.truncate('weekYear', date('2017-01-01')) AS wy""".stripMargin,
      Seq(row("dec" -> "2010-01-01", "cen" -> "2000-01-01",
        "mil" -> "2000-01-01", "wy" -> "2016-01-04"))),
    Scenario("datetime-epoch-construction", empty,
      """RETURN datetime({epochMillis: 86400000}).epochMillis AS ms,
        |datetime({epochSeconds: 120}).epochSeconds AS s""".stripMargin,
      Seq(row("ms" -> 86400000L, "s" -> 120L))),
    // batch 32: undirected self-loops match ONCE (reference MatchTests
    // "matches an undirected cyclic relationship"; both orientations of
    // a loop are the same (r, src, dst) binding)
    Scenario("undirected-selfloop-matches-once",
      "CREATE (a:N {n: 'a'}), (a)-[:L {w: 9}]->(a)",
      "MATCH (x:N)-[r:L]-(y) RETURN x.n AS x, y.n AS y, r.w AS w",
      Seq(row("x" -> "a", "y" -> "a", "w" -> 9L))),
    Scenario("undirected-nonloop-still-both-orientations",
      "CREATE (a:N {n: 'a'})-[:T]->(b:N {n: 'b'})",
      "MATCH (x:N)-[:T]-(y:N) RETURN x.n AS x ORDER BY x",
      Seq(row("x" -> "a"), row("x" -> "b")), ordered = true),
    Scenario("undirected-varlength-selfloop-once",
      "CREATE (a:N {n: 'a'}), (b:N {n: 'b'}), (a)-[:T]->(a), (a)-[:T]->(b)",
      // 1 hop: b—a; 2 hops: b—a then the loop (each loop traversal ONCE)
      "MATCH (s:N {n: 'b'})-[:T*1..2]-(x) RETURN x.n AS x, count(*) AS c",
      Seq(row("x" -> "a", "c" -> 2L))))

  /** Probe batch 33 (Probe40Main): error-shape parity with the
    * reference's two unmined blacklists — wont_fix (write clauses; the
    * engine answers with a typed read-only error) and failure_reporting
    * (scenarios whose expected outcome is a SPECIFIC error) — plus the
    * null-shared-var OPTIONAL/EXISTS/comprehension fixes found by
    * differential case 443. */
  private def probeBatch33: Seq[Scenario] = Seq(
    Scenario("probe33 CREATE is a typed read-only error", "CREATE (:A)",
      "CREATE (n:X) RETURN n", Nil, expectError = Some("read-only")),
    Scenario("probe33 MERGE is a typed read-only error", "CREATE (:A)",
      "MERGE (n:X {k: 1}) RETURN n", Nil, expectError = Some("read-only")),
    Scenario("probe33 DELETE is a typed read-only error", "CREATE (:A)",
      "MATCH (n:A) DELETE n", Nil, expectError = Some("read-only")),
    Scenario("probe33 DETACH DELETE is a typed read-only error",
      "CREATE (:A)", "MATCH (n:A) DETACH DELETE n", Nil,
      expectError = Some("read-only")),
    Scenario("probe33 SET is a typed read-only error", "CREATE (:A)",
      "MATCH (n:A) SET n.k = 2 RETURN n.k AS k", Nil,
      expectError = Some("read-only")),
    Scenario("probe33 REMOVE is a typed read-only error", "CREATE (:A)",
      "MATCH (n:A) REMOVE n.k RETURN n.k AS k", Nil,
      expectError = Some("read-only")),
    Scenario("probe33 mixed UNION and UNION ALL is invalid",
      "CREATE (:A {k: 1})",
      "MATCH (n:A) RETURN n.k AS k UNION MATCH (n:A) RETURN n.k AS k " +
        "UNION ALL MATCH (n:A) RETURN n.k AS k",
      Nil, expectError = Some("Invalid combination of UNION and UNION ALL")),
    Scenario("probe33 aggregate in WHERE is invalid", "CREATE (:A {k: 1})",
      "MATCH (n:A) WHERE count(n) > 0 RETURN n.k AS k", Nil,
      expectError = Some("Invalid use of aggregating function")),
    Scenario("probe33 aggregate inside a list comprehension is invalid",
      "CREATE (:A {k: 1})",
      "MATCH (n:A) RETURN [x IN [1, 2] | count(*)] AS l", Nil,
      expectError = Some("Invalid use of aggregating function")),
    Scenario("probe33 node variable cannot be reused as a relationship",
      "CREATE (:A {k: 1})-[:T]->(:B)",
      "MATCH (n:A) MATCH ()-[n]->() RETURN 1 AS x", Nil,
      expectError = Some("cannot reuse it as a relationship")),
    Scenario("probe33 a path name cannot rebind",
      "CREATE (:A {k: 1})-[:T]->(:B {k: 2})",
      "MATCH p = (a:A)-->(b) MATCH p = (x:B)-->(y) RETURN 1 AS x", Nil,
      expectError = Some("already declared")),
    Scenario("probe33 MATCH cannot follow OPTIONAL MATCH",
      "CREATE (:A {k: 1}), (:B {k: 2})",
      "OPTIONAL MATCH (n:A) MATCH (m:B) RETURN m.k AS k", Nil,
      expectError = Some("MATCH cannot follow OPTIONAL MATCH")),
    Scenario("probe33 WITH resets the OPTIONAL MATCH restriction",
      "CREATE (:A {k: 1}), (:B {k: 2})",
      "OPTIONAL MATCH (n:A) WITH n MATCH (m:B) " +
        "RETURN n.k AS nk, m.k AS mk",
      Seq(row("nk" -> 1L, "mk" -> 2L))),
    Scenario("probe33 toString on a list is invalid", "CREATE (:A)",
      "RETURN toString([1, 2]) AS s", Nil,
      expectError = Some("Invalid input for toString()")),
    Scenario("probe33 toString on a map is invalid", "CREATE (:A)",
      "RETURN toString({a: 1}) AS s", Nil,
      expectError = Some("Invalid input for toString()")),
    Scenario("probe33 IN requires a list on the right-hand side",
      "CREATE (:A)", "RETURN 1 IN 'a' AS x", Nil,
      expectError = Some("IN expects a list")),
    Scenario("probe33 map index must be a string", "CREATE (:A)",
      "WITH {a: 1} AS m RETURN m[0] AS x", Nil,
      expectError = Some("map index must be a string")),
    Scenario("probe33 size() on a path is invalid - length() is the path form",
      "CREATE (:A)-[:T]->(:B)",
      "MATCH p = (a:A)-->(b) RETURN size(p) AS s", Nil,
      expectError = Some("use length(p)")),
    Scenario("probe33 length() on a path still works",
      "CREATE (:A)-[:T]->(:B)",
      "MATCH p = (a:A)-->(b) RETURN length(p) AS s",
      Seq(row("s" -> 1L))),
    Scenario("probe33 NOT on a string is a type error", "CREATE (:A)",
      "RETURN NOT 'foo' AS x", Nil,
      expectError = Some("NOT expects a Boolean")),
    Scenario("probe33 negative LIMIT is invalid", "CREATE (:A {k: 1})",
      "MATCH (n:A) RETURN n.k AS k LIMIT -1", Nil,
      expectError = Some("non-negative")),
    Scenario("probe33 negative SKIP is invalid", "CREATE (:A {k: 1})",
      "MATCH (n:A) RETURN n.k AS k SKIP -2", Nil,
      expectError = Some("non-negative")),
    Scenario(
      "probe33 OPTIONAL MATCH WHERE over a null rel from a previous optional",
      "CREATE (:A {v: 1}), (:A {v: 2})",
      "MATCH (a:A) OPTIONAL MATCH (a)-[r:T]->(m) " +
        "OPTIONAL MATCH (n:A) WHERE r IS NULL " +
        "RETURN a.v AS v, count(n) AS c",
      Seq(row("v" -> 1L, "c" -> 2L), row("v" -> 2L, "c" -> 2L))),
    Scenario("probe33 EXISTS over a null rel from a previous optional",
      "CREATE (:A {v: 1}), (:A {v: 2})",
      "MATCH (a:A) OPTIONAL MATCH (a)-[r:T]->(m) " +
        "WITH a, r WHERE EXISTS { MATCH (n:A) WHERE r IS NULL } " +
        "RETURN count(a) AS c",
      Seq(row("c" -> 2L))),
    Scenario("probe33 NOT EXISTS over a null rel from a previous optional",
      "CREATE (:A {v: 1}), (:A {v: 2})",
      "MATCH (a:A) OPTIONAL MATCH (a)-[r:T]->(m) " +
        "WITH a, r WHERE NOT EXISTS { MATCH (n:A) WHERE r IS NULL } " +
        "RETURN count(a) AS c",
      Seq(row("c" -> 0L))),
    Scenario("probe33 pattern comprehension under a null shared rel",
      "CREATE (a:A {v: 1})-[:S]->(:B), (:A {v: 2})",
      "MATCH (a:A) OPTIONAL MATCH (a)-[r:T]->(m) " +
        "RETURN a.v AS v, size([(a)-[:S]->(x) WHERE r IS NULL | 1]) AS s " +
        "ORDER BY v",
      Seq(row("v" -> 1L, "s" -> 1L), row("v" -> 2L, "s" -> 0L)),
      ordered = true))

  // probe batch 34: the remaining failure_reporting families — typed
  // errors for function argument types, invalid indexing, procedure
  // calls, and literal exotica (reference failure_reporting_blacklist;
  // full TCK-syntax twins live in features/ErrorReporting.feature)
  // a def, not a val: the class initializer is at the JVM's 64KB method
  // limit — each batch from here on compiles to its own method
  // probe batch 40 (round 6, Probe47Main): parser whitespace/syntax
  // tolerance — the read-only LabelsAcceptance rows plus literal forms
  def probeBatch40: Seq[Scenario] = {
    val ab = "CREATE (:A:B {k: 1, s: 'x'})\nCREATE (:A {k: 2})"
    Seq(
      Scenario("probe40 space before label colon",
        ab, "MATCH (n :A) RETURN count(*) AS c", Seq(row("c" -> 2L))),
      Scenario("probe40 label conjunction predicate with spaces",
        ab,
        """MATCH (n) WHERE n:A:B RETURN n.k AS k
          |UNION ALL MATCH (n) WHERE n : A RETURN count(*) AS k"""
          .stripMargin,
        Seq(row("k" -> 1L), row("k" -> 2L))),
      Scenario("probe40 tight spacing around IN and keywords",
        ab,
        "MATCH (n:A) WHERE n.k IN[1,2] RETURN count(*) AS c",
        Seq(row("c" -> 2L))),
      Scenario("probe40 float and radix literal forms",
        empty,
        """RETURN .5 AS a, 5. AS b, 0x1F AS hex, 0o17 AS oct,
          |1e3 AS e1, 1E-2 AS e2""".stripMargin,
        Seq(row("a" -> 0.5, "b" -> 5.0, "hex" -> 31L, "oct" -> 15L,
          "e1" -> 1000.0, "e2" -> 0.01))),
      Scenario("probe40 mixed-case keywords",
        ab, "mAtCh (n:A) rEtUrN count(*) AS c", Seq(row("c" -> 2L))),
      Scenario("probe40 backtick-quoted variables",
        ab,
        """MATCH (`my var`:A) WITH `my var`.k AS `back tick`
          |RETURN `back tick` AS k ORDER BY k""".stripMargin,
        Seq(row("k" -> 1L), row("k" -> 2L)), ordered = true),
      Scenario("probe40 undefined backtick variable errors",
        empty, "RETURN `weird col` IS NULL AS x", Nil,
        expectError = Some("not defined")),
      Scenario("probe40 block and line comments",
        ab,
        "/* block comment */ MATCH (n:A) // line comment\nRETURN count(*) AS c",
        Seq(row("c" -> 2L))))
  }

  // probe batch 38 (round 6, Probe44/45Main): TIME and LOCALTIME — the
  // last two of Neo4j's five temporal types (the reference blacklists
  // its whole 920-scenario temporal area). Struct-encoded time-of-day
  // scalars: instant-based equality/ordering, local-clock accessors,
  // ISO toString; plus the duration.between family and ISO duration
  // rendering.
  def probeBatch38: Seq[Scenario] = Seq(
    Scenario("probe38b localtime accessors and rendering",
      empty,
      """RETURN localtime('09:05:01.5').hour AS h,
        |       localtime('09:05:01.5').minute AS m,
        |       toString(localtime('09:05:01.5')) AS s""".stripMargin,
      Seq(row("h" -> 9L, "m" -> 5L, "s" -> "09:05:01.5"))),
    Scenario("probe38b localtime component-map construction",
      empty,
      """RETURN localtime({hour: 9, minute: 5, second: 1,
        |millisecond: 500}).millisecond AS ms""".stripMargin,
      Seq(row("ms" -> 500L))),
    Scenario("probe38b localtime comparisons and ordering",
      empty,
      """UNWIND [localtime('13:00'), localtime('09:00')] AS t
        |RETURN toString(t) AS s ORDER BY t""".stripMargin,
      Seq(row("s" -> "09:00:00"), row("s" -> "13:00:00")), ordered = true),
    Scenario("probe38b zoned time accessors render the local clock",
      empty,
      """RETURN time('13:37:01+01:00').hour AS h,
        |       time('13:37:01+01:00').offset AS o,
        |       time('23:30-02:00').hour AS wrap""".stripMargin,
      Seq(row("h" -> 13L, "o" -> "+01:00", "wrap" -> 23L))),
    Scenario("probe38b zoned times compare by instant",
      empty,
      """RETURN time('13:00+01:00') = time('12:00Z') AS same,
        |       time('13:00+01:00') < time('12:30Z') AS lt""".stripMargin,
      Seq(row("same" -> true, "lt" -> true))),
    Scenario("probe38b time and localtime are cross-type incomparable",
      empty,
      """RETURN localtime('12:00') = localdatetime('1970-01-01T12:00') AS a,
        |       localtime('12:00') = time('12:00Z') AS b""".stripMargin,
      Seq(row("a" -> false, "b" -> false))),
    Scenario("probe38b zoned time toString keeps the offset",
      empty,
      "RETURN toString(time('13:37:01+01:00')) AS t",
      Seq(row("t" -> "13:37:01+01:00"))),
    Scenario("probe38b time component map with timezone",
      empty,
      """RETURN time({hour: 13, minute: 30, timezone: '+02:00'}).offset AS o,
        |       time({hour: 13, minute: 30, timezone: '+02:00'}).hour AS h"""
        .stripMargin,
      Seq(row("o" -> "+02:00", "h" -> 13L))),
    Scenario("probe38b duration toString is ISO-8601",
      empty,
      """RETURN toString(duration({months: 14, days: 3, seconds: 90})) AS a,
        |       toString(duration({seconds: 0})) AS z,
        |       toString(duration({seconds: 90.5})) AS f""".stripMargin,
      Seq(row("a" -> "P1Y2M3DT1M30S", "z" -> "PT0S",
        "f" -> "PT1M30.5S"))),
    Scenario("probe38b duration.between calendar difference",
      empty,
      """RETURN toString(duration.between(date('1984-10-11'),
        |date('2015-06-24'))) AS d""".stripMargin,
      Seq(row("d" -> "P30Y8M13D"))),
    Scenario("probe38b duration.inDays negative direction",
      empty,
      """RETURN toString(duration.inDays(date('2015-06-24'),
        |date('1984-10-11'))) AS d""".stripMargin,
      Seq(row("d" -> "P-11213D"))),
    Scenario("probe38b duration.inSeconds over localdatetimes",
      empty,
      """RETURN toString(duration.inSeconds(
        |localdatetime('2015-06-24T12:00'),
        |localdatetime('2015-06-24T12:30:35'))) AS d""".stripMargin,
      Seq(row("d" -> "PT30M35S"))),
    Scenario("probe38b duration.between null propagation",
      "CREATE (:A {k: 1})",
      """MATCH (n:A)
        |RETURN duration.between(n.missing, date('2015-06-24')) AS a,
        |       duration.between(date('2015-06-24'), null) AS b""".stripMargin,
      Seq(row("a" -> null, "b" -> null))),
    Scenario("probe38b date truncate edges",
      empty,
      """RETURN date.truncate('month', date('2024-02-29')) = date('2024-02-01') AS m,
        |       date.truncate('year', date('2024-02-29')) = date('2024-01-01') AS y,
        |       date.truncate('week', date('2024-01-01')) = date('2024-01-01') AS w"""
        .stripMargin,
      Seq(row("m" -> true, "y" -> true, "w" -> true))),
    Scenario("probe38b epochMillis accessor",
      empty,
      "RETURN datetime('2024-02-29T13:37:01.5Z').epochMillis AS em",
      Seq(row("em" -> 1709213821500L))),
    Scenario("probe38b localtime plus duration wraps within the day",
      empty,
      """RETURN toString(localtime('23:30') + duration({hours: 2})) AS a,
        |       toString(localtime('01:00') - duration({minutes: 90})) AS b"""
        .stripMargin,
      Seq(row("a" -> "01:30:00", "b" -> "23:30:00"))),
    Scenario("probe38b time plus duration keeps the offset",
      empty,
      """RETURN toString(time('13:00+01:00') + duration({hours: 1})) AS a"""
        .stripMargin,
      Seq(row("a" -> "14:00:00+01:00"))),
    Scenario("probe38b time arithmetic ignores month and day components",
      empty,
      """RETURN toString(localtime('10:00') +
        |duration({days: 3, hours: 2})) AS a""".stripMargin,
      Seq(row("a" -> "12:00:00"))),
    Scenario("probe38b times filter in WHERE",
      """CREATE (:E {t: 'a'})
        |CREATE (:E {t: 'b'})""".stripMargin,
      """MATCH (n:E)
        |WITH n, CASE n.t WHEN 'a' THEN localtime('09:00')
        |        ELSE localtime('18:00') END AS lt
        |WHERE lt < localtime('12:00')
        |RETURN n.t AS t""".stripMargin,
      Seq(row("t" -> "a"))),
    Scenario("probe38b DISTINCT and grouping over time values",
      empty,
      """UNWIND [localtime('09:00'), localtime('09:00'),
        |localtime('10:00')] AS t
        |RETURN toString(t) AS s, count(*) AS n ORDER BY s""".stripMargin,
      Seq(row("s" -> "09:00:00", "n" -> 2L),
        row("s" -> "10:00:00", "n" -> 1L)), ordered = true),
    Scenario("probe38b min and max over time values",
      empty,
      """UNWIND [localtime('13:00'), localtime('09:00'),
        |localtime('11:30')] AS t
        |RETURN toString(min(t)) AS lo, toString(max(t)) AS hi""".stripMargin,
      Seq(row("lo" -> "09:00:00", "hi" -> "13:00:00"))),
    Scenario("probe38b coalesce over time values",
      "CREATE (:A {k: 1})",
      """MATCH (n:A)
        |RETURN toString(coalesce(n.missing, localtime('07:15'))) AS t"""
        .stripMargin,
      Seq(row("t" -> "07:15:00"))),
    Scenario("probe38b time IS NULL and IS NOT NULL",
      empty,
      """RETURN localtime('09:00') IS NOT NULL AS a,
        |       time('09:00Z') IS NULL AS b""".stripMargin,
      Seq(row("a" -> true, "b" -> false))),
    Scenario("probe38b localtime inequality matrix",
      empty,
      """RETURN localtime('09:00') <= localtime('09:00') AS a,
        |       localtime('09:00') <> localtime('09:01') AS b,
        |       localtime('09:00:00.000001') > localtime('09:00') AS c"""
        .stripMargin,
      Seq(row("a" -> true, "b" -> true, "c" -> true))),
    // Probe48: TIME/LOCALTIME/duration values as fixture-stored node
    // PROPERTIES (CREATE literal evaluator maps them onto the engine's
    // struct / CalendarInterval encodings)
    Scenario("probe38b localtime stored as a node property",
      """CREATE (:E {t: localtime('09:05'), uid: 0})
        |CREATE (:E {uid: 1})""".stripMargin,
      "MATCH (n:E) RETURN toString(n.t) AS t ORDER BY n.uid",
      Seq(row("t" -> "09:05:00"), row("t" -> null)), ordered = true),
    Scenario("probe38b stored localtime filters in WHERE",
      """CREATE (:E {t: localtime('09:05'), uid: 0})
        |CREATE (:E {t: localtime('14:30'), uid: 1})""".stripMargin,
      "MATCH (n:E) WHERE n.t < localtime('12:00') RETURN n.uid AS u",
      Seq(row("u" -> 0L))),
    Scenario("probe38b stored zoned time keeps its offset",
      "CREATE (:E {t: time('09:05+02:00'), uid: 0})",
      "MATCH (n:E) RETURN n.t.hour AS h, n.t.offset AS o",
      Seq(row("h" -> 9L, "o" -> "+02:00"))),
    Scenario("probe38b stored duration round-trips",
      "CREATE (:E {d: duration({days: 2, hours: 3}), uid: 0})",
      "MATCH (n:E) RETURN toString(n.d) AS d, n.d.days AS days",
      Seq(row("d" -> "P2DT3H", "days" -> 2L))),
    Scenario("probe38b compact and fractional time parse forms",
      empty,
      """RETURN toString(localtime('0905')) AS a,
        |       toString(localtime('090501')) AS b,
        |       localtime('09:05:01.25').microsecond AS us""".stripMargin,
      Seq(row("a" -> "09:05:00", "b" -> "09:05:01", "us" -> 250000L))))

  // probe batch 39 (round 6, Probe41/42Main): CONSTRUCT CLONE dedup +
  // map-value semantics the differential CONSTRUCT/map grammar rests on
  def probeBatch39: Seq[Scenario] = {
    val g3 = """CREATE (a:A {k: 1, s: 'x', uid: 0})
               |CREATE (b:A {k: 1, uid: 1})
               |CREATE (c:B {k: 2, uid: 2})
               |CREATE (a)-[:T {w: 5, uid: 1000}]->(b)
               |CREATE (a)-[:T {w: 6, uid: 1001}]->(c)
               |CREATE (b)-[:S {w: 7, uid: 1002}]->(c)""".stripMargin
    Seq(
      Scenario("probe39 construct clones dedup across rows",
        g3,
        """MATCH (a)-[r:T]->(b)
          |CONSTRUCT CLONE a, r, b
          |MATCH (x) RETURN x.uid AS xu ORDER BY xu""".stripMargin,
        Seq(row("xu" -> 0L), row("xu" -> 1L), row("xu" -> 2L)),
        ordered = true),
      Scenario("probe39 construct keeps labels and rel props",
        g3,
        """MATCH (a:A)-[r:T]->(b)
          |CONSTRUCT CLONE a, r, b
          |MATCH (x:A)-[y:T]->(z) WHERE z.k = 2
          |RETURN x.uid AS xu, y.w AS w, z.uid AS zu""".stripMargin,
        Seq(row("xu" -> 0L, "w" -> 6L, "zu" -> 2L))),
      Scenario("probe39 construct node-only clones give an edgeless graph",
        g3,
        """MATCH (a)-[r:S]->(b)
          |CONSTRUCT CLONE a, b
          |MATCH (x)-[y]->(z) RETURN count(*) AS n""".stripMargin,
        Seq(row("n" -> 0L))),
      Scenario("probe39 construct respects an upstream WHERE",
        g3,
        """MATCH (a)-[r:T]->(b) WHERE b.uid = 2
          |CONSTRUCT CLONE a, r, b
          |MATCH (x)-[y]->(z) RETURN x.uid AS xu, z.uid AS zu""".stripMargin,
        Seq(row("xu" -> 0L, "zu" -> 2L))),
      Scenario("probe39 aggregate over the constructed graph",
        g3,
        """MATCH (a)-[r:T]->(b)
          |CONSTRUCT CLONE a, r, b
          |MATCH (x)-[y]->(z) RETURN count(*) AS n, sum(y.w) AS sw"""
          .stripMargin,
        Seq(row("n" -> 2L, "sw" -> 11L))),
      Scenario("probe39 map projection chains into key access",
        g3,
        "MATCH (n:A {uid: 0}) RETURN n {.k}.k AS pk",
        Seq(row("pk" -> 1L))),
      Scenario("probe39 nested map literals",
        g3,
        "MATCH (n:A {uid: 0}) RETURN {a: {b: n.k}}.a.b AS v",
        Seq(row("v" -> 1L))),
      Scenario("probe39 map inside coalesce is non-null as a struct",
        g3,
        """MATCH (n:A {uid: 0})
          |RETURN coalesce({k: n.missing}, {k: 9}).k AS v""".stripMargin,
        Seq(row("v" -> null))),
      Scenario("probe39 DISTINCT over map projections",
        g3,
        "MATCH (n:A) RETURN DISTINCT n {.k} AS m",
        Seq(row("m" -> Map("k" -> 1L)))),
      Scenario("probe39 dynamic key access on a map literal",
        g3,
        "MATCH (n:A {uid: 0}) RETURN {a: n.k, b: 2}['a'] AS v",
        Seq(row("v" -> 1L))),
      // CONSTRUCT NEW (Probe46): one NEW element per binding ROW
      Scenario("probe39 construct NEW edge between cloned nodes",
        g3,
        """MATCH (a:A)-[:T]->(b)
          |CONSTRUCT CLONE a, b NEW (a)-[:X {w: b.k}]->(b)
          |MATCH (x)-[y:X]->(z) RETURN y.w AS w ORDER BY w""".stripMargin,
        Seq(row("w" -> 1L), row("w" -> 2L)), ordered = true),
      Scenario("probe39 construct NEW is per binding row",
        """CREATE (a:A {uid: 0})
          |CREATE (b:B {uid: 1})
          |CREATE (a)-[:T {uid: 1000}]->(b)
          |CREATE (a)-[:T {uid: 1001}]->(b)""".stripMargin,
        """MATCH (a:A)-[:T]->(b:B)
          |CONSTRUCT CLONE a, b NEW (a)-[:X]->(b)
          |MATCH (x)-[y:X]->(z) RETURN count(*) AS n""".stripMargin,
        Seq(row("n" -> 2L))),
      Scenario("probe39 construct NEW standalone node per row",
        g3, // g3 has TWO :A nodes → one Fresh node per binding row
        """MATCH (a:A)
          |CONSTRUCT CLONE a NEW (n:Fresh {v: 7})
          |MATCH (m:Fresh) RETURN m.v AS v""".stripMargin,
        Seq(row("v" -> 7L), row("v" -> 7L))),
      Scenario("probe39 multiple NEW clauses per construct",
        g3,
        """MATCH (a:A {uid: 0})-[r:T]->(b:A {uid: 1})
          |CONSTRUCT CLONE a, b NEW (a)-[:W]->(b) NEW (a)-[:V]->(b)
          |MATCH (x)-[y]->(z) RETURN type(y) AS t ORDER BY t""".stripMargin,
        Seq(row("t" -> "V"), row("t" -> "W")), ordered = true))
  }

  // probe batch 37 (round 6, Probe43Main): the remaining READ-ONLY
  // reference failing_blacklist surfaces — type conversions over
  // runtime-typed (tagged) values, string predicates on non-string
  // operands (now null, never Spark's implicit cast), SKIP/LIMIT with
  // variable-free numeric functions, list concat/append typing, and the
  // wont_fix "sorting on variable removed by DISTINCT" error.
  def probeBatch37: Seq[Scenario] = Seq(
    Scenario("probe37b toInteger over mixed tagged values",
      empty,
      "UNWIND [1, 2.3, '4', '4.7', 'foo', true] AS x " +
        "RETURN toInteger(x) AS i",
      Seq(row("i" -> 1L), row("i" -> 2L), row("i" -> 4L), row("i" -> 4L),
        row("i" -> null), row("i" -> 1L))),
    Scenario("probe37b toFloat over mixed tagged values",
      empty,
      "UNWIND [1, 2.3, '4.7', 'foo', true] AS x RETURN toFloat(x) AS f",
      Seq(row("f" -> 1.0), row("f" -> 2.3), row("f" -> 4.7),
        row("f" -> null), row("f" -> null))),
    Scenario("probe37b toString over mixed tagged values",
      empty,
      "UNWIND [1, 2.3, 'foo', true] AS x RETURN toString(x) AS s",
      Seq(row("s" -> "1"), row("s" -> "2.3"), row("s" -> "foo"),
        row("s" -> "true"))),
    Scenario("probe37b toBoolean over mixed tagged values",
      empty,
      "UNWIND [1, 0, 'true', 'False', 'foo', true] AS x " +
        "RETURN toBoolean(x) AS b",
      Seq(row("b" -> true), row("b" -> false), row("b" -> true),
        row("b" -> false), row("b" -> null), row("b" -> true))),
    Scenario("probe37b toBoolean on a list is a type error",
      empty, "RETURN toBoolean([1]) AS b", Nil,
      expectError = Some("toBoolean")),
    Scenario("probe37b STARTS WITH on a non-string operand is null",
      "CREATE (:A {k: 1, f: 1.5, b: true})",
      """MATCH (n:A)
        |RETURN n.k STARTS WITH 'x' AS a, 'x' CONTAINS n.f AS b,
        |       n.b ENDS WITH 'e' AS c, 1 STARTS WITH '1' AS d""".stripMargin,
      Seq(row("a" -> null, "b" -> null, "c" -> null, "d" -> null))),
    Scenario("probe37b string predicates still work on real strings",
      "CREATE (:A {s: 'xyz'})",
      """MATCH (n:A)
        |RETURN n.s STARTS WITH 'x' AS a, n.s ENDS WITH 'z' AS b,
        |       n.s CONTAINS 'y' AS c, n.missing CONTAINS 'y' AS d"""
        .stripMargin,
      Seq(row("a" -> true, "b" -> true, "c" -> true, "d" -> null))),
    Scenario("probe37b SKIP and LIMIT take variable-free numeric fns",
      empty,
      """UNWIND [1, 2, 3, 4, 5] AS x RETURN x ORDER BY x
        |SKIP toInteger(1.0) LIMIT toInteger(ceil(1.7))""".stripMargin,
      Seq(row("x" -> 2L), row("x" -> 3L)), ordered = true),
    Scenario("probe37b LIMIT floor/abs/round static forms",
      empty,
      "UNWIND [1, 2, 3] AS x RETURN x ORDER BY x LIMIT floor(2.9)",
      Seq(row("x" -> 1L), row("x" -> 2L)), ordered = true),
    Scenario("probe37b concatenating literal lists",
      empty, "RETURN size([1, 2, 3] + [4, 5]) AS n",
      Seq(row("n" -> 5L))),
    Scenario("probe37b list concat and element append",
      "CREATE (:A {k: 1})",
      "MATCH (a:A) RETURN [a.k, 7] + [9] AS l1, [a.k, 7] + 9 AS l2",
      Seq(row("l1" -> List(1L, 7L, 9L), "l2" -> List(1L, 7L, 9L)))),
    Scenario("probe37b arithmetic null propagation",
      empty,
      "RETURN 1 + null AS a, null * 2 AS b, abs(null) AS c",
      Seq(row("a" -> null, "b" -> null, "c" -> null))),
    Scenario("probe37b DISTINCT count over nested lists of maps in maps",
      empty,
      "UNWIND [{m: [{x: 1}]}, {m: [{x: 1}]}, {m: [{x: 2}]}] AS v " +
        "RETURN count(DISTINCT v) AS n",
      Seq(row("n" -> 2L))),
    Scenario("probe37b multiple aliasing and backreferencing",
      "CREATE (:A {k: 1})",
      "MATCH (a:A) WITH a.k AS x, a.k * 2 AS y RETURN x, y, x + y AS z",
      Seq(row("x" -> 1L, "y" -> 2L, "z" -> 3L))),
    Scenario("probe37b sorting on a variable removed by DISTINCT fails",
      empty,
      "UNWIND [1, 2] AS x UNWIND [3, 4] AS y RETURN DISTINCT x ORDER BY y",
      Nil, expectError = Some("not defined")),
    Scenario("probe37b ordering by an expression of a DISTINCT column",
      empty,
      "UNWIND [2, 1] AS x RETURN DISTINCT x ORDER BY x * -1",
      Seq(row("x" -> 2L), row("x" -> 1L)), ordered = true))

  def probeBatch34: Seq[Scenario] = Seq(
    Scenario("probe34 rand() inside an aggregate is invalid", "CREATE (:A)",
      "MATCH (n:A) RETURN count(rand()) AS x", Nil,
      expectError = Some("cannot be used inside an aggregate")),
    Scenario("probe34 rand() beside an aggregate stays legal", "CREATE (:A)",
      "MATCH (n:A) RETURN count(*) AS c, rand() >= 0 AS r",
      Seq(row("c" -> 1L, "r" -> true))),
    Scenario("probe34 float literal overflow", empty,
      "RETURN 1.34E999 AS x", Nil,
      expectError = Some("floating point number is too large")),
    Scenario("probe34 invalid unicode escape", empty,
      "RETURN '\\uH' AS x", Nil,
      expectError = Some("invalid unicode escape")),
    Scenario("probe34 CALL is a typed unsupported error", empty,
      "CALL db.labels() YIELD label RETURN label", Nil,
      expectError = Some("CALL is not supported")),
    Scenario("probe34 indexing a scalar is a type error", empty,
      "WITH 100 AS i RETURN i[0] AS x", Nil,
      expectError = Some("cannot index into a value of type bigint")),
    Scenario("probe34 indexing a string is a type error", empty,
      "WITH 'abc' AS s RETURN s[0] AS x", Nil,
      expectError = Some("cannot index into a value of type string")),
    Scenario("probe34 property access on an integer is a type error", empty,
      "WITH 1 AS n RETURN n.prop AS x", Nil,
      expectError = Some("property access on a value of type bigint")),
    Scenario("probe34 property access on a string is a type error", empty,
      "WITH 'a' AS n RETURN n.prop AS x", Nil,
      expectError = Some("property access on a value of type string")),
    Scenario("probe34 list indexed with a list is a type error", empty,
      "WITH [1, 2] AS l RETURN l[[0]] AS x", Nil,
      expectError = Some("list index must be an integer")),
    Scenario("probe34 length() on a node is a type error", "CREATE (:A)",
      "MATCH (n:A) RETURN length(n) AS x", Nil,
      expectError = Some("length() cannot be applied to a node")),
    Scenario("probe34 size() on a relationship is a type error",
      "CREATE (:A)-[:T]->(:B)",
      "MATCH ()-[r:T]->() RETURN size(r) AS x", Nil,
      expectError = Some("size() cannot be applied to a relationship")),
    Scenario("probe34 size() on a var-length rel list stays legal",
      "CREATE (:A)-[:T]->(:B)",
      "MATCH (:A)-[r:T*1..2]->() RETURN size(r) AS x",
      Seq(row("x" -> 1L))),
    Scenario("probe34 toInteger() on an entity is a type error", "CREATE (:A)",
      "MATCH (n:A) RETURN toInteger(n) AS x", Nil,
      expectError = Some("Invalid input for toInteger()")),
    Scenario("probe34 toInteger() on a list is a type error", empty,
      "RETURN toInteger([1]) AS x", Nil,
      expectError = Some("Invalid input for toInteger()")),
    Scenario("probe34 toFloat() on a list is a type error", empty,
      "RETURN toFloat([1.0]) AS x", Nil,
      expectError = Some("Invalid input for toFloat()")),
    Scenario("probe34 toString() on an entity is a type error", "CREATE (:A)",
      "MATCH (n:A) RETURN toString(n) AS x", Nil,
      expectError = Some("Invalid input for toString()")),
    Scenario("probe34 percentileCont() non-numeric percentile", "CREATE (:A {k: 1})",
      "MATCH (n:A) RETURN percentileCont(n.k, 'nope') AS x", Nil,
      expectError = Some("percentile argument must be a number")),
    Scenario("probe34 percentileCont() non-numeric input", "CREATE (:A {s: 'x'})",
      "MATCH (n:A) RETURN percentileCont(n.s, 0.5) AS x", Nil,
      expectError = Some("expects a numeric value expression")),
    Scenario("probe34 range() with string arguments", empty,
      "RETURN range('a', 'b') AS x", Nil,
      expectError = Some("range() expects integer arguments")),
    Scenario("probe34 exists() over a general expression", "CREATE (:A {k: 1})",
      "MATCH (n:A) WHERE exists(n.k + 1) RETURN n.k AS x", Nil,
      expectError = Some("exists() expects a property access or a pattern")),
    Scenario("probe34 exists() over a property still works", "CREATE (:A {k: 1})",
      "MATCH (n:A) WHERE exists(n.k) RETURN n.k AS x",
      Seq(row("x" -> 1L))),
    Scenario("probe34 heterogeneous map/atomic list literal", empty,
      "RETURN [{prop: 1}, 1] AS x", Nil,
      expectError = Some("cannot build a list mixing")),
    Scenario("probe34 rel reuse in one pattern is invalid",
      "CREATE (:A)-[:T]->(:B)",
      "MATCH (a)-[r]->(b)-[r]->(c) RETURN 1 AS x", Nil,
      expectError = Some("same relationship variable")),
    Scenario("probe34 OR tolerates a null-poisoned disjunct",
      "CREATE (:A {k: 1, s: 'x'})",
      // the second disjunct is null for the row (no such property);
      // true OR null must still be true per ternary logic
      "MATCH (n:A) WHERE n.s = 'x' OR n.missing > 0 RETURN n.k AS x",
      Seq(row("x" -> 1L))))

  // --------------------------------------------------------- blacklist
  // differential-hunt batch 5: correlation reached ONLY through pattern
  // elements of a WHERE-embedded pattern predicate / EXISTS (freeExprVars
  // saw Var nodes but not NodePattern/RelPattern variable names, so the
  // OPTIONAL MATCH planned uncorrelated — hunt cases 6277/6326/7536)
  def diffBatch5: Seq[Scenario] = Seq(
    Scenario("diff5 EXISTS correlates optional var to outer var",
      """CREATE (a:P {uid: 1})
        |CREATE (b:P {uid: 2})
        |CREATE (c:P {uid: 3})
        |CREATE (a)-[:T]->(c)""".stripMargin,
      """MATCH (n0:P) OPTIONAL MATCH (n1:P)
        |WHERE EXISTS { MATCH (n0)<-[]-(n1) }
        |RETURN n0.uid AS u, n1.uid AS v ORDER BY u""".stripMargin,
      Seq(row("u" -> 1L, "v" -> null), row("u" -> 2L, "v" -> null),
        row("u" -> 3L, "v" -> 1L)), ordered = true),
    Scenario("diff5 outer-only pattern predicate keeps optional cardinality",
      """CREATE (a:N {k: 1})
        |CREATE (b:N {k: 2})
        |CREATE (:M {k: 9})
        |CREATE (:M {k: 8})
        |CREATE (a)-[:T]->(a)""".stripMargin,
      """MATCH (n:N) OPTIONAL MATCH (m:M)
        |WHERE NOT ((n)-[:T]->(n))
        |RETURN n.k AS k ORDER BY k""".stripMargin,
      Seq(row("k" -> 1L), row("k" -> 2L), row("k" -> 2L)), ordered = true),
    Scenario("diff5 bare re-match of a null-bound var fails the pattern",
      """CREATE (a:N {k: 1})
        |CREATE (b:M {k: 2})
        |CREATE (c:M {k: 3})
        |CREATE (b)-[:T]->(c)""".stripMargin,
      """OPTIONAL MATCH (z:Z)
        |OPTIONAL MATCH (p:M)-[:T]->(q:M), (z)
        |RETURN p.k AS pk, q.k AS qk""".stripMargin,
      Seq(row("pk" -> null, "qk" -> null))),
    Scenario("diff5 bare re-match of a bound var keeps matched rows",
      """CREATE (a:N {k: 1})
        |CREATE (b:M {k: 2})
        |CREATE (c:M {k: 3})
        |CREATE (b)-[:T]->(c)""".stripMargin,
      """MATCH (z:N)
        |OPTIONAL MATCH (p:M)-[:T]->(q:M), (z)
        |RETURN z.k AS zk, p.k AS pk, q.k AS qk""".stripMargin,
      Seq(row("zk" -> 1L, "pk" -> 2L, "qk" -> 3L))),
    Scenario("diff5 null outer var in pattern predicate filters all rows",
      """CREATE (a:A {k: 1})
        |CREATE (b:B {k: 2})
        |CREATE (a)-[:T]->(b)""".stripMargin,
      """OPTIONAL MATCH (z:Z) OPTIONAL MATCH (p)-[:T]->(q)
        |WHERE (z)-[:T]->(q)
        |RETURN p.k AS pk, q.k AS qk""".stripMargin,
      Seq(row("pk" -> null, "qk" -> null))))

  // differential-hunt batch 6 (list-grammar extension): a mixed-tagged
  // element compared with <> against a cross-family value returned false
  // instead of true (mixedCmp hardcoded the family-mismatch constant —
  // hunt case 995), and a runtime-EMPTY list with a null needle
  // null-poisoned IN via array_contains (hunt case 886)
  def diffBatch6: Seq[Scenario] = Seq(
    Scenario("diff6 tagged element <> cross-family value is true",
      "CREATE (:A {k: 1})",
      "MATCH (n:A) RETURN [n.k, 'abc'][0] <> 'b' AS x",
      Seq(row("x" -> true))),
    Scenario("diff6 tagged element = cross-family value is false",
      "CREATE (:A {k: 1})",
      "MATCH (n:A) RETURN [n.k, 'abc'][0] = 'b' AS x",
      Seq(row("x" -> false))),
    Scenario("diff6 tagged null element <> value is null",
      "CREATE (:A {k: 1})",
      "MATCH (n:A) RETURN [n.missing, 'abc'][0] <> 'b' AS x",
      Seq(row("x" -> null))),
    Scenario("diff6 null needle IN runtime-empty list is false",
      "CREATE (:A {k: 1})",
      "MATCH (n:A) RETURN n.missing IN [n.missing][0..-2] AS x",
      Seq(row("x" -> false))),
    Scenario("diff6 null needle IN non-empty list is null",
      "CREATE (:A {k: 1})",
      "MATCH (n:A) RETURN n.missing IN [n.k] AS x",
      Seq(row("x" -> null))),
    // probe batch 36: single() must be strict-ternary — an unknown
    // predicate outcome can tip the exactly-one count either way, so it
    // poisons unless two definite matches already falsify
    Scenario("diff6 single with one true and one unknown is null",
      "CREATE (:A {k: 1})",
      "RETURN single(x IN [1, null] WHERE x = 1) AS r",
      Seq(row("r" -> null))),
    Scenario("diff6 single with zero true and one unknown is null",
      "CREATE (:A {k: 1})",
      "RETURN single(x IN [1, null] WHERE x = 9) AS r",
      Seq(row("r" -> null))),
    Scenario("diff6 single with two trues is false despite unknowns",
      "CREATE (:A {k: 1})",
      "RETURN single(x IN [1, 1, null] WHERE x = 1) AS r",
      Seq(row("r" -> false))),
    Scenario("diff6 single exact one definite match is true",
      "CREATE (:A {k: 1})",
      "RETURN single(x IN [1, 2] WHERE x = 1) AS r",
      Seq(row("r" -> true))),
    // cross-family UNION columns take the tagged-union encoding instead
    // of unionByName's crashing cast; integral branches KEEP the integer
    // tag (round 7 — `1` stays `1`, not `1.0`), while UNION-distinct
    // keys on equivalence so 1 and 1.0 still collapse to one row
    Scenario("diff6 cross-family UNION ALL keeps every branch value",
      "CREATE (:A {k: 1, s: 'x'})",
      "MATCH (n:A) RETURN n.k AS v UNION ALL MATCH (n:A) RETURN n.s AS v",
      Seq(row("v" -> 1L), row("v" -> "x"))),
    Scenario("diff6 cross-family UNION dedups within each family",
      "CREATE (:A {k: 1, s: 'x'})\nCREATE (:A {k: 1, s: 'x'})",
      "MATCH (n:A) RETURN n.s AS v UNION MATCH (n:A) RETURN n.k AS v",
      Seq(row("v" -> 1L), row("v" -> "x"))),
    Scenario("r7 cross-family UNION ALL preserves the integer", empty,
      "RETURN 1 AS x UNION ALL RETURN 'a' AS x",
      Seq(row("x" -> 1L), row("x" -> "a"))),
    Scenario("r7 cross-family UNION ALL keeps int and float distinct",
      empty,
      "RETURN 1 AS x UNION ALL RETURN 1.0 AS x UNION ALL RETURN 'a' AS x",
      Seq(row("x" -> 1L), row("x" -> 1.0), row("x" -> "a"))),
    Scenario("r7 cross-family UNION collapses equivalent int and float",
      empty,
      "RETURN 1 AS x UNION RETURN 1.0 AS x UNION RETURN 'a' AS x",
      Seq(row("x" -> 1L), row("x" -> "a"))),
    Scenario("r7 cross-family UNION float-first still keeps integer repr",
      empty,
      "RETURN 1.0 AS x UNION RETURN 1 AS x UNION RETURN true AS x",
      Seq(row("x" -> 1L), row("x" -> true))),
    Scenario("r7 all-numeric UNION still collapses via widening", empty,
      "RETURN 1 AS x UNION RETURN 1.0 AS x",
      Seq(row("x" -> 1.0))),
    Scenario("r7 cross-family UNION negative and boolean branches", empty,
      "RETURN -3 AS x UNION ALL RETURN false AS x UNION ALL RETURN -3 AS x",
      Seq(row("x" -> -3L), row("x" -> false), row("x" -> -3L))),
    Scenario("r7 cross-family UNION distinct multi-column mixed key", empty,
      """RETURN 1 AS a, 'p' AS b UNION RETURN 1.0 AS a, 'p' AS b
        |UNION RETURN 'q' AS a, 'p' AS b""".stripMargin,
      Seq(row("a" -> 1L, "b" -> "p"), row("a" -> "q", "b" -> "p"))),
    // round 7 (ADVICE): duration({...}) supports the full Neo4j component
    // set including sub-second, and unknown keys error instead of
    // silently contributing nothing
    Scenario("r7 duration map sub-second components", empty,
      "RETURN duration({seconds: 1, milliseconds: 500}).milliseconds AS ms",
      Seq(row("ms" -> 1500L))),
    Scenario("r7 duration map microseconds component", empty,
      "RETURN duration({milliseconds: 2, microseconds: 500}).microseconds AS us",
      Seq(row("us" -> 2500L))),
    Scenario("r7 duration map nanoseconds truncate to micros", empty,
      "RETURN duration({nanoseconds: 1500}).microseconds AS us",
      Seq(row("us" -> 1L))),
    Scenario("r7 duration map quarters fold into months", empty,
      "RETURN duration({years: 1, quarters: 2}).months AS m",
      Seq(row("m" -> 18L))),
    Scenario("r7 duration map unknown component errors", empty,
      "RETURN duration({secnds: 1}) AS d",
      Nil, expectError = Some("unknown duration component")),
    Scenario("r7 duration fixture literal sub-second + validation",
      "CREATE (:A {d: duration({seconds: 2, milliseconds: 250})})",
      "MATCH (n:A) RETURN n.d.milliseconds AS ms",
      Seq(row("ms" -> 2250L))),
    Scenario("r7 duration fixture literal quarters",
      "CREATE (:A {d: duration({quarters: 3})})",
      "MATCH (n:A) RETURN n.d.months AS m",
      Seq(row("m" -> 9L))),
    // round 7 (ADVICE): ISO time offset parsing accepts lowercase 'z'
    // (case-insensitive per ISO-8601) and bad bodies get a typed error
    Scenario("r7 time lowercase z offset parses as UTC", empty,
      "RETURN time('12:00z').offset AS o",
      Seq(row("o" -> "Z"))),
    Scenario("r7 time odd-length compact body errors typed", empty,
      "RETURN time('123') AS t",
      Nil, expectError = Some("invalid ISO time-of-day")),
    Scenario("r7 localtime compact body with fraction", empty,
      "RETURN localtime('123045.5').second AS s",
      Seq(row("s" -> 45L))),
    // round 7 (ADVICE): zoned TIME grouping/DISTINCT use INSTANT
    // equivalence, matching =/ordering (offset is presentation only)
    Scenario("r7 zoned time count(DISTINCT) collapses equal instants",
      empty,
      """UNWIND [time('12:00+01:00'), time('11:00Z')] AS t
        |RETURN count(DISTINCT t) AS c""".stripMargin,
      Seq(row("c" -> 1L))),
    Scenario("r7 zoned time collect(DISTINCT) collapses equal instants",
      empty,
      """UNWIND [time('12:00+01:00'), time('11:00Z'), time('09:30Z')] AS t
        |RETURN size(collect(DISTINCT t)) AS n""".stripMargin,
      Seq(row("n" -> 2L))),
    Scenario("r7 zoned time GROUP BY key collapses equal instants", empty,
      """UNWIND [time('12:00+01:00'), time('11:00Z')] AS t
        |WITH t, count(*) AS c RETURN c""".stripMargin,
      Seq(row("c" -> 2L))),
    Scenario("r7 zoned time DISTINCT projection collapses equal instants",
      empty,
      """UNWIND [time('12:00+01:00'), time('11:00Z')] AS t
        |WITH DISTINCT t RETURN count(t) AS n""".stripMargin,
      Seq(row("n" -> 1L))),
    Scenario("r7 zoned time distinct instants stay distinct", empty,
      """UNWIND [time('12:00+01:00'), time('12:00Z')] AS t
        |RETURN count(DISTINCT t) AS c""".stripMargin,
      Seq(row("c" -> 2L))),
    Scenario("diff6 cross-family UNION null branch stays one null",
      "CREATE (:A {k: 1})\nCREATE (:A {k: 2})",
      "MATCH (n:A) RETURN n.missing AS v UNION MATCH (n:A) RETURN 'z' AS v",
      Seq(row("v" -> null), row("v" -> "z"))),
    // differential batch 7: a NAMED PATH shared into a later OPTIONAL
    // MATCH / EXISTS crashed the null-safe join-back (the per-binding id
    // column lookup had no PathBinding arm — hunt cases 475/704); a path
    // identity joins on ALL its constituent columns
    Scenario("diff7 path var consumed by a later OPTIONAL MATCH WHERE",
      """CREATE (a:A {k: 1})
        |CREATE (b:B {k: 2})
        |CREATE (a)-[:T]->(b)""".stripMargin,
      """MATCH p = (a:A)-[:T]->(b) OPTIONAL MATCH (z:B)
        |WHERE length(p) > 9
        |RETURN z.k AS k""".stripMargin,
      Seq(row("k" -> null))),
    Scenario("diff7 path var consumed by a matching later OPTIONAL MATCH",
      """CREATE (a:A {k: 1})
        |CREATE (b:B {k: 2})
        |CREATE (a)-[:T]->(b)""".stripMargin,
      """MATCH p = (a:A)-[:T]->(b) OPTIONAL MATCH (z:B)
        |WHERE length(p) = 1
        |RETURN z.k AS k""".stripMargin,
      Seq(row("k" -> 2L))),
    Scenario("diff7 single-node named path has length 0",
      "CREATE (:A {k: 1})",
      "MATCH p = (n:A) RETURN length(p) AS l, size(nodes(p)) AS n",
      Seq(row("l" -> 0L, "n" -> 1L))),
    Scenario("diff7 path var consumed inside EXISTS",
      """CREATE (a:A {k: 1})
        |CREATE (b:B {k: 2})
        |CREATE (a)-[:T]->(b)""".stripMargin,
      """MATCH p = (a:A)-[:T]->(b)
        |WHERE EXISTS { MATCH (z:B) WHERE length(p) = 1 }
        |RETURN b.k AS k""".stripMargin,
      Seq(row("k" -> 2L))),
    // differential batch 8 (round 6): a zero-hop named path over an
    // ALREADY-BOUND node in a FAILED OPTIONAL MATCH shares only non-null
    // outer columns, so the miss was invisible to the path null guard —
    // length(p)/relationships(p) returned 0/[] instead of null
    // (hunt 31400; fixed with PathBinding.presenceCol)
    Scenario("diff8 failed optional zero-hop path observables are null",
      "CREATE (:A {k: 1})",
      """OPTIONAL MATCH (n:A)
        |OPTIONAL MATCH p = (n:A) WHERE n.k = 9
        |RETURN length(p) AS l, size(relationships(p)) AS r""".stripMargin,
      Seq(row("l" -> null, "r" -> null))),
    Scenario("diff8 matched optional zero-hop path has length 0",
      "CREATE (:A {k: 1})",
      """OPTIONAL MATCH (n:A)
        |OPTIONAL MATCH p = (n:A) WHERE n.k = 1
        |RETURN length(p) AS l, size(relationships(p)) AS r""".stripMargin,
      Seq(row("l" -> 0L, "r" -> 0L))),
    Scenario("diff8 failed optional one-hop path over bound endpoints",
      """CREATE (a:A {k: 1})
        |CREATE (b:B {k: 2})
        |CREATE (a)-[:T]->(b)""".stripMargin,
      """MATCH (a:A), (b:B)
        |OPTIONAL MATCH p = (a)-[:S]->(b)
        |RETURN length(p) AS l""".stripMargin,
      Seq(row("l" -> null))),
    // engine/reference map semantics: struct-style BINARY equality
    // (null values are ordinary values — Neo4j's ternary map equality
    // would return null here); locked as a documented divergence
    Scenario("diff8 map equality treats null values as equal",
      "CREATE (:A {k: 1})",
      "MATCH (n:A) RETURN {x: n.missing} = {x: n.missing} AS eq",
      Seq(row("eq" -> true))),
    Scenario("diff8 map equality null value vs value is definite false",
      "CREATE (:A {k: 1})",
      "MATCH (n:A) RETURN {x: n.missing} <> {x: 1} AS ne",
      Seq(row("ne" -> true))),
    Scenario("diff8 map projection keeps missing keys as null",
      "CREATE (:A {k: 1})",
      "MATCH (n:A) RETURN n {.k, .zz} = {k: 1, zz: n.missing} AS eq",
      Seq(row("eq" -> true))),
    // hunt 32530/32463/32408: correlation reaching the outer scope ONLY
    // through a map projection in WHERE was invisible to freeExprVars →
    // the optional planned uncorrelated and crashed on the unseeded var
    Scenario("diff8 correlation only through a WHERE map projection",
      """CREATE (:A {f: 1.0, k: 1})
        |CREATE (:B {f: 1.0, k: 2})
        |CREATE (:B {f: 2.0, k: 3})""".stripMargin,
      """MATCH (a:A) OPTIONAL MATCH (m:B)
        |WHERE a {.f} = m {.f}
        |RETURN m.k AS mk""".stripMargin,
      Seq(row("mk" -> 2L))),
    // hunt 32015: date ± duration over a STATICALLY-ABSENT property
    // (NullType literal) failed Spark analysis instead of yielding null
    Scenario("diff8 date arithmetic over an absent property is null",
      "CREATE (:A {k: 1})",
      """MATCH (n:A)
        |RETURN n.d - duration({days: 5}) AS x,
        |       n.d + duration({days: 2}) AS y""".stripMargin,
      Seq(row("x" -> null, "y" -> null))),
    // hunt 32296: with TWO var-length segments in one named path, the
    // second segment's select dropped the first's interior-node list
    // (RelListBinding now carries innerNodesCol); UNWIND re-selects the
    // header columns, which is what surfaced the loss
    Scenario("diff8 two var-length segments keep both inner node lists",
      """CREATE (a:A {k: 1})
        |CREATE (b:B {k: 2})
        |CREATE (c:C {k: 3})
        |CREATE (a)-[:T]->(b)
        |CREATE (b)-[:T]->(c)""".stripMargin,
      """MATCH p = (a:A)-[*1..1]->(b)-[*1..1]->(c)
        |UNWIND [1, 2] AS u
        |RETURN [x IN nodes(p) | x.k] AS nk, length(p) AS l, u AS u""".stripMargin,
      Seq(row("nk" -> List(1L, 2L, 3L), "l" -> 2L, "u" -> 1L),
        row("nk" -> List(1L, 2L, 3L), "l" -> 2L, "u" -> 2L))))

  // round-7 fixtures: a yelp-flavoured review graph and a market graph
  // shaped after the reference's example apps (morpheus-examples/.../
  // integration/yelp/Part2_YelpGraphLibrary.scala,
  // examples/RecommendationExample.scala, Customer360Example.scala)
  val yelp: String = """
    CREATE (b1:Business {name: 'Cafe', city: 'Berlin', rank: 2})
    CREATE (b2:Business {name: 'Bar', city: 'Berlin', rank: 1})
    CREATE (b3:Business {name: 'Shop', city: 'Paris', rank: 3})
    CREATE (u1:User {name: 'Ann', since: 2015})
    CREATE (u2:User {name: 'Ben', since: 2017})
    CREATE (u3:User {name: 'Cyd', since: 2016})
    CREATE (u1)-[:REVIEWS {stars: 5, year: 2017}]->(b1)
    CREATE (u2)-[:REVIEWS {stars: 3, year: 2017}]->(b1)
    CREATE (u3)-[:REVIEWS {stars: 5, year: 2017}]->(b1)
    CREATE (u1)-[:REVIEWS {stars: 4, year: 2018}]->(b2)
    CREATE (u2)-[:REVIEWS {stars: 2, year: 2018}]->(b3)
    CREATE (u3)-[:REVIEWS {stars: 1, year: 2018}]->(b2)
  """
  val market: String = """
    CREATE (u1:Person {name: 'Alice'})
    CREATE (u2:Person {name: 'Bob'})
    CREATE (c1:Customer {name: 'Alice'})
    CREATE (c2:Customer {name: 'Bob'})
    CREATE (p1:Product {title: 'Beans', category: 'coffee', rank: 2})
    CREATE (p2:Product {title: 'Mug', category: 'coffee', rank: 1})
    CREATE (p3:Product {title: 'Tea', category: 'tea', rank: 3})
    CREATE (i1:Interest {name: 'coffee'})
    CREATE (u1)-[:FRIEND_OF]->(u2)
    CREATE (u1)-[:HAS_INTEREST]->(i1)
    CREATE (c2)-[:BOUGHT {rating: 5, helpful: 4, votes: 5}]->(p1)
    CREATE (c2)-[:BOUGHT {rating: 4, helpful: 1, votes: 9}]->(p2)
    CREATE (c2)-[:BOUGHT {rating: 5, helpful: 9, votes: 10}]->(p3)
  """
  val optChain: String = """
    CREATE (a:A {k: 1})-[:T]->(b:B {k: 2})
    CREATE (c:A {k: 3})
  """
  val multiLabel: String = "CREATE (:P:Q {k: 1}) CREATE (:P {k: 2})"

  /** Round-7 batch A: query shapes mined from the reference's example
    * apps (yelp graph library, recommendation flow, customer-360 stats)
    * re-run against small in-memory fixtures. */
  private def r7Examples: Seq[Scenario] = Seq(
    // CensusHiveExample.scala:69-77 — untyped rel + entity RETURN ordered
    // by a property of a projected entity
    Scenario("r7ex census: untyped expand, entity return, prop order",
      social,
      """MATCH (n:Person)-[r]->(m) WHERE n.age >= 30
        |RETURN n.name AS nm, m.name AS om ORDER BY n.age, om""".stripMargin,
      Seq(row("nm" -> "Alice", "om" -> "Bob"),
        row("nm" -> "Alice", "om" -> "Carol"),
        row("nm" -> "Alice", "om" -> "R2"),
        row("nm" -> "Carol", "om" -> "Dave")), ordered = true),
    // LdbcHiveExample.scala:95-102 — UNALIASED property return items,
    // ORDER BY those properties, LIMIT
    Scenario("r7ex ldbc: unaliased property items + order + limit", social,
      """MATCH (n:Person)-[:KNOWS]->(c:Person)
        |RETURN n.name, c.name ORDER BY n.name, c.name
        |LIMIT 3""".stripMargin,
      Seq(row("n.name" -> "Alice", "c.name" -> "Bob"),
        row("n.name" -> "Alice", "c.name" -> "Carol"),
        row("n.name" -> "Bob", "c.name" -> "Carol")), ordered = true),
    Scenario("r7ex co-reviewed business pairs with review counts", yelp,
      """MATCH (x:Business)<-[r1:REVIEWS]-(u:User)-[r2:REVIEWS]->(y:Business)
        |WHERE r1.year = 2017 AND r2.year = 2018
        |WITH x, y, count(u) AS c
        |RETURN x.name AS a, y.name AS b, c""".stripMargin,
      Seq(row("a" -> "Cafe", "b" -> "Bar", "c" -> 2L),
        row("a" -> "Cafe", "b" -> "Shop", "c" -> 1L))),
    Scenario("r7ex co-reviews user pairs over a shared business", yelp,
      """MATCH (b:Business)<-[r1:REVIEWS]-(u1:User),
        |      (b)<-[r2:REVIEWS]-(u2:User)
        |WHERE r1.year = 2017 AND r2.year = 2017 AND u1.name < u2.name
        |WITH u1, u2, count(b) AS c
        |RETURN u1.name AS a, u2.name AS b, c""".stripMargin,
      Seq(row("a" -> "Ann", "b" -> "Ben", "c" -> 1L),
        row("a" -> "Ann", "b" -> "Cyd", "c" -> 1L),
        row("a" -> "Ben", "b" -> "Cyd", "c" -> 1L))),
    Scenario("r7ex project filtered reviews via bound-rel clone", yelp,
      """MATCH (u:User)-[r:REVIEWS]->(b:Business)
        |WHERE r.year = 2017 AND u.since <= 2016
        |CONSTRUCT CREATE (u)-[r]->(b)
        |MATCH (x:User)-[e:REVIEWS]->(y:Business)
        |RETURN x.name AS x, e.stars AS s, y.name AS y""".stripMargin,
      Seq(row("x" -> "Ann", "s" -> 5L, "y" -> "Cafe"),
        row("x" -> "Cyd", "s" -> 5L, "y" -> "Cafe"))),
    Scenario("r7ex CONSTRUCT rel carrying an aggregate property", yelp,
      """MATCH (x:Business)<-[:REVIEWS]-(u:User)-[:REVIEWS]->(y:Business)
        |WHERE x.name < y.name
        |WITH x, y, count(u) AS reviewCount
        |CONSTRUCT CREATE (x)-[:CO_REVIEWED {reviewCount: reviewCount}]->(y)
        |MATCH (a)-[e:CO_REVIEWED]->(b)
        |RETURN a.name AS a, e.reviewCount AS c, b.name AS b""".stripMargin,
      Seq(row("a" -> "Bar", "c" -> 2L, "b" -> "Cafe"),
        row("a" -> "Cafe", "c" -> 1L, "b" -> "Shop"))),
    Scenario("r7ex business trend via CLONE + SET of a computed score", yelp,
      """MATCH (b:Business)<-[r:REVIEWS]-(:User)
        |WITH b, sum(r.stars) AS totalStars
        |CONSTRUCT CLONE b AS nb SET nb.delta = totalStars - b.rank
        |MATCH (x:Business) RETURN x.name AS n, x.delta AS d""".stripMargin,
      Seq(row("n" -> "Cafe", "d" -> 11L), row("n" -> "Bar", "d" -> 4L),
        row("n" -> "Shop", "d" -> -1L))),
    Scenario("r7ex top businesses by total stars", yelp,
      """MATCH (u:User)-[r:REVIEWS]->(b:Business)
        |WITH b.name AS name, sum(r.stars) AS totalStars
        |RETURN name, totalStars ORDER BY totalStars DESC LIMIT 2""".stripMargin,
      Seq(row("name" -> "Cafe", "totalStars" -> 13L),
        row("name" -> "Bar", "totalStars" -> 5L)), ordered = true),
    Scenario("r7ex recommendations from co-reviewers", yelp,
      """MATCH (u:User)-[:REVIEWS]->(b:Business)<-[:REVIEWS]-(o:User),
        |      (o)-[r:REVIEWS]->(b2:Business)
        |WHERE NOT((u)-[:REVIEWS]->(b2)) AND r.stars > 1
        |WITH u.name AS name, collect(DISTINCT b2.name) AS recs
        |RETURN name, size(recs) AS n""".stripMargin,
      Seq(row("name" -> "Ann", "n" -> 1L), row("name" -> "Ben", "n" -> 1L),
        row("name" -> "Cyd", "n" -> 1L))),
    Scenario("r7ex customer-360 interaction stats (undirected two-hop)", yelp,
      """MATCH (u:User)--(b:Business)--(u2:User)
        |WITH u, b.city AS city, count(*) AS cnt
        |WHERE city IN ['Berlin']
        |RETURN u.name AS n, city, cnt ORDER BY cnt DESC, n""".stripMargin,
      Seq(row("n" -> "Ann", "city" -> "Berlin", "cnt" -> 3L),
        row("n" -> "Cyd", "city" -> "Berlin", "cnt" -> 3L),
        row("n" -> "Ben", "city" -> "Berlin", "cnt" -> 2L)), ordered = true),
    Scenario("r7ex recommendation flow with rating-quality predicate", market,
      """MATCH (person:Person)-[:FRIEND_OF]-(friend:Person),
        |      (customer:Customer)-[b:BOUGHT]->(product:Product)
        |WHERE customer.name = friend.name
        |  AND b.rating >= 4 AND (b.helpful * 1.0) / b.votes > 0.6
        |  AND person.name <> customer.name
        |WITH person, product ORDER BY product.rank
        |RETURN DISTINCT product.title AS rec, person.name AS who""".stripMargin,
      Seq(row("rec" -> "Beans", "who" -> "Alice"),
        row("rec" -> "Tea", "who" -> "Alice"))),
    Scenario("r7ex inline property map referencing another match var", market,
      """MATCH (u:Person)-[:HAS_INTEREST]->(i:Interest),
        |      (c:Customer)-[:BOUGHT]->(p:Product {category: i.name})
        |RETURN u.name AS u, p.title AS t""".stripMargin,
      Seq(row("u" -> "Alice", "t" -> "Beans"),
        row("u" -> "Alice", "t" -> "Mug"))),
    Scenario("r7ex aggregate-then-filter WITH (HAVING shape)", yelp,
      """MATCH (u:User)-[r:REVIEWS]->(b:Business)
        |WITH b, count(r) AS cnt WHERE cnt > 1
        |RETURN b.name AS n, cnt""".stripMargin,
      Seq(row("n" -> "Cafe", "cnt" -> 3L), row("n" -> "Bar", "cnt" -> 2L))),
    Scenario("r7ex WITH * ORDER BY then RETURN DISTINCT LIMIT", yelp,
      """MATCH (u:User)-[r:REVIEWS]->(b:Business)
        |WHERE r.stars >= 4
        |WITH * ORDER BY b.rank
        |RETURN DISTINCT b.name AS n LIMIT 2""".stripMargin,
      Seq(row("n" -> "Bar"), row("n" -> "Cafe"))),
    Scenario("r7ex label predicate as a WHERE expression", yelp,
      "MATCH (n) WHERE n:User AND n.since >= 2016 RETURN n.name AS n",
      Seq(row("n" -> "Ben"), row("n" -> "Cyd"))),
    Scenario("r7ex degree table ordered by count", yelp,
      """MATCH (:User)-[:REVIEWS]->(b:Business)
        |WITH b, count(*) AS degree
        |RETURN b.name AS n, degree ORDER BY degree DESC, n""".stripMargin,
      Seq(row("n" -> "Cafe", "degree" -> 3L),
        row("n" -> "Bar", "degree" -> 2L),
        row("n" -> "Shop", "degree" -> 1L)), ordered = true))

  /** Round-7 batch B: locks for the round-7 engine changes (integer-
    * preserving mixed unions, implicit rel clones, duration components,
    * TIME parsing/identity, list-literal error semantics) plus assorted
    * read-side corners. */
  private def r7Locks: Seq[Scenario] = Seq(
    // --- hunt 92400: VOID correlation vars (Spark joins match nothing
    // on a void <=> void key — the pairing must be vacuous) ---
    Scenario("r7 void-typed correlation var in OPTIONAL MATCH", social,
      "UNWIND [null, null] AS u0 " +
        "OPTIONAL MATCH (n:Person) WHERE u0 IS NULL AND n.age > 30 " +
        "RETURN count(n) AS c",
      Seq(row("c" -> 4L))),
    Scenario("r7 void-typed correlation var in EXISTS", social,
      "UNWIND [null] AS u0 MATCH (n:Person) " +
        "WHERE EXISTS { MATCH (m:Person) WHERE u0 IS NULL AND " +
        "m.age > n.age } RETURN count(n) AS c",
      Seq(row("c" -> 3L))),
    Scenario("r7 void-typed correlation var in a pattern comprehension",
      social,
      "UNWIND [null] AS u0 MATCH (n:Person {name: 'Alice'}) " +
        "RETURN size([(n)-[:KNOWS]->(m) WHERE u0 IS NULL | m.name]) AS c",
      Seq(row("c" -> 2L))),
    // --- probe batch 54: ZONED DATETIME (struct-encoded, round 7) ---
    Scenario("r7 zdt offset parse and toString round-trip", empty,
      "RETURN toString(datetime('2024-01-01T13:00+02:00')) AS s",
      Seq(row("s" -> "2024-01-01T13:00+02:00"))),
    Scenario("r7 zdt named zone resolves its rules offset", empty,
      "RETURN toString(datetime('2024-06-01T12:00[Europe/Berlin]')) AS s",
      Seq(row("s" -> "2024-06-01T12:00+02:00[Europe/Berlin]"))),
    Scenario("r7 zdt equality is by instant across offsets", empty,
      "RETURN datetime('2024-06-01T12:00+02:00') = " +
        "datetime('2024-06-01T10:00Z') AS eq, " +
        "datetime('2024-06-01T12:00+02:00') < " +
        "datetime('2024-06-01T10:01Z') AS lt",
      Seq(row("eq" -> true, "lt" -> true))),
    Scenario("r7 zdt orders by instant", empty,
      "UNWIND [datetime('2024-01-01T13:00+02:00'), " +
        "datetime('2024-01-01T12:30Z'), " +
        "datetime('2024-01-01T11:00-01:00')] AS t " +
        "RETURN t.offset AS o ORDER BY t ASC",
      Seq(row("o" -> "+02:00"), row("o" -> "-01:00"), row("o" -> "Z")),
      ordered = true),
    Scenario("r7 zdt clock accessors are local, epoch is the instant",
      empty,
      "WITH datetime('2024-06-01T12:34:56.789+02:00') AS d " +
        "RETURN d.year AS y, d.hour AS h, d.minute AS m, d.offset AS o, " +
        "d.epochSeconds AS es, d.millisecond AS ms",
      Seq(row("y" -> 2024L, "h" -> 12L, "m" -> 34L, "o" -> "+02:00",
        "es" -> 1717238096L, "ms" -> 789L))),
    Scenario("r7 zdt named-zone accessors and timezone", empty,
      "WITH datetime('2024-06-01T05:00[America/New_York]') AS d " +
        "RETURN d.hour AS h, d.offset AS o, d.timezone AS tz",
      Seq(row("h" -> 5L, "o" -> "-04:00", "tz" -> "America/New_York"))),
    Scenario("r7 zdt calendar day across a DST gap keeps the wall clock",
      empty,
      "RETURN toString(datetime('2024-03-30T21:00[Europe/Berlin]') + " +
        "duration({days: 1})) AS s",
      Seq(row("s" -> "2024-03-31T21:00+02:00[Europe/Berlin]"))),
    Scenario("r7 zdt sub-day arithmetic is exact elapsed time", empty,
      "RETURN toString(datetime('2024-03-31T01:30[Europe/Berlin]') + " +
        "duration({hours: 1})) AS s",
      Seq(row("s" -> "2024-03-31T03:30+02:00[Europe/Berlin]"))),
    Scenario("r7 zdt fixed-offset arithmetic keeps the offset", empty,
      "RETURN toString(datetime('2024-03-30T21:00+01:00') + " +
        "duration({days: 1})) AS p, " +
        "toString(datetime('2024-01-01T00:00Z') - " +
        "duration({minutes: 90})) AS m",
      Seq(row("p" -> "2024-03-31T21:00+01:00",
        "m" -> "2023-12-31T22:30Z"))),
    Scenario("r7 zdt component map with timezone", empty,
      "RETURN toString(datetime({year: 2024, month: 6, day: 1, hour: 12, " +
        "timezone: 'Europe/Berlin'})) AS s",
      Seq(row("s" -> "2024-06-01T12:00+02:00[Europe/Berlin]"))),
    Scenario("r7 zdt date-only string is midnight UTC", empty,
      "RETURN toString(datetime('2024-01-01')) AS s, " +
        "toString(datetime('2015-W30-2T12:00+02:00')) AS w",
      Seq(row("s" -> "2024-01-01T00:00Z",
        "w" -> "2015-07-21T12:00+02:00"))),
    Scenario("r7 zdt DISTINCT and min/max use the instant", empty,
      "UNWIND [datetime('2024-06-01T12:00+02:00'), " +
        "datetime('2024-06-01T10:00Z'), " +
        "datetime('2024-06-01T09:59Z')] AS d " +
        "RETURN count(DISTINCT d) AS c, toString(min(d)) AS lo",
      Seq(row("c" -> 2L, "lo" -> "2024-06-01T09:59Z"))),
    Scenario("r7 zdt truncate works in the value's zone", empty,
      "RETURN toString(datetime.truncate('day', " +
        "datetime('2024-06-01T23:30[Europe/Berlin]'))) AS s",
      Seq(row("s" -> "2024-06-01T00:00+02:00[Europe/Berlin]"))),
    Scenario("r7 zdt duration.between and selection take local clocks",
      empty,
      "RETURN toString(duration.between(datetime('2024-01-01T00:00Z'), " +
        "datetime('2024-03-01T12:00+02:00'))) AS b, " +
        "toString(date(datetime('2024-06-01T23:30-04:00'))) AS d, " +
        "toString(localdatetime(datetime('2024-06-01T23:30-04:00'))) AS l",
      Seq(row("b" -> "P2MT10H", "d" -> "2024-06-01",
        "l" -> "2024-06-01T23:30:00"))),
    Scenario("r7 zdt fixture properties: order, accessors, equality",
      """CREATE (:E {uid: 0, at: datetime('2024-06-01T12:00+02:00')})
        |CREATE (:E {uid: 1, at: datetime('2024-06-01T10:30Z')})
        |CREATE (:E {uid: 2, at: datetime('2024-06-01T05:00-04:00[America/New_York]')})
        |""".stripMargin,
      "MATCH (e:E) RETURN e.uid AS u, e.at.hour AS h, e.at.offset AS o " +
        "ORDER BY e.at ASC, u ASC",
      Seq(row("u" -> 2L, "h" -> 5L, "o" -> "-04:00"),
        row("u" -> 0L, "h" -> 12L, "o" -> "+02:00"),
        row("u" -> 1L, "h" -> 10L, "o" -> "Z")), ordered = true),
    Scenario("r7 aggregate reading an equivalence-keyed group column",
      "CREATE (:A {uid: 0, zd: datetime('2025-01-01T00:00Z')})\n" +
        "CREATE (:A {uid: 1})",
      // the zd group key groups by instant with a min_by representative;
      // the sibling count() reads the same column — must not resolve it
      // as a lateral alias (hunt 110538)
      "MATCH (n:A) WITH n, count([lcv IN range(0, 4) WHERE " +
        "datetime('2024-01-31T22:07-02:00') <> n.zd | 'x'][1]) AS c " +
        "RETURN n.uid AS u, c ORDER BY u",
      Seq(row("u" -> 0L, "c" -> 1L), row("u" -> 1L, "c" -> 0L)),
      ordered = true),
    Scenario("r7 zdt component-map composition", empty,
      "RETURN toString(datetime({date: date('2024-06-01'), hour: 12, " +
        "timezone: '+02:00'})) AS a, " +
        "toString(datetime({year: 2024, week: 23, dayOfWeek: 4})) AS b, " +
        "toString(datetime({date: datetime('2024-06-01T08:30Z'), " +
        "timezone: 'Europe/Berlin'})) AS c",
      Seq(row("a" -> "2024-06-01T12:00+02:00",
        "b" -> "2024-06-06T00:00Z",
        "c" -> "2024-06-01T08:30+02:00[Europe/Berlin]"))),
    Scenario("r7 zdt map constructor resolves a DST gap forward", empty,
      "RETURN toString(datetime({year: 2024, month: 3, day: 31, hour: 2, " +
        "minute: 30, timezone: 'Europe/Berlin'})) AS s",
      Seq(row("s" -> "2024-03-31T03:30+02:00[Europe/Berlin]"))),
    Scenario("r7 zdt from a localdatetime selects the UTC zone", empty,
      "RETURN datetime(localdatetime('2024-01-01T12:00:00')) = " +
        "datetime('2024-01-01T12:00Z') AS eq, " +
        "toString(datetime(localdatetime('2024-01-01T12:00:00'))) AS s",
      Seq(row("eq" -> true, "s" -> "2024-01-01T12:00Z"))),
    Scenario("r7 zdt time/localtime selection", empty,
      "WITH datetime('2024-06-01T12:34:56.5+02:00') AS d " +
        "RETURN toString(time(d)) AS t, toString(localtime(d)) AS lt, " +
        "time(d) = time('12:34:56.5+02:00') AS eq",
      Seq(row("t" -> "12:34:56.5+02:00", "lt" -> "12:34:56.5",
        "eq" -> true))),
    Scenario("r7 zdt never equals a localdatetime", empty,
      "RETURN datetime('2024-01-01T00:00Z') = " +
        "localdatetime('2024-01-01T00:00:00') AS x",
      Seq(row("x" -> false))),
    Scenario("r7 zdt epoch constructors and accessors", empty,
      "RETURN datetime({epochSeconds: 120}).epochSeconds AS es, " +
        "datetime({epochMillis: 86400000}).epochMillis AS em, " +
        "(datetime('2024-01-01T00:00Z') + null) IS NULL AS n",
      Seq(row("es" -> 120L, "em" -> 86400000L, "n" -> true))),
    Scenario("r7 durations are not orderable in ORDER BY", empty,
      "UNWIND [duration({days: 1}), duration({hours: 12})] AS d " +
        "RETURN d ORDER BY d",
      Nil, expectError = Some("not orderable")),
    // --- probe batch 50: ORDER BY scope + list total order ---
    Scenario("r7 order by null list elements sort last under ASC", empty,
      "UNWIND [[null, 3], [1, 1], [1, 2], [2, 0]] AS l " +
        "RETURN l ORDER BY l ASC",
      Seq(row("l" -> Seq(1L, 1L)), row("l" -> Seq(1L, 2L)),
        row("l" -> Seq(2L, 0L)), row("l" -> Seq(null, 3L))),
      ordered = true),
    Scenario("r7 order by null list elements sort first under DESC", empty,
      "UNWIND [[null, 3], [1, 1], [2, 0]] AS l RETURN l ORDER BY l DESC",
      Seq(row("l" -> Seq(null, 3L)), row("l" -> Seq(2L, 0L)),
        row("l" -> Seq(1L, 1L))), ordered = true),
    Scenario("r7 list prefix order unchanged by the wrapped key", empty,
      "UNWIND [[1, 2], [1], [], [1, null]] AS l RETURN l ORDER BY l ASC",
      Seq(row("l" -> Seq.empty[Any]), row("l" -> Seq(1L)),
        row("l" -> Seq(1L, 2L)), row("l" -> Seq(1L, null))),
      ordered = true),
    Scenario("r7 heterogeneous list-of-lists literal", empty,
      "RETURN [[1], ['a'], null][1][0] = 'a' AS s, " +
        "[[1], ['a']][0][0] = 1 AS i, [[1], ['a'], null][2] IS NULL AS z",
      Seq(row("s" -> true, "i" -> true, "z" -> true))),
    Scenario("r7 mixed-family lists order by the CIP global order", empty,
      // per-element family rank: STRING < BOOLEAN < NUMBER, null last
      "UNWIND [[1], ['a'], [true], [0.5], [null]] AS l " +
        "RETURN l ORDER BY l ASC",
      Seq(row("l" -> Seq("a")), row("l" -> Seq(true)),
        row("l" -> Seq(0.5)), row("l" -> Seq(1L)),
        row("l" -> Seq(null))), ordered = true),
    Scenario("r7 min over lists treats null elements as largest", empty,
      // list = with a null element is ternary-null — compare positionally
      "UNWIND [[null, 3], [1, 1]] AS l RETURN min(l) = [1, 1] AS m, " +
        "max(l)[0] IS NULL AS x0, max(l)[1] = 3 AS x1",
      Seq(row("m" -> true, "x0" -> true, "x1" -> true))),
    Scenario("r7 min/max over lists skip whole-null values", empty,
      "UNWIND [null, [2], [1, null]] AS l " +
        "RETURN min(l)[0] = 1 AS m0, min(l)[1] IS NULL AS m1, " +
        "max(l) = [2] AS x",
      Seq(row("m0" -> true, "m1" -> true, "x" -> true))),
    Scenario("r7 hidden sort aggregate inside an expression", social,
      "MATCH (n:Person) RETURN n.city AS city, count(*) AS c " +
        "ORDER BY sum(n.age) + 1 DESC",
      Seq(row("city" -> "Berlin", "c" -> 2), row("city" -> null, "c" -> 1),
        row("city" -> "Paris", "c" -> 1)), ordered = true),
    Scenario("r7 hidden percentile sort aggregate", social,
      "MATCH (n:Person) RETURN n.city AS city, count(*) AS c " +
        "ORDER BY percentileCont(n.age, 0.5) DESC, city ASC",
      Seq(row("city" -> "Berlin", "c" -> 2), row("city" -> null, "c" -> 1),
        row("city" -> "Paris", "c" -> 1)), ordered = true),
    Scenario("r7 DISTINCT projection rejects a hidden sort aggregate",
      social,
      "MATCH (n:Person) RETURN DISTINCT n.city AS city ORDER BY count(*)",
      Nil, expectError = Some("ORDER BY")),
    Scenario("r7 WHERE after WITH sees only the projected scope", social,
      "MATCH (n:Person) WITH n.city AS city WHERE n.age > 0 RETURN city",
      Nil, expectError = Some("not defined")),
    Scenario("r7 trailing ORDER BY binds to the last union branch", empty,
      "UNWIND [2, 1] AS x RETURN x UNION ALL " +
        "UNWIND [30, 10, 20] AS x RETURN x ORDER BY x ASC",
      Seq(row("x" -> 2L), row("x" -> 1L), row("x" -> 10L),
        row("x" -> 20L), row("x" -> 30L)), ordered = true),
    Scenario("r7 double cut: WITH ORDER BY LIMIT then RETURN cut", social,
      "MATCH (n:Person) WITH n ORDER BY n.age DESC LIMIT 2 " +
        "RETURN n.name AS nm ORDER BY nm ASC LIMIT 1",
      Seq(row("nm" -> "Carol"))),
    Scenario("r7 aggregate in ORDER BY needs an aggregating RETURN", social,
      "MATCH (n:Person) RETURN n.city AS city ORDER BY count(*) DESC",
      Nil, expectError = Some("ORDER BY")),
    Scenario("r7 aggregate in ORDER BY needs an aggregating WITH", social,
      "MATCH (n:Person) WITH n.city AS city ORDER BY count(*) DESC " +
        "RETURN city",
      Nil, expectError = Some("ORDER BY")),
    Scenario("r7 order by unprojected var through WITH", social,
      "MATCH (n:Person) WITH n.city AS city ORDER BY n.age DESC LIMIT 1 " +
        "RETURN city",
      Seq(row("city" -> "Berlin"))),
    Scenario("r7 order by expression mixing alias and unprojected var",
      social,
      "MATCH (n:Person) RETURN n.age AS a ORDER BY a + n.age ASC LIMIT 1",
      Seq(row("a" -> 25L))),
    Scenario("r7 union all across families preserves integers", empty,
      "RETURN 1 AS x UNION ALL RETURN 'a' AS x",
      Seq(row("x" -> 1L), row("x" -> "a"))),
    Scenario("r7 union all across four families", empty,
      "RETURN 1 AS x UNION ALL RETURN 'a' AS x UNION ALL RETURN true AS x " +
        "UNION ALL RETURN null AS x",
      Seq(row("x" -> 1L), row("x" -> "a"), row("x" -> true),
        row("x" -> null))),
    Scenario("r7 union distinct collapses 1 and 1.0 to the integer", empty,
      "RETURN 1 AS x UNION RETURN 'a' AS x UNION RETURN 1.0 AS x",
      Seq(row("x" -> 1L), row("x" -> "a"))),
    Scenario("r7 union distinct float-first still yields the integer", empty,
      "RETURN 1.0 AS x UNION RETURN 'a' AS x UNION RETURN 1 AS x",
      Seq(row("x" -> 1L), row("x" -> "a"))),
    Scenario("r7 DISTINCT over a mixed list dedupes 1 and 1.0", empty,
      "UNWIND [1, 1.0, 'a', 1] AS x RETURN count(DISTINCT x) AS c",
      Seq(row("c" -> 2L))),
    Scenario("r7 zoned times with one instant are one DISTINCT value", empty,
      "UNWIND [time('13:00+01:00'), time('12:00Z')] AS t " +
        "RETURN count(DISTINCT t) AS c",
      Seq(row("c" -> 1L))),
    Scenario("r7 min over zoned times picks the earliest instant", empty,
      "UNWIND [time('13:00+01:00'), time('12:00Z'), time('01:00Z')] AS t " +
        "RETURN min(t) = time('01:00Z') AS m",
      Seq(row("m" -> true))),
    Scenario("r7 duration sub-second components", empty,
      "RETURN duration({seconds: 1, milliseconds: 500}) = " +
        "duration({milliseconds: 1500}) AS eq",
      Seq(row("eq" -> true))),
    Scenario("r7 duration quarters normalize to months", empty,
      "RETURN duration({quarters: 1}) = duration({months: 3}) AS eq",
      Seq(row("eq" -> true))),
    Scenario("r7 duration map rejects unknown components", empty,
      "RETURN duration({lightyears: 1}) AS d", Nil,
      expectError = Some("unknown duration component")),
    Scenario("r7 time accepts a lowercase zulu suffix", empty,
      "RETURN time('12:00z').hour AS h", Seq(row("h" -> 12L))),
    Scenario("r7 odd-length compact time body is a typed error", empty,
      "RETURN localtime('123') AS t", Nil,
      expectError = Some("invalid ISO time-of-day")),
    Scenario("r7 time arithmetic wraps within the day", empty,
      "RETURN time('23:30Z') + duration({hours: 1}) = time('00:30Z') AS eq",
      Seq(row("eq" -> true))),
    Scenario("r7 localtime clock accessors", empty,
      "RETURN localtime('12:34:56.789').minute AS m, " +
        "localtime('12:34:56.789').second AS s",
      Seq(row("m" -> 34L, "s" -> 56L))),
    Scenario("r7 ISO-8601 duration rendering", empty,
      "RETURN toString(duration({years: 1, months: 2, days: 3, " +
        "minutes: 1, seconds: 30})) AS s",
      Seq(row("s" -> "P1Y2M3DT1M30S"))),
    Scenario("r7 raising list-literal sibling raises when another element is selected",
      empty, "RETURN [1/0, 2][1] AS x", Nil,
      expectError = Some("Division by zero")),
    Scenario("r7 raising list-literal sibling raises under head()", empty,
      "RETURN head([1, 1/0]) AS x", Nil,
      expectError = Some("Division by zero")),
    Scenario("r7 static list select over safe siblings", optChain,
      "MATCH (n:A) RETURN [n.k, 5][0] AS x",
      Seq(row("x" -> 1L), row("x" -> 3L))),
    Scenario("r7 nested OPTIONAL MATCH chains propagate nulls", optChain,
      """MATCH (n:A) OPTIONAL MATCH (n)-[:T]->(m:B)
        |OPTIONAL MATCH (m)-[:T]->(z)
        |RETURN n.k AS k, m.k AS mk, z.k AS zk""".stripMargin,
      Seq(row("k" -> 1L, "mk" -> 2L, "zk" -> null),
        row("k" -> 3L, "mk" -> null, "zk" -> null))),
    Scenario("r7 EXISTS block inside CASE in RETURN", optChain,
      """MATCH (n:A) RETURN n.k AS k,
        |CASE WHEN EXISTS { MATCH (n)-[:T]->() } THEN 'yes' ELSE 'no' END AS e""".stripMargin,
      Seq(row("k" -> 1L, "e" -> "yes"), row("k" -> 3L, "e" -> "no"))),
    Scenario("r7 EXISTS block inside CASE in WHERE", optChain,
      """MATCH (n:A)
        |WHERE CASE WHEN n.k > 0 THEN EXISTS { MATCH (n)-[:T]->() }
        |      ELSE false END
        |RETURN n.k AS k""".stripMargin,
      Seq(row("k" -> 1L))),
    Scenario("r7 pattern predicate inside CASE in WITH", optChain,
      """MATCH (n:A)
        |WITH CASE WHEN (n)-[:T]->(:B) THEN n.k ELSE -1 END AS x
        |RETURN x""".stripMargin,
      Seq(row("x" -> 1L), row("x" -> -1L))),
    Scenario("r7 SET on an implicit rel clone", yelp,
      """MATCH (u:User {name: 'Ann'})-[r:REVIEWS]->(b:Business)
        |WHERE r.year = 2017
        |CONSTRUCT CREATE (u)-[r]->(b) SET r.flag = true
        |MATCH ()-[e:REVIEWS]->()
        |RETURN e.stars AS s, e.flag AS f""".stripMargin,
      Seq(row("s" -> 5L, "f" -> true))),
    Scenario("r7 bound rel clone accepts reversed pattern orientation", yelp,
      """MATCH (u:User {name: 'Ann'})-[r:REVIEWS]->(b:Business)
        |WHERE r.year = 2017
        |CONSTRUCT CREATE (b)<-[r]-(u)
        |MATCH (x)-[e:REVIEWS]->(y)
        |RETURN x.name AS x, y.name AS y""".stripMargin,
      Seq(row("x" -> "Ann", "y" -> "Cafe"))),
    Scenario("r7 bound rel clone must keep its matched endpoints", yelp,
      """MATCH (u:User)-[r:REVIEWS]->(b:Business), (o:User)
        |WHERE o.name <> u.name
        |CONSTRUCT CREATE (o)-[r]->(b)
        |MATCH (x)-[e:REVIEWS]->(y) RETURN count(e) AS c""".stripMargin,
      Nil, expectError = Some("must restate its matched endpoints")),
    Scenario("r7 bound rel clone cannot restate a type", yelp,
      """MATCH (u:User)-[r:REVIEWS]->(b:Business)
        |CONSTRUCT CREATE (u)-[r:REVIEWS]->(b)
        |MATCH (x)-[e]->(y) RETURN count(e) AS c""".stripMargin,
      Nil, expectError = Some("cannot restate a type")),
    Scenario("r7 bound rel clone cannot restate properties", yelp,
      """MATCH (u:User)-[r:REVIEWS]->(b:Business)
        |CONSTRUCT CREATE (u)-[r {stars: 1}]->(b)
        |MATCH (x)-[e]->(y) RETURN count(e) AS c""".stripMargin,
      Nil, expectError = Some("cannot restate properties")),
    Scenario("r7 multi-label node passes a second label predicate", multiLabel,
      "MATCH (n:P) WHERE n:Q RETURN n.k AS k", Seq(row("k" -> 1L))),
    Scenario("r7 negated label predicate", multiLabel,
      "MATCH (n:P) WHERE NOT n:Q RETURN n.k AS k", Seq(row("k" -> 2L))),
    Scenario("r7 SKIP and LIMIT accept variable-free numeric functions", empty,
      "UNWIND [1, 2, 3, 4] AS x RETURN x ORDER BY x " +
        "SKIP toInteger('1') LIMIT abs(-2)",
      Seq(row("x" -> 2L), row("x" -> 3L)), ordered = true),
    Scenario("r7 list comprehension with filter and transform", empty,
      "RETURN [x IN range(1, 5) WHERE x % 2 = 0 | x * 10] AS l",
      Seq(row("l" -> List(20L, 40L)))),
    Scenario("r7 quantifier over a var-length rel list", chain,
      """MATCH (a:N {v: 1})-[rs:R*1..3]->(x)
        |RETURN x.v AS v, all(r IN rs WHERE r.w < 3) AS q""".stripMargin,
      Seq(row("v" -> 2L, "q" -> true), row("v" -> 3L, "q" -> true),
        row("v" -> 4L, "q" -> false))),
    Scenario("r7 pattern comprehension sized per row", yelp,
      """MATCH (u:User)
        |RETURN u.name AS n, size([(u)-[:REVIEWS]->(b) | b.name]) AS c""".stripMargin,
      Seq(row("n" -> "Ann", "c" -> 2L), row("n" -> "Ben", "c" -> 2L),
        row("n" -> "Cyd", "c" -> 2L))),
    Scenario("r7 map equality is struct-style over null values", empty,
      "RETURN {a: 1, b: null} = {a: 1, b: null} AS eq",
      Seq(row("eq" -> true))),
    Scenario("r7 simple CASE null subject never matches (null = null is null)",
      empty, "RETURN CASE null WHEN null THEN 'y' ELSE 'n' END AS c",
      Seq(row("c" -> "n"))),
    Scenario("r7 keys() of a map literal keeps insertion order", empty,
      // r9 flip: the reference's FunctionTests pin INSERTION order for
      // map keys ({name, age, address} → that order); only entity keys
      // are sorted
      "RETURN keys({b: 1, a: 2}) AS k",
      Seq(row("k" -> List("b", "a")))),
    Scenario("r7 split keeps interior empty strings", empty,
      "RETURN split('a,b,,c', ',') AS s",
      Seq(row("s" -> List("a", "b", "", "c")))),
    Scenario("r7 reverse over strings and lists", empty,
      "RETURN reverse('abc') AS r, reverse([1, 2, 3]) AS l",
      Seq(row("r" -> "cba", "l" -> List(3L, 2L, 1L)))),
    Scenario("r7 reduce over a literal list", empty,
      "RETURN reduce(acc = 0, x IN [1, 2, 3] | acc + x) AS s",
      Seq(row("s" -> 6L))),
    Scenario("r7 percentileCont interpolates between ranks", empty,
      "UNWIND [1, 2, 3, 4] AS x RETURN percentileCont(x, 0.5) AS p",
      Seq(row("p" -> 2.5))),
    Scenario("r7 date.truncate to month start", empty,
      "RETURN date.truncate('month', date('2026-08-15')) = " +
        "date('2026-08-01') AS eq",
      Seq(row("eq" -> true))),
    // COPY OF (reference morpheus syntax, yelp Part4_BusinessTrends:
    // CREATE (newB COPY OF b) SET newB.trendRank = ...): NEW identity,
    // copied labels/type + properties
    Scenario("r7 COPY OF copies labels and props under a fresh id", yelp,
      """MATCH (b:Business {name: 'Cafe'})
        |CONSTRUCT CREATE (nb COPY OF b)
        |MATCH (x:Business) RETURN x.name AS n, id(x) < 0 AS fresh""".stripMargin,
      Seq(row("n" -> "Cafe", "fresh" -> true))),
    Scenario("r7 COPY OF + SET overlays computed properties", yelp,
      """MATCH (b:Business)
        |WITH b, b.rank * 10 AS trendRank
        |CONSTRUCT CREATE (nb COPY OF b) SET nb.trendRank = trendRank
        |MATCH (x:Business)
        |RETURN x.name AS n, x.trendRank AS t, x.rank AS r""".stripMargin,
      Seq(row("n" -> "Cafe", "t" -> 20L, "r" -> 2L),
        row("n" -> "Bar", "t" -> 10L, "r" -> 1L),
        row("n" -> "Shop", "t" -> 30L, "r" -> 3L))),
    Scenario("r7 COPY OF rel re-attaches between node copies", yelp,
      """MATCH (u:User {name: 'Ann'})-[r:REVIEWS]->(b:Business)
        |WHERE r.year = 2017
        |CONSTRUCT CREATE (cu COPY OF u)-[e COPY OF r]->(cb COPY OF b)
        |MATCH (x:User)-[e2:REVIEWS]->(y:Business)
        |RETURN x.name AS x, e2.stars AS s, y.name AS y""".stripMargin,
      Seq(row("x" -> "Ann", "s" -> 5L, "y" -> "Cafe"))),
    Scenario("r7 COPY OF pattern labels extend the copied ones", yelp,
      """MATCH (b:Business {name: 'Bar'})
        |CONSTRUCT CREATE (nb COPY OF b :Hot)
        |MATCH (x:Hot) RETURN x.name AS n""".stripMargin,
      Seq(row("n" -> "Bar"))),
    Scenario("r7 COPY OF creates one element per driving row", yelp,
      """MATCH (:User)-[:REVIEWS]->(b:Business {name: 'Cafe'})
        |CONSTRUCT CREATE (nb COPY OF b)
        |MATCH (x) RETURN count(x) AS c""".stripMargin,
      Seq(row("c" -> 3L))),
    Scenario("r7 CLONE of the same input dedups by id (contrast)", yelp,
      """MATCH (:User)-[:REVIEWS]->(b:Business {name: 'Cafe'})
        |CONSTRUCT CLONE b
        |MATCH (x) RETURN count(x) AS c""".stripMargin,
      Seq(row("c" -> 1L))),
    Scenario("r7 COPY OF skips failed-optional source rows", optChain,
      """MATCH (n:A) OPTIONAL MATCH (n)-[:T]->(m:B)
        |CONSTRUCT CREATE (c COPY OF m)
        |MATCH (x) RETURN count(x) AS c""".stripMargin,
      Seq(row("c" -> 1L))),
    Scenario("r7 COPY OF outside CONSTRUCT is a typed error", yelp,
      "MATCH (n COPY OF m) RETURN 1 AS x", Nil,
      expectError = Some("only valid in CONSTRUCT")),
    Scenario("r7 COPY OF of an unbound source is a typed error", yelp,
      """MATCH (b:Business)
        |CONSTRUCT CREATE (nb COPY OF nope)
        |MATCH (x) RETURN count(x) AS c""".stripMargin,
      Nil, expectError = Some("is not a bound node")),
    Scenario("r7 COPY OF rel of a non-relationship is a typed error", yelp,
      """MATCH (u:User {name: 'Ann'})
        |CONSTRUCT CREATE (a)-[e COPY OF u]->(c)
        |MATCH (x) RETURN count(x) AS c""".stripMargin,
      Nil, expectError = Some("is not a bound relationship")),
    // differential hunt 69716: a label predicate over a failed-OPTIONAL
    // (null) node is null, not false — including statically-absent labels
    Scenario("r7 label predicate on a null node is null", optChain,
      """MATCH (n:A) OPTIONAL MATCH (n)-[:T]->(m:B) WHERE n.k > 99
        |RETURN n.k AS k, (m:B) AS hasB, (m:Nope) AS hasNope""".stripMargin,
      Seq(row("k" -> 1L, "hasB" -> null, "hasNope" -> null),
        row("k" -> 3L, "hasB" -> null, "hasNope" -> null))),
    Scenario("r7 label predicate on a matched node stays ternary-false", optChain,
      """MATCH (n:A) OPTIONAL MATCH (n)-[:T]->(m:B)
        |RETURN n.k AS k, (m:B) AS hasB, (m:Nope) AS hasNope""".stripMargin,
      Seq(row("k" -> 1L, "hasB" -> true, "hasNope" -> false),
        row("k" -> 3L, "hasB" -> null, "hasNope" -> null))))

  // Round-8 locks: DST-correct zoned-datetime arithmetic (ADVICE r7 —
  // time components apply to the INSTANT, calendar components to the
  // local clock with the original offset preferred on ambiguity), the
  // instant-based duration.between seconds remainder, and java.time ISO
  // rendering. Ground truth hand-derived from java.time ZonedDateTime
  // (R8Probe1Main prints both sides).
  private def r8Locks: Seq[Scenario] = Seq(
    Scenario("r8 zdt hour addition crosses a fall-back overlap by elapsed time",
      empty,
      // 02:30+02:00 is one hour of elapsed time before 02:30+01:00 —
      // adding PT1H lands on the repeated hour's later side, not 03:30
      "RETURN toString(datetime('2024-10-27T02:30+02:00[Europe/Berlin]') " +
        "+ duration({hours: 1})) AS s",
      Seq(row("s" -> "2024-10-27T02:30+01:00[Europe/Berlin]"))),
    Scenario("r8 zdt hour subtraction crosses the overlap backwards", empty,
      "RETURN toString(datetime('2024-10-27T02:30+01:00[Europe/Berlin]') " +
        "- duration({hours: 1})) AS s",
      Seq(row("s" -> "2024-10-27T02:30+02:00[Europe/Berlin]"))),
    Scenario("r8 zdt day addition into the overlap retains the offset",
      empty,
      // java.time ofLocal: an ambiguous local result keeps the value's
      // original offset (+02:00), not the zone default
      "RETURN toString(datetime('2024-10-26T02:30+02:00[Europe/Berlin]') " +
        "+ duration({days: 1})) AS s",
      Seq(row("s" -> "2024-10-27T02:30+02:00[Europe/Berlin]"))),
    Scenario("r8 zdt P1D and PT24H diverge across a transition", empty,
      "WITH datetime('2024-10-26T03:30+02:00[Europe/Berlin]') AS b " +
        "RETURN toString(b + duration({days: 1})) AS d1, " +
        "toString(b + duration({hours: 24})) AS h24, " +
        "b + duration({days: 1}) = b + duration({hours: 24}) AS eq",
      Seq(row("d1" -> "2024-10-27T03:30+01:00[Europe/Berlin]",
        "h24" -> "2024-10-27T02:30+01:00[Europe/Berlin]", "eq" -> false))),
    Scenario("r8 zdt mixed duration: calendar first, then elapsed time",
      empty,
      // P1DT1H = (+P1D keeping the wall clock and offset) then one
      // ELAPSED hour through the overlap
      "RETURN toString(datetime('2024-10-26T02:30+02:00[Europe/Berlin]') " +
        "+ duration({days: 1, hours: 1})) AS s",
      Seq(row("s" -> "2024-10-27T02:30+01:00[Europe/Berlin]"))),
    Scenario("r8 duration.between seconds are the instant difference",
      empty,
      // Berlin spring-forward: 01:00+01:00 .. 04:00+02:00 is 2 elapsed
      // hours (the 02:00-03:00 local hour does not exist)
      "RETURN toString(duration.between(" +
        "datetime('2024-03-31T01:00+01:00[Europe/Berlin]'), " +
        "datetime('2024-03-31T04:00+02:00[Europe/Berlin]'))) AS d",
      Seq(row("d" -> "PT2H"))),
    Scenario("r8 duration.between days are local, remainder is elapsed",
      empty,
      // one local day (01:00 to 01:00) spans 25 elapsed hours across the
      // fall-back — P1D plus an instant-difference hour
      "RETURN toString(duration.between(" +
        "datetime('2024-10-26T01:00+02:00[Europe/Berlin]'), " +
        "datetime('2024-10-27T01:00+01:00[Europe/Berlin]'))) AS d",
      Seq(row("d" -> "P1DT1H"))),
    Scenario("r8 duration.between is consistent with duration.inSeconds",
      empty,
      "WITH datetime('2024-03-31T01:00+01:00[Europe/Berlin]') AS a, " +
        "datetime('2024-03-31T04:00+02:00[Europe/Berlin]') AS b " +
        "RETURN duration.between(a, b) = duration.inSeconds(a, b) AS eq",
      Seq(row("eq" -> true))),
    Scenario("r8 zdt truncate retains the value's side of the overlap",
      empty,
      "RETURN toString(datetime.truncate('hour', " +
        "datetime('2024-10-27T02:30+01:00[Europe/Berlin]'))) AS a, " +
        "toString(datetime.truncate('hour', " +
        "datetime('2024-10-27T02:30+02:00[Europe/Berlin]'))) AS b",
      Seq(row("a" -> "2024-10-27T02:00+01:00[Europe/Berlin]",
        "b" -> "2024-10-27T02:00+02:00[Europe/Berlin]"))),
    Scenario("r8 zdt toString omits zero seconds, keeps nonzero", empty,
      "RETURN toString(datetime('2024-01-01T13:00+02:00')) AS a, " +
        "toString(datetime('2024-01-01T13:00:30+02:00')) AS b",
      Seq(row("a" -> "2024-01-01T13:00+02:00",
        "b" -> "2024-01-01T13:00:30+02:00"))),
    Scenario("r8 zdt toString prints fractions in java.time digit groups",
      empty,
      "RETURN toString(datetime('2024-01-01T12:00:00.5Z')) AS a, " +
        "toString(datetime('2024-01-01T12:00:00.1234Z')) AS b, " +
        "toString(datetime('2024-01-01T12:00:00.123456Z')) AS c",
      Seq(row("a" -> "2024-01-01T12:00:00.500Z",
        "b" -> "2024-01-01T12:00:00.123400Z",
        "c" -> "2024-01-01T12:00:00.123456Z"))),
    // --- round 8: COLUMN-valued temporal constructor args (VERDICT r7
    // item 1): ISO strings in data columns upgrade in-query, identical
    // to the literal path's parse (TemporalParse codegen expression)
    Scenario("r8 datetime over a string property column",
      """CREATE (:D {uid: 0, iso: '2024-06-01T12:00+02:00[Europe/Berlin]'})
        |CREATE (:D {uid: 1, iso: '2024-01-01T00:00Z'})
        |CREATE (:D {uid: 2})
        |""".stripMargin,
      "MATCH (n:D) RETURN n.uid AS u, toString(datetime(n.iso)) AS s, " +
        "datetime(n.iso).hour AS h ORDER BY u",
      Seq(row("u" -> 0L, "s" -> "2024-06-01T12:00+02:00[Europe/Berlin]",
        "h" -> 12L),
        row("u" -> 1L, "s" -> "2024-01-01T00:00Z", "h" -> 0L),
        row("u" -> 2L, "s" -> null, "h" -> null)), ordered = true),
    Scenario("r8 date over string columns covers the full ISO grammar",
      """CREATE (:D {uid: 0, d: '2024-03-05'})
        |CREATE (:D {uid: 1, d: '2015-W30-2'})
        |CREATE (:D {uid: 2, d: '20240229'})
        |CREATE (:D {uid: 3, d: '2024-202'})
        |""".stripMargin,
      "MATCH (n:D) RETURN n.uid AS u, toString(date(n.d)) AS s ORDER BY u",
      Seq(row("u" -> 0L, "s" -> "2024-03-05"),
        row("u" -> 1L, "s" -> "2015-07-21"),
        row("u" -> 2L, "s" -> "2024-02-29"),
        row("u" -> 3L, "s" -> "2024-07-20")), ordered = true),
    Scenario("r8 time and localtime over string columns",
      """CREATE (:D {uid: 0, t: '13:30:15+01:00'})
        |CREATE (:D {uid: 1, t: '091500'})
        |CREATE (:D {uid: 2})
        |""".stripMargin,
      "MATCH (n:D) RETURN n.uid AS u, toString(time(n.t)) AS zt, " +
        "toString(localtime(n.t)) AS lt, localtime(n.t) IS NULL AS z " +
        "ORDER BY u",
      Seq(row("u" -> 0L, "zt" -> "13:30:15+01:00", "lt" -> "13:30:15",
        "z" -> false),
        row("u" -> 1L, "zt" -> "09:15:00Z", "lt" -> "09:15:00",
          "z" -> false),
        row("u" -> 2L, "zt" -> null, "lt" -> null, "z" -> true)),
      ordered = true),
    Scenario("r8 duration over a string column drives arithmetic",
      """CREATE (:D {uid: 0, dur: 'P1Y2MT3H'})
        |CREATE (:D {uid: 1, dur: 'PT90S'})
        |""".stripMargin,
      "MATCH (n:D) RETURN n.uid AS u, toString(duration(n.dur)) AS s, " +
        "toString(date('2024-01-01') + duration(n.dur)) AS d ORDER BY u",
      Seq(row("u" -> 0L, "s" -> "P1Y2MT3H", "d" -> "2025-03-01"),
        row("u" -> 1L, "s" -> "PT1M30S", "d" -> "2024-01-01")),
      ordered = true),
    Scenario("r8 localdatetime over derived string columns",
      "CREATE (:D {uid: 0, iso: '2024-01-05T07:08:09'})",
      "MATCH (n:D) RETURN toString(localdatetime(n.iso)) AS a, " +
        "toString(date(substring(n.iso, 0, 10))) AS b, " +
        "localdatetime(n.nope) IS NULL AS z",
      Seq(row("a" -> "2024-01-05T07:08:09", "b" -> "2024-01-05",
        "z" -> true))),
    Scenario("r8 malformed temporal string column raises a typed error",
      "CREATE (:D {iso: 'garbage'})",
      "MATCH (n:D) RETURN datetime(n.iso) AS x",
      Nil, expectError = Some("cannot parse")),
    Scenario("r8 column-parsed datetimes group and order by instant",
      """CREATE (:D {iso: '2024-06-01T12:00+02:00'})
        |CREATE (:D {iso: '2024-06-01T10:00Z'})
        |CREATE (:D {iso: '2024-06-01T09:00Z'})
        |""".stripMargin,
      "MATCH (n:D) WITH datetime(n.iso) AS dt " +
        "RETURN count(DISTINCT dt) AS c, toString(min(dt)) AS lo, " +
        "max(dt) = datetime('2024-06-01T10:00Z') AS hi",
      Seq(row("c" -> 2L, "lo" -> "2024-06-01T09:00Z", "hi" -> true))),
    // --- round 8: POINT type + distance() (VERDICT r7 item 3; the
    // reference documents Point unsupported,
    // cypher-cypher9-features.adoc:36-54)
    Scenario("r8 point construction, accessors and srid", empty,
      "WITH point({x: 1.5, y: -2.0}) AS c, " +
        "point({latitude: 52.5, longitude: 13.4}) AS g " +
        "RETURN toString(c) AS s, c.crs AS ccrs, c.srid AS csrid, " +
        "g.latitude AS lat, g.longitude AS lon, g.x AS gx, g.y AS gy, " +
        "g.srid AS gsrid",
      Seq(row("s" -> "point({x: 1.5, y: -2.0, crs: 'cartesian'})",
        "ccrs" -> "cartesian", "csrid" -> 7203L, "lat" -> 52.5,
        "lon" -> 13.4, "gx" -> 13.4, "gy" -> 52.5, "gsrid" -> 4326L))),
    Scenario("r8 point equality is component-wise, ordering-null", empty,
      "RETURN point({x: 1, y: 2}) = point({x: 1.0, y: 2.0}) AS eq, " +
        "point({x: 1, y: 2}) = point({x: 2, y: 1}) AS ne, " +
        "point({x: 1, y: 2}) = point({latitude: 2, longitude: 1}) AS crs, " +
        "point({x: 1, y: 2}) < point({x: 2, y: 3}) AS lt",
      Seq(row("eq" -> true, "ne" -> false, "crs" -> false, "lt" -> null))),
    Scenario("r8 point DISTINCT and grouping", empty,
      "UNWIND [point({x: 2, y: 1}), point({x: 1, y: 9}), " +
        "point({x: 1, y: 9})] AS p " +
        "RETURN count(DISTINCT p) AS c",
      Seq(row("c" -> 2L))),
    Scenario("r8 distance euclidean and haversine", empty,
      "RETURN distance(point({x: 3.0, y: 4.0}), " +
        "point({x: 0.0, y: 0.0})) AS dc, " +
        // 1 degree of longitude at the equator on Neo4j's earth radius
        // (6378140 m): R * pi / 180 ≈ 111320 m
        "round(distance(point({latitude: 0, longitude: 0}), " +
        "point({latitude: 0, longitude: 1}))) AS dg",
      Seq(row("dc" -> 5.0, "dg" -> 111320.0))),
    Scenario("r8 distance crs mismatch and null operands are null",
      "CREATE (:P {uid: 0})",
      "MATCH (n:P) RETURN distance(point({x: 1, y: 2}), " +
        "point({latitude: 2, longitude: 1})) IS NULL AS mm, " +
        "distance(point({x: n.nope, y: 0}), point({x: 0, y: 0})) " +
        "IS NULL AS nn, point(null) IS NULL AS pn",
      Seq(row("mm" -> true, "nn" -> true, "pn" -> true))),
    Scenario("r8 WHERE distance filters matched rows",
      """CREATE (:P {uid: 0, x: 0.3, y: 0.4})
        |CREATE (:P {uid: 1, x: 30.0, y: 40.0})
        |""".stripMargin,
      "MATCH (n:P) WITH n, point({x: n.x, y: n.y}) AS p " +
        "WHERE distance(p, point({x: 0.0, y: 0.0})) < 1.0 " +
        "RETURN n.uid AS u",
      Seq(row("u" -> 0L))),
    Scenario("r8 latitude on a cartesian point raises", empty,
      "RETURN point({x: 1, y: 2}).latitude AS l",
      Nil, expectError = Some("not available on a cartesian point")),
    Scenario("r8 out-of-range latitude raises", empty,
      "RETURN point({latitude: 99, longitude: 0}) AS p",
      Nil, expectError = Some("latitude must be in")),
    Scenario("r8 3D points are a typed error", empty,
      "RETURN point({x: 1, y: 2, z: 3}) AS p",
      Nil, expectError = Some("3D points are not supported")),
    // --- round 8: parser inner-validation errors carry a position
    // (VERDICT r7 item 7: the checked() wrapper routes the literal
    // validators' throws into positioned parse Errors — these lock the
    // line/col rendering for each validator shape)
    Scenario("r8 bad unicode escape error is positioned", empty,
      "RETURN '\\uHHHH' AS x",
      Nil, expectError = Some("line 1, col")),
    Scenario("r8 \\U out-of-range escape error is positioned", empty,
      "RETURN '\\U00110000' AS x",
      Nil, expectError = Some("line 1, col")),
    Scenario("r8 float overflow error is positioned", empty,
      "RETURN 1.34E999 AS x",
      Nil, expectError = Some("line 1, col")),
    Scenario("r8 integer overflow error is positioned on its line", empty,
      "RETURN 1 AS x\nUNION ALL RETURN 99999999999999999999999999 AS x",
      Nil, expectError = Some("line 2, col")),
    // --- round 8b: corner locks from R8Probe4Main (java.time-verified)
    Scenario("r8 half-hour DST zone arithmetic (Lord Howe)", empty,
      // Lord Howe shifts 30 minutes: +11:00 -> +10:30 at the 2024-04-07
      // overlap; one elapsed hour from 01:30+11:00 lands on 02:00+10:30
      "RETURN toString(" +
        "datetime('2024-04-07T01:30+11:00[Australia/Lord_Howe]') + " +
        "duration({hours: 1})) AS s",
      Seq(row("s" -> "2024-04-07T02:00+10:30[Australia/Lord_Howe]"))),
    Scenario("r8 month-end clamp in zdt month arithmetic", empty,
      "RETURN toString(datetime('2024-01-31T12:00Z') + " +
        "duration({months: 1})) AS s",
      Seq(row("s" -> "2024-02-29T12:00Z"))),
    Scenario("r8 zdt minus a mixed-component duration", empty,
      "RETURN toString(datetime('2024-03-15T12:00+01:00[Europe/Berlin]') " +
        "- duration({months: 1, days: 2, hours: 3})) AS s",
      Seq(row("s" -> "2024-02-13T09:00+01:00[Europe/Berlin]"))),
    Scenario("r8 zdt fractional-second arithmetic renders 3-digit groups",
      empty,
      "RETURN toString(datetime('2024-01-01T00:00Z') + " +
        "duration({seconds: 1.5})) AS s",
      Seq(row("s" -> "2024-01-01T00:00:01.500Z"))),
    Scenario("r8 duration.between component accessors over zdts", empty,
      "WITH duration.between(datetime('2024-01-15T06:00Z'), " +
        "datetime('2024-03-20T08:30:10Z')) AS d " +
        "RETURN d.months AS m, d.days AS dd, d.minutes AS mi, " +
        "d.seconds AS s",
      Seq(row("m" -> 2L, "dd" -> 5L, "mi" -> 150L, "s" -> 9010L))),
    Scenario("r8 duration.inMonths and inDays over zoned operands", empty,
      "WITH datetime('2024-01-15T06:00+01:00[Europe/Berlin]') AS a, " +
        "datetime('2024-03-20T08:30Z') AS b " +
        "RETURN toString(duration.inMonths(a, b)) AS m, " +
        "toString(duration.inDays(a, b)) AS d",
      Seq(row("m" -> "P2M", "d" -> "P65D"))),
    Scenario("r8 column-parsed datetime keeps its bracket zone",
      "CREATE (:D {zb: '2024-06-01T12:00+02:00[Europe/Berlin]'})",
      "MATCH (n:D) RETURN toString(datetime(n.zb)) AS s, " +
        "datetime(n.zb).timezone AS tz",
      Seq(row("s" -> "2024-06-01T12:00+02:00[Europe/Berlin]",
        "tz" -> "Europe/Berlin"))),
    Scenario("r8 column-parsed year-month and bare-year dates",
      "CREATE (:D {ym: '2024-06', yo: '2024', ct: '0930'})",
      "MATCH (n:D) RETURN toString(date(n.ym)) AS ym, " +
        "toString(date(n.yo)) AS yo, toString(localtime(n.ct)) AS t",
      Seq(row("ym" -> "2024-06-01", "yo" -> "2024-01-01",
        "t" -> "09:30:00"))),
    Scenario("r8 column-parsed fractional-second duration",
      "CREATE (:D {dur: 'PT1.5S'})",
      "MATCH (n:D) RETURN toString(duration(n.dur)) AS s, " +
        "duration(n.dur).milliseconds AS ms",
      Seq(row("s" -> "PT1.5S", "ms" -> 1500L))),
    Scenario("r8 point membership in a list", empty,
      "RETURN point({x: 1, y: 2}) IN [point({x: 3, y: 4}), " +
        "point({x: 1.0, y: 2.0})] AS a, " +
        "point({x: 9, y: 9}) IN [point({x: 1, y: 2})] AS b",
      Seq(row("a" -> true, "b" -> false))),
    Scenario("r8 points collect and unwind", empty,
      "UNWIND [1, 2] AS i WITH point({x: i, y: 0}) AS p " +
        "WITH collect(p) AS ps UNWIND ps AS q RETURN q.x AS x ORDER BY x",
      Seq(row("x" -> 1.0), row("x" -> 2.0)), ordered = true),
    Scenario("r8 point through CASE and coalesce", empty,
      "RETURN coalesce(null, point({x: 1, y: 2})).x AS x, " +
        "CASE WHEN true THEN point({x: 5, y: 6}) " +
        "ELSE point({x: 0, y: 0}) END.y AS y",
      Seq(row("x" -> 1.0, "y" -> 6.0))),
    Scenario("r8 distance is symmetric and zero on equal points", empty,
      "WITH point({latitude: 10, longitude: 20}) AS a, " +
        "point({latitude: -5, longitude: 30}) AS b " +
        "RETURN distance(a, b) = distance(b, a) AS sym, " +
        "distance(a, a) AS zero",
      Seq(row("sym" -> true, "zero" -> 0.0))),
    Scenario("r8 srid key selects the geographic crs", empty,
      "RETURN point({x: 1, y: 2, srid: 4326}).latitude AS lat",
      Seq(row("lat" -> 2.0))),
    Scenario("r8 unknown point accessor is a typed error", empty,
      "RETURN point({x: 1, y: 2}).nope AS z",
      Nil, expectError = Some("unknown point accessor")),
    Scenario("r8 min/max over column-parsed dates", empty,
      "UNWIND ['2024-03-05', '2015-W30-2', '20240229'] AS s " +
        "RETURN toString(min(date(s))) AS lo, toString(max(date(s))) AS hi",
      Seq(row("lo" -> "2015-07-21", "hi" -> "2024-03-05"))),
    Scenario("r8 WHERE over column-parsed datetimes filters by instant",
      empty,
      "UNWIND ['2024-01-01T00:00Z', '2024-06-01T00:00Z'] AS s " +
        "WITH datetime(s) AS d WHERE d > datetime('2024-03-01T00:00Z') " +
        "RETURN count(*) AS c",
      Seq(row("c" -> 1L))),
    // --- round 8: hunt 112827 — constructed fresh ids must agree
    // across every derived table (the copy-node table and the NEW-rel
    // table previously re-evaluated monotonically_increasing_id in
    // separate jobs; after a var-length driving match their row orders
    // diverged and the constructed rels dangled)
    Scenario("r8 construct fresh ids are stable across derived tables",
      """CREATE (v4:A:B {f: 0.5, uid: 4})
        |CREATE (v0:A {uid: 0})
        |CREATE (v2:A {uid: 2})
        |CREATE (v1:A {uid: 1})
        |CREATE (v4)-[:S {uid: 1002}]->(v4)
        |CREATE (v4)-[:S {uid: 1006}]->(v2)
        |CREATE (v4)-[:S {uid: 1008}]->(v0)
        |CREATE (v4)-[:S {uid: 1010}]->(v1)
        |""".stripMargin,
      // 3 two-hop S paths from v4 → 3 copies, each with one incoming Y
      // edge from the v4 clone (:B); the direct match, the WHERE-EXISTS
      // route and a projection EXISTS must all see the same 3 rels
      "MATCH (n0:A)-[:S*2..2]->(n2) " +
        "CONSTRUCT CLONE n0 NEW (cp0 COPY OF n0) NEW (n0)-[:Y]->(cp0) " +
        "MATCH (m) WITH m, EXISTS { MATCH (m)<-[]-(q:B) } AS pe " +
        "OPTIONAL MATCH (m)<-[r]-() " +
        "RETURN pe, count(r) AS inc, count(*) AS n ORDER BY pe",
      Seq(row("pe" -> false, "inc" -> 0L, "n" -> 1L),
        row("pe" -> true, "inc" -> 3L, "n" -> 3L)), ordered = true),
    Scenario("r8 already-mixed inner list promotes its siblings", empty,
      // ADVICE r7: [[1, 'a'], [2]] — a mixed inner literal next to a
      // single-family sibling must land on the tagged encoding, not
      // Spark's raw DATA_DIFF_TYPES failure
      "WITH [[1, 'a'], [2]] AS l " +
        "RETURN l[0][1] = 'a' AS a, l[1][0] = 2 AS b, size(l) AS n, " +
        "[[2], [1, 'a']][1][0] = 1 AS c",
      Seq(row("a" -> true, "b" -> true, "n" -> 2L, "c" -> true))),
    Scenario("r8 anonymous COPY OF via the CREATE synonym",
      "CREATE (:A {uid: 1})-[:T]->(:A {uid: 2})",
      // CatalogDDLTests row 424 form: CREATE (COPY OF m) with no alias —
      // one per-row copy carrying labels + props
      "MATCH (n:A)-[:T]->(m:A) CONSTRUCT CLONE n CREATE (COPY OF m) " +
        "MATCH (x:A) RETURN x.uid AS u ORDER BY u",
      Seq(row("u" -> 1L), row("u" -> 2L)), ordered = true),
    // --- round 8: MultipleGraphTests-mined construct shapes ---
    Scenario("r8 two copies of one node joined by a NEW rel",
      "CREATE (:N {uid: 1})",
      // reference "creates multiple copies of the same node"
      "MATCH (a:N) CONSTRUCT CREATE (f COPY OF a)-[:FOO]->(g COPY OF a) " +
        "MATCH (s)-[:FOO]->(t) " +
        "RETURN s.uid AS su, t.uid AS tu, s = t AS same",
      Seq(row("su" -> 1L, "tu" -> 1L, "same" -> false))),
    Scenario("r8 rel copy with a type override and prop overlay",
      """CREATE ()-[:FOO {val: 1, val2: 2}]->()
        |CREATE ()-[:BAR {val: 1, val2: 3}]->()
        |""".stripMargin,
      // reference "should copy a mean relationship": restated type
      // OVERRIDES, the prop map overlays (val2 2/3 → 'Donald'), val
      // copies through
      "MATCH ()-[s]->() CONSTRUCT " +
        "CREATE ()-[t COPY OF s :BAZ {val2: 'Donald'}]->() " +
        "MATCH ()-[r]->() RETURN r.val AS v, r.val2 AS v2, type(r) AS tp",
      Seq(row("v" -> 1L, "v2" -> "Donald", "tp" -> "BAZ"),
        row("v" -> 1L, "v2" -> "Donald", "tp" -> "BAZ"))),
    Scenario("r8 SET label on a NEW node", empty,
      // reference "should set a node label"
      "CONSTRUCT CREATE (a) SET a: FOO MATCH (n) " +
        "RETURN labels(n) AS ls",
      Seq(row("ls" -> Seq("FOO")))),
    Scenario("r8 SET label merges into a clone's labels",
      "CREATE (:N {uid: 1})",
      "MATCH (a:N) CONSTRUCT CLONE a AS b SET b: Extra, b.k = 7 " +
        "MATCH (n:Extra) RETURN labels(n) AS ls, n.k AS k, n.uid AS u",
      Seq(row("ls" -> Seq("Extra", "N"), "k" -> 7L, "u" -> 1L))),
    Scenario("r8 SET label on a relationship is a typed error",
      "CREATE (:N)-[:T]->(:N)",
      "MATCH (:N)-[r:T]->(:N) CONSTRUCT CLONE r SET r: Nope RETURN GRAPH",
      Nil, expectError = Some("labels can only be set on nodes")),
    Scenario("r8 fixture-stored point properties",
      """CREATE (:P {uid: 0, loc: point({x: 3.0, y: 4.0})})
        |CREATE (:P {uid: 1, loc: point({latitude: 0.0, longitude: 1.0})})
        |""".stripMargin,
      "MATCH (n:P) RETURN n.uid AS u, n.loc.crs AS crs, " +
        "round(distance(n.loc, point({x: 0.0, y: 0.0, " +
        "crs: 'cartesian'}))) AS dc ORDER BY u",
      // the wgs-84 row's distance vs a cartesian point is null (crs
      // mismatch) — only the cartesian row measures 5
      Seq(row("u" -> 0L, "crs" -> "cartesian", "dc" -> 5.0),
        row("u" -> 1L, "crs" -> "wgs-84", "dc" -> null)), ordered = true),
    Scenario("r8 datetime map constructor with a column timezone",
      """CREATE (:D {uid: 0, tz: 'Europe/Berlin'})
        |CREATE (:D {uid: 1, tz: '+05:00'})
        |CREATE (:D {uid: 2})
        |""".stripMargin,
      "MATCH (n:D) WITH n, datetime({year: 2024, month: 6, day: 1, " +
        "hour: 12, timezone: n.tz}) AS dt " +
        "RETURN n.uid AS u, toString(dt) AS s, dt.offsetSeconds AS off " +
        "ORDER BY u",
      Seq(row("u" -> 0L, "s" -> "2024-06-01T12:00+02:00[Europe/Berlin]",
        "off" -> 7200L),
        row("u" -> 1L, "s" -> "2024-06-01T12:00+05:00", "off" -> 18000L),
        row("u" -> 2L, "s" -> null, "off" -> null)), ordered = true),
    Scenario("r8 union mixing a point with another family is typed", empty,
      "RETURN point({x: 1, y: 2}) AS v UNION ALL RETURN 1.5 AS v",
      Nil, expectError = Some("mixes incompatible value types")),
    Scenario("r8 union of same-type points dedups component-wise", empty,
      "RETURN point({x: 1, y: 2}).x AS x UNION " +
        "RETURN point({x: 1.0, y: 2.0}).x AS x",
      Seq(row("x" -> 1.0))),
    // --- round 8: duration.between sub-second precision + same-sign
    // components (truncate toward zero, java.time/Neo4j)
    Scenario("r8 duration.between keeps sub-second precision", empty,
      "RETURN toString(duration.between(datetime('2024-01-01T00:00:00.5Z'), " +
        "datetime('2024-01-01T00:00:01.75Z'))) AS d, " +
        "toString(duration.inSeconds(datetime('2024-01-01T00:00:00.5Z'), " +
        "datetime('2024-01-01T00:00:01.75Z'))) AS s",
      Seq(row("d" -> "PT1.25S", "s" -> "PT1.25S"))),
    Scenario("r8 negative duration.between components share the sign",
      empty,
      "RETURN toString(duration.between(datetime('2024-01-01T00:00:01.75Z'), " +
        "datetime('2024-01-01T00:00:00.5Z'))) AS a, " +
        "toString(duration.between(localdatetime('2024-03-15T12:00'), " +
        "localdatetime('2024-01-10T06:30'))) AS b, " +
        "toString(duration.inDays(date('2024-03-05'), date('2024-01-01'))) AS c",
      Seq(row("a" -> "PT-1.25S", "b" -> "P-2M-5DT-5H-30M",
        "c" -> "P-64D"))),
    Scenario("r8 subtracting temporal instants is a typed error", empty,
      // Neo4j: instants cannot be subtracted; previously date - date
      // silently produced a Spark interval while zoned types crashed
      // analysis with a raw DATATYPE_MISMATCH
      "RETURN date('2024-01-05') - date('2024-01-01') AS d",
      Nil, expectError = Some("cannot be subtracted")),
    Scenario("r8 adding temporal instants is a typed error", empty,
      "RETURN datetime('2024-01-02T00:00Z') + " +
        "datetime('2024-01-01T00:00Z') AS d",
      Nil, expectError = Some("cannot be added")),
    Scenario("r8 point arithmetic is a typed error", empty,
      "RETURN point({x: 1, y: 2}) + point({x: 1, y: 2}) AS d",
      Nil, expectError = Some("points do not support arithmetic")))

  private val blacklist: Map[String, String] = {
    val in = getClass.getResourceAsStream("/tck_blacklist.txt")
    if (in == null) Map.empty
    else scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val parts = l.split("\\|", 2)
        parts(0).trim -> (if (parts.length > 1) parts(1).trim else "no reason given")
      }.toMap
  }

  /** Round 9 (VERDICT item 2): the last two unmined reference acceptance
    * suites, ported case-for-case — NullTests.scala (83 cases) and
    * FunctionTests.scala (≈110 engine-relevant cases; id-encoding and
    * "point is unimplemented" negatives excluded). The case tables live
    * in R9Probe4Main (the probe that found the round's five real
    * divergences: null:FOO, range(null,…), degrees fp order, map-key
    * insertion order, null-valued map entries in keys()). Two KEPT
    * divergences are locked at openCypher/Neo4j behavior instead and
    * documented in README: sum(all-null) = 0 and tail([]) = []. */
  private def r9RefSuites: Seq[Scenario] = {
    val nullCalls = R9Probe4Main.nullToNull.map(c =>
      Scenario(s"r9 NullTests: $c", empty, s"RETURN $c AS res",
        Seq(row("res" -> null))))
    val valueCalls = R9Probe4Main.nullToValue.map { case (c, e) =>
      Scenario(s"r9 NullTests value: $c", empty, s"RETURN $c AS res",
        Seq(row("res" -> e)))
    }
    val fns = R9Probe4Main.fnCases.map { case (c, e) =>
      Scenario(s"r9 FunctionTests: $c", empty, s"RETURN $c AS res",
        Seq(row("res" -> e)))
    }
    val queries = R9Probe4Main.queryCases
      .filterNot(_._1 == "keys literal map").map { case (n, f, q, exp) =>
        val outCol = if (q.contains("AS trimmed")) "trimmed" else "res"
        Scenario(s"r9 FunctionTests: $n", f, q, exp.map(v => row(outCol -> v)))
      }
    val keysTwoCols = Scenario("r9 FunctionTests: keys literal map", empty,
      "WITH {person: {name: 'Anne', age: 25}} AS p " +
        "RETURN keys(p) AS k1, keys(p['person']) AS k2",
      Seq(row("k1" -> List("person"), "k2" -> List("name", "age"))))
    nullCalls ++ valueCalls ++ fns ++ queries ++ Seq(keysTwoCols) ++ r9Locks
  }

  /** Round-9 engine locks: deterministic fresh-id semantics through
    * consecutive constructs (cross-construct id disjointness without the
    * r8 materialization barrier) and duplicate-row NEW multiplicity. */
  private def r9Locks: Seq[Scenario] = Seq(
    Scenario("r9 consecutive constructs mint disjoint fresh ids",
      "CREATE (:N {uid: 1})-[:T]->(:N {uid: 2})",
      // construct 1 copies each matched node once (2 copies + 2 clones);
      // construct 2 copies EVERY node of graph 1 (4 copies + 4 clones).
      // A cross-construct id collision would dedupe nodes and shrink the
      // final count below 8.
      "MATCH (a:N)-[:T]->(b:N) CONSTRUCT CLONE a, b " +
        "CREATE (COPY OF a) CREATE (COPY OF b) " +
        "MATCH (m) CONSTRUCT CLONE m CREATE (COPY OF m) " +
        "MATCH (x) RETURN count(*) AS n, count(DISTINCT x) AS d",
      Seq(row("n" -> 8L, "d" -> 8L))),
    Scenario("r9 duplicate driving rows create one NEW element per row",
      empty,
      "UNWIND [1, 1, 1] AS x CONSTRUCT CREATE (:M)-[:R]->(:K) " +
        "MATCH (a:M)-[:R]->(b:K) " +
        "RETURN count(*) AS pairs, count(DISTINCT a) AS da, " +
        "count(DISTINCT b) AS db",
      Seq(row("pairs" -> 3L, "da" -> 3L, "db" -> 3L))),
    Scenario("r9 construct over a var-length match keeps tables aligned",
      """CREATE (a:V {uid: 1})-[:E]->(b:V {uid: 2})-[:E]->(c:V {uid: 3})
        |""".stripMargin,
      // two 2-hop paths start/end pairs? one: a->b->c. COPY the far end,
      // NEW edge from the start clone to the copy; the rel table and the
      // copy table must agree on the copy's id (hunt-112827 shape, now
      // barrier-free)
      "MATCH (s:V)-[:E*2..2]->(t:V) CONSTRUCT CLONE s " +
        "CREATE (cp COPY OF t) CREATE (s)-[:LINK]->(cp) " +
        "MATCH (x)-[:LINK]->(y) RETURN x.uid AS xu, y.uid AS yu",
      Seq(row("xu" -> 1L, "yu" -> 3L))))

  test("scenario corpus is large enough to be meaningful") {
    val all = scenarios ++ probeBatch16 ++ probeBatch33 ++ probeBatch34 ++
      probeBatch37 ++ probeBatch38 ++ probeBatch39 ++ probeBatch40 ++ diffBatch5 ++ diffBatch6 ++
      r7Examples ++ r7Locks ++ r8Locks ++ r9RefSuites
    assert(all.size >= 100, s"only ${all.size} scenarios")
    val dupes = all.groupBy(_.name).filter(_._2.size > 1).keys
    assert(dupes.isEmpty, s"duplicate scenario names: $dupes")
    val staleBlacklist = blacklist.keySet -- all.map(_.name).toSet
    assert(staleBlacklist.isEmpty,
      s"blacklist names not in the corpus: $staleBlacklist")
  }

  (scenarios ++ probeBatch16 ++ probeBatch33 ++ probeBatch34 ++
    probeBatch37 ++ probeBatch38 ++ probeBatch39 ++ probeBatch40 ++ diffBatch5 ++ diffBatch6 ++
    r7Examples ++ r7Locks ++ r8Locks ++ r9RefSuites).foreach { sc =>
    blacklist.get(sc.name) match {
      case Some(reason) =>
        ignore(s"[tck] ${sc.name} (blacklisted: $reason)") { check(sc) }
      case None =>
        test(s"[tck] ${sc.name}") { check(sc) }
    }
  }
}
