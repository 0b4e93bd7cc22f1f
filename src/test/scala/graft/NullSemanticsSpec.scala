package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.api.GraftSession
import graft.graph.{NodeTable, PropertyGraph, RelTable}

/** Cypher ternary-logic and edge-case semantics (SURVEY §7.4 item 2 —
  * "null semantics everywhere"): Spark's null-propagating comparisons and
  * WHERE-drops-null line up with Cypher's, these tests pin that down.
  */
class NullSemanticsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val gs = GraftSession(spark)

  lazy val g: PropertyGraph = {
    val s = spark
    import s.implicits._
    val people = Seq[(Long, Option[String], Option[Long])](
      (1L, Some("Ann"), Some(30L)), (2L, Some("Ben"), None),
      (3L, None, Some(40L)))
      .toDF("id", "name", "age")
    val knows = Seq((10L, 1L, 2L)).toDF("rid", "src", "dst")
    new PropertyGraph(
      Seq(NodeTable(Set("Person"), people, "id",
        Map("name" -> "name", "age" -> "age"))),
      Seq(RelTable("KNOWS", knows, "rid", "src", "dst", Map.empty)), spark)
  }

  private def one(q: String) = gs.cypher(g, q).head()

  test("null comparisons are null and WHERE drops them") {
    assert(gs.cypher(g,
      "MATCH (p:Person) WHERE p.age > 0 RETURN id(p) AS i ORDER BY i")
      .collect().map(_.getLong(0)).toSeq === Seq(1L, 3L))
    // equality with null never matches
    assert(gs.cypher(g,
      "MATCH (p:Person) WHERE p.name = p.name RETURN id(p) AS i")
      .count() === 2) // row with null name drops
  }

  test("IS NULL / IS NOT NULL / coalesce") {
    assert(one("MATCH (p:Person) WHERE p.name IS NULL RETURN id(p) AS i")
      .getLong(0) === 3L)
    assert(gs.cypher(g,
      "MATCH (p:Person) RETURN coalesce(p.name, 'unknown') AS n ORDER BY n")
      .collect().map(_.getString(0)).toSeq === Seq("Ann", "Ben", "unknown"))
  }

  test("aggregates skip nulls; count(*) does not") {
    val r = one(
      """MATCH (p:Person)
        |RETURN count(*) AS all, count(p.age) AS ages, sum(p.age) AS total""".stripMargin)
    assert(r.getLong(0) === 3L && r.getLong(1) === 2L && r.getLong(2) === 70L)
  }

  test("OPTIONAL MATCH yields nulls for missing, aggregable") {
    val rows = gs.cypher(g,
      """MATCH (p:Person) OPTIONAL MATCH (p)-[:KNOWS]->(q:Person)
        |RETURN id(p) AS i, q.name AS qn ORDER BY i""".stripMargin).collect()
    assert(rows.map(r => (r.getLong(0), Option(r.getString(1)))).toSeq ===
      Seq((1L, Some("Ben")), (2L, None), (3L, None)))
  }

  test("arithmetic propagates null; integer division truncates toward zero") {
    val r = one(
      """RETURN 7 / 2 AS a, -7 / 2 AS b, 7.0 / 2 AS c,
        |       null + 1 AS d, 1 + null AS e""".stripMargin)
    assert(r.getLong(0) === 3L && r.getLong(1) === -3L)
    assert(r.getDouble(2) === 3.5)
    assert(r.isNullAt(3) && r.isNullAt(4))
  }

  test("integer division is exact beyond 2^53 and errors on zero divisor") {
    // 2^62 + 1 is not representable in a double; the old double round-trip
    // returned an off-by-one quotient here
    val big = (1L << 62) + 1L
    val r = one(s"RETURN $big / 3 AS q, $big / 1 AS idq")
    assert(r.getLong(0) === big / 3)
    assert(r.getLong(1) === big)
    // Cypher: integer division by zero is a runtime error ("/ by zero");
    // Spark 4's ANSI mode raises the same way
    intercept[Exception] { one("RETURN 5 / 0 AS dz") }
  }

  test("a raising list-literal element raises even when not selected") {
    // Cypher evaluates the whole list literal before indexing: the static
    // fast path (which compiles only the selected element) must not
    // swallow a sibling's runtime error, at any index position
    intercept[Exception] { one("RETURN [1/0, 2][1] AS x") }
    intercept[Exception] { one("RETURN [1, 1/0][0] AS x") }
    intercept[Exception] { one("RETURN [1/0, 2][7] AS x") } // OOB still evaluates
    intercept[Exception] { one("RETURN head([1, 1/0]) AS x") }
    intercept[Exception] { one("RETURN last([1/0, 2]) AS x") }
    // side-effect-free lists keep the static element selection: values
    // unchanged, out-of-bounds null
    val r = one("RETURN [1, 2][1] AS a, ['a', 'b'][-1] AS b, [1, 2][9] AS c")
    assert(r.getLong(0) === 2L && r.getString(1) === "b" && r.isNullAt(2))
    // mixed-family list with a raising sibling: forced path returns the
    // tagged value for the selected element
    val m = one("RETURN ([1, 'x'][1/1]) AS x")
    assert(m.get(0) != null)
  }

  test("boolean ternary logic: null AND false = false, null OR true = true") {
    val r = one(
      """RETURN (null AND false) AS a, (null OR true) AS b,
        |       (null AND true) AS c, (NOT null) AS d""".stripMargin)
    assert(!r.getBoolean(0))
    assert(r.getBoolean(1))
    assert(r.isNullAt(2) && r.isNullAt(3))
  }

  test("substring/size edges") {
    val r = one(
      """RETURN substring('hello', 3) AS tail3, substring('hi', 0, 10) AS all2,
        |       size([]) AS empty, head([]) AS hempty""".stripMargin)
    assert(r.getString(0) === "lo")
    assert(r.getString(1) === "hi")
    assert(r.getLong(2) === 0L)
    assert(r.isNullAt(3))
  }
}
