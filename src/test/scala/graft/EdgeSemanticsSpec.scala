package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.api.GraftSession

/** openCypher edge-semantics batch: ternary-logic corners (IN with nulls,
  * VOID-typed predicates), literal forms (hex 0x / octal 0o / exponent),
  * null ordering (ASC last, DESC first), aggregate null-skipping,
  * list/slice bounds, and `+` overloads. Complements TckStyleSpec's
  * scenario corpus with direct-assertion probes.
  */
class EdgeSemanticsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val gs = GraftSession(spark)
  lazy val g = gs.createGraphFromCypher(
    """CREATE (:X {k: 1, s: 'a'})
      |CREATE (:X {k: 2})
      |CREATE (:X {s: 'b'})""".stripMargin)

  private def rows(q: String): Seq[Map[String, Any]] = {
    val df = gs.cypher(g, q)
    df.collect().toSeq.map(r => df.columns.zipWithIndex.map { case (c, i) =>
      c -> (r.get(i) match {
        case s: scala.collection.Seq[_] => s.toList
        case x => x
      })
    }.toMap)
  }
  private def one(q: String): Any = rows(q).head.values.head

  test("collect skips nulls")(
    assert(one("MATCH (n:X) RETURN collect(n.k) AS ks") match {
      case l: List[_] => l.toSet == Set(1L, 2L)
      case _ => false
    }))
  test("collect of all-null is empty list")(
    assert(one("MATCH (n:X) WHERE n.k IS NULL RETURN collect(n.k) AS ks") ==
      List()))
  test("hex literal")(assert(one("RETURN 0x10 AS x") == 16L))
  test("octal literal")(assert(one("RETURN 0o17 AS x") == 15L))
  test("exponent literal")(assert(one("RETURN 1e3 AS x") == 1000.0))
  test("negative exponent literal")(assert(one("RETURN 1.5e-1 AS x") == 0.15))
  test("chained comparison is conjunction")(
    assert(one("RETURN (1 < 2) = true AS x") == true))
  test("ltrim/rtrim")(
    assert(one("RETURN ltrim(rtrim('  x  ')) AS x") == "x"))
  test("range negative step")(
    assert(one("RETURN range(5, 1, -2) AS r") == List(5L, 3L, 1L)))
  test("range empty when start past end")(
    assert(one("RETURN range(0, -1) AS r") == List()))
  test("IN null element found")(assert(one("RETURN 1 IN [null, 1] AS x") == true))
  test("IN null element not found is null")(
    assert(one("RETURN 2 IN [null, 1] AS x") == null))
  test("IN null lhs is null")(assert(one("RETURN null IN [1] AS x") == null))
  test("IN empty list with null lhs is false")(
    assert(one("RETURN null IN [] AS x") == false))
  test("order by desc puts nulls first") {
    val vs = rows("MATCH (n:X) RETURN n.k AS k ORDER BY n.k DESC").map(_("k"))
    assert(vs == Seq(null, 2L, 1L))
  }
  test("order by asc puts nulls last") {
    val vs = rows("MATCH (n:X) RETURN n.k AS k ORDER BY n.k ASC").map(_("k"))
    assert(vs == Seq(1L, 2L, null))
  }
  test("min over strings")(
    assert(one("UNWIND ['b','a','c'] AS s RETURN min(s) AS m") == "a"))
  test("sum over no rows is 0")(
    assert(one("MATCH (n:X) WHERE false RETURN sum(n.k) AS s") == 0L))
  test("avg skips nulls")(
    assert(one("MATCH (n:X) RETURN avg(n.k) AS a") == 1.5))
  test("count property skips nulls")(
    assert(one("MATCH (n:X) RETURN count(n.k) AS c") == 2L))
  test("mod negative dividend")(assert(one("RETURN -7 % 3 AS x") == -1L))
  test("power is float")(assert(one("RETURN 2 ^ 3 AS x") == 8.0))
  test("toInteger of float string is null")(
    assert(one("RETURN toInteger('4.2x') AS x") == null))
  test("toInteger of float truncates")(
    assert(one("RETURN toInteger(4.9) AS x") == 4L))
  test("toBoolean")(assert(one("RETURN toBoolean('true') AS x") == true))
  test("string comparison")(assert(one("RETURN 'a' < 'b' AS x") == true))
  test("mixed type comparison is null")(
    assert(one("RETURN 1 < 'a' AS x") == null))
  test("null arithmetic propagates")(
    assert(one("RETURN null + 1 AS x") == null))
  test("list index out of bounds is null")(
    assert(one("RETURN [1,2][5] AS x") == null))
  test("negative list index from end")(
    assert(one("RETURN [1,2,3][-1] AS x") == 3L))
  test("slice beyond bounds clamps")(
    assert(one("RETURN [1,2,3][1..10] AS x") == List(2L, 3L)))
  test("list concat with plus")(
    assert(one("RETURN [1] + [2,3] AS x") == List(1L, 2L, 3L)))
  test("element append with plus")(
    assert(one("RETURN [1] + 2 AS x") == List(1L, 2L)))
  test("WHERE null filters all")(
    assert(rows("MATCH (n:X) WHERE n.missing RETURN n.k AS k").isEmpty))
  test("union distinct dedups")(
    assert(rows("RETURN 1 AS x UNION RETURN 1 AS x").size == 1))
  test("reverse list")(
    assert(one("RETURN reverse([1,2,3]) AS x") == List(3L, 2L, 1L)))
  test("reverse string")(assert(one("RETURN reverse('abc') AS x") == "cba"))
  test("null equals null is null")(assert(one("RETURN null = null AS x") == null))
  test("distinct keeps one null") {
    assert(rows("MATCH (n:X) RETURN DISTINCT n.k AS k").map(_("k")).toSet ==
      Set(1L, 2L, null))
  }
}
