package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.api.GraftSession

/** Locks behaviors at the boundary between strict openCypher ternary
  * logic and the reference's Spark lowering, and documents each choice:
  *
  *  - list equality is element-wise TERNARY (round 3): [1,null]=[1,null]
  *    is null, a definite element mismatch is false, length mismatch is
  *    false. This follows openCypher/Neo4j; the reference's backends map
  *    Equals to Column.=== unconditionally (SparkSQLExprMapper.scala:122)
  *    and would answer true — a documented reference DIVERGENCE from its
  *    own TCK, which we deliberately do not reproduce.
  *  - `x + [list]` / `[list] + x` with a null scalar operand propagates
  *    null (Cypher 3VL); the reference wraps the null as an element
  *    (concat(array(lhs), rhs), SparkSQLExprMapper.scala:181-182).
  *    Non-null scalars wrap as elements exactly like the reference.
  *  - single()/none() count elements whose predicate is TRUE; a null
  *    predicate element is simply not counted (ArrayFilter drops it,
  *    SparkSQLExprMapper.scala:380-396). Strict ternary logic would
  *    return null when a null element could change the count.
  *    (any/all DO follow ternary nulls here — see EdgeSemanticsSpec.)
  *  - round() is Spark HALF_UP away from zero (round(-2.5) = -3.0);
  *    pre-5.0 Neo4j Math.round semantics would give -2.0.
  *  - string length/indexing counts Unicode CODEPOINTS (Spark
  *    UTF8String semantics): size('😀') = 1 where Neo4j's
  *    Java-String backend counts UTF-16 units (2), and substring
  *    positions index codepoints. Only astral-plane characters differ;
  *    codepoint counting is the arguably-correct reading and keeps the
  *    whole string stack codegen'd, so it stays. Locked below.
  *
  * Everything else in this spec is plain parity evidence on shapes the
  * probe batch exercised (simple-CASE null subject, toInteger on
  * decimal strings, signed modulo, string+number concat).
  */
class ReferenceParitySpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder().master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false").getOrCreate()
  lazy val gs = GraftSession(spark)
  lazy val g = gs.createGraphFromCypher("CREATE (:Z {k: 1})")
  private def one(q: String): Any = gs.cypher(g, q).collect().head.get(0)

  test("list equality is element-wise ternary (openCypher, not reference ===)") {
    assert(one("RETURN [1, null] = [1, null] AS x") == null)
    assert(one("RETURN [1, null] = [1, 2] AS x") == null)
    assert(one("RETURN [1] = [1, 2] AS x") == false)
    assert(one("RETURN [1, 2] = [null, 3] AS x") == false)
  }
  test("scalar + list wraps the scalar as an element (reference Add); null propagates") {
    assert(one("RETURN [1] + 2 AS x") == Seq(1L, 2L))
    assert(one("RETURN 0 + [1] AS x") == Seq(0L, 1L))
    assert(one("RETURN null + [1] AS x") == null)
    assert(one("RETURN [1] + [2, 3] AS x") == Seq(1L, 2L, 3L))
  }
  test("single() is strict-ternary (DIVERGES from reference filter-count)") {
    // the reference lowers single() to size(filter) === 1
    // (SparkSQLExprMapper.scala:392 ListSingle), silently dropping unknown
    // predicate outcomes; its all() size-compare drops them too — but our
    // all()/any() already follow openCypher 3VL (Spark forall/exists), so
    // single() follows the same rule: an unknown can tip the exactly-one
    // count either way unless two definite matches already falsify
    assert(one("RETURN single(x IN [true, null] WHERE x) AS s") == null)
    assert(one("RETURN single(x IN [true, true] WHERE x) AS s") == false)
    assert(one("RETURN single(x IN [false, null] WHERE x) AS s") == null)
    assert(one("RETURN single(x IN [true, true, null] WHERE x) AS s") == false)
    assert(one("RETURN single(x IN [true, false] WHERE x) AS s") == true)
    assert(one("RETURN single(x IN [] WHERE x) AS s") == false)
  }
  test("simple CASE with null subject falls through to ELSE (null = null is null)") {
    assert(one("RETURN CASE null WHEN null THEN 'y' ELSE 'n' END AS x") == "n")
  }
  test("round follows Spark HALF_UP away from zero") {
    assert(one("RETURN round(2.5) AS x") == 3.0)
    assert(one("RETURN round(-2.5) AS x") == -3.0)
    assert(one("RETURN round(2.4567, 2) AS x") == 2.46)
  }
  test("toInteger truncates decimal strings; junk is null") {
    assert(one("RETURN toInteger('4.9') AS x") == 4L)
    assert(one("RETURN toInteger('abc') AS x") == null)
    assert(one("RETURN toFloat('x') AS x") == null)
  }
  test("signed modulo follows the dividend (Java semantics)") {
    assert(one("RETURN -7 % 3 AS x") == -1L)
    assert(one("RETURN 7 % -3 AS x") == 1L)
    assert(one("RETURN 7.5 % 2 AS x") == 1.5)
  }
  test("string + number concatenates (both orders); null propagates") {
    assert(one("RETURN 'a' + 1 AS x") == "a1")
    assert(one("RETURN 1 + 'a' AS x") == "1a")
    assert(one("RETURN 'a' + null AS x") == null)
  }
  test("out-of-range substring/left are total, not errors") {
    assert(one("RETURN substring('abc', 5) AS x") == "")
    assert(one("RETURN left('ab', 5) AS x") == "ab")
  }
  test("negative list indices and open slices") {
    assert(one("RETURN [1,2,3][-1] AS x") == 3L)
    assert(one("RETURN [1,2,3][-2..] AS x") == Seq(2L, 3L))
    assert(one("RETURN [1,2,3][..-1] AS x") == Seq(1L, 2L))
  }
  test("range with step, descending, and single point") {
    assert(one("RETURN range(0, 10, 3) AS x") == Seq(0L, 3L, 6L, 9L))
    assert(one("RETURN range(3, 0, -1) AS x") == Seq(3L, 2L, 1L, 0L))
    assert(one("RETURN range(1, 1) AS x") == Seq(1L))
  }
  test("date + duration clamps to end of month") {
    assert(one("RETURN toString(date('2024-01-31') + duration({months: 1})) AS x")
      == "2024-02-29")
  }
  test("duration accessor months is the total month count") {
    assert(one(
      "RETURN duration.between(date('2024-01-01'), date('2025-03-01')).months AS m")
      == 14L)
  }
  test("absent duration groups read 0 instead of failing analysis") {
    // day-time durations carry no month group; Spark's date_part would
    // throw AnalysisException for YEAR/MONTH fields on them (ADVICE r2)
    assert(one("RETURN duration({days: 3}).months AS m") == 0L)
    assert(one("RETURN duration({days: 3}).years AS y") == 0L)
    assert(one("RETURN duration({hours: 5}).quarters AS q") == 0L)
    assert(one(
      "RETURN duration.inDays(date('2020-01-01'), date('2020-03-01')).monthsOfYear AS m")
      == 0L)
  }
  test("durations keep day and seconds groups separate (raw fields)") {
    // Spark date_part folds hours>=24 into the DAY digit; Neo4j keeps the
    // groups as constructed. ALL durations are CalendarIntervalType
    // storing the raw (months, days, micros) triple, so every
    // construction reads back its own groups.
    assert(one("RETURN duration({months: 1, hours: 26}).days AS d") == 0L)
    assert(one("RETURN duration({months: 1, hours: 26}).hours AS h") == 26L)
    assert(one("RETURN duration({months: 1, hours: 26}).minutes AS m") == 26L * 60)
    assert(one("RETURN duration({hours: 26}).days AS d") == 0L)
    assert(one("RETURN duration({hours: 26}).hours AS h") == 26L)
    assert(one("RETURN duration({days: 5, hours: 26}).days AS d") == 5L)
  }
  test("duration sum/avg aggregate component-wise; min/max reject") {
    assert(one(
      """UNWIND [duration({hours: 20}), duration({hours: 6})] AS d
        |RETURN sum(d).hours AS h""".stripMargin) == 26L)
    assert(one(
      """UNWIND [duration({months: 1, days: 2}), duration({days: 1})] AS d
        |RETURN sum(d).months AS m""".stripMargin) == 1L)
    assert(one(
      """UNWIND [duration({hours: 2}), duration({hours: 4})] AS d
        |RETURN avg(d).hours AS h""".stripMargin) == 3L)
    intercept[Exception](one(
      "UNWIND [duration({days: 1})] AS d RETURN min(d) AS x"))
  }
  test("calendar duration equality is component-wise: P1M != P30D-equivalents") {
    assert(one(
      "RETURN duration({months: 1, hours: 24}) = duration({months: 1, days: 1}) AS x")
      == false)
    assert(one(
      "RETURN duration({months: 13}) = duration({years: 1, months: 1}) AS x")
      == true)
  }
  test("durations are not orderable: </> between durations is null") {
    assert(one("RETURN duration({months: 1}) > duration({days: 40}) AS x") == null)
    assert(one("RETURN duration({days: 1}) < duration({days: 2}) AS x") == null)
  }
  test("=~ anchors with \\A..\\z: trailing newline is not forgiven") {
    assert(one("RETURN 'abc\n' =~ 'abc' AS x") == false)
    assert(one("RETURN 'abc' =~ 'abc' AS x") == true)
  }
  test("string length counts CODEPOINTS, not UTF-16 units (documented divergence)") {
    // 😀 is one codepoint = two UTF-16 units; Neo4j would answer 2 / 4
    assert(one("RETURN size('\\uD83D\\uDE00') AS n") == 1L)
    assert(one("RETURN size('a\\uD83D\\uDE00b\\uD83D\\uDE00') AS n") == 4L)
    // substring indexes codepoints: position 2 is the char AFTER the emoji
    assert(one("RETURN substring('a\\uD83D\\uDE00b', 2, 1) AS s") == "b")
  }
}
