package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.api.GraftSession

/** Scalar-function coverage batch, including IEEE float-division
  * semantics (Cypher: 1.0/0.0 = Infinity, 0.0/0.0 = NaN — Spark's ANSI
  * divide would raise) and nullIf/isNaN.
  */
class FnProbeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder().master("local[2]")
    .config("spark.ui.enabled", "false").getOrCreate()
  lazy val gs = GraftSession(spark)
  lazy val g = gs.createGraphFromCypher("CREATE (:F {k: 1})")
  private def one(q: String): Any = gs.cypher(g, q).collect().head.get(0)

  test("exists on property")(
    assert(one("MATCH (n:F) WHERE exists(n.k) RETURN count(*)") == 1L))
  test("numeric functions") {
    assert(one("RETURN toFloat('2.5')") == 2.5)
    assert(one("RETURN abs(-3)") == 3L)
    assert(one("RETURN sign(-5)") == -1)
    assert(one("RETURN ceil(1.1)") == 2.0)
    assert(one("RETURN floor(1.9)") == 1.0)
    assert(one("RETURN sqrt(16.0)") == 4.0)
    assert(one("RETURN log10(100.0)") == 2.0)
    assert(one("RETURN degrees(pi())") == 180.0)
    assert(one("RETURN toInteger(true)") == 1L)
  }
  test("float division by zero is IEEE, not an error") {
    assert(one("RETURN 1.0 / 0.0") == Double.PositiveInfinity)
    assert(one("RETURN -1.0 / 0.0") == Double.NegativeInfinity)
    assert(one("RETURN 0.0 / 0.0").asInstanceOf[Double].isNaN)
    assert(one("RETURN isNaN(0.0 / 0.0)") == true)
  }
  test("integer division by zero still raises") {
    assertThrows[Exception](one("RETURN 1 / 0"))
  }
  test("nullIf")(assert(one("RETURN nullIf(1, 1)") == null))
  test("nullIf unequal passes through")(
    assert(one("RETURN nullIf(1, 2)") == 1L))
  test("string helpers") {
    assert(one("RETURN left('hello', 2)") == "he")
    assert(one("RETURN right('hello', 2)") == "lo")
    assert(one("RETURN replace('aaa', 'a', 'b')") == "bbb")
    assert(one("RETURN substring('abc', 0, 2)") == "ab")
  }
  test("list helpers") {
    assert(one("RETURN last([1,2,3])") == 3L)
    assert(one("RETURN head([1,2,3])") == 1L)
    assert(one("RETURN size('abc')") == 3)
  }
}
