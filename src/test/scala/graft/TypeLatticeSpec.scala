package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.graph.SparkTypes

/** Exhaustive law checks for the type-widening lattice used to align
  * element tables (role of the reference's type-lattice law tests,
  * okapi-api/src/test/.../types/TypeLawsTest.scala — our lattice is the
  * Spark-type join used by scans, SURVEY §1.2/§1.4). The domain is small
  * enough to check every pair/triple instead of sampling.
  */
class TypeLatticeSpec extends AnyFunSuite {

  private val types: Seq[DataType] = Seq(
    ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType,
    StringType, BooleanType, DateType, TimestampType, NullType,
    DecimalType(18, 4), DecimalType(38, 0), DecimalType(10, 2),
    DecimalType(38, 30), ArrayType(LongType), ArrayType(DoubleType))

  test("decimal joins stay exact until 38-digit overflow") {
    assert(SparkTypes.widen(DecimalType(18, 4), DecimalType(10, 2)) ===
      DecimalType(18, 4))
    assert(SparkTypes.widen(DecimalType(18, 4), LongType) ===
      DecimalType(24, 4))
    assert(SparkTypes.widen(DecimalType(38, 0), DecimalType(10, 2)) ===
      DoubleType) // 40 digits needed
    assert(SparkTypes.widen(DecimalType(18, 4), DoubleType) === DoubleType)
  }

  test("widen is commutative") {
    for (a <- types; b <- types)
      assert(SparkTypes.widen(a, b) === SparkTypes.widen(b, a), s"($a, $b)")
  }

  test("widen is idempotent on normalized types") {
    for (a <- types) {
      val n = SparkTypes.normalize(a)
      assert(SparkTypes.widen(n, n) === n, s"$a")
    }
  }

  test("widen is associative") {
    for (a <- types; b <- types; c <- types)
      assert(SparkTypes.widen(SparkTypes.widen(a, b), c) ===
        SparkTypes.widen(a, SparkTypes.widen(b, c)), s"($a, $b, $c)")
  }

  test("NullType is the identity") {
    for (a <- types)
      assert(SparkTypes.widen(NullType, a) === SparkTypes.normalize(a), s"$a")
  }

  test("widen result is always normalized (no narrow types escape)") {
    for (a <- types; b <- types) {
      val w = SparkTypes.widen(a, b)
      assert(SparkTypes.normalize(w) === w, s"($a, $b)")
    }
  }
}
