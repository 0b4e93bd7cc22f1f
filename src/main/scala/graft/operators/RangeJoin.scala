package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded range join — equi-join on quantized bands instead of a raw
  * inequality join (which Spark executes as BroadcastNestedLoop / cartesian
  * with O(|L|·|R|) comparisons).
  *
  * For `|l.ts - r.ts| <= tolerance` with equal keys: quantize each side's
  * timestamp to bands of width `tolerance`; a qualifying pair is always in
  * the same or adjacent band, so the left side explodes to (band-1, band,
  * band+1) — 3 rows — and the join becomes an equi-join on (keys, band)
  * followed by the exact predicate. Shuffle volume is 3|L|+|R| rows
  * hash-partitioned by key+band; skew stays bounded by band population,
  * not key population.
  */
object RangeJoin {

  /** Pairs (left, right) with equal `keys` and
    * `|left.tsCol - right.tsCol| <= tolerance` (inclusive). Right columns
    * arrive prefixed. `tsCol` must be numeric (epoch seconds/millis/nanos —
    * any unit, as long as both sides and `tolerance` agree). */
  def withinJoin(left: DataFrame, right: DataFrame, tsCol: String,
      keys: Seq[String], tolerance: Long,
      rightPrefix: String = "r_"): DataFrame = {
    require(tolerance > 0, "tolerance must be positive")
    val keyCols = keys.map(c => col(s"`$c`"))

    val l = left
      .withColumn("_band", explode(array(
        (col(s"`$tsCol`").cast("long") / tolerance - 1).cast("long"),
        (col(s"`$tsCol`").cast("long") / tolerance).cast("long"),
        (col(s"`$tsCol`").cast("long") / tolerance + 1).cast("long"))))
    val rCols: Seq[Column] =
      (col("_band") +: keyCols) ++
        (col(s"`$tsCol`").as(s"$rightPrefix$tsCol") +:
          right.columns.filterNot(c => keys.contains(c) || c == tsCol).toSeq
            .map(c => col(s"`$c`").as(s"$rightPrefix$c")))
    val r = right
      .withColumn("_band", (col(s"`$tsCol`").cast("long") / tolerance).cast("long"))
      .select(rCols: _*)

    l.join(r, Seq("_band") ++ keys)
      .where(abs(col(s"`$tsCol`").cast("long") -
        col(s"`$rightPrefix$tsCol`").cast("long")) <= tolerance)
      .drop("_band")
  }
}
