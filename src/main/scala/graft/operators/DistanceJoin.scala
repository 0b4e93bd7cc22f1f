package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grid-bucketed euclidean distance join — equi-join on spatial grid
  * cells instead of a raw `distance(a, b) < r` predicate (which Spark
  * executes as BroadcastNestedLoop / cartesian with O(|L|·|R|) distance
  * evaluations).
  *
  * Quantize both sides to a grid of cell size `radius`; a qualifying pair
  * is always in the same or one of the 8 neighboring cells, so the left
  * side explodes to its 3×3 cell neighborhood — 9 rows — and the join
  * becomes an equi-join on (cellX, cellY) followed by the exact distance
  * predicate. Each right point lives in exactly ONE cell, so no pair can
  * match twice — no dedup pass needed. Shuffle volume is 9|L| + |R| rows
  * hash-partitioned by cell; per-task work is bounded by cell population
  * (≈ density · r²), not by the full cross product. Same scale-extension
  * pattern as [[RangeJoin]] (1-D bands) and [[AsOfJoin]] (time buckets).
  *
  * Dense hot cells (all points in one city block with a large r) bound
  * the worst case: work degrades toward the cartesian only WITHIN a cell,
  * never across cells. If one cell holds k points the task does k² exact
  * checks; callers with pathological density should shrink r or pre-salt.
  */
object DistanceJoin {

  /** Pairs (left, right) with `euclidean((x,y), (rx,ry)) < radius`
    * (strict, matching the Cypher `WHERE distance(a.p, b.p) < r` shape;
    * set `inclusive = true` for `<=`). Right columns arrive prefixed.
    * Rows with a null coordinate never match (SQL comparison semantics).
    */
  def within(left: DataFrame, right: DataFrame,
      xCol: String, yCol: String, radius: Double,
      rightPrefix: String = "r_", inclusive: Boolean = false): DataFrame = {
    require(radius > 0, "radius must be positive")
    def cell(c: Column): Column = floor(c / lit(radius)).cast("long")

    val l = left
      .withColumn("_cx", explode(array(
        cell(col(s"`$xCol`")) - 1, cell(col(s"`$xCol`")),
        cell(col(s"`$xCol`")) + 1)))
      .withColumn("_cy", explode(array(
        cell(col(s"`$yCol`")) - 1, cell(col(s"`$yCol`")),
        cell(col(s"`$yCol`")) + 1)))
    val rCols: Seq[Column] =
      Seq(col("_cx"), col("_cy")) ++
        right.columns.toSeq.map(c => col(s"`$c`").as(s"$rightPrefix$c"))
    val r = right
      .withColumn("_cx", cell(col(s"`$xCol`")))
      .withColumn("_cy", cell(col(s"`$yCol`")))
      .select(rCols: _*)

    val dx = col(s"`$xCol`") - col(s"`$rightPrefix$xCol`")
    val dy = col(s"`$yCol`") - col(s"`$rightPrefix$yCol`")
    val d2 = dx * dx + dy * dy
    val r2 = lit(radius) * lit(radius)
    l.join(r, Seq("_cx", "_cy"))
      .where(if (inclusive) d2 <= r2 else d2 < r2)
      .drop("_cx", "_cy")
  }
}
