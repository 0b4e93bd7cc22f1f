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

  /** Grid SUPERSET-prefilter join over Cypher point structs
    * (`{@crs, px, py}`) — the planner's lowering target for
    * `MATCH (a), (b) WHERE distance(a.p, b.p) < r` on DISCONNECTED
    * patterns. Returns every pair that COULD be within `radius`; the
    * caller re-applies the original exact predicate after the join, so
    * this only has to be a superset and never has to reproduce
    * crs-mismatch/null semantics (it still prunes those pairs: the join
    * key leads with crs and drops null coordinates).
    *
    * Cell scheme is crs-aware per row:
    *  - `cartesian`: 2-D grid of cell size `radius`, left explodes its
    *    3×3 neighborhood (same superset argument as [[within]]).
    *  - `wgs-84`: 1-D LATITUDE bands of `radius / 110000` degrees —
    *    haversine(a, b) < r meters bounds Δlat to r/110574° (meridian
    *    arc ≥ 110574 m/° everywhere), so matching pairs sit in the same
    *    or an adjacent band. Longitude is deliberately NOT bucketed: a
    *    2-D geo grid needs per-band cos(lat) cell widths and
    *    antimeridian wrap to stay a superset, and degenerates near the
    *    poles anyway; the 1-D band is conservative at every latitude and
    *    still cuts candidates by ~(Δlat band / 180°). Pairs straddling
    *    the antimeridian share a band, so wrap is handled for free.
    * Mixed-crs inputs route each row by its own tag; cross-crs pairs
    * never join (distance() would return null for them anyway). */
  def gridJoinPoints(left: DataFrame, right: DataFrame,
      leftPoint: Column, rightPoint: Column, radius: Double): DataFrame = {
    require(radius > 0, "radius must be positive")
    val latCell = radius / 110000.0
    def cells(p: Column, neighborhood: Boolean): Column = {
      val crs = p.getField("@crs")
      val cx = floor(p.getField("px") / lit(radius)).cast("long")
      val cy = floor(p.getField("py") / lit(radius)).cast("long")
      val band = floor(p.getField("py") / lit(latCell)).cast("long")
      def k(c1: Column, c2: Column): Column =
        struct(crs.as("crs"), c1.as("c1"), c2.as("c2"))
      val cart =
        if (!neighborhood) array(k(cx, cy))
        else array((for { i <- -1 to 1; j <- -1 to 1 }
          yield k(cx + i, cy + j)): _*)
      val geo =
        if (!neighborhood) array(k(band, lit(0L)))
        else array((for (i <- -1 to 1) yield k(band + i, lit(0L))): _*)
      when(crs === "cartesian", cart).otherwise(geo)
    }
    def nonNull(p: Column): Column =
      p.isNotNull && p.getField("@crs").isNotNull &&
        p.getField("px").isNotNull && p.getField("py").isNotNull
    val l = left.where(nonNull(leftPoint))
      .withColumn("__dj_cell", explode(cells(leftPoint, neighborhood = true)))
    val r = right.where(nonNull(rightPoint))
      .withColumn("__dj_cell", cells(rightPoint, neighborhood = false)(0))
    l.join(r, Seq("__dj_cell")).drop("__dj_cell")
  }
}
