package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join — an operator Spark's join zoo lacks.
  *
  * Semantics: every left row picks the LATEST right row with
  * `right.ts <= left.ts` and equal keys (inclusive on ties), left-outer:
  * unmatched left rows keep nulls. Matches DuckDB/kdb `ASOF LEFT JOIN ...
  * ON l.k = r.k AND l.ts >= r.ts`.
  *
  * Implementation (composition tier (a) of the custom-operator preference
  * order — no custom plan node needed): tag and union both sides, one
  * sort-shuffle by (keys, ts, side), then a running `last(_, ignoreNulls)`
  * window carries the most recent right payload forward onto left rows.
  * Cost is a single Exchange + sort of |L|+|R| rows — a naive range-join
  * (`l.k = r.k AND l.ts >= r.ts` + argmax) explodes to O(|L|·|R|/keys)
  * intermediate rows; this never materializes more than the input.
  */
object AsOfJoin {

  def asofBackward(left: DataFrame, right: DataFrame, tsCol: String,
      keys: Seq[String], rightPrefix: String = "asof_"): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one equality key")
    val rPayloadCols = right.columns.filterNot(keys.contains).toSeq
    val rStruct = struct(rPayloadCols.map(c => col(s"`$c`")): _*)
    val rStructType = right.select(rStruct.as("_r")).schema("_r").dataType

    val lStruct = struct(left.columns.toSeq.map(c => col(s"`$c`")): _*)
    val lStructType = left.select(lStruct.as("_l")).schema("_l").dataType

    val keyCols = keys.map(c => col(s"`$c`"))
    val rightTagged = right.select(
      keyCols :+ col(s"`$tsCol`").as("_ts") :+ rStruct.as("_r") :+
        lit(null).cast(lStructType).as("_l") :+ lit(0).as("_side"): _*)
    val leftTagged = left.select(
      keyCols :+ col(s"`$tsCol`").as("_ts") :+
        lit(null).cast(rStructType).as("_r") :+ lStruct.as("_l") :+
        lit(1).as("_side"): _*)

    // right sorts before left on timestamp ties → inclusive (ts >= ts)
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col("_ts").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val merged = rightTagged.unionByName(leftTagged)
      .withColumn("_m", last(col("_r"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)

    val leftOut = left.columns.toSeq.map(c =>
      col("_l").getField(c).as(c))
    val rightOut = rPayloadCols.map(c =>
      col("_m").getField(c).as(s"$rightPrefix$c"))
    merged.select(leftOut ++ rightOut: _*)
  }
}
