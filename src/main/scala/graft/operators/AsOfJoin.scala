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

  /** As-of backward join, skew-routed by default: a sampled key histogram
    * (one job — sample → per-key counts → max/total) estimates whether a
    * single key dominates the window partitioning. Past `skewShare` of
    * sampled rows AND `minHotKeyRows` estimated rows in the hottest key,
    * the per-key window would serialize that key through one task, so the
    * join falls through to [[asofBackwardBucketed]] (keys × time-buckets
    * parallelism). Otherwise the single-shuffle plain variant runs — on
    * balanced keys it is strictly cheaper (no summary/carry passes).
    *
    * `skewSampleFraction = 0` disables detection (always plain). Map-typed
    * right payloads always take the plain path (the bucketed summary needs
    * an orderable struct).
    */
  def asofBackward(left: DataFrame, right: DataFrame, tsCol: String,
      keys: Seq[String], rightPrefix: String = "asof_",
      skewSampleFraction: Double = 0.05, skewShare: Double = 0.3,
      minHotKeyRows: Long = 1000000L, buckets: Int = 32): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one equality key")
    val rPayloadOrderable = !right.schema.fields
      .filterNot(f => keys.contains(f.name)).exists(f => hasMap(f.dataType))
    if (skewSampleFraction > 0 && rPayloadOrderable) {
      val keyCols = keys.map(c => col(s"`$c`"))
      val stats = left.select(keyCols: _*)
        .unionByName(right.select(keyCols: _*))
        .sample(withReplacement = false, skewSampleFraction, seed = 7)
        .groupBy(keyCols: _*).agg(count(lit(1)).as("_cnt"))
        .agg(max(col("_cnt")).as("_max"), sum(col("_cnt")).as("_tot")).head()
      if (!stats.isNullAt(0)) {
        val (hot, tot) = (stats.getLong(0), stats.getLong(1))
        val estHotRows = (hot / skewSampleFraction).toLong
        if (tot > 0 && hot.toDouble / tot >= skewShare &&
            estHotRows >= minHotKeyRows)
          return asofBackwardBucketed(left, right, tsCol, keys, buckets,
            rightPrefix)
      }
    }
    asofPlain(left, right, tsCol, keys, rightPrefix)
  }

  private def hasMap(t: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    t match {
      case _: MapType => true
      case s: StructType => s.fields.exists(f => hasMap(f.dataType))
      case ArrayType(e, _) => hasMap(e)
      case _ => false
    }
  }

  private def asofPlain(left: DataFrame, right: DataFrame, tsCol: String,
      keys: Seq[String], rightPrefix: String): DataFrame = {
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

  /** Skew-resistant variant of [[asofBackward]] for hot keys: with few
    * distinct keys (or one dominant key) the per-key window serializes an
    * entire key's rows through one task. Here the time axis is split into
    * `buckets` coarse ranges, the running-last window runs per
    * (key, bucket) — parallelism = keys × buckets — and cross-bucket
    * carry-in is resolved on a bucket-granularity summary (one row per
    * key-bucket, thousands not billions) with a second window, then
    * joined back. Segmented-scan shape; same result as [[asofBackward]].
    *
    * Costs one extra aggregation pass over the union for the summary and
    * a min/max pass for bucket bounds — worth it exactly when key skew
    * would otherwise serialize the big window. One input restriction the
    * plain variant does not have: the right payload struct must be
    * ORDERABLE (no map-typed columns) because the bucket summary takes a
    * struct max; use [[asofBackward]] for unorderable payloads.
    */
  def asofBackwardBucketed(left: DataFrame, right: DataFrame, tsCol: String,
      keys: Seq[String], buckets: Int = 32,
      rightPrefix: String = "asof_"): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one equality key")
    require(buckets > 1, "buckets must be > 1")
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
    val merged = rightTagged.unionByName(leftTagged)

    // bucket bounds: two scalars off a column-pruned scan of both inputs
    val bounds = merged.agg(
      min(col("_ts").cast("double")), max(col("_ts").cast("double"))).head()
    if (bounds.isNullAt(0))
      return asofPlain(left, right, tsCol, keys, rightPrefix)
    val (mn, mx) = (bounds.getDouble(0), bounds.getDouble(1))
    val width = math.max((mx - mn) / buckets, Double.MinPositiveValue)
    val bucketed = merged.withColumn("_b",
      least(greatest(floor((col("_ts").cast("double") - lit(mn)) / lit(width)),
        lit(0L)), lit(buckets.toLong - 1L)))

    // intra-bucket running last — parallel across keys × buckets
    val wIn = Window.partitionBy(keyCols :+ col("_b"): _*)
      .orderBy(col("_ts").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // bucket summary: latest right payload per (key, bucket); struct max
    // orders by _ts first, ignores left rows (null when()); then the
    // carry-in for bucket b = latest summary over buckets < b
    val summary = bucketed
      .groupBy(keyCols :+ col("_b"): _*)
      .agg(max(when(col("_side") === 0,
        struct(col("_ts"), col("_r")))).as("_bl"))
    val wCarry = Window.partitionBy(keyCols: _*).orderBy(col("_b").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carries = summary.withColumn("_carry",
        last(col("_bl"), ignoreNulls = true).over(wCarry))
      .select(keyCols ++ Seq(col("_b"), col("_carry._r").as("_cr")): _*)

    // null-SAFE key equality: the window variant groups null keys into
    // one partition and matches them, so the carry join must too
    val renamedCarries = keys.foldLeft(carries) { (d, k) =>
      d.withColumnRenamed(k, s"_ck_$k") }
    val carryCond = keys.map(k =>
      col(s"`$k`") <=> col(s"`_ck_$k`")).reduce(_ && _) &&
      col("_b") === col("_cb")
    val joined = bucketed
      .withColumn("_m0", last(col("_r"), ignoreNulls = true).over(wIn))
      .where(col("_side") === 1)
      .join(renamedCarries.withColumnRenamed("_b", "_cb"), carryCond, "left")
      .withColumn("_m", coalesce(col("_m0"), col("_cr")))

    val leftOut = left.columns.toSeq.map(c => col("_l").getField(c).as(c))
    val rightOut = rPayloadCols.map(c =>
      col("_m").getField(c).as(s"$rightPrefix$c"))
    joined.select(leftOut ++ rightOut: _*)
  }
}
