package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation join for the cases AQE's skew-join splitting can't
  * reach (e.g. a sort-merge join whose hot keys sit in ONE shuffle
  * partition that still exceeds executor memory after splitting, or a
  * pre-AQE plan boundary).
  *
  * Classic key salting: the skewed (large, hot-keyed) side gets a random
  * salt in [0, salts); the other side is replicated once per salt value.
  * The join key becomes (key, salt), spreading each hot key over `salts`
  * reducers. Replication multiplies the small side by `salts` — use only
  * when that side is broadcast-scale or the skew factor warrants it.
  */
object SkewJoin {

  /** Inner equi-join `large.key == small.key` with salting on the large
    * side. Columns of both inputs are preserved (small-side key dropped).
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      salts: Int = 16): DataFrame = {
    require(salts > 1, "salts must be > 1")
    val salted = large.withColumn("_salt",
      (rand(seed = 42) * salts).cast("int"))
    val replicated = small
      .withColumn("_salt", explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated,
        salted(key) === replicated(key) && salted("_salt") === replicated("_salt"),
        "inner")
      .drop(replicated(key)).drop("_salt")
  }

  /** Top-N heavy-hitter keys of `df` by frequency — the usual input to a
    * targeted two-path skew join (hot keys through [[saltedJoin]] or a
    * broadcast, the long tail through a plain shuffle join). */
  def heavyHitters(df: DataFrame, key: String, topN: Int = 100): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc).limit(topN)

  /** Skew-aware two-path inner equi-join: heavy-hitter keys of the large
    * side — detected on a sample so detection costs a fraction of a scan,
    * not a full shuffle — route through [[saltedJoin]]; the long tail
    * takes a plain equi-join. The hot-key list is bounded (≤ `topN`) and
    * driver-resident by construction, so the split predicates are simple
    * IN filters both scans can push down.
    *
    * `minShare` is the sampled frequency share above which a key counts
    * as hot (0.05 = keys holding ≥5% of sampled rows). With no hot keys
    * the result is exactly `large ⋈ small` with zero extra cost beyond
    * the sample pass.
    */
  def adaptiveJoin(large: DataFrame, small: DataFrame, key: String,
      salts: Int = 16, sampleFraction: Double = 0.05,
      minShare: Double = 0.05, topN: Int = 20): DataFrame = {
    // deterministic seed → the two jobs over the sample see the same rows
    val sampled = large.sample(withReplacement = false, sampleFraction, seed = 7)
      .select(col(key)).where(col(key).isNotNull)
    val total = sampled.count()
    val hotKeys: Seq[Any] =
      if (total == 0L) Nil
      else heavyHitters(sampled, key, topN)
        .where(col("cnt") >= minShare * total)
        .collect().map(_.get(0)).toSeq

    if (hotKeys.isEmpty) {
      large.join(small, Seq(key), "inner")
    } else {
      val hotPath = saltedJoin(
        large.where(col(key).isin(hotKeys: _*)),
        small.where(col(key).isin(hotKeys: _*)), key, salts)
      val tailPath = large.where(!col(key).isin(hotKeys: _*))
        .join(small, Seq(key), "inner")
      // saltedJoin keeps large-side column order + small payload; align
      tailPath.unionByName(hotPath.select(tailPath.columns.toSeq
        .map(c => col(s"`$c`")): _*))
    }
  }
}
