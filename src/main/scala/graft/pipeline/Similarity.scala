package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact all-pairs cosine — the correctness baseline
  *    (O(n²·d), only viable for small corpora or per-bucket refinement);
  *  - [[lshTopK]]: random-hyperplane LSH (Charikar 2002 SimHash for cosine)
  *    — the 100 TB path: signatures are computed shuffle-free, candidates
  *    only form within (table, bucket) groups, so the join fan-out is
  *    n²/2^bits per table instead of n².
  *
  * The dot product is `aggregate(zip_with(a,b,*), 0d, +)` — public
  * higher-order functions, fully codegen'd, no UDF.
  */
object Similarity {

  /** cosine similarity of two double-array columns — fused custom
    * expression with whole-stage codegen (one loop: dot + both norms).
    * The composed higher-order-function version
    * (`aggregate(zip_with(...))`) evaluates interpreted and allocates an
    * intermediate array per pair — ~50× slower on all-pairs workloads. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.cosine_similarity(a, b)

  /** Exact top-k cosine neighbors for every vector (self-join, excludes
    * self-matches). Ranking uses the rounded similarity (stable across
    * engines/accumulation orders) with id tiebreak, so results are
    * deterministic. */
  def bruteForceTopK(emb: DataFrame, idCol: String, vecCol: String,
      k: Int = 5, roundTo: Int = 4): DataFrame = {
    val v = emb.select(col(idCol).cast(LongType).as("id"),
      col(vecCol).cast(ArrayType(DoubleType)).as("vec"))
    val a = v.toDF("qid", "qvec"); val b = v.toDF("nid", "nvec")
    val scored = a.join(b, col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        round(cosine(col("qvec"), col("nvec")), roundTo).as("sim"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("nid"), col("sim"), col("rank"))
  }

  /** deterministic pseudo-random hyperplanes (seeded, plan-time literals). */
  private def hyperplanes(dim: Int, bits: Int, table: Int, seed: Long): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed + table * 7919)
    Seq.fill(bits)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** LSH bucket id for one table: sign bits of dot products with `bits`
    * hyperplanes, packed via Horner. Pure column arithmetic. */
  def lshBucket(vec: Column, dim: Int, bits: Int, table: Int,
      seed: Long = 42L): Column = {
    val planes = hyperplanes(dim, bits, table, seed)
    planes.foldLeft(lit(0L)) { (acc, plane) =>
      val dot = graft.functions.VectorFunctions.dot_product(
        vec, array(plane.map(lit): _*))
      acc * 2 + when(dot >= 0, 1L).otherwise(0L)
    }
  }

  /** ANN via multi-table random-hyperplane LSH: candidates share a bucket
    * in at least one of `tables` tables; exact cosine re-ranks candidates.
    * Recall grows with tables; cost per table is one narrow shuffle of
    * (bucket, id, vec). */
  def lshTopK(emb: DataFrame, idCol: String, vecCol: String, dim: Int,
      k: Int = 5, bits: Int = 8, tables: Int = 4, seed: Long = 42L,
      roundTo: Int = 4): DataFrame = {
    val v = emb.select(col(idCol).cast(LongType).as("id"),
      col(vecCol).cast(ArrayType(DoubleType)).as("vec"))
    // all table buckets in one compiled pass, then explode narrow
    // (id, table, bucket) rows — vectors do NOT travel to the bucket join
    val banded = v.select(col("id"),
      posexplode(graft.functions.VectorFunctions.lsh_buckets(
        col("vec"), dim, bits, tables, seed)))
      .toDF("id", "table_idx", "bucket")

    val a = banded.as("a"); val b = banded.as("b")
    val candidates = a.join(b,
        col("a.table_idx") === col("b.table_idx") &&
        col("a.bucket") === col("b.bucket") &&
        col("a.id") =!= col("b.id"))
      .select(col("a.id").as("qid"), col("b.id").as("nid"))
      .dropDuplicates("qid", "nid")

    // re-attach vectors only after candidate dedup (broadcast the narrow
    // id→vec side when small; AQE decides otherwise)
    val scored = candidates
      .join(v.toDF("qid", "qvec"), "qid")
      .join(v.toDF("nid", "nvec"), "nid")
      .select(col("qid"), col("nid"),
        round(cosine(col("qvec"), col("nvec")), roundTo).as("sim"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("nid"), col("sim"), col("rank"))
  }
}
