package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Keyword retrieval over a document corpus — the "find me training
  * examples about X" primitive of corpus curation.
  *
  * Scale design: the score is computed WITHOUT building an inverted
  * index — per-query-term frequencies are columnar `filter`/`size`
  * expressions over each document's token array (zero shuffle), corpus
  * statistics (N, total length, per-term document frequencies) are ONE
  * map-side-combined aggregate producing a single row that broadcasts
  * back, and the top-k is Spark's TakeOrderedAndProject (per-partition
  * heaps, no global sort materialization). At 100 TB this is one pass
  * over the corpus plus a k-row result.
  *
  * Determinism (for cross-engine oracle parity): idf uses the rational
  * (N - df + 0.5)/(df + 0.5) form — no libm `log`, whose last ulp
  * differs between runtimes; per-term contributions are summed in fixed
  * written order; every step is IEEE-754 exact-rounded arithmetic on
  * values derived from exact integers.
  */
object Search {

  /** BM25 top-k. Returns (doc_id, score) for the k best-matching
    * documents, ties broken by ascending doc id. */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25TopK needs at least one query term")
    val toks = df.select(col(idCol).cast(LongType).as("doc_id"),
      TextOps.tokens(col(textCol)).as("w"))

    // one corpus pass: doc count, total token count, df per query term
    val dfAggs = queryTerms.zipWithIndex.map { case (t, i) =>
      sum(when(array_contains(col("w"), t), 1L).otherwise(0L)).as(s"df_$i")
    }
    val stats = toks.agg(count(lit(1)).as("n_docs"),
      (sum(size(col("w")).cast(LongType)).as("total_len") +: dfAggs): _*)

    // Bind each term's tf ONCE as a real column (round 10): the tf
    // filter is a higher-order function (interpreted, no codegen) and
    // the score references it three times per term (guard, numerator,
    // denominator); with the score inlined into a pushed-down filter AND
    // the top-k sort key, that was ~6 interpreted array scans per
    // (row, term). Bound columns are O(1) attribute references —
    // CollapseProject keeps the binding because a non-cheap alias used
    // three times is not inlined.
    // round 11: occurrence count as a codegen loop (array_count_eq) —
    // size(filter(w, ===)) was the one interpreted HOF left on this path
    val tfCols = queryTerms.indices.map { i =>
      graft.functions.TextFunctions
        .array_count_eq(col("w"), lit(queryTerms(i)))
        .cast(DoubleType).as(s"tf_$i")
    }
    val withStats = toks
      .select(Seq(col("doc_id"),
        size(col("w")).cast(LongType).as("len")) ++ tfCols: _*)
      .crossJoin(broadcast(stats))

    val avgdl = col("total_len").cast(DoubleType) / col("n_docs").cast(DoubleType)
    val lenD = col("len").cast(DoubleType)
    val termScores: Seq[Column] = queryTerms.zipWithIndex.map { case (t, i) =>
      val tf = col(s"tf_$i")
      val dfD = col(s"df_$i").cast(DoubleType)
      val idf = (col("n_docs").cast(DoubleType) - dfD + lit(0.5)) / (dfD + lit(0.5))
      val score = (idf * (tf * lit(k1 + 1.0))) /
        (tf + (lit(k1) * ((lit(1.0) - lit(b)) + ((lit(b) * lenD) / avgdl))))
      when(tf > 0, score).otherwise(lit(0.0))
    }
    val total = termScores.reduce(_ + _)

    // where AFTER the top-k (round 10): positive scores always sort
    // before non-positive ones, so filtering the k ordered rows yields
    // exactly the filter-then-top-k set — and the score is no longer
    // pushed into the join condition, where it was evaluated once as a
    // predicate and again as the sort key.
    withStats
      .select(col("doc_id"), total.as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
      .where(col("score") > 0.0)
  }

  /** TF-IDF document vectors restricted to a fixed vocabulary: one row
    * per (doc, term) with tf, df and the classic tf·idf weight — the
    * feature-extraction half of keyword-based corpus filtering. Same
    * zero-index scale shape as [[bm25TopK]]; idf is the rational
    * N/(df+1) form for cross-engine determinism. */
  def tfIdf(df: DataFrame, idCol: String, textCol: String,
      vocabulary: Seq[String]): DataFrame = {
    require(vocabulary.nonEmpty, "tfIdf needs a vocabulary")
    val toks = df.select(col(idCol).cast(LongType).as("doc_id"),
      TextOps.tokens(col(textCol)).as("w"))
    val dfAggs = vocabulary.zipWithIndex.map { case (t, i) =>
      sum(when(array_contains(col("w"), t), 1L).otherwise(0L)).as(s"df_$i")
    }
    val stats = toks.agg(count(lit(1)).as("n_docs"), dfAggs: _*)
    val withStats = toks.crossJoin(broadcast(stats))

    val perTerm = vocabulary.zipWithIndex.map { case (t, i) =>
      struct(lit(t).as("term"),
        graft.functions.TextFunctions.array_count_eq(col("w"), lit(t))
          .cast(LongType).as("tf"),
        col(s"df_$i").cast(LongType).as("df"))
    }
    withStats
      .select(col("doc_id"), col("n_docs"),
        explode(array(perTerm: _*)).as("e"))
      .where(col("e.tf") > 0)
      .select(col("doc_id"), col("e.term").as("term"),
        col("e.tf").as("tf"), col("e.df").as("df"),
        (col("e.tf").cast(DoubleType) *
          (col("n_docs").cast(DoubleType) /
            (col("e.df").cast(DoubleType) + lit(1.0)))).as("tf_idf"))
  }
}
