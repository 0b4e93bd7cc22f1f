package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-10 probe: ngram-jaccard candidate population analysis at sf0.1
  * (how many candidate rows the bucket self-join emits, how many distinct
  * pairs survive, gram df distribution) — sizes the p8/p35 optimization. */
object R10Probe4Main {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.VectorFunctions.word_ngram_hashes
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val grams = docs.select(col("doc_id").cast("long").as("id"),
      word_ngram_hashes(col("text"), 3).as("grams"))
    val inverted = grams.select(col("id"), explode(col("grams")).as("gram"))
    val dfs = inverted.groupBy("gram").agg(count(lit(1)).as("df"))
    println("n_docs=" + docs.count())
    println("avg_grams_per_doc=" +
      grams.selectExpr("avg(size(grams))").first().getDouble(0))
    println("n_gram_rows=" + inverted.count())
    println("n_distinct_grams=" + dfs.count())
    dfs.selectExpr("max(df) as maxdf",
      "sum(case when df>=2 then cast(df*(df-1)/2 as bigint) else 0 end) as pairs_with_mult",
      "sum(case when df>=2 then df else 0 end) as idx_rows").show()
    val pruned = inverted.join(
      dfs.where(col("df") <= 5000 && col("df") >= 2).select("gram"),
      Seq("gram"))
    val cand = pruned.as("a").join(pruned.as("b"),
      col("a.gram") === col("b.gram") && col("a.id") < col("b.id"))
    println("candidate_rows=" + cand.count())
    println("distinct_pairs=" +
      cand.select(col("a.id"), col("b.id")).distinct().count())
    spark.stop()
  }
}
