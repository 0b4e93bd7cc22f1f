package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-10 probe: stage-by-stage timing of the ngramJaccard pipeline
  * (p8/p35's shared kernel) at sf0.1. Each stage is timed with a noop
  * count on a fresh lineage so stage costs do not overlap (persisted
  * intermediates make later stages reuse earlier work, like the real op).
  */
object R10Probe3Main {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.VectorFunctions.{word_ngram_hashes, sorted_jaccard}
    import graft.pipeline.CacheRegistry

    def docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STAGE $label ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    // warm codegen on tiny data
    graft.pipeline.Dedup.ngramJaccard(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
      "doc_id", "text", n = 3, threshold = 0.3, maxDocFreq = 5000).count()

    (1 to 2).foreach { rep =>
      println(s"--- rep $rep")
      val caches = CacheRegistry.lru
      val grams = caches.persist(
        docs.select(col("doc_id").cast("long").as("id"),
          word_ngram_hashes(col("text"), 3).as("grams")))
      time("grams_persist")(grams.count())
      val inverted = grams.select(col("id"), explode(col("grams")).as("gram"))
      val rare = inverted.groupBy("gram").agg(count(lit(1)).as("df"))
        .where(col("df") <= 5000 && col("df") >= 2)
      val pruned = caches.persist(
        inverted.join(rare.select("gram"), Seq("gram")))
      time("pruned_persist")(pruned.count())
      val candidates = time("pair_join_build")(
        graft.pipeline.Dedup.bucketPairJoin(pruned, Seq("gram"))
          .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
          .distinct())
      time("candidates")(candidates.count())
      val out = candidates
        .join(grams.toDF("id_a", "grams_a"), "id_a")
        .join(grams.toDF("id_b", "grams_b"), "id_b")
        .select(col("id_a"), col("id_b"),
          sorted_jaccard(col("grams_a"), col("grams_b")).as("jaccard"))
        .where(col("jaccard") >= 0.3)
      time("verify")(out.count())
      time("full_fused") {
        graft.pipeline.Dedup.ngramJaccard(docs, "doc_id", "text",
          n = 3, threshold = 0.3, maxDocFreq = 5000).count()
      }
    }
    spark.stop()
  }
}
