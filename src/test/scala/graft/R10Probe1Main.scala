package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-10 threshold calibration for the production-config ANN gates
  * (VERDICT item 2).
  *
  * First finding (this probe, raw-sample variant): recall-vs-exact-top5
  * on the SYNTHETIC embeddings is meaningless — the vectors are uniform
  * random, so "nearest neighbors" sit at background similarity (~0.4)
  * and production-sized LSH (bits=12) scores 0.02-0.12, IVF 0.25-0.59.
  * That is a property of structureless data, not the engine: ANN
  * promises retrieval of genuinely SIMILAR items. The gates therefore
  * use the standard ANN-benchmark methodology: PLANTED ground truth —
  * deterministically perturb a sampled corpus vector (±10% elementwise,
  * xxhash64-seeded ⇒ ~3° angle, cos ≈ 0.998 vs ~0.4 background) and
  * score whether the production path retrieves the original in its
  * top-5. This probe measures that hit rate at every gate SF so the
  * p10b/p15b thresholds are set from data.
  */
object R10Probe1Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
      "/root/testdata/sf0.1") ++
      (if (new java.io.File(s"${GenSf1Main.OutDir}/embeddings.parquet")
        .exists()) Seq(GenSf1Main.OutDir) else Nil)
    for (dir <- dirs) {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val n = emb.count()
      val dim = emb.select(size(col("embedding"))).head().getInt(0)
      val corpus = emb.select(col("vec_id").cast("long").as("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
      val qOff = 1000000000L
      val queries = corpus.where(
        substring(md5(col("vec_id").cast("string")), 1, 1) === "0")
        .select((col("vec_id") + qOff).as("vec_id"),
          transform(col("embedding"), (x, j) =>
            x * (lit(1.0) + lit(0.1) *
              (pmod(xxhash64(col("vec_id") * 64 + j), lit(1000))
                .cast("double") / 499.5 - 1.0))).as("embedding"))
      val nQ = queries.count()
      val all = corpus.unionByName(queries)
      val exact1 = pipeline.Similarity.blockTopKFor(queries, corpus,
        "vec_id", "embedding", k = 1).cache()
      exact1.count()
      val cells = math.max(8, (4 * math.sqrt(n.toDouble)).toInt)
      def report(tag: String, ann: org.apache.spark.sql.DataFrame): Unit = {
        val t0 = System.nanoTime()
        val r = pipeline.Similarity.recallAtK(
          ann.where(col("qid") >= qOff), exact1)
          .agg(avg(col("recall")).as("avg"), count(lit(1)).as("nq")).head()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"$dir n=$n nQ=$nQ $tag avg=${r.getDouble(0)}%.4f " +
          f"nq=${r.getLong(1)} ($dt%.1f s)")
      }
      report(s"ivf(cells=$cells,nProbe=8)",
        pipeline.Similarity.ivfTopK(all, "vec_id", "embedding", k = 5,
          nClusters = cells, nProbe = 8))
      report("lsh(bits=12,tables=8)",
        pipeline.Similarity.lshTopK(all, "vec_id", "embedding", dim = dim,
          k = 5, bits = 12, tables = 8))
      exact1.unpersist()
    }
    spark.stop()
  }
}
