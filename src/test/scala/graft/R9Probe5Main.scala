package graft

import org.apache.spark.sql.SparkSession

/** Round-9 scale evidence for the ANN production configurations.
  *
  * The DRIVER GATES for the embedding family are exact/all-pairs BY
  * CONSTRUCTION (oracle-exactness at small sf): p15 probes every IVF
  * cell (nProbe = nClusters ≡ blockTopK), p34 runs nClusters = 1 (whole
  * corpus in one dense cell), p4/p12/p18 are the exact tiled kernels.
  * Their ~25-45× cost at the 10× fixture is the quadratic FLOP count of
  * exact similarity — inherent to the gate configuration, not a
  * planning defect. This probe measures the PRODUCTION configurations
  * (IVF with nProbe ≪ nClusters, LSH with bounded buckets) at sf0.1 vs
  * the 10× fixture to demonstrate the scale path is ~linear.
  */
object R9Probe5Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions.col

    def time(tag: String)(f: => Long): Double = {
      val t0 = System.nanoTime()
      val n = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$tag rows=$n $dt%.3f s")
      dt
    }

    for (dir <- Seq("/root/testdata/sf0.1", GenSf1Main.OutDir)) {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val n = emb.count()
      println(s"=== $dir ($n vectors)")
      // scale rule: cells ~ sqrt-ish growth keeps per-cell occupancy flat
      val cells = if (n > 100000) 256 else if (n > 5000) 128 else 32
      // warm (codegen + kmeans JIT)
      pipeline.Similarity.ivfTopK(emb.limit(500), "vec_id", "embedding",
        k = 5, nClusters = 8, nProbe = 2).count()
      (1 to 2).foreach { r =>
        time(s"ivf prod (cells=$cells nProbe=8) rep$r") {
          pipeline.Similarity.ivfTopK(emb, "vec_id", "embedding",
            k = 5, nClusters = cells, nProbe = 8).count()
        }
      }
      (1 to 2).foreach { r =>
        time(s"lsh prod (bits=12 tables=8) rep$r") {
          pipeline.Similarity.lshTopK(emb, "vec_id", "embedding",
            dim = emb.select(org.apache.spark.sql.functions
              .size(col("embedding"))).head().getInt(0),
            k = 5, bits = 12, tables = 8).count()
        }
      }
    }
    spark.stop()
  }
}
