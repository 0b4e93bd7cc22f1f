package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.Similarity

/** Paired LSH-ANN config comparison (machine noise immune: configs
  * alternate inside ONE JVM): current gate (bits=8, tables=8) vs
  * multi-probe (bits=12, tables=4, probes=12). Reports per-config
  * median seconds and recall@5 against the exact tiled kernel.
  * `runMain graft.Probe22Main /root/testdata/sf0.1` */
object Probe22Main {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")

    val exact = Similarity.blockTopK(emb, "vec_id", "embedding", k = 5)
      .select(col("qid"), col("nid")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap

    def recall(cfg: => org.apache.spark.sql.DataFrame): Double = {
      val got = cfg.select(col("qid"), col("nid")).collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      val hits = exact.toSeq.map { case (q, t) =>
        got.getOrElse(q, Set.empty).count(t.contains).toDouble / t.size }
      hits.sum / hits.size
    }

    def cfgA = Similarity.lshTopK(emb, "vec_id", "embedding", dim = 64,
      k = 5, bits = 8, tables = 8)
    def cfgB = Similarity.lshTopK(emb, "vec_id", "embedding", dim = 64,
      k = 5, bits = 12, tables = 4, probes = 12)

    println(f"recall A(8b,8t)=${recall(cfgA)}%.4f  B(12b,4t,12p)=${recall(cfgB)}%.4f")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val (ta, tb) = (collection.mutable.ArrayBuffer[Double](),
      collection.mutable.ArrayBuffer[Double]())
    (1 to 5).foreach { _ =>
      ta += time(cfgA.count()); tb += time(cfgB.count())
    }
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    println(f"median A=${med(ta.toSeq)}%.3f s  B=${med(tb.toSeq)}%.3f s  " +
      f"(A runs ${ta.map(x => f"$x%.2f").mkString(",")} | B ${tb.map(x => f"$x%.2f").mkString(",")})")
    spark.stop()
  }
}
