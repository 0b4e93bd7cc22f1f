package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Stage-by-stage timing of the p6 gate's first call: where do the ~20 s
  * go — the gram explode+persist, the signature aggregation, the bucket
  * self-join, or the exact-Jaccard verification? */
object ProbeP6Main {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = time("read")(
      spark.read.parquet(s"$sfDir/documents.parquet"))
    println(s"docs: ${docs.count()}")

    val toksW = filter(split(lower(col("text")), "[^a-z0-9]+"),
      t => length(t) > 0)
    val gramsW = array_distinct(
      when(size(col("w")) >= 3,
        transform(sequence(lit(1), size(col("w")) - 2),
          i => concat_ws(" ", element_at(col("w"), i),
            element_at(col("w"), i + 1), element_at(col("w"), i + 2))))
        .otherwise(array().cast("array<string>")))
    val sh = docs
      .select(col("doc_id").cast(LongType).as("id"), toksW.as("w"))
      .select(col("id"), explode(gramsW).as("s")).persist()
    time("sh persist")(println(s"sh rows: ${sh.count()}"))

    val hx = sh.select(col("id"),
      conv(substring(md5(col("s")), 1, 7), 16, 10).cast(LongType).as("x"))
    val hashMins = (0 until 16).map { seed =>
      min((lit(976369L + seed * 1049L) * col("x") +
        lit(1234567L + seed * 2477L)) % lit(1073741789L)).as(s"h$seed")
    }
    val sig = hx.groupBy(col("id")).agg(hashMins.head, hashMins.tail: _*)
    val bandKeys = array((0 until 8).map { b =>
      concat_ws(",", (b * 2 until (b + 1) * 2)
        .map(sd => col(s"h$sd").cast("string")): _*)
    }: _*)
    val banded = sig.select(col("id"), posexplode(bandKeys))
      .toDF("id", "band", "key").persist()
    time("banded persist")(println(s"banded rows: ${banded.count()}"))

    val a = banded.as("a"); val b = banded.as("b")
    val cand = a.join(b,
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
      .persist()
    time("cand")(println(s"cand rows: ${cand.count()}"))

    val nsz = sh.groupBy(col("id")).agg(count(lit(1)).as("n"))
    val inter = cand
      .join(sh.toDF("id_a", "s"), "id_a")
      .join(sh.toDF("id_b", "s"), Seq("id_b", "s"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("i"))
    val out = inter
      .join(nsz.toDF("id_a", "na"), "id_a")
      .join(nsz.toDF("id_b", "nb"), "id_b")
      .select(col("id_a"), col("id_b"),
        (col("i").cast("double") /
          (col("na") + col("nb") - col("i")).cast("double")).as("jaccard"))
      .where(col("jaccard") >= 0.3)
    time("verify+out")(println(s"pairs: ${out.count()}"))
    spark.stop()
  }
}
