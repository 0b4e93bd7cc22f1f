package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-9 scale-headroom fixture (VERDICT item 3): derive an sf1-sized
  * dataset (~6M lineitems, 50k documents) from the driver's sf0.1
  * parquet by replicating each table 10× with key offsets that preserve
  * referential structure (each copy is a disjoint subgraph wired exactly
  * like the original). Documents get a per-copy ALPHABET ROTATION so
  * copies share zero word-grams and zero character shingles: the
  * per-copy gram statistics are exactly sf0.1's and the dedup gates'
  * pair population scales linearly with the corpus (details at the
  * rotation below). Writes to /root/repo/testdata_sf1
  * (never touches /root/testdata). Used by R9BenchSf1Main as a cliff
  * detector only — no oracle runs at this scale.
  */
object GenSf1Main {
  val OutDir = "/root/repo/testdata_sf1"
  val Copies = 10

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val src = "/root/testdata/sf0.1"
    def t(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")

    // one row per (original row, copy), keys shifted per copy
    def replicate(df: DataFrame, shifts: Map[String, Long]): DataFrame = {
      val copies = explode(sequence(lit(0), lit(Copies - 1))).as("_copy")
      df.select(col("*"), copies).select(
        df.columns.map { c =>
          shifts.get(c) match {
            case Some(off) => (col(c) + col("_copy") * lit(off)).as(c)
            case None => col(c)
          }
        }: _*)
    }

    val CK = 1000000L; val OK = 10000000L; val PK = 1000000L
    val SK = 100000L; val DOC = 100000L

    def write(df: DataFrame, name: String): Unit = {
      df.write.mode("overwrite").parquet(s"$OutDir/$name.parquet")
      println(s"wrote $name: ${spark.read.parquet(s"$OutDir/$name.parquet").count()} rows")
    }

    // dimensions stay shared across copies (nation/region keys unshifted)
    write(t("region"), "region")
    write(t("nation"), "nation")
    write(replicate(t("customer"), Map("c_custkey" -> CK)), "customer")
    write(replicate(t("supplier"), Map("s_suppkey" -> SK)), "supplier")
    write(replicate(t("part"), Map("p_partkey" -> PK)), "part")
    write(replicate(t("orders"),
      Map("o_orderkey" -> OK, "o_custkey" -> CK)), "orders")
    write(replicate(t("lineitem"),
      Map("l_orderkey" -> OK, "l_partkey" -> PK, "l_suppkey" -> SK)),
      "lineitem")

    // documents: copy 0 verbatim; copy k ≥ 1 rotates the alphabet by k
    // (translate a→a+k). A bijection on letters preserves EVERY per-copy
    // statistic — word lengths, token boundaries, gram/shingle doc-freq
    // distributions are exactly sf0.1's — while making word-grams AND
    // character shingles disjoint across copies, so the near-dup pair
    // population scales linearly with the corpus. (Earlier variants
    // failed instructively: shuffling word order made trigrams
    // semi-random over a small vocab — pairs went 1.27M → 1.69e9; a "~k"
    // word suffix split into its own token under the engine's
    // non-alphanumeric tokenizer, interleaving a copy digit whose grams
    // had word-level doc frequencies; and any suffix leaves most
    // word-interior character shingles shared, so MinHash-LSH cross-copy
    // candidates exploded. Those runs exposed — and now lock — the
    // output-aware partitioning guard in ngramJaccard.)
    val docs = t("documents")
    val repl = docs.select(col("*"),
      explode(sequence(lit(0), lit(Copies - 1))).as("_copy"))
    // rotate BOTH cases and digits (round 10, ADVICE): lowercase-only
    // rotation left uppercase/digit-bearing tokens shared verbatim
    // across copies, weakening the "zero shared grams" claim on
    // mixed-case text. Digits rotate too (0-9 cycle) so numeric tokens
    // also diverge per copy.
    val az = "abcdefghijklmnopqrstuvwxyz"
    val aZ = az.toUpperCase; val dg = "0123456789"
    def rot(k: Int): String =
      az.drop(k) + az.take(k) + aZ.drop(k) + aZ.take(k) +
        dg.drop(k % 10) + dg.take(k % 10)
    val alphabet = az + aZ + dg
    val rotated = (1 until Copies).foldLeft(col("text")) { (acc, k) =>
      when(col("_copy") === k, translate(col("text"), alphabet, rot(k)))
        .otherwise(acc)
    }
    val salted = repl.select(
      (col("doc_id") + col("_copy") * lit(DOC)).as("doc_id"),
      rotated.as("text"),
      col("lang"), col("source"), col("n_chars"))
    write(salted, "documents")

    // events: copies are disjoint user populations (sessionization /
    // as-of joins see 10× users, same per-user density — the realistic
    // scale-up for behavioral streams)
    val EV = 10000000L; val EU = 1000000L
    write(replicate(t("events"),
      Map("event_id" -> EV, "user_id" -> EU)), "events")

    // embeddings: copy k circularly shifts the coordinate axes by k.
    // A shift preserves norms and all WITHIN-copy similarities exactly
    // (per-copy statistics = sf0.1's), while cross-copy similarities
    // collapse to noise — so LSH buckets / IVF cells / k-means cells
    // partition the 10× corpus into ~10× cells of unchanged size and the
    // ANN/semantic-dedup gates scale linearly. (Verbatim copies made
    // every bucket hold 10× near-identical vectors: candidate work went
    // quadratic — 10× queries × 10× bucket occupancy — and the sweep
    // read 26-42× on the whole embedding family. Fixture regime, not a
    // planning defect: the exact all-pairs baselines p4/p12 stay
    // quadratic BY DESIGN either way.)
    val VK = 1000000L
    val emb = replicate(t("embeddings"), Map("vec_id" -> VK))
      .withColumn("_copy",
        (col("vec_id") / lit(VK)).cast("long").cast("int"))
    val dim = t("embeddings").select(size(col("embedding")))
      .head().getInt(0)
    val shifted = emb.select(col("vec_id"),
      when(col("_copy") === 0, col("embedding")).otherwise(concat(
        slice(col("embedding"), col("_copy") + lit(1),
          lit(dim) - col("_copy")),
        slice(col("embedding"), lit(1), col("_copy")))).as("embedding"),
      col("label"))
    write(shifted, "embeddings")
    spark.stop()
  }
}
