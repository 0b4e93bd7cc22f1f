package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline._

/** Partition-invariance property harness (round-5 VERDICT item 4).
  *
  * Every determinism claim the pipeline operators make — md5-keyed
  * shuffles/splits/budgets/mixtures, minhash/simhash/ngram near-dup
  * pairs, span dedup, connected components — rests on the OUTPUT being a
  * pure function of the data, independent of how the input happens to be
  * partitioned. At 100 TB the partitioning is whatever the upstream job
  * left behind, so this is the property that keeps reruns reproducible.
  * Each operator runs under three adversarial layouts — everything in
  * one partition, over-split across 64, and a 2-hot-partition skew — and
  * must produce identical rows.
  */
class PartitionInvarianceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  val dir = "/root/testdata/sf0.001"
  lazy val docs = spark.read.parquet(s"$dir/documents.parquet")
  lazy val emb = spark.read.parquet(s"$dir/embeddings.parquet")

  /** the three layouts: single partition, over-split, skewed (all rows
    * land in 2 hot partitions of 16 by a low-cardinality key). */
  private def layouts(df: DataFrame): Seq[(String, DataFrame)] = Seq(
    "repartition(1)" -> df.repartition(1),
    "repartition(64)" -> df.repartition(64),
    "skewed" -> df.repartition(16, pmod(col(df.columns.head).cast("long"),
      lit(2L))))

  /** canonical sorted row-image of a result (column order normalized). */
  private def image(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted.map(c => col(s"`$c`"))
    df.select(cols.toIndexedSeq: _*).collect().map(_.toString).sorted.toSeq
  }

  private def assertInvariant(name: String, base: DataFrame)(
      op: DataFrame => DataFrame): Unit = {
    val results = layouts(base).map { case (l, d) => l -> image(op(d)) }
    val (refName, ref) = results.head
    results.tail.foreach { case (l, img) =>
      assert(img === ref,
        s"$name: $l disagrees with $refName " +
          s"(${img.size} vs ${ref.size} rows)")
    }
    assert(ref.nonEmpty, s"$name produced no rows — vacuous invariance")
  }

  // a corpus slice with planted exact + near duplicates (mirrors
  // PipelineSpec.planted so pair-producing ops have non-empty output)
  lazy val planted: DataFrame = {
    val base = docs.select($"doc_id", $"text", $"source").limit(50)
    val exactDup = base.limit(5)
      .select(($"doc_id" + 10000).as("doc_id"), $"text", $"source")
    val nearDup = base.limit(5)
      .select(($"doc_id" + 20000).as("doc_id"),
        concat($"text", lit(" tiny edit suffix")).as("text"), $"source")
    base.union(exactDup).union(nearDup)
  }

  // ------------------------------------------------ splits & sampling

  test("deterministicSplit is partition-invariant") {
    assertInvariant("deterministicSplit", planted)(
      Sampling.deterministicSplit(_, "doc_id"))
  }

  test("deterministicSample is partition-invariant") {
    assertInvariant("deterministicSample", planted)(
      Sampling.deterministicSample(_, "doc_id", 40.0))
  }

  test("mixture is partition-invariant") {
    assertInvariant("mixture", planted)(
      Sampling.mixture(_, "doc_id", "source",
        Map("web" -> 80.0, "code" -> 25.0), defaultPct = 50.0))
  }

  test("capPerKey is partition-invariant") {
    assertInvariant("capPerKey", planted)(
      Sampling.capPerKey(_, "doc_id", "source", maxPerKey = 3))
  }

  test("deterministicShuffle positions are partition-invariant") {
    assertInvariant("deterministicShuffle", planted)(
      Sampling.deterministicShuffle(_, "doc_id", bucketChars = 2))
  }

  test("takeTokenBudget is partition-invariant") {
    assertInvariant("takeTokenBudget", planted)(
      Sampling.takeTokenBudget(_, "doc_id", "text", budget = 2000,
        bucketChars = 2))
  }

  test("mixtureByTokens is partition-invariant") {
    assertInvariant("mixtureByTokens", planted)(
      Sampling.mixtureByTokens(_, "doc_id", "text", "source",
        totalBudget = 3000, Map("web" -> 0.6, "code" -> 0.4),
        defaultShare = 0.5, bucketChars = 2))
  }

  test("quantileBins ranks/bins are partition-invariant") {
    // approxQuantile samples differently per layout — the claim under
    // test is that rank/bin are EXACT for any monotone bucketing, so the
    // output must still be identical
    assertInvariant("quantileBins",
      planted.withColumn("score", length($"text").cast("double")))(
      Sampling.quantileBins(_, "doc_id", "score", nBins = 4, buckets = 8))
  }

  test("packSequences bins are partition-invariant") {
    assertInvariant("packSequences", planted)(
      Sampling.packSequences(_, "doc_id", "text", "source", capacity = 512))
  }

  // ------------------------------------------------ dedup families

  test("exact dedup is partition-invariant") {
    assertInvariant("exact", planted)(
      Dedup.exact(_, "doc_id", Seq("text")))
    assertInvariant("exactByHash", planted)(
      Dedup.exactByHash(_, "doc_id", "text"))
  }

  test("minhash LSH pairs are partition-invariant") {
    assertInvariant("minhashLsh", planted)(
      Dedup.minhashLsh(_, "doc_id", "text",
        numHashes = 32, bands = 8, shingleSize = 5, threshold = 0.5))
  }

  test("simhash near-dup pairs are partition-invariant") {
    assertInvariant("simhashNearDup", planted)(
      Dedup.simhashNearDup(_, "doc_id", "text", maxHamming = 6))
  }

  test("ngram jaccard pairs are partition-invariant") {
    assertInvariant("ngramJaccard", planted)(
      Dedup.ngramJaccard(_, "doc_id", "text",
        n = 3, threshold = 0.5, maxDocFreq = 100))
  }

  test("paragraph dedup is partition-invariant") {
    val withPara = planted.select($"doc_id",
      concat($"text", lit("\nshared paragraph body here\n"),
        $"text").as("text"))
    assertInvariant("paragraphDedup", withPara)(
      Dedup.paragraphDedup(_, "doc_id", "text"))
  }

  test("duplicate spans + strip are partition-invariant") {
    val spanDocs = planted.select($"doc_id",
      concat(lit("the exact same duplicated leading span of text. "),
        $"text").as("text"))
    assertInvariant("duplicateSpans", spanDocs)(
      Dedup.duplicateSpans(_, "doc_id", "text", window = 20, stride = 10))
    assertInvariant("stripDuplicateSpans", spanDocs)(
      Dedup.stripDuplicateSpans(_, "doc_id", "text",
        window = 20, stride = 10))
  }

  test("connected components + winner election are partition-invariant") {
    val pairs = Dedup.minhashLsh(planted, "doc_id", "text",
      numHashes = 32, bands = 8, shingleSize = 5, threshold = 0.5)
      .select($"id_a", $"id_b")
    val scored = planted.withColumn("score", length($"text").cast("double"))
    assertInvariant("connectedComponents", scored)(d =>
      Dedup.connectedComponents(d.select("doc_id"), "doc_id", pairs,
        "id_a", "id_b"))
    assertInvariant("keepBestPerCluster", scored)(d =>
      Dedup.keepBestPerCluster(d, "doc_id", "score", pairs, "id_a", "id_b"))
  }
}
