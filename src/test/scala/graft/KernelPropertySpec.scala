package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions._

/** Randomized property checks for the custom codegen kernels against
  * plain-Scala references (fixed seed → reproducible; one Spark job per
  * property, 1000 samples each). These are the expressions whole corpora
  * flow through — a codegen bug here silently corrupts every dedup and
  * similarity result, so they get reference-implementation parity checks
  * beyond the example-based specs.
  */
class KernelPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val rnd = new scala.util.Random(20260813L)

  test("integral_divide matches BigInt truncation-toward-zero, also past 2^53") {
    val s = spark
    import s.implicits._
    val cases = Seq.fill(1000) {
      val a = rnd.nextLong()
      val b = rnd.nextInt(4) match {
        case 0 => rnd.nextLong() | (1L << 60) // huge divisor
        case _ => rnd.nextLong() match { case 0 => 7L; case x => x }
      }
      (a, b)
    }.filterNot { case (a, b) => a == Long.MinValue && b == -1L } ++
      Seq((Long.MaxValue, 3L), ((1L << 60) + 7, 1000L), (-(1L << 59) - 3, 17L))
    val out = cases.toDF("a", "b")
      .select(col("a"), col("b"), integral_divide(col("a"), col("b")).as("q"))
      .collect()
    out.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      val want = (BigInt(a) / BigInt(b)).toLong
      assert(r.getLong(2) == want, s"$a / $b: got ${r.getLong(2)}, want $want")
    }
    // /0 raises (ANSI) — Cypher's "/ by zero" is a runtime error
    val thrown = intercept[Exception] {
      Seq((1L, 0L)).toDF("a", "b")
        .select(integral_divide(col("a"), col("b"))).collect()
    }
    assert(thrown.getMessage.toLowerCase.contains("zero"))
  }

  test("dot_product and cosine_similarity match manual math") {
    val s = spark
    import s.implicits._
    val cases = Seq.fill(500) {
      val n = 1 + rnd.nextInt(16)
      (Array.fill(n)(rnd.nextDouble() * 4 - 2),
        Array.fill(n)(rnd.nextDouble() * 4 - 2))
    }
    val out = cases.toDF("a", "b")
      .select(col("a"), col("b"), dot_product(col("a"), col("b")).as("dot"),
        cosine_similarity(col("a"), col("b")).as("cos"))
      .collect()
    out.zip(cases).foreach { case (r, (a, b)) =>
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      assert(math.abs(r.getDouble(2) - dot) < 1e-9)
      if (na > 0 && nb > 0)
        assert(math.abs(r.getDouble(3) - dot / (na * nb)) < 1e-9)
    }
  }

  test("sorted_jaccard equals set Jaccard of the underlying hash sets") {
    val s = spark
    import s.implicits._
    def arr() = Array.fill(1 + rnd.nextInt(30))(rnd.nextInt(40).toLong)
      .distinct.sorted
    val cases = Seq.fill(500)((arr(), arr()))
    val out = cases.toDF("a", "b")
      .select(col("a"), col("b"), sorted_jaccard(col("a"), col("b")).as("j"))
      .collect()
    out.zip(cases).foreach { case (r, (a, b)) =>
      val inter = a.toSet.intersect(b.toSet).size.toDouble
      val union = a.toSet.union(b.toSet).size.toDouble
      val want = if (union == 0) 0.0 else inter / union
      assert(math.abs(r.getDouble(2) - want) < 1e-12,
        s"${a.toSeq} vs ${b.toSeq}: got ${r.getDouble(2)}, want $want")
    }
  }

  test("minhash signature agreement estimates shingle Jaccard") {
    val s = spark
    import s.implicits._
    val words = Vector("w0", "w1", "w2", "w3", "w4", "w5", "w6", "w7")
    // pairs with varying overlap: prefix of A + fresh suffix
    val base = Seq.fill(60)(words(rnd.nextInt(words.size))).mkString(" ")
    val variants = Seq(1.0, 0.7, 0.4).map { keep =>
      val toks = base.split(" ")
      val kept = toks.take((toks.length * keep).toInt)
      val fresh = Seq.fill(toks.length - kept.length)(
        "zz" + rnd.nextInt(1000)).mkString(" ")
      (base, (kept.mkString(" ") + " " + fresh).trim)
    }
    val df = variants.toDF("a", "b").select(
      shingle_hashes(col("a"), 4).as("sa"),
      shingle_hashes(col("b"), 4).as("sb"),
      minhash_signature(col("a"), 128, 4).as("ma"),
      minhash_signature(col("b"), 128, 4).as("mb"))
    df.collect().foreach { r =>
      val trueJ = {
        val a = r.getSeq[Long](0).toSet; val b = r.getSeq[Long](1).toSet
        a.intersect(b).size.toDouble / a.union(b).size
      }
      val est = r.getSeq[Long](2).zip(r.getSeq[Long](3))
        .count { case (x, y) => x == y }.toDouble / 128
      // 128 hashes → stderr ~ sqrt(J(1-J)/128) ≤ 0.045; allow 4σ
      assert(math.abs(est - trueJ) < 0.2,
        s"minhash estimate $est vs true Jaccard $trueJ")
    }
  }

  test("lsh buckets: identical vectors share every bucket, tables differ") {
    val s = spark
    import s.implicits._
    val v = Array.fill(16)(rnd.nextDouble() * 2 - 1)
    val df = Seq((v, v)).toDF("a", "b").select(
      lsh_buckets(col("a"), 16, 8, 4, 7L).as("ba"),
      lsh_buckets(col("b"), 16, 8, 4, 7L).as("bb"))
    val r = df.collect().head
    assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    assert(r.getSeq[Long](0).size == 4)
  }

  test("text kernels are deterministic and shape-correct") {
    val s = spark
    import s.implicits._
    val words = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val texts = Seq.fill(300) {
      Seq.fill(rnd.nextInt(20))(words(rnd.nextInt(words.size))).mkString(" ")
    }
    val df = texts.toDF("t")
    val out = df.select(col("t"),
        word_ngram_hashes(col("t"), 3).as("ng"),
        minhash_signature(col("t"), 32, 4).as("sig"),
        simhash64(col("t")).as("sh"))
      .collect()
    val out2 = df.select(col("t"),
        word_ngram_hashes(col("t"), 3).as("ng"),
        minhash_signature(col("t"), 32, 4).as("sig"),
        simhash64(col("t")).as("sh"))
      .collect()
    out.zip(out2).foreach { case (r1, r2) =>
      assert(r1.getSeq[Long](1) == r2.getSeq[Long](1))
      assert(r1.getSeq[Long](2) == r2.getSeq[Long](2))
      assert(r1.getLong(3) == r2.getLong(3))
    }
    out.foreach { r =>
      val nWords = r.getString(0).split("\\s+").count(_.nonEmpty)
      val nGrams = r.getSeq[Long](1).size
      // distinct sorted n-grams: at most words-n+1, zero iff too short
      assert(nGrams <= math.max(nWords - 2, 0))
      assert((nGrams == 0) == (nWords < 3))
      assert(r.getSeq[Long](2).size == 32)
    }
    // identical texts hash identically (cross-row)
    val byText = out.groupBy(_.getString(0))
    byText.values.foreach { rows =>
      assert(rows.map(_.getLong(3)).distinct.size == 1)
    }
  }

  test("production-config ANN planted-recall holds across seeds and " +
      "configs (round 10, VERDICT item 7 family)") {
    // The p15b/p10b gates pin ONE config at the gate corpus; this is the
    // differential-family version: several corpus seeds × production
    // configs, planted ground truth (each query = a corpus vector
    // perturbed ±10% elementwise, cos ≈ 0.998 vs ~0.4 background), the
    // recall property as the oracle. Catches config-sensitive recall
    // regressions the single gate config would miss.
    val s = spark
    import s.implicits._
    import graft.pipeline.Similarity
    val dim = 16
    for (seed <- Seq(1L, 77L, 2026L)) {
      val r2 = new scala.util.Random(seed)
      val corpus = (0 until 600).map { i =>
        (i.toLong, Array.fill(dim)(r2.nextDouble() * 2 - 1))
      }.toDF("vec_id", "embedding")
      val queries = (0 until 600 by 16).map { i =>
        val base = corpus.where($"vec_id" === i.toLong)
          .head.getSeq[Double](1).toArray
        val qr = new scala.util.Random(seed * 31 + i)
        (1000000L + i,
          base.map(x => x * (1.0 + 0.1 * (qr.nextDouble() * 2 - 1))))
      }.toDF("vec_id", "embedding")
      val both = corpus.unionByName(queries)
      val exact1 = Similarity.blockTopKFor(queries, corpus,
        "vec_id", "embedding", k = 1)
      def recallOf(ann: org.apache.spark.sql.DataFrame): Double =
        Similarity.recallAtK(ann.where($"qid" >= 1000000L), exact1)
          .agg(avg($"recall")).head.getDouble(0)
      val ivf = Similarity.ivfTopK(both, "vec_id", "embedding", k = 5,
        nClusters = 96, nProbe = 8, trainSample = 600)
      val rIvf = recallOf(ivf)
      assert(rIvf >= 0.9, s"seed $seed: IVF planted recall $rIvf < 0.9")
      val lsh = Similarity.lshTopK(both, "vec_id", "embedding", dim = dim,
        k = 5, bits = 12, tables = 8)
      val rLsh = recallOf(lsh)
      assert(rLsh >= 0.9, s"seed $seed: LSH planted recall $rLsh < 0.9")
    }
  }
}
