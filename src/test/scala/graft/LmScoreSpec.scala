package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline._

/** LM quality scoring (CCNet-shape) + bloom-prefiltered decontamination.
  * The unigram scorer is checked against a plain-Scala model computed on
  * the driver; the bloom path is checked for EXACT equality with the
  * broadcast-set path (false positives must all die in the verify join).
  */
class LmScoreSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  private def toks(s: String): Seq[String] =
    s.toLowerCase.split("[^\\p{L}\\p{N}]+").filter(_.nonEmpty).toSeq

  test("unigram lmScore matches a plain-Scala model (quantized decimals)") {
    val ref = docs.where($"source" === "src0")
    val sc = docs.where($"source" =!= "src0")
    val out = TextAnalysis.lmScore(ref, sc, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap

    // driver-side reference model
    val refTexts = ref.select($"text").as[String].collect()
    val counts = refTexts.flatMap(toks).groupBy(identity)
      .map { case (k, v) => k -> v.size.toLong }
    val n = counts.values.sum
    def q(x: Double): BigDecimal =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val logp = counts.map { case (t, c) => t -> q(math.log(c.toDouble / n)) }
    val oov = q(math.log(0.5 / n))

    val rows = sc.select($"doc_id".cast("long"), $"text").as[(Long, String)]
      .collect()
    assert(rows.length == out.size)
    rows.foreach { case (id, text) =>
      val ts = toks(text)
      val (nTok, nOov, sum, avg) = out(id)
      assert(nTok == ts.length, s"doc $id token count")
      assert(nOov == ts.count(t => !logp.contains(t)), s"doc $id oov")
      val expSum = ts.map(t => logp.getOrElse(t, oov)).sum
      assert(math.abs(sum - expSum.toDouble) < 1e-9, s"doc $id sum_logp")
      if (ts.nonEmpty)
        assert(math.abs(avg - expSum.toDouble / ts.length) < 1e-9,
          s"doc $id avg_logp")
    }
    // sanity: fluent in-domain docs score higher than OOV-heavy ones
    assert(out.values.exists(_._4 < 0.0))
  }

  test("lmScore vocab cap prunes rare tokens to OOV deterministically") {
    val ref = Seq((1L, "aa aa aa bb bb cc")).toDF("doc_id", "text")
    val sc = Seq((10L, "aa bb cc")).toDF("doc_id", "text")
    // cap 2 keeps {aa, bb} (count desc, token asc); cc becomes OOV
    val out = TextAnalysis.lmScore(ref, sc, "doc_id", "text", maxVocab = 2)
      .collect().head
    assert(out.getLong(1) == 3 && out.getLong(2) == 1)
    val q = (x: Double) =>
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val exp = q(math.log(3.0 / 6)) + q(math.log(2.0 / 6)) + q(math.log(0.5 / 6))
    assert(math.abs(out.getDouble(3) - exp) < 1e-9)
  }

  test("bigram stupid-backoff ranks in-domain text above shuffled text") {
    val ref = docs.where($"source" === "src0")
    val inDomain = ref.limit(20).select($"doc_id", $"text")
    // shuffled-word versions of the same docs: same unigrams, broken bigrams
    val shuffled = inDomain.select(($"doc_id" + 100000).as("doc_id"),
      concat_ws(" ", shuffle(split(lower($"text"), "[^a-z0-9]+"))).as("text"))
    val out = TextAnalysis.lmScoreBigram(ref, inDomain.union(shuffled),
      "doc_id", "text")
    val byId = out.collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val pairs = byId.keys.filter(_ < 100000)
      .flatMap(id => byId.get(id + 100000).map(s => (byId(id), s)))
    // mean avg_logp of originals must beat mean of shuffles
    val (orig, shuf) = (pairs.map(_._1).sum / pairs.size,
      pairs.map(_._2).sum / pairs.size)
    assert(orig > shuf,
      s"bigram LM should prefer coherent text: orig=$orig shuffled=$shuf")
    // ppl column is exp(-avg_logp)
    val r0 = out.where($"n_tokens" > 0).select($"avg_logp", $"ppl").head()
    assert(math.abs(r0.getDouble(1) - math.exp(-r0.getDouble(0))) < 1e-9)
  }

  test("chunkDocuments: windows, overlap continuity, boundary and empty") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 toks, 3 chunks
      (2L, (1 to 4).map(i => s"s$i").mkString(" ")),  // exactly maxTokens
      (3L, ""),                                        // empty → one chunk
      (4L, (1 to 5).map(i => s"u$i").mkString(" "))   // one past boundary
    ).toDF("doc_id", "text")
    val out = TextAnalysis.chunkDocuments(docs, "doc_id", "text",
      maxTokens = 4, overlap = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getString(2), r.getLong(3)))
      .toMap
    // doc 1: starts at 0,2,4,6,8 → ceil((10-4)/2)+1 = 4 chunks
    assert(out((1L, 0L)) == ("t1 t2 t3 t4", 4L))
    assert(out((1L, 1L)) == ("t3 t4 t5 t6", 4L)) // 2-token overlap
    assert(out((1L, 3L)) == ("t7 t8 t9 t10", 4L))
    assert(!out.contains((1L, 4L)))
    assert(out((2L, 0L)) == ("s1 s2 s3 s4", 4L) && !out.contains((2L, 1L)))
    assert(out((3L, 0L)) == ("", 0L))
    assert(out((4L, 0L)) == ("u1 u2 u3 u4", 4L))
    assert(out((4L, 1L)) == ("u3 u4 u5", 3L)) // final short chunk
    // every token appears in at least one chunk (coverage)
    val covered = out.collect { case ((1L, _), (txt, _)) =>
      txt.split(" ").toSeq }.flatten.toSet
    assert(covered == (1 to 10).map(i => s"t$i").toSet)
  }

  test("decontaminateBloom == decontaminate exactly (FPs verified away)") {
    val train = docs.where($"source" =!= "src0")
    val bench = docs.where($"source" === "src0")
    val exact = TextAnalysis.decontaminate(train, bench, "doc_id", "text", 4)
      .orderBy("id").collect()
    // tight fpp AND loose fpp (forces false positives through the bloom)
    for (fpp <- Seq(0.01, 0.5)) {
      val bloom = TextAnalysis.decontaminateBloom(train, bench,
        "doc_id", "text", 4, fpp).orderBy("id").collect()
      assert(bloom.toSeq == exact.toSeq, s"fpp=$fpp")
    }
  }
}
