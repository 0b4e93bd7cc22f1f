package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams
import graft.streaming.EventStreams.{SessionEvent, SessionOut}

class StreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-streaming-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def ts(minutes: Long): Timestamp = new Timestamp(minutes * 60000L)

  test("windowedCounts: tumbling window counts with watermark") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, Double)]
    val events = input.toDF().toDF("ts", "user_id", "value")

    val counts = EventStreams.windowedCounts(events, "ts", Seq("user_id"),
      windowDuration = "10 minutes", watermarkDelay = "5 minutes",
      valueCol = Some("value"))

    val q = counts.writeStream.format("memory").queryName("wc")
      .outputMode("append").start()
    try {
      input.addData((ts(1), 1L, 2.0), (ts(2), 1L, 3.0), (ts(3), 2L, 1.0))
      q.processAllAvailable()
      // watermark must pass the first window before append emits it
      input.addData((ts(30), 9L, 0.0))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT user_id, n, total FROM wc ORDER BY user_id").collect()
      assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
        === Seq((1L, 2L, 5.0), (2L, 1L, 1.0)))
    } finally q.stop()
  }

  test("sessionize: inactivity gap splits sessions, emitted on watermark") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val sessions = EventStreams.sessionize(input.toDS(), gapSeconds = 600,
      watermarkDelay = "1 minute")

    val q = sessions.writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    try {
      // user 1: events at t=1,5 (one session), then t=40 (new session)
      input.addData(SessionEvent(1L, ts(1)), SessionEvent(1L, ts(5)))
      q.processAllAvailable()
      input.addData(SessionEvent(1L, ts(40)))
      q.processAllAvailable()
      // push watermark far ahead so the second session times out too
      input.addData(SessionEvent(99L, ts(500)))
      q.processAllAvailable()
      input.addData(SessionEvent(98L, ts(1000)))
      q.processAllAvailable()

      val rows = spark.sql(
        """SELECT user_id, session_start, session_end, n_events FROM sess
          |WHERE user_id = 1 ORDER BY session_start""".stripMargin).collect()
      assert(rows.length === 2)
      assert(rows(0).getTimestamp(1) === ts(1))
      assert(rows(0).getTimestamp(2) === ts(5))
      assert(rows(0).getLong(3) === 2L)
      assert(rows(1).getTimestamp(1) === ts(40))
      assert(rows(1).getLong(3) === 1L)
    } finally q.stop()
  }

  test("sessionizeNative matches the typed-state sessionizer on batch data") {
    val s = spark
    import s.implicits._
    // two users; user 1 has two sessions split by a 20-min gap
    val events = Seq(
      (1L, ts(0)), (1L, ts(2)), (1L, ts(5)),
      (1L, ts(30)), (1L, ts(31)),
      (2L, ts(10))).toDF("user_id", "ts")
    val out = EventStreams.sessionizeNative(events, "ts", "user_id", "10 minutes")
      .orderBy("user_id", "session_start").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(3)))
    assert(out.toSeq === Seq(
      (1L, ts(0), 3L), (1L, ts(30), 2L), (2L, ts(10), 1L)))
  }

  test("streamingNearDup flags same-bucket fingerprints within the horizon") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val docs = input.toDF().toDF("ts", "doc_id", "text")

    val hits = EventStreams.streamingNearDup(docs, "ts", "doc_id", "text",
      maxHamming = 3, horizonSeconds = 3600)
    val q = hits.writeStream.format("memory").queryName("nd")
      .outputMode("append").start()
    try {
      val same = "the quick brown fox jumps over the lazy dog again and again"
      input.addData(
        (ts(1), 1L, same),
        (ts(2), 2L, same),
        (ts(3), 3L, "completely different words entirely unrelated content stream"))
      q.processAllAvailable()
      // 200 min later: identical text but beyond the 60-min horizon
      input.addData((ts(200), 4L, same))
      q.processAllAvailable()
      val pairs = spark.sql("SELECT DISTINCT id_a, id_b, hamming FROM nd")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(pairs === Set((1L, 2L, 0)))
    } finally q.stop()
  }

  test("streamingMinHashNearDup flags near-identical docs, respects horizon") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val docs = input.toDF().toDF("ts", "doc_id", "text")

    val hits = EventStreams.streamingMinHashNearDup(docs, "ts", "doc_id",
      "text", numHashes = 64, bands = 16, threshold = 0.6,
      horizonSeconds = 3600)
    val q = hits.writeStream.format("memory").queryName("mh")
      .outputMode("append").start()
    try {
      val base = "the quick brown fox jumps over the lazy dog again and again today"
      val near = "the quick brown fox jumps over the lazy dog again and again" // shared prefix
      input.addData(
        (ts(1), 1L, base),
        (ts(2), 2L, base),               // identical → est 1.0
        (ts(3), 3L, near),               // near-dup of 1 and 2
        (ts(4), 4L, "completely different words entirely unrelated content stream"))
      q.processAllAvailable()
      // 200 min later: identical text but beyond the 60-min horizon
      input.addData((ts(200), 5L, base))
      q.processAllAvailable()
      val pairs = spark.sql("SELECT DISTINCT id_a, id_b FROM mh")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs.contains((1L, 2L)), s"identical pair missed: $pairs")
      assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
        s"unrelated doc flagged: $pairs")
      assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L),
        s"horizon not respected: $pairs")
      // identical docs estimate at exactly 1.0
      val est = spark.sql(
        "SELECT max(est_jaccard) FROM mh WHERE id_a = 1 AND id_b = 2")
        .head.getDouble(0)
      assert(est === 1.0)
      // agreement with the batch path on the same corpus (signature
      // estimate vs exact verification: same pair set at this threshold)
      val batchDf = Seq((1L, base), (2L, base), (3L, near)).toDF("doc_id", "text")
      val batch = graft.pipeline.Dedup.minhashLsh(batchDf, "doc_id", "text",
        numHashes = 64, bands = 16, threshold = 0.6)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val streamed = pairs.filter(p => p._1 <= 3 && p._2 <= 3)
      assert(streamed === batch, s"stream $streamed vs batch $batch")
    } finally q.stop()
  }

  test("streamingDedup keeps first occurrence per content hash") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val docs = input.toDF().toDF("ts", "text")
    val deduped = EventStreams.streamingDedup(docs, "ts", Seq("text"))

    val q = deduped.writeStream.format("memory").queryName("dd")
      .outputMode("append").start()
    try {
      input.addData((ts(1), "alpha"), (ts(2), "alpha"), (ts(3), "beta"))
      q.processAllAvailable()
      val rows = spark.sql("SELECT text FROM dd ORDER BY text").collect()
      assert(rows.map(_.getString(0)).toSeq === Seq("alpha", "beta"))
    } finally q.stop()
  }

  test("streamingTokenBudget admits per-source prefixes across batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String, String)]
    val docs = input.toDF().toDF("ts", "doc_id", "source", "text")
    val admitted = EventStreams.streamingTokenBudget(docs, "ts", "doc_id",
      "text", "source", budgets = Map("web" -> 5L, "code" -> 2L))

    val q = admitted.writeStream.format("memory").queryName("tb")
      .outputMode("append").start()
    try {
      // web: 3 + 2 tokens fit the 5 budget; code: 2 fits, second doc not
      input.addData(
        (ts(1), 1L, "web", "one two three"),
        (ts(2), 2L, "code", "x y"),
        (ts(3), 3L, "code", "a b"))
      q.processAllAvailable()
      // second micro-batch: the state must carry over
      input.addData(
        (ts(4), 4L, "web", "four five"),
        (ts(5), 5L, "web", "overflow now"),
        (ts(6), 6L, "other", "nope"))
      q.processAllAvailable()
      val rows = spark.sql("SELECT doc_id, source, n_tokens FROM tb ORDER BY doc_id")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      assert(rows.toSeq === Seq((1L, "web", 3L), (2L, "code", 2L),
        (4L, "web", 2L)))
    } finally q.stop()
  }

  test("streamingTokenBudget in md5-shuffle order equals batch takeTokenBudget") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    // varied token counts so the budget cut falls mid-corpus (asserted
    // below); the strictPrefix-vs-greedy distinction has its own test
    val corpus = Seq(
      (1L, "alpha beta gamma"), (2L, "one two three four five"),
      (3L, "x"), (4L, "lorem ipsum dolor sit"),
      (5L, "aa bb"), (6L, "q w e r t y u"))
    val docs = corpus.toDF("doc_id", "text")
    val budget = 9L
    val batch = graft.pipeline.Sampling
      .takeTokenBudget(docs, "doc_id", "text", budget)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // replay the batch op's md5 permutation as event time
    val pos = graft.pipeline.Sampling.deterministicShuffle(docs, "doc_id")
      .select("doc_id", "pos").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val input = MemoryStream[(Timestamp, Long, String, String)]
    val stream = input.toDF().toDF("ts", "doc_id", "source", "text")
    val admitted = EventStreams.streamingTokenBudget(stream, "ts", "doc_id",
      "text", "source", budgets = Map("src" -> budget))
    val q = admitted.writeStream.format("memory").queryName("tbp")
      .outputMode("append").start()
    try {
      input.addData(corpus.map { case (id, text) =>
        (ts(pos(id) + 1), id, "src", text) })
      q.processAllAvailable()
      val streamed = spark.sql("SELECT doc_id FROM tbp")
        .collect().map(_.getLong(0)).toSet
      assert(streamed === batch,
        s"stream $streamed vs batch $batch (order ${pos.toSeq.sortBy(_._2)})")
      assert(batch.nonEmpty && batch.size < corpus.size,
        s"degenerate corpus: batch admitted $batch")
    } finally q.stop()
  }

  test("streamingMixtureByTokens in md5-shuffle order equals batch mixtureByTokens") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(
      (1L, "web", "a b c"), (2L, "web", "d e f g h"), (3L, "web", "i j"),
      (4L, "code", "k l m n"), (5L, "code", "o p"), (6L, "code", "q"),
      (7L, "junk", "r s t"))
    val docs = corpus.toDF("doc_id", "source", "text")
    val total = 12L
    val shares = Map("web" -> 0.5, "code" -> 0.4)
    val batch = graft.pipeline.Sampling.mixtureByTokens(docs, "doc_id",
      "text", "source", total, shares)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val pos = graft.pipeline.Sampling
      .deterministicShuffle(docs, "doc_id")
      .select("doc_id", "pos").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val input = MemoryStream[(Timestamp, Long, String, String)]
    val stream = input.toDF().toDF("ts", "doc_id", "source", "text")
    val admitted = EventStreams.streamingMixtureByTokens(stream, "ts",
      "doc_id", "text", "source", total, shares)
    val q = admitted.writeStream.format("memory").queryName("mbp")
      .outputMode("append").start()
    try {
      input.addData(corpus.map { case (id, src, text) =>
        (ts(pos(id) + 1), id, src, text) })
      q.processAllAvailable()
      val streamed = spark.sql("SELECT doc_id FROM mbp")
        .collect().map(_.getLong(0)).toSet
      assert(streamed === batch, s"stream $streamed vs batch $batch")
      assert(batch.nonEmpty && batch.size < corpus.size,
        s"degenerate corpus: batch admitted $batch")
    } finally q.stop()
  }

  test("strictPrefix=false keeps greedy-continue admission") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String, String)]
    val stream = input.toDF().toDF("ts", "doc_id", "source", "text")
    val admitted = EventStreams.streamingTokenBudget(stream, "ts", "doc_id",
      "text", "source", budgets = Map("src" -> 5L), strictPrefix = false)
    val q = admitted.writeStream.format("memory").queryName("tbg")
      .outputMode("append").start()
    try {
      // 3 tokens admit; 4 would cross (skip); 2 still fits → greedy admits
      input.addData(
        (ts(1), 1L, "src", "a b c"),
        (ts(2), 2L, "src", "d e f g"),
        (ts(3), 3L, "src", "h i"))
      q.processAllAvailable()
      val streamed = spark.sql("SELECT doc_id FROM tbg")
        .collect().map(_.getLong(0)).toSet
      assert(streamed === Set(1L, 3L))
    } finally q.stop()
  }

  test("streamingSubstringDups matches the batch duplicated-window set") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val shared = "S" * 80 // 80 identical chars: several aligned windows
    val d1 = "prefix-one ".padTo(32, 'a') + shared + " tail one distinct"
    val d2 = "other-start ".padTo(48, 'b') + shared + " different ending"
    val d3 = "no duplicated content here at all " * 4
    val input = MemoryStream[(Timestamp, Long, String)]
    val docs = input.toDF().toDF("ts", "doc_id", "text")

    val hits = EventStreams.streamingSubstringDups(docs, "ts", "doc_id",
      "text", window = 16, stride = 8, horizonSeconds = 3600)
    val q = hits.writeStream.format("memory").queryName("sd")
      .outputMode("append").start()
    try {
      input.addData((ts(1), 1L, d1))
      q.processAllAvailable()
      // second batch: state must carry the first doc's windows over
      input.addData((ts(2), 2L, d2), (ts(3), 3L, d3))
      q.processAllAvailable()
      val streamed = spark.sql("SELECT DISTINCT doc_id, pos FROM sd")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // batch marks ALL occurrences of any window content seen >= 2
      // times; within one horizon the streamed set must be identical
      // (the remembered first occurrence is late-emitted on the repeat)
      val batch = graft.pipeline.Dedup
        .windowHashes(Seq((1L, d1), (2L, d2), (3L, d3)).toDF("doc_id", "text"),
          "doc_id", "text", window = 16, stride = 8)
      val dupes = batch.groupBy("h").count().where(col("count") >= 2)
        .select("h")
      val expected = batch.join(dupes, Seq("h"), "left_semi")
        .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("pos"))).toSet
      assert(streamed === expected)
      assert(streamed.nonEmpty && streamed.exists(_._1 == 1L) &&
        streamed.exists(_._1 == 2L) && !streamed.exists(_._1 == 3L))
    } finally q.stop()
  }

  test("streamingLmScore is bit-identical to the batch lmScore") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val reference = Seq(
      "the quick brown fox jumps over the lazy dog",
      "the dog sleeps while the fox runs",
      "a quick brown dog and a lazy fox").toDF("text")
    val docTexts = Seq(
      (1L, "the quick fox"),
      (2L, "zyzzyx unknown tokens everywhere"),
      (3L, "the the the dog"),
      (4L, ""))
    val batchDocs = docTexts.toDF("doc_id", "text")
    val batch = graft.pipeline.TextAnalysis
      .lmScore(reference, batchDocs, "doc_id", "text", maxVocab = 8)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))).toMap

    val model = EventStreams.trainLmModel(reference, "text", maxVocab = 8)
    assert(model.logp.size === 8) // vocab capped
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val scored = EventStreams.streamingLmScore(model, docs, "doc_id", "text")
    val q = scored.writeStream.format("memory").queryName("lm")
      .outputMode("append").start()
    try {
      input.addData(docTexts.take(2): _*)
      q.processAllAvailable()
      input.addData(docTexts.drop(2): _*) // second micro-batch: stateless
      q.processAllAvailable()
      val streamed = spark.sql(
        "SELECT id, n_tokens, oov_tokens, sum_logp, avg_logp FROM lm")
        .collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
          r.getDouble(3), r.getDouble(4)))).toMap
      assert(streamed === batch) // exact doubles: decimal-quantized sums
      assert(streamed(2L)._2 > 0) // OOV tokens counted
    } finally q.stop()
  }
}
