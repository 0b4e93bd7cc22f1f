package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators for the event stream.
  *
  * The reference has no streaming surface at all (SURVEY §2.7 — verified
  * absence); this module is the scale extension: the same event-shaping
  * ops the batch gate runs (e1 counts, e2 sessionization) expressed as
  * incremental computations with watermarks and typed state, so a 100 TB/day
  * event feed folds continuously instead of re-scanning.
  *
  * All transforms are source-agnostic: they accept any DataFrame
  * (`readStream` from kafka/files/rate or a batch frame for testing — the
  * logical plan is identical either way).
  */
object EventStreams {

  /** Tumbling/sliding windowed counts + sums per key with a watermark:
    * late events beyond `watermarkDelay` are dropped, window state is
    * evicted once the watermark passes — bounded state at any volume. */
  def windowedCounts(events: DataFrame, tsCol: String, keyCols: Seq[String],
      windowDuration: String = "1 hour", slideDuration: Option[String] = None,
      watermarkDelay: String = "10 minutes",
      valueCol: Option[String] = None): DataFrame = {
    val withWm = events.withWatermark(tsCol, watermarkDelay)
    val win = slideDuration match {
      case Some(slide) => window(col(tsCol), windowDuration, slide)
      case None => window(col(tsCol), windowDuration)
    }
    val grouped = withWm.groupBy(win +: keyCols.map(c => col(s"`$c`")): _*)
    valueCol match {
      case Some(v) => grouped.agg(count(lit(1)).as("n"),
        sum(col(s"`$v`")).as("total"))
      case None => grouped.agg(count(lit(1)).as("n"))
    }
  }

  case class SessionEvent(userId: Long, ts: Timestamp)
  case class SessionState(start: Long, end: Long, n: Long)
  case class SessionOut(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long)

  /** Incremental sessionization: per-user inactivity-gap sessions via
    * [[org.apache.spark.sql.KeyValueGroupedDataset.flatMapGroupsWithState]]
    * with an event-time timeout — the streaming twin of the batch
    * lag-over-window recipe (PipelineQueries e2_sessions). A session is
    * emitted when the watermark passes its close (gap elapsed). */
  def sessionize(events: Dataset[SessionEvent], gapSeconds: Long,
      watermarkDelay: String = "10 minutes"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapMs = gapSeconds * 1000L

    def update(userId: Long, evts: Iterator[SessionEvent],
        state: GroupState[SessionState]): Iterator[SessionOut] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        return Iterator(SessionOut(userId, new Timestamp(s.start),
          new Timestamp(s.end), s.n))
      }
      val sorted = evts.map(_.ts.getTime).toArray.sorted
      var out = List.empty[SessionOut]
      var cur = state.getOption
      sorted.foreach { t =>
        cur match {
          case Some(s) if t - s.end <= gapMs =>
            cur = Some(SessionState(s.start, math.max(s.end, t), s.n + 1))
          case Some(s) =>
            out ::= SessionOut(userId, new Timestamp(s.start),
              new Timestamp(s.end), s.n)
            cur = Some(SessionState(t, t, 1))
          case None =>
            cur = Some(SessionState(t, t, 1))
        }
      }
      cur.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.end + gapMs)
      }
      out.reverseIterator
    }

    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** Streaming exact-dedup by content hash within the watermark horizon:
    * `dropDuplicates` keyed on the hash with event-time watermark bounds
    * the state — the streaming counterpart of Dedup.exact. */
  def streamingDedup(docs: DataFrame, tsCol: String, contentCols: Seq[String],
      watermarkDelay: String = "1 hour"): DataFrame =
    docs.withColumn("content_hash",
        xxhash64(contentCols.map(c => col(s"`$c`")): _*))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicates("content_hash")

  /** Sessionization via Spark's native `session_window` (codegen'd,
    * merge-on-overlap): one groupBy instead of typed state — preferred
    * when only per-session aggregates are needed. Works identically on a
    * batch frame and a watermarked stream (same logical plan). */
  def sessionizeNative(events: DataFrame, tsCol: String, keyCol: String,
      gap: String, watermarkDelay: Option[String] = None): DataFrame = {
    val in = watermarkDelay.fold(events)(events.withWatermark(tsCol, _))
    in.groupBy(col(s"`$keyCol`"), session_window(col(s"`$tsCol`"), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col(s"`$keyCol`"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))
  }

  case class BandedFingerprint(bandIdx: Int, bandVal: Long, docId: Long,
      simhash: Long, ts: Timestamp)
  case class BandEntries(entries: List[(Long, Long, Long)]) // (id, sim, tsMs)
  case class NearDupHit(id_a: Long, id_b: Long, hamming: Int, ts: Timestamp)

  /** Streaming NEAR-dup detection — the incremental twin of
    * [[graft.pipeline.Dedup.simhashNearDup]]: each document's 64-bit
    * SimHash splits into `maxHamming + 1` bands (pigeonhole: any pair
    * within the bound shares one identical band), fingerprints group by
    * band bucket, and per-bucket state keeps the last `horizonSeconds` of
    * entries — a new document compares only against its own buckets, so
    * state and work stay proportional to the horizon, never the stream's
    * history. Emits (id_a, id_b, hamming) with id_a < id_b; a pair that
    * collides in several bands is emitted once per band — run
    * `.withWatermark("ts", …).dropDuplicates("id_a", "id_b")` downstream
    * (or distinct in batch tests) for unique pairs. Idle buckets evict by
    * event-time timeout. */
  def streamingNearDup(docs: DataFrame, tsCol: String, idCol: String,
      textCol: String, maxHamming: Int = 3,
      watermarkDelay: String = "10 minutes",
      horizonSeconds: Long = 3600): Dataset[NearDupHit] = {
    require(maxHamming >= 0 && maxHamming <= 15, "maxHamming out of 0..15")
    import docs.sparkSession.implicits._
    import graft.functions.VectorFunctions.simhash64
    val nBands = maxHamming + 1
    val baseW = 64 / nBands; val rem = 64 % nBands
    val widths = Seq.tabulate(nBands)(i => baseW + (if (i < rem) 1 else 0))
    val offsets = widths.scanLeft(0)(_ + _).init
    val horizonMs = horizonSeconds * 1000L

    val banded = docs
      .withColumn("@sim", simhash64(col(s"`$textCol`")))
      .select(posexplode(array((0 until nBands).map { b =>
          val mask = if (widths(b) >= 64) -1L else (1L << widths(b)) - 1L
          shiftrightunsigned(col("@sim"), offsets(b)).bitwiseAND(lit(mask))
        }: _*)).as(Seq("bandIdx", "bandVal")),
        col(s"`$idCol`").cast("long").as("docId"),
        col("@sim").as("simhash"), col(s"`$tsCol`").as("ts"))
      .as[BandedFingerprint]

    def update(key: (Int, Long), fps: Iterator[BandedFingerprint],
        state: GroupState[BandEntries]): Iterator[NearDupHit] = {
      if (state.hasTimedOut) { state.remove(); return Iterator.empty }
      val sorted = fps.toArray.sortBy(_.ts.getTime)
      var entries = state.getOption.map(_.entries).getOrElse(Nil)
      val out = scala.collection.mutable.ArrayBuffer.empty[NearDupHit]
      var maxTs = entries.headOption.map(_._3).getOrElse(0L)
      sorted.foreach { fp =>
        val t = fp.ts.getTime
        maxTs = math.max(maxTs, t)
        entries = entries.filter(_._3 >= maxTs - horizonMs)
        entries.foreach { case (oid, osim, _) =>
          val h = java.lang.Long.bitCount(fp.simhash ^ osim)
          if (h <= maxHamming && oid != fp.docId)
            out += NearDupHit(math.min(oid, fp.docId),
              math.max(oid, fp.docId), h, fp.ts)
        }
        entries = (fp.docId, fp.simhash, t) :: entries
      }
      state.update(BandEntries(entries))
      state.setTimeoutTimestamp(maxTs + horizonMs)
      out.iterator
    }

    banded.withWatermark("ts", watermarkDelay)
      .groupByKey(fp => (fp.bandIdx, fp.bandVal))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }

  case class BandedSig(bandIdx: Int, bandHash: Long, docId: Long,
      sig: Array[Long], ts: Timestamp)
  case class SigEntries(entries: List[(Long, Array[Long], Long)])
  case class MinHashHit(id_a: Long, id_b: Long, est_jaccard: Double,
      ts: Timestamp)

  /** Streaming MinHash near-dup detection — the incremental twin of
    * [[graft.pipeline.Dedup.minhashLsh]]: each document's k-hash MinHash
    * signature splits into `bands` bands of r = k/bands rows; a banding
    * collision (same band hash) makes the pair a candidate
    * (P = 1-(1-s^r)^b, MMDS §3.4), and the candidate is scored by the
    * SIGNATURE Jaccard estimate (matching-position fraction) instead of
    * the batch path's exact shingle verification — a stream cannot hold
    * every document's shingle set, and the estimate's error is
    * O(1/sqrt(k)). Per-bucket state keeps the last `horizonSeconds` of
    * (id, signature) entries; idle buckets evict by event-time timeout.
    * A colliding pair emits once per colliding band — dedupe downstream
    * (`dropDuplicates("id_a","id_b")` under the watermark, or distinct
    * in batch tests). */
  def streamingMinHashNearDup(docs: DataFrame, tsCol: String, idCol: String,
      textCol: String, numHashes: Int = 64, bands: Int = 16,
      shingleSize: Int = 5, threshold: Double = 0.7,
      watermarkDelay: String = "10 minutes",
      horizonSeconds: Long = 3600): Dataset[MinHashHit] = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    import docs.sparkSession.implicits._
    val r = numHashes / bands
    val horizonMs = horizonSeconds * 1000L

    val banded = docs
      .withColumn("@sig", graft.pipeline.Dedup.minhashSignature(
        col(s"`$textCol`"), numHashes, shingleSize))
      .select(posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(slice(col("@sig"), b * r + 1, lit(r)), b)))
          .as(Seq("bandIdx", "bandHash")),
        col(s"`$idCol`").cast("long").as("docId"),
        col("@sig").as("sig"), col(s"`$tsCol`").as("ts"))
      .as[BandedSig]

    def estJaccard(a: Array[Long], b: Array[Long]): Double = {
      var m = 0; var i = 0
      while (i < a.length) { if (a(i) == b(i)) m += 1; i += 1 }
      m.toDouble / a.length
    }

    def update(key: (Int, Long), sigs: Iterator[BandedSig],
        state: GroupState[SigEntries]): Iterator[MinHashHit] = {
      if (state.hasTimedOut) { state.remove(); return Iterator.empty }
      val sorted = sigs.toArray.sortBy(_.ts.getTime)
      var entries = state.getOption.map(_.entries).getOrElse(Nil)
      val out = scala.collection.mutable.ArrayBuffer.empty[MinHashHit]
      var maxTs = entries.headOption.map(_._3).getOrElse(0L)
      sorted.foreach { fp =>
        val t = fp.ts.getTime
        maxTs = math.max(maxTs, t)
        entries = entries.filter(_._3 >= maxTs - horizonMs)
        entries.foreach { case (oid, osig, _) =>
          if (oid != fp.docId) {
            val est = estJaccard(fp.sig, osig)
            if (est >= threshold)
              out += MinHashHit(math.min(oid, fp.docId),
                math.max(oid, fp.docId), est, fp.ts)
          }
        }
        entries = (fp.docId, fp.sig, t) :: entries
      }
      state.update(SigEntries(entries))
      state.setTimeoutTimestamp(maxTs + horizonMs)
      out.iterator
    }

    banded.withWatermark("ts", watermarkDelay)
      .groupByKey(fp => (fp.bandIdx, fp.bandHash))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }

  case class BudgetDoc(source: String, docId: Long, nTokens: Long,
      ts: Timestamp)
  case class SourceBudget(taken: Long, closed: Boolean)
  case class AdmittedDoc(doc_id: Long, source: String, n_tokens: Long,
      ts: Timestamp)

  /** Streaming per-source token-budget admission — the incremental twin
    * of [[graft.pipeline.Sampling.takeTokenBudget]]/`mixtureByTokens`:
    * each source keeps one running token total; a document is admitted
    * iff its source's cumulative total stays within `budgets` (absent
    * sources use `defaultBudget`). Unlike the batch ops, admission is
    * ARRIVAL order (sorted by event time + id within each micro-batch for
    * per-batch determinism) — a stream cannot replay the md5 permutation.
    * State is one (Long, Boolean) per source: bounded by source
    * cardinality, never the stream's history.
    *
    * `strictPrefix` (default) reproduces the batch PREFIX semantics: the
    * first document that would cross its source's budget closes the
    * source, exactly like the batch `@cum <= budget` cut — so a stream
    * fed in the batch ops' md5-shuffle order admits the IDENTICAL set
    * (StreamingSpec parity locks). `strictPrefix = false` keeps
    * greedy-continue admission instead: a later, smaller document that
    * still fits is admitted — more tokens per budget, but no longer the
    * batch twin. */
  def streamingTokenBudget(docs: DataFrame, tsCol: String, idCol: String,
      textCol: String, sourceCol: String, budgets: Map[String, Long],
      defaultBudget: Long = 0L,
      strictPrefix: Boolean = true): Dataset[AdmittedDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val nTokens = graft.functions.TextFunctions
      .count_tokens(col(s"`$textCol`"), graft.functions.TokenMode.Whitespace)
      .cast("long")
    val in = docs.select(
      col(s"`$sourceCol`").cast("string").as("source"),
      col(s"`$idCol`").cast("long").as("docId"),
      nTokens.as("nTokens"),
      col(s"`$tsCol`").as("ts")).as[BudgetDoc]

    def update(source: String, it: Iterator[BudgetDoc],
        state: GroupState[SourceBudget]): Iterator[AdmittedDoc] = {
      val budget = budgets.getOrElse(source, defaultBudget)
      var taken = state.getOption.map(_.taken).getOrElse(0L)
      var closed = state.getOption.exists(_.closed)
      val out = scala.collection.mutable.ArrayBuffer.empty[AdmittedDoc]
      it.toArray.sortBy(d => (d.ts.getTime, d.docId)).foreach { d =>
        if (!closed && taken + d.nTokens <= budget) {
          taken += d.nTokens
          out += AdmittedDoc(d.docId, source, d.nTokens, d.ts)
        } else if (strictPrefix) closed = true
      }
      state.update(SourceBudget(taken, closed))
      out.iterator
    }

    in.groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update)
  }

  /** Streaming twin of [[graft.pipeline.Sampling.mixtureByTokens]]:
    * per-source budgets are the same `floor(share · totalBudget)` token
    * cuts the batch operator computes (sources absent from `shares` get
    * `defaultShare`), admission is [[streamingTokenBudget]]. Fed in the
    * batch md5-shuffle order with `strictPrefix` on, the admitted set is
    * the batch operator's output exactly. */
  def streamingMixtureByTokens(docs: DataFrame, tsCol: String, idCol: String,
      textCol: String, sourceCol: String, totalBudget: Long,
      shares: Map[String, Double], defaultShare: Double = 0.0,
      strictPrefix: Boolean = true): Dataset[AdmittedDoc] = {
    require(totalBudget >= 0, "totalBudget must be non-negative")
    require((shares.values ++ Seq(defaultShare)).forall(s => s >= 0 && s <= 1),
      "shares must be in [0, 1]")
    streamingTokenBudget(docs, tsCol, idCol, textCol, sourceCol,
      budgets = shares.map { case (k, s) => k -> (totalBudget * s).toLong },
      defaultBudget = (totalBudget * defaultShare).toLong,
      strictPrefix = strictPrefix)
  }

  case class WindowFp(h: Long, docId: Long, pos: Long, ts: Timestamp)
  case class SeenWindow(docId: Long, pos: Long, lastMs: Long,
      emitted: Boolean)
  case class SubstrHit(doc_id: Long, pos: Long, ts: Timestamp)

  /** Streaming duplicated-substring detection — the incremental twin of
    * [[graft.pipeline.Dedup.duplicateSpans]]: each document's
    * stride-aligned window hashes group by hash value; per-hash state
    * remembers the first occurrence inside the horizon, and a repeat
    * emits BOTH copies (the remembered first is emitted late, exactly
    * once) — so within one horizon the emitted (doc_id, pos) set equals
    * the batch operator's duplicated-window set. Merge hits into maximal
    * spans downstream per document (the batch gaps-and-islands step);
    * strip with [[graft.pipeline.Dedup.stripDuplicateSpans]] semantics.
    * State is one (docId, pos, lastSeen, emitted) record per DISTINCT
    * window content seen inside the horizon — bounded by the horizon,
    * never the stream's history; idle hashes evict by event-time
    * timeout. */
  def streamingSubstringDups(docs: DataFrame, tsCol: String, idCol: String,
      textCol: String, window: Int = 64, stride: Int = 16,
      watermarkDelay: String = "10 minutes",
      horizonSeconds: Long = 3600): Dataset[SubstrHit] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val horizonMs = horizonSeconds * 1000L
    val fps = graft.pipeline.Dedup
      .windowHashes(docs, idCol, textCol, window, stride, keep = Seq(tsCol))
      .select(col("h"), col("id").as("docId"), col("pos"),
        col(s"`$tsCol`").as("ts")).as[WindowFp]

    def update(h: Long, it: Iterator[WindowFp],
        state: GroupState[SeenWindow]): Iterator[SubstrHit] = {
      if (state.hasTimedOut) { state.remove(); return Iterator.empty }
      val sorted = it.toArray.sortBy(fp => (fp.ts.getTime, fp.docId, fp.pos))
      if (sorted.isEmpty) return Iterator.empty
      val out = scala.collection.mutable.ArrayBuffer.empty[SubstrHit]
      var st = state.getOption
      var maxTs = st.map(_.lastMs).getOrElse(0L)
      sorted.foreach { fp =>
        val t = fp.ts.getTime
        maxTs = math.max(maxTs, t)
        st match {
          case Some(s) if t - s.lastMs <= horizonMs =>
            if (!s.emitted) out += SubstrHit(s.docId, s.pos, fp.ts)
            out += SubstrHit(fp.docId, fp.pos, fp.ts)
            st = Some(s.copy(lastMs = math.max(s.lastMs, t), emitted = true))
          case _ => // nothing seen, or the last sighting aged out: reset
            st = Some(SeenWindow(fp.docId, fp.pos, t, emitted = false))
        }
      }
      state.update(st.get)
      state.setTimeoutTimestamp(maxTs + horizonMs)
      out.iterator
    }

    fps.withWatermark("ts", watermarkDelay)
      .groupByKey(_.h)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** Frozen unigram LM — the broadcastable artifact of
    * [[graft.pipeline.TextAnalysis.lmScore]]'s training phase: per-token
    * quantized log-probabilities plus the OOV floor. The vocabulary is
    * capped at train time (≤ `maxVocab` entries by construction), so
    * collecting it is bounded regardless of reference-corpus size. */
  case class LmModel(logp: Map[String, java.math.BigDecimal],
      floor: java.math.BigDecimal)

  /** Train an [[LmModel]] on a static reference corpus. Probabilities are
    * derived with the exact expressions lmScore uses (same Spark round →
    * DECIMAL(18,6) quantization), so scores from the frozen model are
    * bit-identical to the batch operator's. */
  def trainLmModel(reference: DataFrame, textCol: String,
      maxVocab: Int = 65536): LmModel = {
    import graft.pipeline.TextOps.tokens
    val vocab = reference
      .select(explode(tokens(col(s"`$textCol`"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val totals = vocab.agg(sum(col("cnt")).cast("long").as("n_total"))
    val lp = vocab.orderBy(col("cnt").desc, col("tok").asc).limit(maxVocab)
      .crossJoin(broadcast(totals))
      .select(col("tok"),
        round(log(col("cnt").cast("double") / col("n_total").cast("double")), 6)
          .cast("decimal(18,6)").as("logp"))
      .collect()
      .map(r => r.getString(0) -> r.getDecimal(1)).toMap
    val floor = totals
      .select(round(log(lit(0.5) / col("n_total").cast("double")), 6)
        .cast("decimal(18,6)").as("floor"))
      .collect().head.getDecimal(0)
    LmModel(lp, floor)
  }

  /** Streaming LM quality scoring — the stateless twin of
    * [[graft.pipeline.TextAnalysis.lmScore]]: the frozen model broadcasts
    * once and every document scores per-row (tokenize → decimal-exact
    * log-prob sum), so the transform needs no state, no watermark, and no
    * shuffle — it appends on any micro-batch cadence. The per-distinct-
    * token decimal quantization makes the sum order-independent, so batch
    * and streaming scores for the same document are BIT-identical
    * (StreamingSpec locks the parity). Works identically on a batch
    * frame. */
  def streamingLmScore(model: LmModel, docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    import graft.pipeline.TextOps.tokens
    val bc = docs.sparkSession.sparkContext.broadcast(model)
    val score = udf { toks: Seq[String] =>
      val m = bc.value
      var n = 0L
      var oov = 0L
      var sum = java.math.BigDecimal.ZERO
      toks.foreach { t =>
        n += 1
        m.logp.get(t) match {
          case Some(lp) => sum = sum.add(lp)
          case None => oov += 1; sum = sum.add(m.floor)
        }
      }
      val s = sum.doubleValue()
      (n, oov, if (n > 0) s else 0.0,
        if (n > 0) s / n.toDouble else 0.0)
    }
    docs.select(col(s"`$idCol`").cast("long").as("id"),
        score(tokens(col(s"`$textCol`"))).as("@s"))
      .select(col("id"), col("@s._1").as("n_tokens"),
        col("@s._2").as("oov_tokens"), col("@s._3").as("sum_logp"),
        col("@s._4").as("avg_logp"))
  }
}
