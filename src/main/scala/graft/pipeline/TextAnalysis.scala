package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import TextOps._

/** Text-analysis operators for corpus curation: token counting, quality
  * scoring, language identification, document fingerprinting. All columnar
  * — each op is a per-row expression (no shuffle, survives any scale-up
  * that the scan itself survives).
  */
object TextAnalysis {

  /** whitespace tokens + a BPE-ish regex count (letter runs, digits, and
    * individual punctuation marks approximate subword-tokenizer counts). */
  def tokenStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    df.select(
      col(idCol),
      size(filter(split(t, "\\s+"), x => length(x) > 0)).cast(LongType)
        .as("ws_tokens"),
      regexp_count(t, lit("[\\p{L}]+|[0-9]|[^\\p{L}0-9\\s]")).cast(LongType)
        .as("bpe_tokens"),
      length(t).cast(LongType).as("n_chars"))
  }

  /** PII scrubbing for training corpora: regex-redact emails, IPv4
    * addresses, phone-shaped digit runs, and SSN-shaped triples with
    * typed placeholder tokens, plus per-class hit counts for audit
    * stats. Counts are pattern occurrences in the ORIGINAL text, counted
    * independently per class — a string matching two classes (an email
    * whose local part is phone-shaped) counts once in each, while the
    * redaction applies the classes sequentially so exactly one
    * placeholder wins. Purely columnar (codegen regexp_replace — no UDF,
    * no shuffle); patterns are RE2-compatible so external engines (audit
    * oracles, DuckDB) reproduce the transform byte-for-byte. Order
    * matters: SSN before phone so `123-45-6789` does not half-match the
    * phone pattern. */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "<IP>"),
    ("ssn", "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b", "<SSN>"),
    ("phone", "\\b(\\+?[0-9]{1,3}[ .-]?)?\\(?[0-9]{3}\\)?[ .-][0-9]{3}[ .-][0-9]{4}\\b",
      "<PHONE>"))

  def redactPii(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val redacted = piiPatterns.foldLeft(col(textCol)) {
      case (c, (_, pat, token)) => regexp_replace(c, pat, token)
    }
    val counts = piiPatterns.map { case (name, pat, _) =>
      regexp_count(col(textCol), lit(pat)).cast(LongType).as(s"n_$name") }
    df.select(col(idCol) +: redacted.as("redacted") +: counts: _*)
  }

  /** HTML/web-crawl → training text: drops script/style blocks, turns
    * block-element boundaries into newlines, strips the remaining tags,
    * decodes the frequent entities (single-decode order: `&amp;` last),
    * normalizes intra-line whitespace, and filters boilerplate-ish lines
    * under `minLineWords` words (nav/footer fragments). Purely columnar —
    * RE2-compatible patterns, no backreferences, no UDF — so any engine
    * (the DuckDB oracle included) reproduces the output byte-for-byte. */
  def cleanHtml(df: DataFrame, idCol: String, htmlCol: String,
      minLineWords: Int = 3): DataFrame = {
    val noScript =
      regexp_replace(col(htmlCol), "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle =
      regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val blocks = regexp_replace(noStyle,
      "(?is)</(p|div|li|tr|h1|h2|h3|h4|h5|h6)>|<br[^>]*>", "\n")
    val noTags = regexp_replace(blocks, "(?s)<[^>]*>", " ")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, r)) => replace(c, lit(e), lit(r)) }
    val normLines = transform(split(decoded, "\n"),
      l => trim(regexp_replace(l, "[ \\t]+", " ")))
    val kept = filter(normLines, l =>
      size(filter(split(l, " "), w => length(w) > 0)) >= minLineWords)
    df.select(col(idCol), array_join(kept, "\n").as("clean_text"),
      size(kept).cast(LongType).as("n_lines"))
  }

  /** heuristic quality signals + a composite score in [0,1]:
    * long-enough docs with normal word lengths, low punctuation/digit
    * noise and some stopword mass score high. */
  def qualityScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    val nTok = size(toks).cast(DoubleType)
    val nChars = length(t).cast(DoubleType)
    val meanTokLen = when(nTok > 0,
      aggregate(toks, lit(0L), (a, x) => a + length(x)).cast(DoubleType) / nTok)
      .otherwise(lit(0.0))
    val punctRatio = when(nChars > 0,
      regexp_count(t, lit("[^\\p{L}0-9\\s]")).cast(DoubleType) / nChars)
      .otherwise(lit(0.0))
    val digitRatio = when(nChars > 0,
      regexp_count(t, lit("[0-9]")).cast(DoubleType) / nChars).otherwise(lit(0.0))
    val stopRatio = when(nTok > 0,
      size(array_intersect(toks, array(EN_STOPWORDS.map(lit): _*)))
        .cast(DoubleType) / size(array_distinct(toks)).cast(DoubleType))
      .otherwise(lit(0.0))

    val lengthScore = least(nTok / 100.0, lit(1.0))
    val wordLenScore = when(meanTokLen.between(3.0, 10.0), 1.0).otherwise(0.3)
    val noiseScore = greatest(lit(0.0), lit(1.0) - punctRatio * 5 - digitRatio * 3)
    val score = (lengthScore * 0.3 + wordLenScore * 0.2 + noiseScore * 0.3 +
      least(stopRatio * 4, lit(1.0)) * 0.2)

    df.select(col(idCol),
      nTok.cast(LongType).as("n_tokens"),
      round(meanTokLen, 4).as("mean_token_len"),
      round(punctRatio, 4).as("punct_ratio"),
      round(digitRatio, 4).as("digit_ratio"),
      round(stopRatio, 4).as("stopword_ratio"),
      round(score, 4).as("quality"))
  }

  // compact per-language stopword profiles (top function words)
  val EN_STOPWORDS: Seq[String] = Seq("the", "a", "an", "and", "or", "of",
    "to", "in", "is", "it", "that", "for", "on", "with", "as", "was", "at",
    "by", "be", "this", "are", "from", "not", "but", "have", "has")
  val DE_STOPWORDS: Seq[String] = Seq("der", "die", "das", "und", "oder",
    "von", "zu", "in", "ist", "es", "dass", "für", "auf", "mit", "als",
    "war", "bei", "sein", "nicht", "aber", "ein", "eine", "den", "dem")
  val FR_STOPWORDS: Seq[String] = Seq("le", "la", "les", "et", "ou", "de",
    "à", "dans", "est", "il", "que", "pour", "sur", "avec", "comme",
    "était", "par", "être", "pas", "mais", "un", "une", "des", "du")
  val ES_STOPWORDS: Seq[String] = Seq("el", "la", "los", "las", "y", "o",
    "de", "a", "en", "es", "que", "para", "sobre", "con", "como", "era",
    "por", "ser", "no", "pero", "un", "una", "del", "se")
  val IT_STOPWORDS: Seq[String] = Seq("il", "la", "i", "le", "e", "o",
    "di", "a", "in", "è", "che", "per", "su", "con", "come", "era", "da",
    "essere", "non", "ma", "un", "una", "dei", "si")

  private val PROFILES: Seq[(String, Seq[String])] = Seq(
    "en" -> EN_STOPWORDS, "de" -> DE_STOPWORDS, "fr" -> FR_STOPWORDS,
    "es" -> ES_STOPWORDS, "it" -> IT_STOPWORDS)

  /** n-gram/stopword-profile language ID: score = |tokens ∩ profile| per
    * language, argmax wins ("und" = unknown when no profile matches).
    * Argmax via array_max over (score, lang) structs — deterministic
    * tie-break on language code. */
  def languageId(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = array_distinct(tokens(col(textCol)))
    val scored = array(PROFILES.map { case (lang, words) =>
      struct(
        size(array_intersect(toks, array(words.map(lit): _*))).as("score"),
        lit(lang).as("lang"))
    }: _*)
    val best = array_max(scored)
    df.select(col(idCol),
      when(best.getField("score") > 0, best.getField("lang"))
        .otherwise(lit("und")).as("detected_lang"),
      best.getField("score").cast(LongType).as("lang_score"))
  }

  /** Winnowing document fingerprint (Schleimer et al. 2003): k-gram hashes,
    * sliding-window minima, distinct + sorted. Robust to small edits;
    * output is a compact sketch column usable for containment joins. */
  def fingerprint(df: DataFrame, idCol: String, textCol: String,
      k: Int = 7, window: Int = 4): DataFrame = {
    val hashes = transform(
      sequence(lit(0), greatest(length(col(textCol)) - k, lit(0))),
      i => xxhash64(col(textCol).substr(i + 1, lit(k))))
    val minima = transform(
      sequence(lit(0), greatest(size(hashes) - window, lit(0))),
      i => array_min(slice(hashes, i + 1, lit(window))))
    df.select(col(idCol),
      array_sort(array_distinct(minima)).as("fingerprint"))
  }

  /** Gopher/MassiveText-style repetition signals: per document, the
    * total token and 2-gram counts, the fraction of occurrences that
    * repeat an earlier one (`1 - distinct/total`), and the most frequent
    * gram's share. High values mark boilerplate / degenerate generations
    * that repetition filters drop before training. One custom-expression
    * pass per n (O(tokens) each), zero shuffle. */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import graft.functions.VectorFunctions.repetition_stats
    val s1 = repetition_stats(col(textCol), 1)
    val s2 = repetition_stats(col(textCol), 2)
    df.select(col(idCol),
      s1.getField("n_grams").as("n_tokens"),
      s1.getField("dup_frac").as("dup_token_frac"),
      s1.getField("top_frac").as("top_token_frac"),
      s2.getField("n_grams").as("n_2grams"),
      s2.getField("dup_frac").as("dup_2gram_frac"),
      s2.getField("top_frac").as("top_2gram_frac"))
  }

  /** Benchmark decontamination: flags training documents that share any
    * word n-gram with an evaluation corpus (the standard guard against
    * eval leakage into a training set). Scale shape: the benchmark gram
    * set is distinct-projected and broadcast — training-side grams are
    * joined map-side and never shuffle; output is one row per training
    * document with the contaminated-gram count. A benchmark too large to
    * broadcast degrades gracefully to a shuffled semi-join of (id, gram)
    * pairs — still narrow, never the document bodies. */
  def decontaminate(train: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int = 3): DataFrame = {
    import graft.functions.VectorFunctions.word_ngram_hashes
    val trainGrams = train.select(col(idCol).cast(LongType).as("id"),
      word_ngram_hashes(col(textCol), n).as("grams"))
    val benchGrams = bench
      .select(explode(word_ngram_hashes(col(textCol), n)).as("gram"))
      .distinct()
    val hits = trainGrams.select(col("id"), explode(col("grams")).as("gram"))
      .join(broadcast(benchGrams), Seq("gram"))
      .groupBy("id").agg(count(lit(1)).as("hits"))
    trainGrams
      .select(col("id"), size(col("grams")).cast(LongType).as("n_grams"))
      .join(hits, Seq("id"), "left")
      .select(col("id"),
        col("n_grams"),
        coalesce(col("hits"), lit(0L)).as("contaminated_grams"),
        (coalesce(col("hits"), lit(0L)) > 0).as("contaminated"))
  }

  /** Hashed bag-of-words linear classifier — the fastText-style quality
    * model shape (hash each token into one of `dim` buckets, dot the
    * bucket counts with a weight vector, threshold). Weights here are a
    * deterministic multiplicative-lattice function of the bucket id so
    * the oracle can reproduce scores bit-exactly; a real model would
    * broadcast its trained weight array into the same expression.
    *
    * Scale shape: pure per-row columnar expressions — zero shuffle, one
    * corpus pass, whole-stage codegen throughout. Determinism: bucketing
    * uses md5 (identical in every engine, unlike xxhash64), the weight
    * sum is exact integer arithmetic, and only the final normalization
    * divides — so scores are bit-identical across engines. */
  def hashedLinearScore(df: DataFrame, idCol: String, textCol: String,
      dim: Int = 1024): DataFrame = {
    val M = 1000003L        // prime weight-lattice modulus
    val A = 2654435761L     // Knuth multiplicative-hash constant
    val toks = TextOps.tokens(col(textCol))
    // bucket = first 8 md5 hex chars as an int, mod dim;
    // weight(bucket) = ((bucket * A) mod M) - M/2  ∈ [-500001, 500001]
    val weights = transform(toks, t =>
      (conv(substring(md5(t), 1, 8), 16, 10).cast(LongType) % dim * A % M)
        - lit(M / 2))
    val scoreNum = aggregate(weights, lit(0L), (acc, w) => acc + w)
    df.select(col(idCol),
        size(toks).cast(LongType).as("n_tokens"),
        scoreNum.as("score_num"))
      .select(col(idCol), col("n_tokens"), col("score_num"),
        when(col("n_tokens") > 0,
          col("score_num").cast(DoubleType) /
            (col("n_tokens").cast(DoubleType) * lit((M / 2).toDouble)))
          .otherwise(lit(0.0)).as("score"),
        (col("score_num") > 0).as("keep"))
  }
}
