package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language ID, fingerprinting.
  *
  * All pure `Column` expressions built from org.apache.spark.sql
  * functions — whole-stage-codegen-friendly, no UDFs, so they run at
  * scan speed over 100 TB of documents.
  */
object Text {

  /** Whitespace token count; empty/blank text counts 0. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish subword count estimate: word-boundary pieces + digits +
    * punctuation each count as a token (a cheap stand-in for a real
    * tokenizer's piece count). */
  def subwordCount(text: Column): Column =
    size(filter(
      split(text, """(?=[^\p{L}\p{N}])|(?<=[^\p{L}\p{N}])"""),
      p => length(trim(p)) > 0))

  /** Sliding token-window chunking — the chunk-for-embedding step of
    * retrieval / embedding pipelines: each document splits into
    * windows of `size` whitespace tokens starting every
    * `size - overlap` tokens (so consecutive chunks share `overlap`
    * tokens of context), returned as one row per chunk
    * `(idCol, chunk_ix, chunk_text)`. Every token appears in at least
    * one chunk; the final chunk may be shorter, and a trailing window
    * that would sit entirely inside its predecessor (every token
    * already covered) is not emitted. Chunk text re-joins
    * tokens with single spaces (token-window semantics: original
    * whitespace runs are not preserved, matching what a tokenizer
    * sees). Blank / null documents produce no chunks.
    *
    * Pure HOF + posexplode — no shuffle, no UDF; chunking 100 TB is a
    * scan. Compose with [[graft.ops.Sample.packSequences]] to pack
    * the chunks and [[graft.ops.Similarity]] to index embeddings of
    * them. */
  def chunkTokens(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, size: Int, overlap: Int = 0): org.apache.spark.sql.DataFrame = {
    require(size > 0, s"chunk size $size must be positive")
    require(overlap >= 0 && overlap < size,
      s"overlap $overlap must be in [0, size)")
    val step = size - overlap
    // null text short-circuits to an empty token list BEFORE the size
    // check: under the legacy conf `size(null)` is -1, which would
    // fabricate a sequence(0, -1) = [0, -1] and emit two empty chunks
    val toks0 = when(col(textCol).isNull, array().cast("array<string>"))
      .otherwise(filter(split(trim(col(textCol)), "\\s+"),
        t => length(t) > 0))
    // a window is emitted only when it contributes at least one NEW
    // token: starts run while s < nTokens - overlap, i.e. nChunks =
    // max(1, ceil((nTokens - overlap) / step)) — the trailing window
    // that ceil(nTokens / step) would add whenever nTokens % step is
    // in (0, overlap] sits entirely inside its predecessor and would
    // only produce redundant downstream embedding work. Coverage
    // still holds: the last start is ≥ nTokens - size.
    val chunks = Hof.bind(toks0, toks =>
        when(org.apache.spark.sql.functions.size(toks) === 0,
            array().cast("array<string>"))
          .otherwise(transform(
            sequence(lit(0),
              greatest(lit(0),
                ceil((org.apache.spark.sql.functions.size(toks) - overlap)
                  .cast("double") / step).cast("int") - 1)),
            i => concat_ws(" ", slice(toks, i * step + 1, lit(size))))))
    df.select(col(idCol),
      posexplode(chunks).as(Seq("chunk_ix", "chunk_text")))
  }

  /** Mean whitespace-token length. */
  def avgTokenLength(text: Column): Column =
    when(tokenCount(text) === 0, lit(null))
      .otherwise(length(regexp_replace(trim(text), "\\s+", ""))
        .cast("double") / tokenCount(text))

  /** Fraction of characters that are punctuation/symbols. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      (length(text) - length(regexp_replace(text, """[\p{P}\p{S}]""", "")))
        .cast("double") / length(text))

  /** Fraction of whitespace tokens present in `stopwords`. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    when(tokenCount(text) === 0, lit(0.0)).otherwise(
      size(filter(toks, t => t.isin(stopwords: _*))).cast("double") / size(toks))
  }

  private val enStop = Seq("the", "a", "an", "and", "or", "of", "to", "in",
    "is", "it", "that", "for", "on", "with", "as", "at", "by", "be")

  /** Composite [0,1] quality score: length in a sane band, low punct
    * density, some stopwords (fluent prose), reasonable token length.
    * Heuristic weights, like reference-pipeline quality filters. */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text)
    val lenOk = when(nTok.between(10, 100000), lit(1.0))
      .otherwise(when(nTok === 0, lit(0.0)).otherwise(lit(0.5)))
    val punctOk = lit(1.0) - least(punctRatio(text) * 4, lit(1.0))
    val stopOk = least(stopwordRatio(text, enStop) * 5, lit(1.0))
    val tokLenOk = when(coalesce(avgTokenLength(text), lit(0.0)).between(2.0, 12.0),
      lit(1.0)).otherwise(lit(0.3))
    round(lenOk * 0.3 + punctOk * 0.3 + stopOk * 0.2 + tokLenOk * 0.2, 4)
  }

  /** Stopword tables for the n-gram-free language-ID heuristic. */
  private val langStop: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "that", "for", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "fr" -> Seq("le", "la", "les", "et", "est", "pas", "une", "des"),
    "es" -> Seq("el", "la", "los", "y", "es", "no", "una", "con"))

  /** Language ID: CJK codepoint share decides zh; otherwise the
    * stopword table with the highest hit count wins, default en. */
  def langId(text: Column): Column = {
    val cjk = length(regexp_replace(text, "[^\\x{4E00}-\\x{9FFF}]", ""))
    val scores = langStop.map { case (lang, words) =>
      val toks = split(lower(trim(text)), "\\s+")
      lang -> size(filter(toks, t => t.isin(words: _*)))
    }
    // greatest-of with argmax via chained when: order keeps ties on the
    // earlier (more common) language.
    val maxScore = greatest(scores.map(_._2): _*)
    val pick = scores.reverse.foldLeft(lit("en")) { case (acc, (l, s)) =>
      when(s === maxScore && maxScore > 0, lit(l)).otherwise(acc)
    }
    when(cjk * 2 > length(text), lit("zh")).otherwise(pick)
  }

  /** 64-bit document fingerprint over normalized content (case- and
    * whitespace-insensitive) — rolling-hash equivalent for exact-ish
    * dedup and change detection. */
  def fingerprint(text: Column): Column =
    xxhash64(regexp_replace(lower(trim(text)), "\\s+", " "))

  // ------------------------------------------------------------- PII
  //
  // Patterns are deliberately RE2-compatible (no lookaround, no
  // backreferences) so the same regex text runs identically in Spark's
  // java.util.regex and in RE2-based engines — redaction decisions
  // must not depend on which engine scanned the shard.

  /** Email addresses. */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4 addresses (syntactic — no octet range check,
    * matching standard scrubber behavior). */
  val ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Phone-ish numbers: optional +country, 2-4 digit groups separated
    * by -, ., or space — at least three groups, so plain integers and
    * years never match. */
  val phonePattern =
    "\\+?\\d{1,3}[-. ]\\(?\\d{2,4}\\)?[-. ]\\d{3,4}[-. ]\\d{2,4}"

  /** Per-document PII hit counts — the triage pass that decides what
    * goes to the (more expensive) redaction rewrite. Pure codegen'd
    * regexp counts, one scan. */
  def piiCounts(text: Column): Column = struct(
    regexp_count(text, lit(emailPattern)).as("emails"),
    regexp_count(text, lit(ipv4Pattern)).as("ips"),
    regexp_count(text, lit(phonePattern)).as("phones"))

  /** Redact PII in place: emails → `[EMAIL]`, IPv4 → `[IP]`,
    * phone-ish numbers → `[PHONE]`. Email first (its local part may
    * contain digits a later pattern would bite into), IP before phone
    * (dotted quads also parse as dot-separated digit groups). */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailPattern, "[EMAIL]"),
        ipv4Pattern, "[IP]"),
      phonePattern, "[PHONE]")

  // ----------------------------------------------------------- TF-IDF

  /** Per-(document, token) TF-IDF over whitespace tokens:
    * `tf * (ln((N + 1) / (df + 1)) + 1)` (smoothed idf, never
    * negative). Returns (idCol, token, tf, df, tfidf).
    *
    * Scale shape: one explode + groupBy(doc, token) with map-side
    * combine for tf; token document frequencies aggregated from the tf
    * frame (already one row per doc×token, so no second corpus scan);
    * the corpus size joins in as a broadcast one-row aggregate —
    * no driver-side count, no window. */
  def tfidf(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val toks = filter(
      split(lower(trim(col(textCol))), "\\s+"), t => length(t) > 0)
    val tf = Par.spread(df)
      .select(col(idCol), explode(toks).as("token"))
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    val dfs = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val total = df.agg(count(lit(1)).as("__n"))
    tf.join(dfs, Seq("token"))
      .crossJoin(broadcast(total))
      .withColumn("tfidf", round(col("tf") *
        (log((col("__n") + lit(1.0)) / (col("df") + lit(1.0))) + lit(1.0)), 6))
      .select(col(idCol), col("token"), col("tf"), col("df"), col("tfidf"))
  }

  /** Per-(document, token) Okapi BM25 score — the ranking function a
    * corpus-scale keyword search / quality-by-rarity filter needs.
    * `idf = ln(1 + (N - df + 0.5) / (df + 0.5))`,
    * `score = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len/avgLen))`.
    * Returns (idCol, token, tf, df, bm25).
    *
    * Scale shape: same single explode + two map-side-combined
    * aggregations as [[tfidf]]; doc lengths ride the tf frame (summed
    * per doc — no second corpus scan), and the corpus constants
    * (N, avg length) join in as ONE broadcast row. */
  def bm25(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, k1: Double = 1.2, b: Double = 0.75)
      : org.apache.spark.sql.DataFrame = {
    val toks = filter(
      split(lower(trim(col(textCol))), "\\s+"), t => length(t) > 0)
    val tf = Par.spread(df)
      .select(col(idCol), explode(toks).as("token"))
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    val lens = tf.groupBy(col(idCol)).agg(sum(col("tf")).as("__len"))
    val dfs = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val consts = lens.agg(count(lit(1)).as("__n"),
      avg(col("__len")).as("__avglen"))
    val idf = log(lit(1.0) +
      (col("__n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    tf.join(lens, Seq(idCol)).join(dfs, Seq("token"))
      .crossJoin(broadcast(consts))
      .withColumn("bm25", round(idf * col("tf") * lit(k1 + 1.0) /
        (col("tf") + lit(k1) * (lit(1.0 - b) +
          lit(b) * col("__len") / col("__avglen"))), 6))
      .select(col(idCol), col("token"), col("tf"), col("df"), col("bm25"))
  }

  /** Corpus vocabulary with document frequencies: one row per distinct
    * lowercased whitespace token, with the number of documents it
    * appears in — the input to stopword mining / rare-token filters.
    * Scale shape: explode distinct per-doc tokens (dedup inside the
    * array first, so a token repeated in one doc costs one row), one
    * count aggregate with map-side combine. */
  def documentFrequencies(df: org.apache.spark.sql.DataFrame,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val toks = array_distinct(filter(
      split(lower(trim(col(textCol))), "\\s+"), t => length(t) > 0))
    Par.spread(df).select(explode(toks).as("token"))
      .groupBy("token").agg(count(lit(1)).as("docs"))
  }

  // ------------------------------------------------- unigram LM score

  /** Unigram language-model quality scoring: the mean token
    * log-probability of each document under an add-one-smoothed
    * unigram model trained on `ref` — the cheap stand-in for the
    * "score candidates with a small LM trained on a trusted corpus"
    * filter every published data pipeline runs (CCNet/KenLM-style,
    * one order lower). `logp(t) = ln((c(t)+1)/(T+V))` with `c` the
    * ref count, `T` total ref tokens, `V` ref vocabulary size; tokens
    * unseen in ref score `ln(1/(T+V))`. Returns one row per document
    * with ≥1 token: (idCol, n_tokens, lm_logprob), logprob rounded to
    * 6 places (higher = more ref-like).
    *
    * Scale shape: ref collapses to one (token, count) frame via a
    * map-side-combined aggregate; the corpus side is the same single
    * explode + per-(doc, token) count as [[tfidf]], joined to the ref
    * counts on token (OOV via left join), with the two model constants
    * (T, V) broadcast as ONE row. No window, no driver collect — the
    * model may be arbitrarily large because it is joined, not
    * broadcast. */
  def lmScore(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, ref: org.apache.spark.sql.DataFrame,
      refTextCol: String): org.apache.spark.sql.DataFrame = {
    def toks(c: Column) =
      filter(split(lower(trim(c)), "\\s+"), t => length(t) > 0)
    val counts = Par.spread(ref)
      .select(explode(toks(col(refTextCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("__c"))
    val consts = counts.agg(sum(col("__c")).as("__t"),
      count(lit(1)).as("__v"))
    val tf = Par.spread(df)
      .select(col(idCol), explode(toks(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("__tf"))
    tf.join(counts, Seq("token"), "left")
      .crossJoin(broadcast(consts))
      .withColumn("__lp",
        log((coalesce(col("__c"), lit(0L)) + lit(1.0)) /
          (col("__t") + col("__v"))))
      .groupBy(col(idCol))
      .agg(sum(col("__tf")).cast("bigint").as("n_tokens"),
        round(sum(col("__tf") * col("__lp")) / sum(col("__tf")), 6)
          .as("lm_logprob"))
  }

  // ------------------------------------- linear quality classifier

  /** Token log-odds weights of a linear quality classifier trained on
    * two labeled corpora — the closed-form, deterministic stand-in
    * for the fastText-style wiki-vs-crawl quality filter the
    * published curation pipelines run (CCNet; DSIR's importance
    * weights are the same ratio over hashed n-grams). Multinomial
    * Naive Bayes with add-one smoothing over the UNION vocabulary:
    * `w(t) = ln((c_pos(t)+1)/(T_pos+V)) − ln((c_neg(t)+1)/(T_neg+V))`
    * — a token seen on one side only still gets a finite weight.
    * Returns (token, weight), weight rounded to 6 places; the model
    * is DATA, so scoring is engine-reproducible (unlike a fitted
    * estimator).
    *
    * Scale shape: each side collapses to a map-side-combined
    * (token, count) aggregate, full-outer-joined on token; the three
    * model constants broadcast as ONE row. The model may be
    * arbitrarily large — nothing collects to the driver. */
  def classifierWeights(pos: org.apache.spark.sql.DataFrame,
      posTextCol: String, neg: org.apache.spark.sql.DataFrame,
      negTextCol: String): org.apache.spark.sql.DataFrame = {
    def toks(c: Column) =
      filter(split(lower(trim(c)), "\\s+"), t => length(t) > 0)
    def counts(d: org.apache.spark.sql.DataFrame, c: String, n: String) =
      Par.spread(d).select(explode(toks(col(c))).as("token"))
        .groupBy("token").agg(count(lit(1)).as(n))
    val joined = counts(pos, posTextCol, "__cp")
      .join(counts(neg, negTextCol, "__cn"), Seq("token"), "full_outer")
    val consts = joined.agg(
      sum(coalesce(col("__cp"), lit(0L))).as("__tp"),
      sum(coalesce(col("__cn"), lit(0L))).as("__tn"),
      count(lit(1)).as("__v"))
    joined.crossJoin(broadcast(consts))
      .select(col("token"), round(
        log((coalesce(col("__cp"), lit(0L)) + lit(1.0)) /
          (col("__tp") + col("__v"))) -
        log((coalesce(col("__cn"), lit(0L)) + lit(1.0)) /
          (col("__tn") + col("__v"))), 6).as("weight"))
  }

  /** Score each document under a (token, weight) linear model: the
    * MEAN per-token weight (length-normalized, like [[lmScore]]), so
    * score > 0 reads "pos-like". Tokens absent from the model score 0
    * — true NB would give every OOV token the constant
    * `ln((T_neg+V)/(T_pos+V))`, an offset that depends only on corpus
    * sizes; dropping it lets the weights table alone define the
    * model. Returns one row per document with ≥1 token:
    * (idCol, n_tokens, clf_score).
    *
    * The weighted sum runs in integer MICRO-UNITS (weights are
    * 6-decimal, so `round(w*1e6)` is exact): integer addition is
    * associative, so the score cannot wobble in the last ulp with
    * partitioning, token order, or engine — a float sum rounds
    * differently on either side of a half-way boundary and breaks
    * cross-engine reproducibility.
    *
    * Scale shape: the same single explode + per-(doc, token) count as
    * [[tfidf]], left-joined to the weights on token — joined, not
    * broadcast, so the model can exceed executor memory. */
  def classifierScore(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, weights: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    def toks(c: Column) =
      filter(split(lower(trim(c)), "\\s+"), t => length(t) > 0)
    val tf = Par.spread(df)
      .select(col(idCol), explode(toks(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("__tf"))
    val wi = round(col("weight") * lit(1e6)).cast("bigint")
    tf.join(weights, Seq("token"), "left")
      .groupBy(col(idCol))
      .agg(sum(col("__tf")).cast("bigint").as("n_tokens"),
        sum(col("__tf") * coalesce(wi, lit(0L))).as("__s"))
      .select(col(idCol), col("n_tokens"),
        round(col("__s") / col("n_tokens") / lit(1e6), 6).as("clf_score"))
  }

  /** 64-bit identity hashes of the word n-gram MULTISET (duplicates
    * kept, unlike [[Dedup.shingleHashes]]) — the repetition statistics
    * need occurrence counts, not set identity. Each token is hashed
    * ONCE (`tokenHashes`), and a gram's hash is the left fold
    * `a*P + h(tok)` over its window — pure long arithmetic per gram
    * instead of a per-gram string slice + concat + byte hash, which
    * dominated the old cost (an n-token doc built O(n·3) strings).
    * Documents with fewer than n tokens collapse to one whole-text
    * gram (the same fold over all tokens), so every doc has ≥1 gram
    * for every n. */
  /** Model-free document embedding by the signed hashing trick: each
    * whitespace token of `textCol` hashes into one of `dims` buckets
    * with a ±1 sign (md5-derived, engine-replayable — see
    * [[graft.functions.TextKernels.featureHash]]), and the per-bucket
    * signed counts become an `array<float>` column named `outCol`,
    * L2-normalized unless `normalize = false`.
    *
    * This is the bridge from the text world to the vector world when
    * no encoder model is available (or affordable at 100 TB): the
    * output column feeds [[Similarity.buildIndex]],
    * [[Similarity.cosineDedup]], SemDeDup, and
    * [[Similarity.decontaminateSemantic]] unchanged. Cosine of two
    * hashed vectors estimates the cosine of the underlying bag-of-
    * words TF vectors (collisions are zero-mean by the sign bit).
    *
    * Scale shape: one native codegen kernel per row — O(tokens + dims)
    * CPU, no explode, no shuffle; embedding 100 TB is a scan. */
  def hashEmbed(df: org.apache.spark.sql.DataFrame, textCol: String,
      dims: Int, outCol: String = "embedding",
      normalize: Boolean = true): org.apache.spark.sql.DataFrame = {
    val raw = graft.functions.TextKernels.featureHash(
      split(lower(trim(col(textCol))), "\\s+"), dims)
    df.withColumn(outCol,
      if (normalize) graft.ops.Similarity.l2Normalize(raw) else raw)
  }

  private val gramP = lit(-7046029254386353131L) // 2^64 / golden ratio
  private def tokenHashes(text: Column): Column =
    transform(split(lower(trim(text)), "\\s+"), t => xxhash64(t))
  private def rawGramHashes(th: Column, n: Int): Column = {
    if (n == 1) th
    else when(size(th) < n,
        array(aggregate(th, lit(0L), (a, x) => a * gramP + x)))
      .otherwise(transform(sequence(lit(0), size(th) - n), i =>
        (0 until n).foldLeft(lit(0L): Column)((a, k) =>
          a * gramP + element_at(th, i + k + 1))))
  }

  /** Benchmark DECONTAMINATION: flag corpus docs sharing any word
    * `n`-gram with any document of `bench` (the eval-set overlap
    * check a training pipeline runs before every release; n = 13 is
    * the common published choice). Returns one row per CONTAMINATED
    * doc: (idCol, n_hits) where n_hits counts the doc's distinct
    * n-grams that appear anywhere in the benchmark.
    *
    * Scale shape: the benchmark side collapses to a distinct gram-
    * hash set (eval suites are tiny next to a training corpus) and is
    * broadcast, so the corpus side is ONE explode + broadcast-hash
    * semi-join + count aggregate with map-side combine — no shuffle
    * of text, no shuffle of the corpus at all. */
  def decontaminate(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, bench: org.apache.spark.sql.DataFrame,
      benchTextCol: String, n: Int = 13): org.apache.spark.sql.DataFrame = {
    val bg = bench
      .select(explode(Dedup.shingleHashes(col(benchTextCol), n)).as("__h"))
      .distinct()
    Par.spread(df)
      .select(col(idCol), explode(Dedup.shingleHashes(col(textCol), n)).as("__h"))
      .join(broadcast(bg), Seq("__h"))
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_hits"))
  }

  /** [[decontaminate]] for benchmark/blocklist sides TOO BIG to
    * broadcast as an exact gram set: a Bloom-filter prefilter plus an
    * exact verify join — same EXACT result (the bloom's false
    * positives are killed by the verify join; it has no false
    * negatives), different memory envelope. An exact distinct-hash
    * set of 1B grams costs ~8 GB+ broadcast; the bloom at 1% fpp
    * costs ~1.2 GB — and the verify join only shuffles the
    * candidates that pass the bloom (true hits + ~fpp of the corpus
    * grams), never the corpus itself.
    *
    * The membership probe is a `mightContainLong` over the broadcast
    * sketch — one of the few places a UDF is the right call: Spark's
    * BloomFilter probe isn't exposed as a SQL function (the
    * `bloom_filter_agg`/`might_contain` expressions are internal,
    * reserved for runtime row-level filtering), and the probe is a
    * couple of hash ops on a long, not a codegen-hostile hot loop. */
  def decontaminateBloom(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, bench: org.apache.spark.sql.DataFrame,
      benchTextCol: String, n: Int = 13,
      fpp: Double = 0.01): org.apache.spark.sql.DataFrame = {
    val bg = bench
      .select(explode(Dedup.shingleHashes(col(benchTextCol), n)).as("__h"))
      .distinct()
    // expected-item count sizes the sketch; one extra job over the
    // (small) bench side, amortized by not broadcasting it exactly
    val bloom = bg.stat.bloomFilter("__h", math.max(bg.count(), 1L), fpp)
    val bloomBc = df.sparkSession.sparkContext.broadcast(bloom)
    val might = udf((h: Long) => bloomBc.value.mightContainLong(h))
    Par.spread(df)
      .select(col(idCol), explode(Dedup.shingleHashes(col(textCol), n)).as("__h"))
      .filter(might(col("__h")))
      .join(bg.hint("shuffle_hash"), Seq("__h")) // exact verify: only
      .groupBy(col(idCol))                       // bloom survivors
      .agg(count(lit(1)).as("n_hits"))           // shuffle
  }

  /** SPAN-LEVEL decontamination: rewrite each corpus document with
    * every word n-gram that appears anywhere in `bench` REMOVED,
    * instead of flagging/dropping the whole document
    * ([[decontaminate]]). The surgical variant for long documents
    * that merely QUOTE an eval item — dropping them wholesale wastes
    * the clean 99%; published decontamination pipelines ship both
    * modes. Overlapping contaminated spans merge via the distinct
    * token-position set; untouched documents keep their text
    * verbatim, trimmed ones come back whitespace-normalized (same
    * output contract as [[Dedup.trimDuplicateSpans]], whose positional
    * machinery this reuses — the bench set simply replaces the
    * cross-document ownership rule: benchmark grams always lose).
    *
    * Scale shape: the benchmark collapses to a broadcast distinct
    * gram-hash set; the corpus side is one positional-gram explode
    * (longs) + broadcast semi-join + per-doc interval collect, then
    * ONE join of removed-position arrays back to the corpus — text
    * shuffles exactly once, in that final join. */
  def decontaminateTrim(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, bench: org.apache.spark.sql.DataFrame,
      benchTextCol: String, n: Int = 13): org.apache.spark.sql.DataFrame = {
    val bg = bench
      .select(explode(Dedup.shingleHashes(col(benchTextCol), n)).as("__h"))
      .distinct()
    val g = Dedup.spanGrams(df, idCol, textCol, n)
    val removed = g.join(broadcast(bg), Seq("__h"))
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("__pos").as("p"), col("__span").as("s")))
        .as("__iv"))
      .select(col(idCol), array_distinct(flatten(transform(col("__iv"),
        iv => sequence(iv.getField("p"),
          iv.getField("p") + iv.getField("s") - 1)))).as("__rm"))
    val keep = filter(split(trim(col(textCol)), "\\s+"),
      (_, i) => !array_contains(col("__rm"), i))
    df.join(removed, Seq(idCol), "left")
      .select(col(idCol),
        when(col("__rm").isNull, col(textCol))
          .otherwise(concat_ws(" ", keep)).as(textCol))
  }

  /** Gopher-style REPETITION statistics: per doc, the fraction of
    * content captured by the single most frequent unigram / bigram /
    * trigram (`top_ngram_frac` = occurrences of the modal n-gram over
    * all n-gram occurrences). Heavily templated or looping text —
    * the failure mode repetition filters exist for — scores high;
    * healthy prose sits low. Returns
    * (idCol, top_unigram_frac, top_bigram_frac, top_trigram_frac),
    * each rounded to 6 places.
    *
    * Scale shape: per n, one explode + two map-side-combinable
    * aggregations (count per (doc, gram-hash), then max/sum per doc);
    * the three n-gram frames join back on the doc id. Gram hashes
    * stand in for gram strings — counts only need identity. */
  def repetition(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    // ZERO-shuffle shape: all of one document's n-grams live in its
    // own row, so the modal-gram count never needs to leave the row —
    // sort the gram-hash array and take the maximal run length in one
    // sequential per-row fold. Replaces the former explode → count per
    // (doc, hash) → max/sum per doc chain, whose first aggregation
    // shuffled ~every gram occurrence (distinct-(doc,gram) pairs ≈ all
    // occurrences in natural text): 18.6s → ~3s at sf0.1, and at
    // 100 TB the map-only plan cannot skew — no hot keys exist.
    // (rawGramHashes emits one whole-text gram when a doc has fewer
    // than n tokens, so every doc appears for every n and the division
    // is never by zero.)
    def topFrac(n: Int, name: String) =
      // sorted is referenced twice (fold input + size) — let-bind it
      Hof.bind(array_sort(rawGramHashes(col("__th"), n)), sorted => {
        val acc0 = struct(lit(0L).as("prev"), lit(0L).as("run"),
          lit(0L).as("mx"))
        val modal = aggregate(sorted, acc0,
          (acc, x) => {
            val run = when(acc.getField("run") === 0L ||
              x =!= acc.getField("prev"), lit(1L))
              .otherwise(acc.getField("run") + 1L)
            struct(x.as("prev"), run.as("run"),
              greatest(acc.getField("mx"), run).as("mx"))
          },
          acc => acc.getField("mx"))
        round(modal.cast("double") / size(sorted), 6)
      }).as(name)
    // tokenize + hash in a projection of its OWN so the work runs once
    // per row, not once per output column (HOFs are interpreted, so
    // codegen subexpression elimination can't dedup them; CollapseProject
    // keeps the split because __th is non-cheap and referenced 3×)
    Par.spread(df)
      .select(col(idCol), tokenHashes(col(textCol)).as("__th"))
      .select(col(idCol), topFrac(1, "top_unigram_frac"),
        topFrac(2, "top_bigram_frac"), topFrac(3, "top_trigram_frac"))
  }

  /** Gopher-rule document signals (Rae et al. 2021, appendix A —
    * the published line-level quality heuristics the n-gram
    * [[repetition]] fractions don't cover). One struct per document:
    *
    *  - `frac_bullet_lines`: non-empty lines starting with a bullet
    *    (`•`, `-`, `*`) — listicle/boilerplate share.
    *  - `frac_ellipsis_lines`: non-empty lines ending `...`/`…` —
    *    truncated-preview share.
    *  - `dup_line_frac`: `1 − distinct/total` over non-empty trimmed
    *    lines.
    *  - `dup_line_char_frac`: characters in repeat occurrences of a
    *    line (beyond its first) over all line characters.
    *  - `frac_alpha_words`: whitespace tokens containing a Latin
    *    letter.
    *  - `symbol_word_ratio`: `#` and ellipsis occurrences per token.
    *
    * All fractions rounded to 6 places; empty denominators yield 0.
    * Pure per-row HOF/regexp Column — no shuffle, no UDF, scan-speed
    * over 100 TB. Thresholding is the caller's policy (Gopher's cuts:
    * bullet > 0.9, ellipsis > 0.3, alpha < 0.8, symbol > 0.1). */
  def gopherSignals(text: Column): Column = {
    val tl = coalesce(text, lit(""))
    Hof.bind(filter(transform(split(tl, "\n"), l => trim(l)), l => l =!= ""),
      lines => {
        val nL = size(lines)
        def fracLines(p: Column => Column) =
          when(nL === 0, lit(0.0)).otherwise(
            round(size(filter(lines, p)).cast("double") / nL, 6))
        val charsOf = (ls: Column) =>
          aggregate(ls, lit(0L), (a, l) => a + length(l))
        val toks = filter(split(trim(tl), "\\s+"), t => t =!= "")
        val nT = size(toks)
        def occurrences(needle: String, width: Int) =
          (length(tl) - length(regexp_replace(tl,
            java.util.regex.Pattern.quote(needle), ""))) / width
        struct(
          fracLines(_.rlike("^[•*-]")).as("frac_bullet_lines"),
          fracLines(_.rlike("(\\.\\.\\.|…)$")).as("frac_ellipsis_lines"),
          when(nL === 0, lit(0.0)).otherwise(round(
            (nL - size(array_distinct(lines))).cast("double") / nL, 6))
            .as("dup_line_frac"),
          when(nL === 0, lit(0.0)).otherwise(round(
            (charsOf(lines) - charsOf(array_distinct(lines))).cast("double") /
              greatest(charsOf(lines), lit(1L)), 6))
            .as("dup_line_char_frac"),
          when(nT === 0, lit(0.0)).otherwise(round(
            size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("double") / nT,
            6)).as("frac_alpha_words"),
          when(nT === 0, lit(0.0)).otherwise(round(
            (occurrences("#", 1) + occurrences("…", 1) +
              occurrences("...", 3)).cast("double") / nT, 6))
            .as("symbol_word_ratio"))
      })
  }

  /** C4-style line cleaning (Raffel et al. 2020 §2.2 heuristics —
    * published, widely replicated): keep only lines with at least
    * `minWords` whitespace tokens and, when `requireTerminal`, a
    * terminal punctuation mark; drop the rest and rejoin with
    * newlines. The boilerplate scrubber (nav menus, cookie banners,
    * footer fragments) every web-corpus pipeline runs before dedup.
    * Pure higher-order-function Column — per-row, no shuffle, no UDF. */
  def cleanLines(text: org.apache.spark.sql.Column, minWords: Int = 3,
      requireTerminal: Boolean = true): org.apache.spark.sql.Column = {
    val kept = filter(split(text, "\n"), l =>
      Hof.bind(trim(l), t => {
        val enough = size(split(t, "\\s+")) >= minWords && t =!= ""
        if (requireTerminal) enough && t.rlike("[.!?\"']$") else enough
      }))
    array_join(kept, "\n")
  }

  /** Character-distribution Shannon entropy (nats) — the gibberish /
    * low-entropy-spam quality heuristic (natural prose ~2.8-3.2,
    * repeated-char spam near 0). Native codegen kernel
    * ([[graft.functions.TextKernels.charEntropy]]); composes with
    * [[qualityScore]]/[[gopherSignals]] as a filter floor/ceiling.
    * Empty or NULL text → NULL. */
  def charEntropy(text: Column): Column =
    graft.functions.TextKernels.charEntropy(text)

  /** Visible text from raw HTML — the extraction step between a
    * crawl archive ([[graft.sources.Warc]] payloads) and everything
    * else in this module; the stage WET files are made of. Native
    * codegen kernel ([[graft.functions.TextKernels.htmlText]]):
    * script/style raw-text skip, head/template/svg suppression,
    * block tags → line breaks, entity decode, trimmed single-spaced
    * lines. Typically followed by [[normalizeUnicode]] →
    * [[cleanLines]] → quality/dedup. NULL in, NULL out. */
  def htmlToText(html: Column): Column =
    graft.functions.TextKernels.htmlText(html)

  /** Unicode text hygiene — the canonical FIRST stage of a web-corpus
    * cleaner: NFC normalization (native codegen kernel,
    * [[graft.functions.TextKernels.nfc]] — decomposed `e`+U+0301 and
    * precomposed `é` become byte-identical, so exact dedup,
    * fingerprints and shingle hashes stop depending on which encoder
    * produced the page), then newline canonicalization (CRLF and
    * lone CR → LF), then C0/DEL control stripping (tab and newline
    * kept). Narrow, stateless, per-row, fully codegen'd; NULL in,
    * NULL out. Order matters and is part of the contract (the DuckDB
    * oracle replays it verbatim): normalize first, so the control
    * scrub sees composed code points. */
  def normalizeUnicode(text: Column): Column =
    regexp_replace(
      regexp_replace(graft.functions.TextKernels.nfc(text),
        "\\r\\n|\\r", "\n"),
      "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", "")

  /** Canonical URL form for web-corpus dedup: the same page crawled
    * as `HTTPS://WWW.Site.com:443/p/1/?utm_source=x&b=2&a=1#top` and
    * `https://site.com/p/1?a=1&b=2` must collapse to ONE key before
    * URL-level dedup, or the corpus keeps every tracking-link
    * variant. Rules (the standard crawl-pipeline set):
    * scheme + host lowercased, `www.` and the scheme's default port
    * stripped, fragment dropped, tracking parameters removed
    * (`utm_*`, `fbclid`, `gclid`, `msclkid`, `mc_cid`, `mc_eid`),
    * remaining query params sorted, empty path normalized to `/` and
    * a trailing slash on a non-root path dropped. Scheme-less input
    * is assumed `http`. Pure regexp/HOF Column — per-row, codegen,
    * no shuffle, no UDF; NULL in, NULL out. */
  /** Lowercased host of a URL: scheme/fragment/path dropped, any
    * `:port` and a leading `www.` stripped (the [[normalizeUrl]] host
    * rules, exposed standalone). Scheme-less input reads from the
    * first character. NULL in, NULL out; pure regexp Column. */
  def urlHost(url: Column): Column = {
    val noFrag = regexp_replace(trim(url), "#.*$", "")
    val rest = regexp_replace(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", "")
    val auth = lower(regexp_extract(rest, "^([^/?]*)", 1))
    regexp_replace(regexp_replace(auth, ":\\d*$", ""), "^www\\.", "")
  }

  /** Domain-BLOCKLIST filter (the RefinedWeb/C4 URL-level gate: drop
    * documents from curated adult/malware/boilerplate domain lists
    * before any content-level stage runs). A document drops when its
    * URL's host equals a blocked domain OR is a subdomain of one
    * (`a.b.example.com` matches blocked `example.com`). Returns the
    * SURVIVORS; rows with a NULL `urlCol` cannot match and survive.
    *
    * Scale shape: each row explodes only its host's label-suffix set
    * (≤ label count, typically ≤ 5 short strings — the payload never
    * moves) and equi-joins the normalized blocklist on the suffix;
    * Spark broadcasts the blocklist when it is small (the usual ~1M-
    * domain curated list) and shuffle-joins otherwise — no per-row
    * scan of the list, no LIKE join, no UDF. */
  def filterDomains(df: org.apache.spark.sql.DataFrame, urlCol: String,
      idCol: String, blocklist: org.apache.spark.sql.DataFrame,
      domainCol: String = "domain"): org.apache.spark.sql.DataFrame = {
    val labels = split(urlHost(col(urlCol)), "\\.")
    val sufs = Hof.bind(labels, ls =>
      transform(sequence(lit(0), size(ls) - 1), i =>
        array_join(slice(ls, i + 1, size(ls)), ".")))
    val cand = df.select(col(idCol).as("__id"), explode(sufs).as("__dom"))
    val bl = blocklist
      .select(lower(trim(col(domainCol))).as("__dom")).distinct()
    val doomed = cand.join(bl, Seq("__dom"))
      .select(col("__id").as(idCol)).distinct()
    df.join(doomed, Seq(idCol), "left_anti")
  }

  def normalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(trim(url), "#.*$", "")
    val schemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
    Hof.bind(lower(regexp_extract(noFrag, schemeRe, 1)), rawScheme =>
    Hof.bind(when(rawScheme === "", lit("http")).otherwise(rawScheme), scheme =>
    Hof.bind(regexp_replace(noFrag, schemeRe, ""), rest => {
      val authority = lower(regexp_extract(rest, "^([^/?]*)", 1))
      val defPort = when(scheme === "http", lit(":80$"))
        .when(scheme === "https", lit(":443$"))
        .otherwise(lit(":(?!)$")) // unknown scheme: match-nothing regex
      val host = regexp_replace(
        regexp_replace(authority, lit("^www\\."), lit("")), defPort, lit(""))
      val tail = regexp_replace(rest, "^[^/?]*", "")
      val path0 = regexp_extract(tail, "^([^?]*)", 1)
      val path = when(path0 === "", lit("/"))
        .otherwise(regexp_replace(path0, "(.)/$", "$1"))
      val tracking = "^(utm_[^=]*|fbclid|gclid|msclkid|mc_cid|mc_eid)(=|$)"
      val params = filter(split(regexp_extract(tail, "\\?(.*)$", 1), "&"),
        p => p =!= "" && !p.rlike(tracking))
      val q = array_join(array_sort(params), "&")
      concat(scheme, lit("://"), host, path,
        when(q === "", lit("")).otherwise(concat(lit("?"), q)))
    })))
  }
}
