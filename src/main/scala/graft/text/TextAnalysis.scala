package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Text-analysis operators for training-data pipelines: token statistics,
  * quality scoring, language ID, fingerprinting. Everything is built from
  * codegen'd `org.apache.spark.sql.functions` array/string expressions — no
  * UDFs — so the ops scan-pipeline at 100 TB (narrow, no shuffle).
  */
object TextAnalysis {

  /** Whitespace tokens (the corpus is single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish subword segmentation: runs of letters, runs of digits, or a
    * single other non-space symbol — the classic pre-tokenizer regex.
    */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-z]+|[A-Z]+|[0-9]+|[^a-zA-Z0-9 ]"), lit(0))).cast("bigint")

  val StopWords: Seq[String] = Seq("the", "a")

  /** Per-document token statistics. Adds n_tokens, n_distinct_tokens,
    * avg_token_len, bpe_tokens.
    */
  def withStats(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = tokens(col(textCol))
    docs
      .withColumn("n_tokens", size(t).cast("bigint"))
      .withColumn("n_distinct_tokens", size(array_distinct(t)).cast("bigint"))
      .withColumn(
        // exact int/int double division — deterministic and cross-engine
        // identical; ROUND(x, 4) is NOT (see graft.queries.Fx scaladoc)
        "avg_token_len",
        (length(col(textCol)) - (col("n_tokens") - 1)) / col("n_tokens"),
      )
      .withColumn("bpe_tokens", bpeTokenCount(col(textCol)))
  }

  /** Heuristic quality score in [0,1]: lexical diversity + length band +
    * stopword presence, the standard cheap pre-filters for LLM corpora.
    *
    * score = 0.5·distinct/n + 0.3·min(n,100)/100 + 0.2·stop/n, evaluated
    * as ONE exact integer numerator over one double division:
    *   (5000·distinct + 30·min(n,100)·n + 2000·stop) / (n · 10000)
    * — algebraically identical, but deterministic and bit-identical
    * cross-engine (the sum-of-three-fractions form rounded to 4 decimals
    * sat exactly on half boundaries and flipped between engines; see
    * graft.queries.Fx scaladoc).
    */
  def withQuality(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = tokens(col(textCol))
    val stopArr = array(StopWords.map(lit): _*)
    docs
      .withColumn("n_tokens", size(t).cast("bigint"))
      .withColumn("n_distinct_tokens", size(array_distinct(t)).cast("bigint"))
      .withColumn("n_stopwords", size(filter(t, w => array_contains(stopArr, w))).cast("bigint"))
      .withColumn(
        "quality_score",
        (lit(5000L) * col("n_distinct_tokens")
          + lit(30L) * least(col("n_tokens"), lit(100L)) * col("n_tokens")
          + lit(2000L) * col("n_stopwords"))
          / (col("n_tokens") * lit(10000.0)),
      )
  }

  /** Language profiles: characteristic function words per language. The
    * predictor votes on profile-word hits (the classic stopword-profile
    * heuristic, e.g. Grefenstette 1995); ties break by profile order.
    */
  val Profiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "de", "y", "es"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "de", "et", "est"),
    "zh" -> Seq("的", "是", "了", "在", "和"),
  )

  /** Adds pred_lang + lang_hits. */
  def withLangId(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = array_distinct(tokens(col(textCol)))
    // score per language = #profile words present; argmax via array_max over
    // (hits, -order, lang) structs — struct comparison is lexicographic.
    val scored = array(Profiles.zipWithIndex.map { case ((lang, words), i) =>
      struct(
        size(array_intersect(t, array(words.map(lit): _*))).as("hits"),
        lit(-i).as("prio"),
        lit(lang).as("lang"),
      )
    }: _*)
    docs
      .withColumn("lang_best", array_max(scored))
      .withColumn("pred_lang", col("lang_best.lang"))
      .withColumn("lang_hits", col("lang_best.hits").cast("bigint"))
      .drop("lang_best")
  }

  /** Adds fp64 rolling-hash fingerprint of the document text (native
    * codegen'd Catalyst expression, registered idempotently per session).
    */
  def withFingerprint(docs: DataFrame, textCol: String = "text"): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    docs.withColumn("fp64", GraftFunctions.fp64(col(textCol)))
  }

  /** Per-group heavy-hitter vocabulary: one row per group with the total
    * token count and a Misra-Gries sketch (MAP<term, est> of <= k
    * counters) over the group's full token stream. Unlike the exact
    * (group, term) aggregation behind `doc_topk_terms` — whose state is
    * the whole vocabulary — the sketch carries O(k) state per group
    * through the map-side partial and the one group exchange, so the
    * shuffle volume is independent of vocabulary size. Guarantees (any
    * order/partitioning): terms with frequency > n/(k+1) are present;
    * estimates undershoot true counts by at most n/(k+1).
    */
  def freqTerms(
      docs: DataFrame,
      k: Int,
      groupCol: String = "source",
      textCol: String = "text",
  ): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    docs
      .select(col(groupCol), explode(tokens(col(textCol))).as("term"))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        GraftFunctions.freqItems(col("term"), k).as("sketch"),
      )
  }

  /** Word bigrams of a token array, repeats preserved. The >= 2 guard
    * matters: Spark's sequence(1, 0) counts DOWN to [1, 0] (step defaults
    * to -1), it is not empty like DuckDB's generate_series — a
    * single-token doc must emit no bigrams, not two broken slices.
    */
  def bigrams(w: Column): Column =
    when(size(w) >= 2, transform(
      sequence(lit(1), size(w) - 1),
      i => concat_ws(" ", slice(w, i, lit(2)))))
    .otherwise(array().cast("array<string>"))

  /** Per-document bigram NOVELTY: of a document's distinct word bigrams,
    * how many appear in no other document (corpus df = 1)? High novelty
    * marks original prose; near-zero novelty marks boilerplate and
    * template spam — the integer-exact cousin of an n-gram LM perplexity
    * filter (counts only, so the oracle comparison has no float
    * summation-order knife edges).
    *
    * Scale shape: one exact groupBy over the exploded bigram stream
    * (map-side partial count first — the same shape as term-df), a
    * re-join of that stream to its df, and a per-doc rollup. No
    * collect_list anywhere: the aggregation state per bigram is one
    * counter, so no stop-bigram can blow task memory.
    */
  def bigramNovelty(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
  ): DataFrame = {
    // bigram stream WITHOUT the transform(sequence…) HOF (CodegenFallback,
    // interpreted lambda per position — its removal took doc_repetition
    // 2.6 → 0.36 s): two codegen'd slices zipped, string built post-
    // explode in codegen, per-doc dedup as a distinct whose exchange sits
    // upstream of (and AQE-reuses into) the df aggregate's
    val w = tokens(col(textCol))
    val grams = docs.select(col(idCol),
        slice(w, lit(1), greatest(size(w) - 1, lit(0))).as("a"),
        slice(w, lit(2), greatest(size(w) - 1, lit(0))).as("b"))
      .select(col(idCol), explode(arrays_zip(col("a"), col("b"))).as("p"))
      .select(col(idCol), concat_ws(" ", col("p.a"), col("p.b")).as("g"))
      .distinct()
    val df = grams.groupBy(col("g")).agg(count(lit(1)).as("df"))
    val perDoc = grams.join(df, Seq("g"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(when(col("df") === 1L, 1L).otherwise(0L)).as("n_novel"))
    // left join back so zero-bigram docs (empty / single-token text)
    // still report, with 0s
    docs.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"))
      .orderBy(col(idCol))
  }

  /** Per-document BIGRAM-LM score — the CCNet/KenLM-family perplexity
    * quality filter (Wenzek et al., "CCNet", LREC 2020) re-expressed on
    * a corpus-trained model with add-one smoothing:
    *
    *   score(doc) = Σ_{(a,b) ∈ doc bigram OCCURRENCES} ln( (c(a,b)+1) / (c(a)+V) )
    *
    * where c(·) are corpus-wide token-occurrence counts and V the
    * corpus vocabulary size. Very negative per-bigram scores mark
    * improbable text (gibberish, wrong-language, OCR noise); scores
    * near zero mark template/boilerplate — the two tails real pipelines
    * cut. `n_bigrams` rides along so consumers can normalize to
    * per-token log-perplexity.
    *
    * Published as Fx e4 fixed point: the log SUM's order differs across
    * engines at ulps (the mm_byte_features entropy discipline — every
    * input to ln is an exact integer ratio identical on both engines,
    * only the accumulation order varies, so the absolute error is
    * ~1e-13 against a 5e-5 rounding half-boundary margin).
    *
    * Scale shape: unigram + bigram count tables are ONE map-side-
    * combined aggregation each over the token/bigram streams (counter
    * state only); the corpus bigram stream then joins its two count
    * tables (hash joins on the gram keys — broadcastable when the
    * vocabulary is, shuffled joins otherwise) and one per-doc rollup
    * sums the logs. V is a scalar aggregate broadcast into the
    * expression. Nothing collects, nothing is quadratic.
    */
  def lmScore(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
  ): DataFrame = {
    val w = tokens(col(textCol))
    // token-OCCURRENCE stream (no distinct — this is a language model,
    // not a df table); same codegen'd zip-slice bigram build as
    // bigramNovelty, keeping the history token as its own column
    val toks = docs.select(explode(w).as("tok"))
    val uni = toks.groupBy(col("tok")).agg(count(lit(1)).as("ca"))
    val vocab = toks.agg(countDistinct(col("tok")).as("v"))
    val grams = docs.select(col(idCol),
        slice(w, lit(1), greatest(size(w) - 1, lit(0))).as("a"),
        slice(w, lit(2), greatest(size(w) - 1, lit(0))).as("b"))
      .select(col(idCol), explode(arrays_zip(col("a"), col("b"))).as("p"))
      .select(col(idCol), col("p.a").as("tok"), concat_ws(" ", col("p.a"), col("p.b")).as("g"))
    val bi = grams.groupBy(col("g")).agg(count(lit(1)).as("cab"))
    val perDoc = grams
      .join(bi, Seq("g"))
      .join(uni, Seq("tok"))
      .crossJoin(broadcast(vocab))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(log((col("cab") + 1).cast("double") / (col("ca") + col("v")).cast("double")))
          .as("score"))
    docs.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(round(col("score") * 10000).cast("bigint"), lit(0L)).as("score_e4"))
      .orderBy(col(idCol))
  }

  /** Hashing-trick linear quality classifier (the fastText-family
    * model-based filter — Joulin et al. 2016; the shape CCNet/RefinedWeb
    * use for "looks like good prose" scoring): every token hashes into
    * one of `buckets` feature slots (first 8 hex chars of md5 → BIGINT,
    * mod buckets — the classic feature-hashing trick, no vocabulary
    * anywhere), each slot carries a FROZEN weight in 1e-3 units, and the
    * doc score is the length-normalized sum `(Σ w(bucket(tok))) · 1000
    * div n_tokens` in exact 1e-6 integer units. The weight table here is
    * a deterministic synthetic model (`w(b) = (b·1103515245 + 12345) mod
    * 2001 − 1000` — an LCG spray in [−1000, 1000]); a production
    * deployment swaps in trained weights as the same kind of plan-side
    * constant, exactly like the frozen BPE merge table. The whole scorer
    * is ONE codegen'd narrow projection (transform + aggregate HOFs over
    * the token array — no explode, no shuffle at any corpus size): at
    * 100 TB the model applies map-side at scan speed.
    */
  def modelScore(
      docs: DataFrame,
      buckets: Int = 1024,
      idCol: String = "doc_id",
      textCol: String = "text",
  ): DataFrame = {
    val w = tokens(col(textCol))
    // weight(tok) inlined per element: bucket → LCG weight, all BIGINT
    val weighted = expr(
      s"""aggregate(
            transform(split($textCol, ' '),
              t -> (CAST(conv(substr(md5(t), 1, 8), 16, 10) AS BIGINT) % $buckets)
                     * 1103515245L),
            0L, (acc, x) -> acc + (x + 12345L) % 2001L - 1000L)""")
    docs.select(
      col(idCol),
      size(w).cast("bigint").as("n_tokens"),
      weighted.as("sum_w_e3"))
      .select(
        col(idCol), col("n_tokens"),
        expr("(sum_w_e3 * 1000) div n_tokens").as("score_e6"))
      .withColumn("quality_pass", (col("score_e6") >= 0).cast("bigint"))
  }

  /** WITHIN-document repetition signals — the Gopher quality-filter
    * family (Rae et al. 2021 §A1.1: fraction of tokens in the most
    * frequent n-gram, duplicate-n-gram fraction), integer-exact:
    * top_token_count, duplicate token occurrences (occurrences beyond
    * each term's first), and top_bigram_count. Everything is computed
    * per row by codegen'd expressions ([[GraftFunctions.maxTermCount]] +
    * array built-ins) — a pure narrow projection, NO explode and NO
    * shuffle at any corpus size; downstream filters divide by n_tokens
    * for the published ratio forms.
    */
  def repetitionSignals(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
  ): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    val w = tokens(col(textCol))
    docs.select(
      col(idCol),
      size(w).cast("bigint").as("n_tokens"),
      GraftFunctions.maxTermCount(w).cast("bigint").as("top_token_count"),
      (size(w) - size(array_distinct(w))).cast("bigint").as("dup_token_occurrences"),
      // maxPairCount, NOT maxTermCount(bigrams(w)): the bigram HOF is
      // CodegenFallback and was measured dominating this query (2.6 s →
      // see spec equivalence pin); the pair kernel counts interned-id
      // pairs in the same pass shape with no string building
      GraftFunctions.maxPairCount(w).cast("bigint").as("top_bigram_count"),
    ).orderBy(col(idCol))
  }
}
