package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline:
  * language ID, quality scoring, token counting, and winnowing
  * fingerprints — all pure column expressions (whole-stage codegen,
  * no UDFs), deterministic, and engine-portable (the same semantics
  * are expressible in ANSI SQL for the DuckDB oracle: only md5 /
  * regexp / integer arithmetic, no engine-specific hashing).
  *
  * Scale notes (100 TB design point): every operator here is a
  * narrow map over `documents` except the winnow window, which
  * shuffles by doc_id only (each document's grams stay in one
  * partition; partition count follows spark.sql.shuffle.partitions).
  */
object TextOps {

  /** Word tokens: maximal [a-z]+ runs, lower-cased first. */
  def tokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z]+"), lit(0))

  /** Per-language stopword lists (the standard high-frequency
    * function words; ASCII-only because [[tokens]] segments on
    * [a-z]+) for the stopword-hit language-ID heuristic.
    * Deterministic tie-break: first match in `langPriority` order
    * wins. Chinese is NOT a stopword language here — Latin
    * tokenization cannot see it — so zh scores by CJK codepoint
    * count ([[cjkCount]]) instead.
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "that", "it", "is",
      "was", "for", "on", "are", "with", "as", "at", "this", "but",
      "have", "from"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ich", "nicht", "ein",
      "eine", "mit", "auf", "von", "sie", "wir", "dem", "den", "im",
      "zu", "sich", "auch"),
    "es" -> Seq("el", "la", "los", "las", "de", "que", "y", "en", "un",
      "una", "es", "por", "con", "para", "su", "al", "lo", "como",
      "se", "pero"),
    "fr" -> Seq("le", "la", "les", "des", "et", "est", "un", "une",
      "dans", "que", "qui", "pour", "sur", "avec", "au", "pas", "ce",
      "il", "elle", "ne"))

  val langPriority: Seq[String] = Seq("en", "de", "es", "fr", "zh")

  /** The same pattern string works in Java regex and RE2 (DuckDB). */
  val CjkPattern = "[\\x{4e00}-\\x{9fff}]"

  def cjkCount(text: Column): Column =
    size(regexp_extract_all(text, lit(CjkPattern), lit(0)))

  def langScore(toks: Column, lang: String): Column =
    stopwords(lang).map(w => array_contains(toks, w).cast("int")).reduce(_ + _)

  /** Language ID over a text column: integer stopword-hit scores for
    * the Latin-token languages, CJK codepoint count for zh, arg-max
    * with fixed priority order.
    */
  def langId(df: DataFrame, text: Column): DataFrame = {
    val withToks = df.withColumn("__toks", tokens(text))
    val scored = langPriority.foldLeft(withToks) { (d, l) =>
      d.withColumn(s"score_$l",
        (if (l == "zh") cjkCount(text) else langScore(col("__toks"), l)).cast("long"))
    }
    val scoreCols = langPriority.map(l => col(s"score_$l"))
    val best = greatest(scoreCols: _*)
    val pred = langPriority.foldRight(lit(langPriority.last)) { (l, acc) =>
      when(col(s"score_$l") === best, lit(l)).otherwise(acc)
    }
    scored.withColumn("pred_lang", pred).drop("__toks")
  }

  /** Quality scoring: integer counts + milli-scaled ratios (floor of
    * an exactly-computed double ratio of small integers, so the
    * result is bit-reproducible across engines).
    */
  def quality(df: DataFrame, text: Column): DataFrame = {
    val toks = tokens(text)
    val allStops = stopwords.values.flatten.toSeq.distinct.sorted
    val stopCnt = allStops.map(w => array_contains(toks, w).cast("int")).reduce(_ + _)
    df.withColumn("n_chars_m", length(text).cast("long"))
      .withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("n_distinct_tokens", size(array_distinct(toks)).cast("long"))
      .withColumn("n_stopword_kinds", stopCnt.cast("long"))
      .withColumn(
        "stop_ratio_milli",
        when(size(toks) > 0,
          floor(lit(1000.0) * stopCnt.cast("double") / size(toks).cast("double")))
          .otherwise(lit(0L)))
      .withColumn(
        "avg_token_len_milli",
        when(size(toks) > 0,
          floor(lit(1000.0) *
            aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
            size(toks).cast("double")))
          .otherwise(lit(0L)))
  }

  /** Token counting: whitespace tokens and a BPE-ish regex
    * segmentation (letter runs | digit runs | single other glyph).
    */
  def tokenCounts(df: DataFrame, text: Column): DataFrame =
    df.withColumn("n_ws_tokens",
        size(regexp_extract_all(text, lit("\\S+"), lit(0))).cast("long"))
      .withColumn("n_bpe_tokens",
        size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"), lit(0))).cast("long"))

  /** Winnowing document fingerprints (Schleimer et al., SIGMOD'03):
    * k-gram hashes, sliding-window minima, distinct selected hashes.
    * Hash = md5 hex of the k-gram (lexicographic min of a uniform hex
    * hash ≙ numeric min; identical in any engine with md5).
    *
    * Scale: the whole gram/window computation is a higher-order
    * projection over the document's own text — NO shuffle at all
    * (an earlier posexplode + per-doc window formulation paid a full
    * hash-repartition + sort of every gram row for the same result;
    * the final distinct is per-doc via array_distinct, so the only
    * wide op left is whatever the caller does with the output).
    */
  def winnowFingerprints(df: DataFrame, idCol: String, textCol: String,
                         k: Int = 8, w: Int = 5): DataFrame = {
    val t = col("__t")
    val nGrams = length(t) - (k - 1)
    val grams = transform(sequence(lit(1), nGrams), i => md5(t.substr(i, lit(k))))
    val winMins = transform(sequence(lit(1), nGrams - (w - 1)),
      j => array_min(slice(col("__grams"), j, lit(w))))
    df.select(col(idCol), col(textCol).as("__t"))
      .where(length(t) >= k + w - 1)
      .withColumn("__grams", grams)
      .select(col(idCol), explode(array_distinct(winMins)).as("fingerprint"))
  }
}
