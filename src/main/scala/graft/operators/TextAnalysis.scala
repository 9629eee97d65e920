package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for LLM-training-data pipelines — SURVEY.md §2 block F.
  *
  * All per-document scoring is pure Column arithmetic over one scan —
  * no shuffle until the (optional) per-group aggregation, so each
  * operator streams at full scan speed over a 100 TB corpus.
  */
object TextAnalysis {

  /** Whitespace tokenization (the BPE-ish regex variant is
    * [[bpeishTokenCount]]).
    */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Rough BPE-style token estimate: word pieces + punctuation kept as
    * separate tokens (a regex approximation of subword tokenizers).
    */
  def bpeishTokenCount(text: Column): Column =
    size(split(trim(text), "\\s+|(?=[.,;:!?])"))

  private val stopwords = Seq("the", "a", "and", "of", "to", "in", "is")

  /** Per-language token statistics (exact long sums). */
  def tokenStats(documents: DataFrame): DataFrame =
    documents
      .withColumn("n_tokens", size(tokens($"text")).cast("long"))
      .groupBy($"lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"n_tokens").as("total_tokens"),
        min($"n_tokens").as("min_tokens"),
        max($"n_tokens").as("max_tokens"))
      .orderBy($"lang")

  /** Per-document quality scoring: length, punctuation ratio, stopword
    * ratio — the heuristics used to filter web-scraped training text.
    */
  def qualityScore(documents: DataFrame): DataFrame =
    documents
      .withColumn("toks", tokens($"text"))  // bind once; see shinglesOf note
      .withColumn("n_chars_actual", length($"text").cast("long"))
      .withColumn("n_tokens", size($"toks").cast("long"))
      .withColumn("punct_count",
        (length($"text") - length(regexp_replace($"text", "[.,;:!?]", "")))
          .cast("long"))
      .withColumn("stop_count",
        size(filter($"toks", t => t.isInCollection(stopwords))).cast("long"))
      .withColumn("punct_ratio", $"punct_count" * 1.0 / $"n_chars_actual")
      .withColumn("stop_ratio", $"stop_count" * 1.0 / $"n_tokens")
      .withColumn("avg_token_len", $"n_chars_actual" * 1.0 / $"n_tokens")
      .withColumn("quality",
        $"stop_ratio" * 0.5 + (lit(1.0) - $"punct_ratio") * 0.3 +
          when($"avg_token_len".between(3.0, 8.0), 0.2).otherwise(0.0))
      .select($"doc_id", $"n_chars_actual", $"n_tokens", $"punct_ratio",
        $"stop_ratio", $"avg_token_len", $"quality")
      .orderBy($"doc_id")

  /** Stopword-profile language ID (n-gram/stopword heuristic) scored
    * against the labeled `lang` column. Confusion-matrix output.
    */
  def langId(documents: DataFrame): DataFrame = {
    def hits(words: Seq[String]): Column =
      size(filter($"toks", t => t.isInCollection(words))).cast("long")
    documents
      .withColumn("toks", tokens(lower($"text")))  // bind once
      .withColumn("en_hits", hits(Seq("the", "a", "and", "of", "is")))
      .withColumn("es_hits", hits(Seq("el", "la", "de", "que", "y")))
      .withColumn("fr_hits", hits(Seq("le", "la", "et", "les", "des")))
      .withColumn("de_hits", hits(Seq("der", "die", "das", "und", "ist")))
      .withColumn("predicted",
        when($"en_hits" >= greatest($"es_hits", $"fr_hits", $"de_hits") &&
             $"en_hits" > 0, "en")
          .when($"es_hits" >= greatest($"fr_hits", $"de_hits") && $"es_hits" > 0, "es")
          .when($"fr_hits" >= $"de_hits" && $"fr_hits" > 0, "fr")
          .when($"de_hits" > 0, "de")
          .otherwise("unknown"))
      .groupBy($"lang", $"predicted")
      .agg(count(lit(1)).as("n"))
      .orderBy($"lang", $"predicted")
  }

  /** Word n-gram shingles from an already-materialized token-array
    * column (guarded: <n tokens → empty array).
    *
    * IMPORTANT perf contract: pass a *column reference* (e.g. bound
    * via `withColumn("w", tokens($"text"))`), not the `tokens(...)`
    * expression itself — every `element_at(w, …)` inside the lambda
    * re-evaluates its subtree, so an inline `split()` would run
    * 3×|shingles| regex splits per row instead of one.
    */
  def shinglesOf(w: Column, n: Int = 3): Column =
    when(size(w) >= n,
      transform(sequence(lit(1), size(w) - (n - 1)), i =>
        concat_ws(" ", (0 until n).map(j => element_at(w, i + j)): _*)))
      .otherwise(array().cast("array<string>"))

  /** Convenience form over raw text — fine for small/cold paths; hot
    * paths should materialize the token column and use [[shinglesOf]].
    */
  def shingles(text: Column, n: Int = 3): Column = shinglesOf(tokens(text), n)

  /** Document fingerprints: whitespace-normalized md5 (exact-dup key)
    * + minimum shingle hash (a 1-hash MinHash, stable under small
    * edits — the rolling-hash fingerprint family).
    */
  def fingerprint(documents: DataFrame): DataFrame =
    documents
      .withColumn("w", tokens($"text"))
      .withColumn("fp_norm",
        md5(lower(regexp_replace(trim($"text"), "\\s+", " "))))
      .withColumn("fp_min_shingle",
        array_min(transform(shinglesOf($"w"), s => md5(s))))
      .select($"doc_id", $"fp_norm", $"fp_min_shingle")
      .orderBy($"doc_id")
}
