package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for LLM-data pipelines (north_star surface:
  * dedup, tokenize, quality scoring, language-ID, fingerprinting).
  *
  * Everything is column-level composition of codegen'd built-ins — no
  * UDFs, no driver-side loops — so at 100 TB each op is a single
  * narrow (per-row) stage over the parquet scan; only the explicit
  * groupBy/join ops shuffle.
  *
  * Cross-engine determinism: float-valued scores only ever come from
  * integer counts divided as doubles (IEEE-exact, so the DuckDB oracle
  * hashes identically); content hashes use md5 (identical in both
  * engines); the rolling fingerprint is 64-bit-overflow-free modular
  * arithmetic expressible as a fold in both engines.
  */
object TextOps {

  /** Tokenize on single spaces — the documents table is pre-normalized
    * space-separated text. (For raw text, compose with [[normalize]]
    * first.)
    */
  def tokens(text: Column): Column = split(text, " ")

  /** GPT-2-style pre-tokenizer pattern (contractions, space-prefixed
    * letter runs, digit runs, punctuation runs, residual whitespace) —
    * the "BPE-ish" token counter for LLM-corpus budgeting. The subset
    * of regex syntax used (\p{L}, \p{N}, \s, alternation) behaves
    * identically under Java regex (Spark) and RE2 (DuckDB), so counts
    * oracle-match.
    */
  val BpeishPattern: String =
    "'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  /** All BPE-ish tokens of a text column (ARRAY<STRING>). */
  def bpeishTokens(text: Column): Column =
    regexp_extract_all(text, lit(BpeishPattern), lit(0))

  /** Raw-text normalization: lowercase, strip non-alphanumerics,
    * collapse runs of spaces, trim. Plain-ASCII regexes behave
    * identically under Java regex and RE2, so the DuckDB oracle
    * matches byte-for-byte.
    */
  def normalize(text: Column): Column =
    regexp_replace(
      trim(regexp_replace(lower(text), "[^a-z0-9 ]", "")),
      " +", " ")

  /** Distinct word-n-gram shingles; empty array when the doc is shorter
    * than n tokens (guard keeps Spark's descending-sequence quirk out).
    *
    * Built by zipping n shifted slices of the token array rather than
    * per-index `element_at` lambdas: a lambda body re-evaluates its
    * non-attribute children (e.g. an inlined `split(text)`) on EVERY
    * invocation, turning shingling into O(n·m) re-tokenizations per doc;
    * the slice/zip form references the token expression only n+1 times
    * per row regardless of doc length.
    */
  def shingles(toks: Column, n: Int): Column = {
    val m = size(toks) - (n - 1)
    val mk = (0 until n).map(j => slice(toks, lit(j + 1), m))
      .reduce((a, b) => zip_with(a, b, (x, y) => concat_ws(" ", x, y)))
    array_distinct(when(size(toks) >= n, mk).otherwise(array()))
  }

  /** Ordered (non-distinct) word bigrams — the repetition-metric
    * denominator. Same slice/zip construction as [[shingles]] (and the
    * same lambda-re-evaluation caveat: pass an attribute column).
    */
  def bigrams(toks: Column): Column = {
    val m = size(toks) - 1
    val mk = zip_with(slice(toks, lit(1), m), slice(toks, lit(2), m),
      (a, b) => concat_ws(" ", a, b))
    when(size(toks) >= 2, mk).otherwise(array())
  }

  /** Ordered bigrams as (w1, w2) structs — collocation scoring needs
    * the component words to join against unigram counts without
    * re-splitting.
    */
  def bigramPairs(toks: Column): Column = {
    val m = size(toks) - 1
    val mk = zip_with(slice(toks, lit(1), m), slice(toks, lit(2), m),
      (a, b) => struct(a.as("w1"), b.as("w2")))
    when(size(toks) >= 2, mk)
      .otherwise(array().cast(ArrayType(new StructType()
        .add("w1", StringType).add("w2", StringType))))
  }

  /** Ordered (center, context) skip-gram pairs within ±maxOffset — the
    * co-occurrence stream feeding embedding training / PMI matrices.
    * Both orientations emitted per offset; same slice/zip construction
    * (and attribute-column caveat) as [[shingles]].
    */
  def skipgramPairs(toks: Column, maxOffset: Int): Column = {
    require(maxOffset >= 1, s"maxOffset must be >= 1, got $maxOffset")
    val emptyPairs = array().cast(ArrayType(new StructType()
      .add("w", StringType).add("c", StringType)))
    val parts = (1 to maxOffset).flatMap { k =>
      val m = size(toks) - k
      val fwd = zip_with(slice(toks, lit(1), m),
        slice(toks, lit(1 + k), m),
        (a, b) => struct(a.as("w"), b.as("c")))
      val bwd = zip_with(slice(toks, lit(1 + k), m),
        slice(toks, lit(1), m),
        (a, b) => struct(a.as("w"), b.as("c")))
      Seq(fwd, bwd).map(e =>
        when(size(toks) > k, e).otherwise(emptyPairs))
    }
    concat(parts: _*)
  }

  /** Token-bounded overlapping passage chunking (the splitter feeding
    * embedding/RAG indexes): chunk i covers token positions
    * [i·stride, i·stride + size); docs shorter than `size` yield one
    * chunk. Pure per-row array math (sequence + slice) fanned out by
    * explode — narrow until the fan-out, zero shuffle.
    *
    * Output: (doc_id, chunk_idx, chunk, n_tokens).
    */
  def chunkDocs(df: DataFrame, textCol: String, idCol: String,
                size: Int, stride: Int): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      s"need 0 < stride <= size, got size=$size stride=$stride")
    val d = df
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("t"))
      .withColumn("n", org.apache.spark.sql.functions.size(col("t")))
      .filter(col("n") > 0)
      .withColumn("n_chunks", when(col("n") <= size, 1)
        .otherwise(floor((col("n") - size + (stride - 1)) / stride)
          .cast(IntegerType) + 1))
    d.select(col("doc_id"), col("t"),
        explode(sequence(lit(0), col("n_chunks") - 1)).as("i"))
      .select(col("doc_id"), col("i").cast(LongType).as("chunk_idx"),
        slice(col("t"), col("i") * stride + 1, lit(size)).as("ch"))
      .select(col("doc_id"), col("chunk_idx"),
        concat_ws(" ", col("ch")).as("chunk"),
        org.apache.spark.sql.functions.size(col("ch")).cast(LongType)
          .as("n_tokens"))
  }

  /** Redact every run matching `pattern` (e.g. digit runs, emails) with
    * a placeholder — the PII-scrub primitive. Pure regexp_replace, so
    * it stays a narrow codegen'd map at any scale. DuckDB mirror needs
    * the 'g' flag (its regexp_replace defaults to first-match-only;
    * Spark's replaces all).
    */
  def redact(c: Column, pattern: String, placeholder: String): Column =
    regexp_replace(c, pattern, placeholder)

  /** Exact content dedup key. */
  def contentHash(text: Column): Column = md5(text)

  /** Per-doc quality metrics (all exact): token count, distinct tokens,
    * type-token ratio, mean token length, stopword ratio, and a BPE-ish
    * regex token count (words + single non-space punctuation marks).
    */
  def qualityMetrics(df: DataFrame, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val stop = Seq("a", "an", "the", "of", "and", "or", "in", "on")
    df.withColumn("n_tokens", size(toks).cast(LongType))
      .withColumn("n_distinct", size(array_distinct(toks)).cast(LongType))
      .withColumn("ttr", col("n_distinct").cast(DoubleType) /
        col("n_tokens").cast(DoubleType))
      .withColumn("mean_tok_len",
        aggregate(toks, lit(0L), (acc, t) => acc + length(t))
          .cast(DoubleType) / col("n_tokens").cast(DoubleType))
      .withColumn("stopword_ratio",
        size(filter(toks, t => t.isin(stop: _*))).cast(DoubleType) /
          col("n_tokens").cast(DoubleType))
      .withColumn("n_bpeish",
        size(regexp_extract_all(col(textCol),
          lit("[a-z0-9]+|[^a-z0-9 ]"), lit(0))).cast(LongType))
  }

  /** Language-ID by marker-stopword voting: score per language = number
    * of tokens in that language's closed-class marker list; prediction =
    * argmax with a fixed tiebreak order (the order of `markers`).
    * Deterministic, SQL-expressible, and the standard cheap heuristic
    * when a real n-gram model isn't warranted.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "es" -> Seq("el", "la", "los", "las", "es", "y", "que", "un"),
    "fr" -> Seq("le", "la", "les", "est", "et", "que", "une", "dans"),
    "zh" -> Seq("de", "shi", "bu", "le", "wo", "ni", "ta", "men"))

  def langScores(toks: Column): Seq[(String, Column)] =
    langMarkers.map { case (lang, ms) =>
      lang -> size(filter(toks, t => t.isin(ms: _*))).cast(LongType)
    }

  def langId(df: DataFrame, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val scored = langScores(toks).foldLeft(df) { case (d, (lang, c)) =>
      d.withColumn(s"score_$lang", c)
    }
    // argmax with first-wins tiebreak, as a chain of when()s over the
    // running max — identical to the oracle's nested CASE.
    val best = langMarkers.map(_._1).tail.foldLeft(
      (lit("en"), col("score_en"))) { case ((bl, bs), lang) =>
      val s = col(s"score_$lang")
      (when(s > bs, lit(lang)).otherwise(bl), greatest(bs, s))
    }
    scored.withColumn("pred_lang",
      when(best._2 > 0, best._1).otherwise(lit("und")))
  }

  /** Rolling polynomial fingerprint over the token stream:
    * fp = fold(acc * 1000003 + code(tok)) mod 2147483647, with
    * code(tok) = ascii(first char) * 131071 + length(tok).
    * acc < 2^31 keeps the multiply < 2^51 — no 64-bit overflow, so the
    * DuckDB list_reduce oracle is bit-identical. Order-sensitive by
    * design (it fingerprints the sequence, not the bag).
    */
  def fingerprint(textCol: Column): Column = {
    val toks = tokens(textCol)
    val codes = transform(toks, t =>
      (ascii(t) * lit(131071L)) + length(t).cast(LongType))
    aggregate(codes, lit(0L),
      (acc, c) => pmod(acc * lit(1000003L) + c, lit(2147483647L)))
  }
}
