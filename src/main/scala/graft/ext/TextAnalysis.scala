package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline:
  * language ID (marker n-gram heuristic), quality scoring, token counting,
  * and document fingerprinting. All pure `Column` expressions — they stay
  * inside whole-stage codegen, shuffle nothing, and scale linearly with the
  * corpus (the 100 TB path is embarrassingly parallel map work).
  *
  * Determinism note: everything here is reproducible bit-for-bit against a
  * SQL oracle — integer counts, single-rounded doubles, md5 hex.
  */
object TextAnalysis {

  /** Exact half-up rounding of the integer ratio num/den to 4 dp:
    * half-up(num/den · 10⁴) = ⌊(2·num·10⁴ + den) / (2·den)⌋, computed in
    * BIGINT then floored — engine-independent where `round(double, 4)`
    * is not (see [[qualityScore]]'s docstring for the exactness bound:
    * requires num·10⁴ ≲ 2⁵³ and quotient ≲ 10⁹). */
  private[graft] def halfUp4(num: Column, den: Column): Column =
    floor((lit(2L) * num * lit(10000L) + den) / (lit(2L) * den))
      .cast("double") / lit(10000.0)

  /** Lower-cased whitespace tokens of the trimmed text. */
  def words(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(words(text))

  /** BPE-ish token count: runs of letters, single digits, or single
    * non-alphanumeric glyphs — the standard pre-tokenizer shape. */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]|[^a-z0-9\\s]"), lit(0)))

  /** Punctuation character count. */
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[.,!?;:]", ""))

  /** Tokens that appear in `markers`. */
  def markerCount(text: Column, markers: Seq[String]): Column =
    size(filter(words(text), w => array_contains(lit(markers.toArray), w)))

  /** Composite quality score in [0,1]:
    * 0.4·min(n_words/50, 1)  — enough content
    * 0.3·(1 − punct/chars)   — not symbol soup
    * 0.3·stopwords/words     — looks like natural language
    *
    * Computed as EXACT integer arithmetic with explicit half-up rounding
    * to 4 dp: `round(double, 4)` is engine-dependent at .xxxx5 boundaries
    * (Spark rounds the shortest decimal representation, DuckDB the binary
    * value — at sf0.1 that flipped 20/5000 rows by 1 ulp of the 4th
    * decimal). score = N/D with
    *   N = 4·min(w,50)·c·w + 150·(c−p)·w + 150·m·c,  D = 500·c·w
    * and half-up(N/D · 10⁴) = ⌊(2·N·10⁴ + D) / (2·D)⌋ — all intermediates
    * < 2⁵³ so the long→double division is exact enough that the floor is
    * unambiguous (quotient-to-integer gaps ≥ 1/(2D) ≈ 5e-11 vs ulp ≈
    * 5e-13), giving bit-identical results in any engine.
    */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val w = tokenCount(text).cast("long")
    val c = length(text).cast("long")
    val p = punctCount(text).cast("long")
    val m = markerCount(text, stopwords).cast("long")
    val n = lit(4L) * least(w, lit(50L)) * c * w +
      lit(150L) * (c - p) * w + lit(150L) * m * c
    val d = lit(500L) * c * w
    halfUp4(n, d)
  }

  /** Marker-voting language ID: the language whose marker set matches the
    * most tokens wins; ties go to the lexicographically first language.
    * (The real-corpus version swaps in per-language character n-gram
    * frequency tables; the operator shape — score columns + argmax — is
    * identical.)
    */
  def languageId(text: Column, markers: Seq[(String, Seq[String])]): Column = {
    val scores = markers.sortBy(_._1).map { case (lang, ws) =>
      lang -> markerCount(text, ws)
    }
    val best = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und")) { case ((lang, s), elseCol) =>
      when(s >= best, lit(lang)).otherwise(elseCol)
    }
  }

  /** Deterministic document fingerprint: md5 of the lower-cased,
    * whitespace-collapsed text. Equal fingerprints ⇔ same normalized text. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Per-document Shannon word entropy (bits/token) — the diversity
    * quality signal: near-zero entropy flags degenerate repetition, the
    * ceiling log2(n_tokens) flags all-unique noise.
    *
    *   H = log2(n) − (Σ_w c_w · log2(c_w)) / n
    *
    * Determinism: `log2` runs on exact integer counts (deterministic
    * per word, the BM25 transcendental argument) — but the Σ is a
    * distributed SUM whose float addition order varies per run, so each
    * term is QUANTIZED to the 1e-6 grid first (`floor(x · 1e6)`, exact
    * on bit-identical doubles) and the sum runs in exact BIGINTs,
    * order-independent. The grid error is ≤ vocab/1e6 bits — far below
    * the 4-dp output rounding for any real document. Docs with no words
    * emit no row (same contract as shingles). Oracle caveat: Spark's
    * LOG2 computes ln(x)/ln(2) — an oracle must mirror that FORMULA
    * (`ln(c)/ln(2)`), not call its own log2(), which is a different
    * libm routine measured to differ by 1 ulp on some integers (and
    * floor() amplifies 1 ulp into an off-by-one quantized term).
    *
    * Shape: one explode + two hash aggregates, all map-side combinable;
    * no window, no join. Σ quantized terms needs n_distinct·20·1e6 < 2⁶³
    * — holds to ~4·10¹¹ occurrences of a single word per doc.
    */
  def entropy(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), explode(words(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col(idCol), col("w")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(sum(floor(col("c") * log2(col("c")) * lit(1000000L)).cast("long"))
        .as("sq"),
        sum(col("c")).as("n_tokens"))
      .select(col(idCol), col("n_tokens"),
        (round(log2(col("n_tokens")) -
          (col("sq").cast("double") / 1000000.0) / col("n_tokens"), 4)
          + lit(0.0)).as("entropy"))
}
