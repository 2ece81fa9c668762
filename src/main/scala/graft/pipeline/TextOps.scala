package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, language-ID (stopword heuristic), quality scoring,
  * token counting, document fingerprinting. All are pure column
  * expressions (whole-stage-codegen friendly — no UDFs), so they scale to
  * 100 TB document tables without serialization overhead.
  */
object TextOps {

  /** Lowercased alphanumeric tokens; empties filtered. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => t =!= lit(""))

  // Small per-language stopword profiles for the heuristic language-ID.
  val StopEn = Seq("the", "and", "of", "to", "in", "is", "that", "it", "was", "for", "a")
  val StopDe = Seq("der", "die", "und", "das", "ist", "nicht", "mit", "ein", "auf", "den")
  val StopEs = Seq("el", "la", "de", "que", "los", "en", "un", "una", "por", "con")
  val StopFr = Seq("le", "les", "des", "est", "une", "dans", "pour", "que", "sur", "la")

  private def hits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words)))

  /** Heuristic language-ID: argmax of stopword hits with the deterministic
    * tie-break order en > de > es > fr; 'und' when no profile matches. */
  def langIdExpr(text: Column): Column = {
    val t = tokens(text)
    val (en, de, es, fr) =
      (hits(t, StopEn), hits(t, StopDe), hits(t, StopEs), hits(t, StopFr))
    when(greatest(en, de, es, fr) === 0, lit("und"))
      .when(en >= greatest(de, es, fr), lit("en"))
      .when(de >= greatest(es, fr), lit("de"))
      .when(es >= fr, lit("es"))
      .otherwise(lit("fr"))
  }

  /** Per-document quality signals + a pure-arithmetic composite score
    * (no transcendentals — keeps the math bit-identical across engines). */
  def qualityColumns(text: Column): Seq[Column] = {
    val nChars = length(text).cast("long")
    val toks = tokens(text)
    val nToks = size(toks).cast("long")
    val punct = length(regexp_replace(text, "[^.,;:!?]", "")).cast("long")
    val stops = size(filter(toks, t => t.isInCollection(StopEn))).cast("long")
    val punctRatio = round(punct.cast("double") / nChars.cast("double"), 4)
    val stopRatio = round(stops.cast("double") / greatest(nToks, lit(1L)).cast("double"), 4)
    val quality = round(
      least(nToks, lit(100L)).cast("double") / 100.0 * 0.5
        + stops.cast("double") / greatest(nToks, lit(1L)).cast("double") * 0.3
        + (lit(1.0) - punct.cast("double") / nChars.cast("double")) * 0.2, 4)
    Seq(nChars.as("n_chars"), nToks.as("n_tokens"),
      punctRatio.as("punct_ratio"), stopRatio.as("stop_ratio"), quality.as("quality"))
  }

  /** Token-count columns: alnum-token count (regex), byte length, and a
    * BPE-ish estimate (≈4 bytes/token). */
  def tokenCountColumns(text: Column): Seq[Column] = {
    val alnum = size(regexp_extract_all(text, lit("[A-Za-z0-9]+"), lit(0))).cast("long")
    val nBytes = octet_length(text).cast("long")
    val bpe = floor((nBytes + lit(3L)).cast("double") / 4.0).cast("long")
    Seq(alnum.as("alnum_tokens"), nBytes.as("n_bytes"), bpe.as("approx_bpe_tokens"))
  }

  /** Normalization-invariant document fingerprint: md5 of the
    * whitespace-collapsed lowercase alphanumeric rendering. */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "[^a-z0-9]+", " ")))
}
