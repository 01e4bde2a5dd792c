package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * language-ID (marker-word heuristic), quality scoring, token counting
  * (whitespace + BPE-ish regex), content fingerprinting.
  *
  * All column-tier (codegen'd builtins, no UDFs): at 100 TB these run as a
  * single narrow projection over the scan — no shuffle, prunes to the text
  * column only.
  */
object TextAnalysis {

  /** Whitespace tokenization. */
  def tokens(text: Column): Column = split(text, "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword segmentation: letter runs, digit runs, single
    * punctuation — the standard pre-tokenizer shape. */
  def bpeishTokens(text: Column): Column =
    regexp_extract_all(text, lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))

  def bpeishCount(text: Column): Column = size(bpeishTokens(text))

  /** Count of tokens appearing in `markers`. */
  def markerCount(text: Column, markers: Seq[String]): Column =
    size(filter(tokens(text), t => t.isInCollection(markers)))

  /** Language-ID marker lists (n-gram/stopword heuristic). Deterministic
    * tie-break: first lang in declaration order wins ties; all-zero → "und".
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "es" -> Seq("el", "la", "y", "los", "de"),
    "zh" -> Seq("的", "是", "了")
  )

  /** argmax over marker counts with strict-greater tie-break (first lang
    * declared wins ties), "und" when every score is zero. */
  def langId(text: Column): Column = {
    val scores = langMarkers.map { case (l, ms) => l -> markerCount(text, ms) }
    val best = scores.tail.foldLeft[(Column, Column)](
      (lit(scores.head._1), scores.head._2)) {
      case ((bestLang, bestScore), (l, sc)) =>
        (when(sc > bestScore, lit(l)).otherwise(bestLang),
          greatest(bestScore, sc))
    }
    when(best._2 === 0, "und").otherwise(best._1)
  }

  /** Heuristic quality score in [0,1]: rational arithmetic only (no
    * transcendentals) so the score is bit-identical across engines.
    * Components: capped average token length, stopword ratio, capped
    * document length. */
  def qualityScore(text: Column): Column = {
    val n = tokenCount(text).cast("double")
    val sumLen = aggregate(transform(tokens(text), t => length(t)),
      lit(0), (a, x) => a + x).cast("double")
    val avgLen = sumLen / n
    val stopRatio =
      markerCount(text, Seq("the", "a", "and", "of", "to", "is", "in"))
        .cast("double") / n
    round(
      least(avgLen, lit(10.0)) / 10.0 * 0.2 +
        stopRatio * 0.5 +
        least(n, lit(100.0)) / 100.0 * 0.3, 6)
  }

  /** Content fingerprints: cryptographic (exact-dup keys, cross-engine
    * stable). The rolling-hash shingle fingerprint for near-dup lives in
    * graft.dedup (kernel tier). */
  def fingerprintMd5(text: Column): Column = md5(text)
  def fingerprintSha(text: Column): Column = sha2(text, 256)
}
