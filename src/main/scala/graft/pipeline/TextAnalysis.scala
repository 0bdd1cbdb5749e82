package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for training-data pipelines: quality statistics,
 * n-gram/stopword language identification, BPE-ish token counting, and
 * winnowing document fingerprints.
 *
 * Everything is per-row narrow work over built-in functions — no shuffle at
 * all until a downstream aggregation, so these scale linearly with input
 * and stay inside whole-stage codegen.
 */
object TextAnalysis {

  /** Whitespace tokens. */
  def toks(text: Column): Column = split(text, " ")

  /** BPE-ish token count: letter runs, digit runs, and single non-space
    * symbols — the shape of a byte-pair pre-tokenizer's word splits. */
  def tokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("([a-z]+|[0-9]+|[^a-z0-9 ])"), lit(1)))

  private val Stopwords =
    Seq("the", "a", "an", "and", "of", "to", "is", "in", "it", "that")

  /** Count of tokens contained in `words`. */
  def hitCount(tokens: Column, words: Seq[String]): Column =
    size(filter(tokens, t => t.isin(words: _*)))

  /** Composite quality score as a standalone column — usable as a direct
    * filter predicate (no join against a stats table needed). Favors
    * documents long enough to be useful (saturating at 100 words) that
    * aren't stopword soup — the usual pretraining-filter shape. */
  def qualityCol(text: Column): Column = {
    val t = toks(text)
    least(lit(1.0), size(t) / lit(100.0)) *
      (lit(1.0) - hitCount(t, Stopwords) / size(t))
  }

  /** Per-document quality statistics + the composite [[qualityCol]] score. */
  def textStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = toks(col(textCol))
    df.select(
      col(idCol),
      length(col(textCol)).cast("long").as("n_chars_c"),
      size(t).cast("long").as("n_words"),
      tokenCount(col(textCol)).cast("long").as("n_tokens"),
      (hitCount(t, Stopwords) / size(t)).as("stop_ratio"),
      qualityCol(col(textCol)).as("quality"))
  }

  /** Marker stopwords per language — tiny, deterministic, and replicated
    * verbatim in the SQL oracle. CJK scripts are detected by codepoint
    * range instead (space-tokenization doesn't apply). */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "is"),
    "fr" -> Seq("le", "la", "les", "et", "un", "une", "est"),
    "es" -> Seq("el", "los", "las", "y", "uno", "una", "es"),
    "de" -> Seq("der", "die", "das", "und", "ein", "ist"))

  val CjkPattern = "[\\x{4e00}-\\x{9fff}]"

  /**
   * Stopword-marker language ID: CJK codepoints ⇒ zh; otherwise the
   * language with the most marker hits, ties broken in [[LangMarkers]]
   * order; no hits at all ⇒ "und".
   */
  def langId(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = toks(lower(col(textCol)))
    val scored = df.select(
      (col(idCol) +: LangMarkers.map { case (l, ws) =>
        hitCount(t, ws).cast("long").as(s"s_$l") }) :+
        col(textCol).rlike(CjkPattern).as("cjk"): _*)
    val langs = LangMarkers.map(_._1)
    // argmax with first-wins tie-break, exactly as the oracle's CASE chain
    val pick = langs.zipWithIndex.foldRight(lit("und")) { case ((l, i), els) =>
      val beatsLater = langs.drop(i + 1).map(o => col(s"s_$l") >= col(s"s_$o"))
        .foldLeft(lit(true))(_ && _)
      when(col(s"s_$l") > 0 && beatsLater, lit(l)).otherwise(els)
    }
    scored.select(
      (col(idCol) +: langs.map(l => col(s"s_$l"))) :+
        when(col("cjk"), lit("zh")).otherwise(pick).as("lang_pred"): _*)
  }

  /**
   * Winnowing fingerprint (Schleimer et al., MOSS): hash every k-gram,
   * keep the minimum hash of each sliding window of `w` consecutive
   * k-grams, dedupe. Robust to local edits; O(doc) work, O(selected)
   * state. Hash-function specific → verified by unit test, not SQL oracle.
   */
  def fingerprints(df: DataFrame, idCol: String, textCol: String,
                   k: Int = 3, w: Int = 4): DataFrame = {
    // ordered (non-distinct) k-gram hashes; sliding-window minima via the
    // same shifted-slices-fold trick as Dedup.shingles (no per-element
    // slice inside an interpreted lambda)
    val t = toks(col(textCol))
    val gramLen = size(t) - lit(k - 1)
    val gramSlices = (1 to k).map(i => slice(t, lit(i), gramLen))
    val grams = gramSlices.reduce((a, b) => zip_with(a, b, (x, y) => concat(x, lit(" "), y)))
    val hashes = when(size(t) >= k, transform(grams, g => xxhash64(g)))
      .otherwise(array().cast("array<bigint>"))
    val winLen = size(hashes) - lit(w - 1)
    val winSlices = (1 to w).map(i => slice(hashes, lit(i), winLen))
    val winMins = winSlices.reduce((a, b) => zip_with(a, b, (x, y) => least(x, y)))
    val selected = when(size(hashes) >= w, array_distinct(winMins))
      .otherwise(when(size(hashes) > 0, array(array_min(hashes)))
        .otherwise(array().cast("array<bigint>")))
    df.select(col(idCol), selected.as("fingerprint"))
      .withColumn("fp_size", size(col("fingerprint")))
      .withColumn("fp_hash", xxhash64(to_json(array_sort(col("fingerprint")))))
  }

  /** Jaccard similarity of winnowing fingerprints — cheap containment
    * check between documents (e.g. clone detection across versions). */
  def fingerprintSimilarity(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))
}
