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

  /** Character-level Shannon entropy in bits — the classic gibberish /
    * boilerplate signal (near-0 for single-char spam, ~4.1 for English
    * prose, ~log2(alphabet) for uniform noise). Pure per-row higher-order
    * functions — narrow, zero shuffle, codegen-friendly; O(distinct·len)
    * per row which is fine for the ≤ few-KB documents this targets.
    * Rounded to 4 decimals (summed-doubles oracle convention: Spark folds
    * the array sequentially, SQL engines sum in group order). */
  def charEntropy(text: Column): Column = {
    val cs = split(text, "")
    val n = size(cs).cast("double")
    val ent = aggregate(array_distinct(cs), lit(0.0d), (acc, c) => {
      val p = size(filter(cs, x => x === c)).cast("double") / n
      acc - p * log(2.0, p)
    })
    round(ent, 4)
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

  /** CJK ⇒ zh; otherwise argmax of the marker scores with first-wins
    * tie-break in `scores` order; all-zero ⇒ "und". Exactly the oracle's
    * CASE chain — shared by [[langId]] (whole doc) and [[codeSwitch]]
    * (per chunk). */
  private def langPick(scores: Seq[(String, Column)], cjk: Column): Column = {
    val pick = scores.zipWithIndex.foldRight(lit("und")) { case (((l, c), i), els) =>
      val beatsLater = scores.drop(i + 1).map { case (_, o) => c >= o }
        .foldLeft(lit(true))(_ && _)
      when(c > 0 && beatsLater, lit(l)).otherwise(els)
    }
    when(cjk, lit("zh")).otherwise(pick)
  }

  /**
   * Code-switching detection: the document is cut into fixed
   * `chunkWords`-word chunks (narrow array slices — no tokenizer pass
   * per chunk), each chunk language-ID'd with the same marker heuristic
   * as [[langId]], and the per-document mixture reported: chunk count,
   * distinct identified languages, the dominant chunk language
   * (deterministic tie-break: higher count, then lexicographic), and a
   * `switched` flag (≥ 2 identified languages). Mixed-language documents
   * poison monolingual training mixes and deserve routing, not a single
   * whole-doc label — the whole-doc argmax happily calls a 50/50 en/de
   * doc "en".
   *
   * Scale shape: chunk expansion is per-row narrow; everything after
   * aggregates at (doc, lang) granularity — ≤ 6 rows per document — so
   * the two groupBys and the dominant-language window all move
   * metadata-sized frames.
   */
  def codeSwitch(df: DataFrame, idCol: String, textCol: String,
                 chunkWords: Int = 20): DataFrame = {
    require(chunkWords >= 1, "chunkWords must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val ws = toks(lower(col(textCol)))
    val nCh = ((size(ws) + chunkWords - 1) / chunkWords).cast("int")
    val chunked = df
      .filter(col(textCol).isNotNull && col(textCol) =!= "")
      .select(col(idCol).as("doc_id"), ws.as("ws"),
        explode(sequence(lit(0), nCh - 1)).as("ci"))
      .select(col("doc_id"), col("ci"),
        slice(col("ws"), col("ci") * chunkWords + 1, lit(chunkWords)).as("ct"))
    val scored = chunked.select(col("doc_id"),
      langPick(LangMarkers.map { case (l, m) =>
          l -> hitCount(col("ct"), m).cast("long") },
        array_join(col("ct"), " ").rlike(CjkPattern)).as("pred"))
    val counts = scored.groupBy("doc_id", "pred").agg(count(lit(1)).as("n"))
    val byDoc = Window.partitionBy("doc_id").orderBy(col("n").desc, col("pred"))
    val dom = counts.withColumn("rk", row_number().over(byDoc))
      .filter(col("rk") === 1)
      .select(col("doc_id"), col("pred").as("dom_lang"), col("n").as("dom_n"))
    val stats = counts.groupBy("doc_id").agg(
      sum("n").as("n_chunks"),
      count(when(col("pred") =!= "und", lit(1))).as("n_langs"))
    stats.join(dom, "doc_id")
      .select(col("doc_id"), col("n_chunks"), col("n_langs"),
        col("dom_lang"), col("dom_n"), (col("n_langs") >= 2).as("switched"))
  }

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
    scored.select(
      (col(idCol) +: langs.map(l => col(s"s_$l"))) :+
        langPick(langs.map(l => l -> col(s"s_$l")), col("cjk")).as("lang_pred"): _*)
  }

  /** The selected-minima column as composable expressions: ordered
    * (non-distinct) k-gram hashes; sliding-window minima via the same
    * shifted-slices-fold trick as Dedup.shinglesComposable (no per-element
    * slice inside an interpreted lambda). Kept as the parity reference for
    * the native [[graft.functions.WinnowFingerprint]]. */
  private[graft] def winnowComposable(text: Column, k: Int, w: Int): Column = {
    val t = toks(text)
    val gramLen = size(t) - lit(k - 1)
    val gramSlices = (1 to k).map(i => slice(t, lit(i), gramLen))
    val grams = gramSlices.reduce((a, b) => zip_with(a, b, (x, y) => concat(x, lit(" "), y)))
    val hashes = when(size(t) >= k, transform(grams, g => xxhash64(g)))
      .otherwise(array().cast("array<bigint>"))
    val winLen = size(hashes) - lit(w - 1)
    val winSlices = (1 to w).map(i => slice(hashes, lit(i), winLen))
    val winMins = winSlices.reduce((a, b) => zip_with(a, b, (x, y) => least(x, y)))
    when(size(hashes) >= w, array_distinct(winMins))
      .otherwise(when(size(hashes) > 0, array(array_min(hashes)))
        .otherwise(array().cast("array<bigint>")))
  }

  /**
   * Winnowing fingerprint (Schleimer et al., MOSS): hash every k-gram,
   * keep the minimum hash of each sliding window of `w` consecutive
   * k-grams, dedupe. Robust to local edits; O(doc) work, O(selected)
   * state. Hash-function specific → verified by unit test, not SQL oracle.
   */
  def fingerprints(df: DataFrame, idCol: String, textCol: String,
                   k: Int = 3, w: Int = 4): DataFrame = {
    // native one-call-per-row winnow (bit-identical, parity-tested);
    // session-free expression node — no registry involved
    val selected = graft.functions.TextFunctions.winnowFingerprint(col(textCol), k, w)
    df.select(col(idCol), selected.as("fingerprint"))
      .withColumn("fp_size", size(col("fingerprint")))
      .withColumn("fp_hash", xxhash64(to_json(array_sort(col("fingerprint")))))
  }

  /** Jaccard similarity of winnowing fingerprints — cheap containment
    * check between documents (e.g. clone detection across versions). */
  def fingerprintSimilarity(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  /**
   * Within-document n-gram repetition ratio — the Gopher-style quality
   * signal (repetitive docs are boilerplate/spam): fraction of n-gram
   * occurrences that are repeats of an earlier n-gram,
   * `(total − distinct) / total` (0.0 for docs with no n-grams). Per-row
   * narrow work, no shuffle; integer/integer division so the double is
   * bit-stable across engines.
   */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String,
                      n: Int = 3): DataFrame = {
    val total = greatest(size(toks(col(textCol))) - lit(n - 1), lit(0))
    val distinctG = size(Dedup.shingles(col(textCol), n))
    df.select(col(idCol),
      total.cast("long").as("n_grams"),
      distinctG.cast("long").as("n_distinct"),
      when(total > 0, (total - distinctG).cast("double") / total)
        .otherwise(lit(0.0)).as("rep_ratio"))
  }

  /**
   * Benchmark decontamination: (document, benchmark-doc) pairs sharing at
   * least `minOverlap` distinct word n-grams — the standard train/eval
   * overlap check before pretraining. The benchmark side is small by
   * definition (an eval set), so its exploded posting list is broadcast;
   * the corpus streams through one scan, and the overlap count aggregates
   * by (doc, bench) pair — no shuffle of the corpus itself beyond the
   * pair aggregation.
   */
  def benchmarkOverlap(docs: DataFrame, idCol: String, textCol: String,
                       bench: DataFrame, benchIdCol: String, benchTextCol: String,
                       n: Int = 3, minOverlap: Int = 1): DataFrame = {
    val dg = docs.select(col(idCol).as("doc_id"),
      explode(Dedup.shingles(col(textCol), n)).as("g"))
    val bg = bench.select(col(benchIdCol).as("bench_id"),
      explode(Dedup.shingles(col(benchTextCol), n)).as("g"))
    dg.join(broadcast(bg), "g")
      .groupBy("doc_id", "bench_id")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minOverlap)
  }

  /**
   * [[benchmarkOverlap]] with a Bloom prefilter in front of the verify
   * join — the 100 TB configuration. The benchmark grams aggregate into
   * one Bloom filter (native `BloomFilterAggregate`: per-task partial
   * filters OR-merged at a 1-row exchange, state O(numBits) per task).
   * The corpus side probes `might_contain` per gram BEFORE the join, so
   * only grams that (probably) occur in the benchmark are ever exploded
   * into the shuffle — at a realistic corpus:benchmark ratio that drops
   * the join input by orders of magnitude, and the probe itself is a
   * codegen'd narrow filter riding the corpus scan.
   *
   * The result is EXACTLY [[benchmarkOverlap]]'s: Bloom false positives
   * survive the prefilter but die in the exact gram join; false negatives
   * cannot occur. `numBits` therefore tunes cost only — size it at ~10
   * bits per distinct benchmark gram for ~1% FP.
   *
   * The built filter is collected to the driver (ONE bounded row of
   * numBits/8 bytes — the same designed-collect pattern as the runner's
   * partials row) and shipped as a Literal so executors deserialize it
   * once and the probe stays inside whole-stage codegen.
   */
  def benchmarkOverlapBloom(docs: DataFrame, idCol: String, textCol: String,
                            bench: DataFrame, benchIdCol: String, benchTextCol: String,
                            n: Int = 3, minOverlap: Int = 1,
                            estimatedGrams: Long = 1 << 20,
                            numBits: Long = 8L << 20): DataFrame = {
    import graft.functions.BloomFunctions
    val bg = bench.select(col(benchIdCol).as("bench_id"),
      explode(Dedup.shingles(col(benchTextCol), n)).as("g"))
    val bloom = bg
      .select(BloomFunctions.bloomFilterAgg(col("g"), estimatedGrams, numBits))
      .head.getAs[Array[Byte]](0)
    val dg = docs.select(col(idCol).as("doc_id"),
      explode(Dedup.shingles(col(textCol), n)).as("g"))
      .filter(BloomFunctions.mightContain(bloom, col("g")))
    dg.join(broadcast(bg), "g")
      .groupBy("doc_id", "bench_id")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minOverlap)
  }

  /**
   * BM25 (Okapi, Lucene idf variant) top-k retrieval for a bag of query
   * terms:
   *
   *   score(d) = Σ_t ln((N − df_t + 0.5)/(df_t + 0.5) + 1)
   *              · tf · (k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
   *
   * One corpus scan computes per-doc term frequencies (`size(toks) −
   * size(array_remove(toks, term))` — all codegen'd builtins, no lambda);
   * one single-row global aggregate yields N, Σdl and per-term document
   * frequencies, broadcast back as a 1-row cross join; top-k is a global
   * `orderBy(desc).limit(k)` → TakeOrderedAndProject (per-partition heaps,
   * only k rows shuffle). Scoring sums terms in fixed argument order so
   * the double arithmetic is deterministic.
   *
   * Output: (doc_id, score, dl, tf0..tfn). NB for oracle checks: Spark's
   * codegen computes `ln` via `StrictMath.log`, which differs from glibc /
   * DuckDB `ln` by 1 ulp on some inputs — compare the integer columns (or
   * ranks), not raw score bits, across engines.
   */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
               terms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "BM25 needs at least one query term")
    val t = toks(col(textCol))
    val tfCols = terms.zipWithIndex.map { case (term, i) =>
      (size(t) - size(array_remove(t, term))).cast("long").as(s"tf$i")
    }
    val base = df.select(col(idCol).as("doc_id") +:
      size(t).cast("long").as("dl") +: tfCols: _*)
    val dfCols = terms.indices.map(i =>
      sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i"))
    val globals = base.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")).as("sum_dl") +: dfCols): _*)
    val avgdl = col("sum_dl").cast("double") / col("n_docs")
    val score = terms.indices.map { i =>
      val idf = log((col("n_docs") - col(s"df$i") + lit(0.5)) /
        (col(s"df$i") + lit(0.5)) + lit(1.0))
      val tf = col(s"tf$i").cast("double")
      idf * (tf * lit(k1 + 1)) /
        (tf + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / avgdl))
    }.reduce(_ + _)
    base.crossJoin(broadcast(globals))
      .select(col("doc_id") +: score.as("score") +: col("dl") +:
        terms.indices.map(i => col(s"tf$i")): _*)
      .orderBy(desc("score"), col("doc_id"))
      .limit(k)
  }

  /** DuckDB SQL mirroring [[bm25TopK]] term for term — literals are
    * rendered from the SAME Scala doubles (shortest round-trip repr) and
    * the per-term sum keeps the same fixed order. Emits only the INTEGER
    * stats of the top-k (doc_id, dl, tf per term): the score goes through
    * `ln`, where Spark codegen (StrictMath.log) and DuckDB (glibc log)
    * differ by 1 ulp on some inputs — selection + order still pin the
    * ranking, while every emitted bit is exact. */
  /** PII patterns, in the Java-regex/RE2 COMMON syntax subset (no
    * backreferences, no lookaround) so one pattern string drives both the
    * Spark plan and the generated DuckDB oracle: (name, pattern,
    * replacement). Order matters — emails are redacted before IPs so an
    * IP-looking mail domain is consumed by the email rule. */
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b", "<IP>"),
    ("phone", "\\+[0-9]{7,15}", "<PHONE>"))

  /** PII redaction: replace every email / IPv4 / E.164-ish phone with a
    * placeholder token and count matches per category (counted on the
    * ORIGINAL text, per pattern, independent of redaction order). Pure
    * per-row regex work — zero shuffle, scales linearly. Regex-based
    * scrubbing is the deterministic first pass of a real pipeline; an
    * NER-model pass would ride the same per-partition plumbing as
    * [[graft.pipeline.Multimodal]]'s decode stage. */
  def redactPii(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val redacted = PiiPatterns.foldLeft(col(textCol)) {
      case (c, (_, pat, repl)) => regexp_replace(c, pat, repl)
    }
    val counts = PiiPatterns.map { case (name, pat, _) =>
      size(regexp_extract_all(col(textCol), lit(pat), lit(0))).cast("long")
        .as(s"n_$name")
    }
    df.select(col(idCol) +: redacted.as("redacted") +: counts: _*)
  }

  /** [[redactPii]] as DuckDB SQL over the same patterns ('g' flag — DuckDB
    * replaces only the first match by default, Spark replaces all). */
  def redactPiiOracleSql(fromSql: String, idCol: String, textCol: String): String = {
    val redacted = PiiPatterns.foldLeft(textCol) {
      case (c, (_, pat, repl)) => s"regexp_replace($c, '$pat', '$repl', 'g')"
    }
    val counts = PiiPatterns.map { case (name, pat, _) =>
      s"CAST(len(regexp_extract_all($textCol, '$pat')) AS BIGINT) AS n_$name"
    }.mkString(", ")
    s"SELECT $idCol, $redacted AS redacted, $counts FROM $fromSql ORDER BY $idCol"
  }

  def bm25OracleSql(table: String, idCol: String, textCol: String,
                    terms: Seq[String], k: Int,
                    k1: Double = 1.2, b: Double = 0.75): String = {
    val tfs = terms.zipWithIndex.map { case (term, i) =>
      val esc = term.replace("'", "''")
      s"CAST(len(ws) - len(list_filter(ws, x -> x != '$esc')) AS BIGINT) AS tf$i"
    }.mkString(", ")
    val dfs = terms.indices.map(i =>
      s"sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS df$i").mkString(", ")
    val score = terms.indices.map { i =>
      s"ln((n_docs - df$i + 0.5) / (df$i + 0.5) + 1.0) * " +
        s"(CAST(tf$i AS DOUBLE) * ${k1 + 1}) / " +
        s"(CAST(tf$i AS DOUBLE) + $k1 * (${1 - b} + $b * dl / " +
        s"(CAST(sum_dl AS DOUBLE) / n_docs)))"
    }.mkString(" + ")
    s"""WITH base AS (
       |  SELECT $idCol AS doc_id, CAST(len(ws) AS BIGINT) AS dl, $tfs
       |  FROM (SELECT $idCol, string_split($textCol, ' ') AS ws FROM $table)
       |), g AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl, $dfs FROM base
       |)
       |SELECT ${(Seq("doc_id", "dl") ++ terms.indices.map(i => s"tf$i")).mkString(", ")} FROM (
       |  SELECT base.*, $score AS score FROM base, g
       |  ORDER BY score DESC, doc_id LIMIT $k
       |)""".stripMargin.replace("\n", " ")
  }

  /**
   * Corpus vocabulary: the `k` most frequent tokens with total occurrence
   * count and document frequency — the tokenizer-training / stopword-
   * discovery pass. Ties order by token (deterministic on any engine).
   * Tokenization is the engine-wide [[toks]] convention (single-space
   * split): corpora with irregular whitespace should normalize upstream,
   * or empty/glued pseudo-tokens enter the vocabulary.
   *
   * Scale shape: explode is narrow off the scan; the distinct doc count
   * plans as Spark's one-distinct aggregate — an exchange on
   * (token, doc_id) then on token, both partially aggregated map-side, so
   * the wide shuffle carries one row per distinct (token, doc) not per
   * occurrence; top-k is TakeOrderedAndProject — per-partition heaps,
   * never a global sort. A pathological token (appearing everywhere) is
   * one counter per stage, never a buffered bucket.
   */
  def vocabTopK(df: DataFrame, idCol: String, textCol: String,
                k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    df.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), explode(toks(col(textCol))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("doc_id")).as("doc_freq"))
      .orderBy(col("n_occurrences").desc, col("token"))
      .limit(k)
  }

  /**
   * Overlapping token chunks — the embedding/RAG prep step: windows of
   * `chunk` tokens starting every `chunk - overlap` tokens, so each
   * consecutive pair shares `overlap` tokens and no token is lost at a
   * boundary. Output: `(doc_id, chunk_idx, start_tok, n_chunk_toks,
   * chunk_text)`; the final chunk may be shorter. Empty/null docs yield
   * no chunks (there is nothing to embed).
   *
   * Per-row narrow work (sequence + explode + slice over the token
   * array) — zero shuffles; output rows ≈ n_tokens / (chunk - overlap)
   * per doc, each carrying only its own slice.
   */
  def chunkOverlap(df: DataFrame, idCol: String, textCol: String,
                   chunk: Int, overlap: Int): DataFrame = {
    require(chunk >= 1, "chunk must be >= 1")
    require(overlap >= 0 && overlap < chunk, "overlap must be in [0, chunk)")
    val step = chunk - overlap
    val tokens = toks(col(textCol))
    val n = size(tokens)
    // start offsets 0, step, 2*step, ... strictly below n
    val starts = sequence(lit(0), greatest(n - 1, lit(0)), lit(step))
    df.filter(col(textCol).isNotNull && col(textCol) =!= "")
      .select(col(idCol).as("doc_id"), tokens.as("__toks"), n.as("__n"),
        posexplode(starts).as(Seq("chunk_idx", "start_tok")))
      .select(col("doc_id"), col("chunk_idx"), col("start_tok"),
        least(lit(chunk), col("__n") - col("start_tok")).as("n_chunk_toks"),
        array_join(slice(col("__toks"), col("start_tok") + 1, lit(chunk)), " ")
          .as("chunk_text"))
  }

  /** The default rule-filter stopword list — [[Stopwords]], exposed so the
    * SQL oracle and callers replicate it verbatim. */
  def ruleStopwords: Seq[String] = Stopwords

  /**
   * Gopher-style rule filter (Rae et al. 2021, "Scaling Language Models",
   * appendix A1.1): per-document heuristic metrics and a composite `pass`
   * verdict. Rules: word count in `[minWords, maxWords]`; mean word length
   * in `[minMeanLen, maxMeanLen]`; symbol-to-word ratio (`#` and `…`)
   * ≤ `maxSymbolRatio`; fraction of words containing at least one
   * alphabetic character ≥ `minAlphaFrac`; at least `minStopHits` hits
   * from the [[ruleStopwords]] list. Output per doc: every metric, every
   * per-rule flag, and `pass` — keeping the metrics lets a curation run
   * tune thresholds from one materialized pass instead of re-scanning.
   *
   * Scale shape: per-row narrow work over built-in functions, zero
   * shuffles, fully inside whole-stage codegen — 100 TB cost is exactly
   * one scan. Mean word length divides a BIGINT character sum by the word
   * count (one IEEE division — bit-identical on any engine).
   */
  def qualityRules(df: DataFrame, idCol: String, textCol: String,
                   minWords: Int = 5, maxWords: Int = 100000,
                   minMeanLen: Double = 1.0, maxMeanLen: Double = 10.0,
                   maxSymbolRatio: Double = 0.1, minAlphaFrac: Double = 0.8,
                   minStopHits: Int = 2): DataFrame = {
    val t = toks(col(textCol))
    val nWords = size(t).cast("long")
    val lenSum = aggregate(transform(t, w => length(w)).cast("array<long>"),
      lit(0L), (acc, x) => acc + x)
    val nSymbols = size(t) - size(filter(t, w => !(w.contains("#") || w.contains("…"))))
    val nAlpha = size(filter(t, w => w.rlike("[a-zA-Z]")))
    df.filter(col(textCol).isNotNull && col(textCol) =!= "")
      .select(col(idCol).as("doc_id"), nWords.as("n_words"),
        (lenSum.cast("double") / nWords).as("mean_word_len"),
        (nSymbols.cast("double") / nWords).as("symbol_ratio"),
        (nAlpha.cast("double") / nWords).as("alpha_frac"),
        hitCount(t, Stopwords).cast("long").as("stop_hits"))
      .withColumn("ok_words",
        col("n_words") >= minWords && col("n_words") <= maxWords)
      .withColumn("ok_mean_len",
        col("mean_word_len") >= minMeanLen && col("mean_word_len") <= maxMeanLen)
      .withColumn("ok_symbols", col("symbol_ratio") <= maxSymbolRatio)
      .withColumn("ok_alpha", col("alpha_frac") >= minAlphaFrac)
      .withColumn("ok_stop", col("stop_hits") >= minStopHits)
      .withColumn("pass", col("ok_words") && col("ok_mean_len") &&
        col("ok_symbols") && col("ok_alpha") && col("ok_stop"))
  }

  /**
   * Per-document conditional log-likelihood under the corpus's own BIGRAM
   * language model — the order-2 companion of [[unigramLogProb]]:
   * `ll2 = Σ_(w1,w2) c · ln( c(w1 w2) / c(w1 ·) )` over adjacent token
   * pairs, where `c(w1 ·)` counts w1 in non-final position (the MLE
   * conditional). Word SEQUENCE now matters: a doc of common words in an
   * incoherent order scores far below the same bag in corpus-typical
   * order — the repetition/gibberish signal unigram scoring cannot see.
   * Docs with fewer than two tokens have no bigrams and are omitted.
   * Rounded to 4 decimals for the same engine-parity reasons as
   * [[unigramLogProb]].
   *
   * Scale shape: bigram generation is narrow (an `arrays_zip` of the
   * token array with its own tail — no join, no extra shuffle over the
   * exploded form); per-(doc, bigram) occurrence collapse, the
   * bigram-vocabulary join, and the context-count join are all
   * partitioned on the bigram / context token with AQE broadcasting the
   * small sides, exactly like the unigram plan.
   */
  def bigramLogProb(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val a = toks(col(textCol))
    val big = df.filter(col(textCol).isNotNull && col(textCol) =!= "" &&
        size(toks(col(textCol))) >= 2)
      .select(col(idCol).as("doc_id"),
        explode(arrays_zip(slice(a, lit(1), size(a) - 1),
          slice(a, lit(2), size(a) - 1))).as("b"))
      .select(col("doc_id"), col("b.0").as("w1"), col("b.1").as("w2"))
    val vocab = big.groupBy("w1", "w2").agg(count(lit(1)).as("cnt"))
    val ctx = vocab.groupBy("w1").agg(sum("cnt").as("ctx"))
    val docBig = big.groupBy("doc_id", "w1", "w2").agg(count(lit(1)).as("c"))
    docBig.join(vocab, Seq("w1", "w2")).join(ctx, Seq("w1"))
      .groupBy("doc_id")
      .agg(sum("c").cast("long").as("n_bigrams"),
        sum(col("c") * log(col("cnt").cast("double") / col("ctx"))).as("__ll"))
      .select(col("doc_id"), col("n_bigrams"),
        round(col("__ll"), 4).as("ll2"),
        round(col("__ll") / col("n_bigrams"), 4).as("avg_ll2"))
  }

  /**
   * Top-`k` TF-IDF terms per document — the classic keyword-extraction /
   * sparse-retrieval signal: `score = c(doc, t) · ln(N / df(t))` with raw
   * term counts and unsmoothed idf. Scores are rounded to 4 decimals
   * BEFORE ranking and ties break on the term string, so the ranking is
   * engine-deterministic (an unrounded rank could flip on a 1-ulp libm
   * difference). One occurrence-collapse shuffle, a token-partitioned
   * doc-frequency join (AQE-broadcast when small), a 1-row broadcast for
   * N, and a per-doc WindowGroupLimit top-k — no sort of the full term
   * space.
   */
  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String,
                    k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = df.filter(col(textCol).isNotNull && col(textCol) =!= "")
      .select(col(idCol).as("doc_id"), explode(toks(col(textCol))).as("t"))
    val nDocs = tok.agg(count_distinct(col("doc_id")).as("nd"))
    val dfreq = tok.groupBy("t").agg(count_distinct(col("doc_id")).as("dfc"))
    val dt = tok.groupBy("doc_id", "t").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("t").asc)
    dt.join(dfreq, "t").crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("t"),
        round(col("c") * log(col("nd").cast("double") / col("dfc")), 4).as("score"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
  }

  /**
   * Per-document log-likelihood under the corpus's own unigram language
   * model — the CCNet-style LM-quality signal (Wenzek et al. 2020) with
   * the corpus itself as the model, so there is no external artifact to
   * ship: `ll = Σ_tok ln(cnt(tok) / N)` over token occurrences, plus the
   * length-normalized `avg_ll` (the per-token perplexity exponent).
   * Documents made of rare tokens score low; stop-soup scores high —
   * rank/filter on `avg_ll` to drop gibberish. Values are rounded to 4
   * decimals: the sum's floating addition order is engine-dependent and
   * `ln` itself may differ by an ulp across libm implementations, so the
   * raw doubles are not oracle-comparable — at 4 decimals the ~1e-13
   * accumulated discrepancy crosses a rounding boundary with probability
   * ~1e-9 per value.
   *
   * Scale shape: explode is narrow off the scan; per-(doc, token) counts
   * collapse occurrences in one partially-aggregated shuffle, so the join
   * carries one row per distinct token per doc, not per occurrence; the
   * vocabulary join is token-partitioned and AQE broadcasts it when small
   * (a real corpus's unigram vocab is MBs — it will be); the final
   * per-doc sum is the second shuffle. The 1-row total is a broadcast
   * cross join, never a collect.
   */
  def unigramLogProb(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df.filter(col(textCol).isNotNull && col(textCol) =!= "")
      .select(col(idCol).as("doc_id"), explode(toks(col(textCol))).as("token"))
    val vocab = tok.groupBy("token").agg(count(lit(1)).as("cnt"))
    val total = vocab.agg(sum("cnt").as("n_total"))
    val docTok = tok.groupBy("doc_id", "token").agg(count(lit(1)).as("c"))
    docTok.join(vocab, "token")
      .crossJoin(broadcast(total))
      .groupBy("doc_id")
      .agg(sum("c").cast("long").as("n_toks"),
        sum(col("c") * log(col("cnt").cast("double") / col("n_total"))).as("__ll"))
      .select(col("doc_id"), col("n_toks"),
        round(col("__ll"), 4).as("ll"),
        round(col("__ll") / col("n_toks"), 4).as("avg_ll"))
  }

  /**
   * DSIR-style importance weights (Xie et al. 2023, "Data Selection for
   * Language Models via Importance Resampling"): score every document by
   * how much more likely its tokens are under a *target* distribution
   * (documents from `targetSources`) than under the whole-corpus
   * background — `w = Σ_tok c · (ln p_t(tok) − ln p_b(tok))`, Laplace-
   * smoothed over the corpus vocabulary so unseen-in-target tokens stay
   * finite. Sampling proportionally to `exp(weight)` (or top-k on
   * `weight`) reshapes a generic crawl toward the target domain. Rounded
   * to 4 decimals (engine-dependent float summation order and libm `ln`
   * ulps — see [[unigramLogProb]]).
   *
   * Scale shape: identical to [[unigramLogProb]] — occurrence collapse,
   * token-partitioned vocab join (AQE-broadcast when small), one-row
   * smoothing constants via broadcast cross join. Both distributions ride
   * ONE vocabulary pass (conditional aggregation), not two scans.
   */
  def dsirWeights(df: DataFrame, idCol: String, textCol: String,
                  sourceCol: String, targetSources: Seq[String]): DataFrame = {
    require(targetSources.nonEmpty, "targetSources must be non-empty")
    val tok = df.filter(col(textCol).isNotNull && col(textCol) =!= "")
      .select(col(idCol).as("doc_id"), col(sourceCol).as("__src"),
        explode(toks(col(textCol))).as("token"))
    val isTarget = col("__src").isin(targetSources: _*)
    val vocab = tok.groupBy("token").agg(
      count(lit(1)).as("cnt_b"),
      sum(when(isTarget, 1L).otherwise(0L)).as("cnt_t"))
    val consts = vocab.agg(
      sum("cnt_b").as("n_b"), sum("cnt_t").as("n_t"),
      count(lit(1)).as("vsz"))
    val docTok = tok.groupBy("doc_id", "token").agg(count(lit(1)).as("c"))
    docTok.join(vocab, "token")
      .crossJoin(broadcast(consts))
      .groupBy("doc_id")
      .agg(sum("c").cast("long").as("n_toks"),
        sum(col("c") * (
          log((col("cnt_t") + 1).cast("double") / (col("n_t") + col("vsz"))) -
          log((col("cnt_b") + 1).cast("double") / (col("n_b") + col("vsz")))))
          .as("__w"))
      // + 0.0 collapses IEEE negative zero: a weight that rounds to zero
      // can carry either sign depending on engine-specific summation
      // order, and a hash comparison sees "-0" vs "0" (bit at sf0.1).
      .select(col("doc_id"), col("n_toks"),
        (round(col("__w"), 4) + lit(0.0)).as("weight"))
  }

  /**
   * Domain-level curation: keep documents whose SOURCE's mean token
   * count is at least the corpus mean — the "drop low-quality domains
   * wholesale" pass (a domain whose pages average 40 tokens is boiler-
   * plate/SEO spam regardless of any single page's score). The mean
   * comparison is INTEGER-exact by cross-multiplying:
   * `sum_s · n_g ≥ sum_g · n_s` decides `sum_s/n_s ≥ sum_g/n_g` with no
   * doubles, so the kept set hashes identically on any engine.
   *
   * Scale shape: one groupBy(source) over per-row token counts (map-side
   * partial), a one-row global broadcast, and a broadcast semi-join of
   * the kept-source list back onto the corpus — the corpus shuffles
   * zero times. Source cardinality is assumed ≪ corpus (domains vs
   * pages); a corpus with millions of sources broadcast-joins the kept
   * list all the same at ~8 bytes a row.
   */
  /**
   * Percentile-blended quality selection (the DataComp/FineWeb "blend
   * several weak signals by rank, keep the top slice" recipe): each
   * signal is converted to a per-language percentile rank — ranks, not
   * raw values, so a signal's scale never dominates the blend — then
   * combined with fixed weights and the top `topK` documents per
   * language survive. Signals here: length (word count, favoring long)
   * and type-token ratio (lexical diversity, against boilerplate).
   *
   * Deterministic by construction: every window order ends in the doc
   * id, so `percent_rank` sees a total order and the blend is an exact
   * arithmetic function of integer ranks — it hashes identically across
   * engines.
   *
   * Scale shape: ONE hash exchange on language feeds all three window
   * passes (same partition key; the sorts differ, the partitioning is
   * reused), and per-row signal extraction is narrow codegen. The
   * per-language partition must fit a task's sort spill budget — true
   * for real corpora only after sharding a dominant language; for a
   * 90%-English 100 TB corpus, salt the window into
   * (lang, hash(doc) % k) shards and take per-shard top-(topK/k), or
   * replace the exact percentile with a broadcast KLL quantile cut
   * ([[graft.operators.GroupedDistribution]]) — same selection, no
   * global per-lang sort.
   */
  def qualityBlend(df: DataFrame, idCol: String, textCol: String,
                   langCol: String, topK: Int,
                   wLen: Double = 0.6, wTtr: Double = 0.4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(topK >= 1, "topK must be >= 1")
    val ws = toks(col(textCol))
    val base = df.filter(col(textCol).isNotNull && col(textCol) =!= "")
      .select(col(idCol).as("doc_id"), col(langCol).as("lang"),
        size(ws).cast("long").as("n_words"),
        (size(array_distinct(ws)).cast("double") / size(ws)).as("ttr"))
    val byLen = Window.partitionBy("lang").orderBy(col("n_words"), col("doc_id"))
    val byTtr = Window.partitionBy("lang").orderBy(col("ttr"), col("doc_id"))
    val blended = base
      .withColumn("pr_len", percent_rank().over(byLen))
      .withColumn("pr_ttr", percent_rank().over(byTtr))
      .withColumn("blend", lit(wLen) * col("pr_len") + lit(wTtr) * col("pr_ttr"))
    val sel = Window.partitionBy("lang").orderBy(col("blend").desc, col("doc_id"))
    blended.withColumn("rk", row_number().over(sel).cast("long"))
      .filter(col("rk") <= topK)
      .select("lang", "doc_id", "n_words", "blend", "rk")
  }

  /**
   * Sliding-window token co-occurrence counts (word2vec/GloVe/PMI
   * pre-processing): every unordered token pair within `window`
   * positions of each other, with corpus-wide multiplicity, thresholded
   * at `minCount`.
   *
   * The pair expansion is a NARROW per-row expression — no self-join and
   * no shuffle until the final count. That is the 100 TB shape: the
   * classic positions-self-join formulation shuffles the corpus once to
   * build the positions table and again for the join; this shuffles only
   * the (already tiny) pair aggregation, with map-side partial counts
   * collapsing the Zipf head before anything moves.
   *
   * The expansion is the native [[graft.functions.CooccurPairs]]
   * expression — one compiled loop per document emitting normalized
   * `min max` pair keys. The composable nested-lambda form
   * (`transform(sequence…, slice(ws, i+2, w)…)`) computes the same pairs
   * but pays interpreted lambda dispatch per PAIR: ~10 µs/pair measured
   * at sf0.1 (7.7 s for 810k pairs) vs ~0.3 s native — same plan shape,
   * 25× less per-row cost.
   */
  def cooccurWindow(df: DataFrame, textCol: String, window: Int,
                    minCount: Long): DataFrame = {
    require(window >= 1, "window must be >= 1")
    df.filter(col(textCol).isNotNull && col(textCol) =!= "")
      .select(explode(graft.functions.TextFunctions
        .cooccurPairs(col(textCol), window)).as("p"))
      .groupBy("p")
      .agg(count(lit(1)).as("c"))
      .filter(col("c") >= minCount)
      .select(split(col("p"), " ").getItem(0).as("a"),
        split(col("p"), " ").getItem(1).as("b"), col("c"))
  }

  /**
   * Tokenizer-vocabulary coverage report: build the top-`vocabSize`
   * token vocabulary by corpus frequency (ties broken lexicographically
   * — the cut is deterministic) and report each document's token count
   * and out-of-vocabulary token count. The corpus OOV rate decides
   * whether a tokenizer vocabulary is big enough BEFORE a training run
   * pays for the answer.
   *
   * Scale shape: one token-count exchange + a top-k cut for the vocab
   * (vocabSize rows — broadcast), then a broadcast join onto the
   * re-exploded tokens and one per-doc count. The corpus is scanned
   * twice; against a persisted vocabulary (the usual production shape —
   * the tokenizer is fixed), skip the first pass and broadcast-join
   * directly.
   */
  def oovReport(df: DataFrame, idCol: String, textCol: String,
                vocabSize: Int): DataFrame = {
    require(vocabSize >= 1, "vocabSize must be >= 1")
    val toksOf = df.filter(col(textCol).isNotNull && col(textCol) =!= "")
      .select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("t"))
    val vocab = toksOf.groupBy("t").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("t")).limit(vocabSize)
      .select(col("t"), lit(1).as("__in"))
    toksOf.join(broadcast(vocab), Seq("t"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        count(when(col("__in").isNull, lit(1))).as("n_oov"))
  }

  def sourceQualityFilter(df: DataFrame, idCol: String, textCol: String,
                          sourceCol: String): DataFrame = {
    val d = df.select(col(idCol).as("doc_id"), col(sourceCol).as("source"),
      size(toks(col(textCol))).cast("long").as("tk"))
    val perSource = d.groupBy("source")
      .agg(count(lit(1)).as("n_s"), sum("tk").as("sum_s"))
    val global = perSource.agg(sum("n_s").as("n_g"), sum("sum_s").as("sum_g"))
    val kept = perSource.crossJoin(broadcast(global))
      .filter(col("sum_s") * col("n_g") >= col("sum_g") * col("n_s"))
      .select("source")
    d.join(broadcast(kept), Seq("source"), "left_semi")
      .select(col("doc_id"), col("source"))
  }

  /**
   * Cross-source score calibration: replace each document's raw quality
   * score with its PERCENTILE RANK within its source, so a source whose
   * scorer runs hot (or cold) stops dominating a mixed-corpus threshold
   * — the step between per-source scoring and any global quality cut.
   * `percent_rank = (rank − 1) / (n − 1)` is a rational of two integers
   * with one final division (engine-exact); ties share a rank (same
   * score ⇒ same calibrated value — deterministic regardless of row
   * order), and a single-doc source calibrates to 0.0 by convention.
   * One window shuffle on the source key.
   */
  def calibrateScores(df: DataFrame, idCol: String, sourceCol: String,
                      scoreCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol)).orderBy(col(scoreCol))
    df.select(col(idCol), col(sourceCol), col(scoreCol))
      .withColumn("calibrated", percent_rank().over(w))
  }
}
