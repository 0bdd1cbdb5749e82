package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Distributed BPE (byte-pair-encoding) tokenizer training — the
 * missing piece between corpus curation and the trainer's vocabulary
 * (Sennrich et al., ACL 2016). Reference analog: none (the reference
 * engine has no tokenizer surface); this extends the LLM-pipeline
 * family alongside [[TextAnalysis]] vocabulary/token-count reports.
 *
 * Scale shape (the part that matters at 100 TB): the corpus is touched
 * EXACTLY ONCE — by the word-count aggregation (one shuffle, map-side
 * combined). Every merge iteration after that runs over the
 * VOCABULARY frame (|distinct words| rows, with multiplicities carried
 * as counts), which is how production tokenizer trainers scale: pair
 * statistics are Σ wordCount over adjacent token pairs, so collapsing
 * duplicate words first is lossless. Per iteration: one pair-count
 * aggregation + a top-1 `orderBy.limit(1)` (TakeOrdered — a heap, not
 * a global sort) + two 1-row bounded collects; the re-tokenization is
 * a narrow per-row `replace`.
 *
 * Token-merge representation: a word's tokenization is the
 * concatenation of `SEP + token + SEP` (SEP = U+001F, the ASCII unit
 * separator — absent from any text this operator admits). Merging pair
 * (a, b) is then the literal string replace of `SEP a SEP SEP b SEP`
 * with `SEP ab SEP` — left-to-right non-overlapping, which is EXACTLY
 * the classic left-greedy BPE merge fold (each token carries its own
 * delimiters, so consecutive matches never share characters and
 * replace() consumes them all). This keeps the whole loop inside
 * codegen'd string expressions — no UDF, no per-row JVM fold — and
 * makes every step replayable by an external SQL engine, which is how
 * the DuckDB oracle pins all of training.
 *
 * No end-of-word marker is appended (documented deviation from
 * Sennrich's `</w>`): merges never cross word boundaries either way,
 * and the marker-free form keeps the oracle exact.
 */
object Bpe {

  val Sep = "\u001f"

  /** Thrown by [[trainLocal]] when the distinct-word table exceeds
    * `maxVocabRows` — a dedicated type so [[trainAuto]]'s distributed
    * fallback dispatches on the CLASS, never on message text (rewording
    * the message cannot silently disable the fallback). Extends
    * IllegalArgumentException so callers treating the guard as a
    * precondition failure keep working. */
  final class VocabOverflowException(msg: String)
    extends IllegalArgumentException(msg)

  /** One trained merge: `step` is 1-based, (a, b) → a+b, `cnt` the
    * corpus-weighted pair count that won the step, `toksAfter` the
    * total corpus token count after applying the merge (monotone
    * decreasing — each merge saves exactly `cnt` tokens). */
  final case class Merge(step: Int, a: String, b: String, cnt: Long, toksAfter: Long)

  /** A word as its Unicode CODE POINT array — the BPE alphabet. Spark's
    * `split(word, "")` splits per UTF-16 code unit, which shears a
    * supplementary-plane character (an emoji) into two unpaired
    * surrogates that UTF8String then encodes as `?` — silently merging
    * distinct emoji and diverging from DuckDB's `string_split(word, '')`
    * (per code point). `substr` over a position sequence is code-point
    * based on UTF8String, so both engines and both trainer paths see the
    * same alphabet. Empty words yield an EMPTY array by construction —
    * Spark's sequence(1, 0) does NOT throw, it counts down to [1, 0]
    * (default step −1), which would silently fabricate two empty-string
    * "code points"; the when() guard below makes the empty case
    * explicit instead of relying on every call site's filter. NULL
    * words stay NULL (length(NULL) >= 1 is NULL, which this when()
    * chain routes to the null branch, not to the empty array — a null
    * row should surface, not silently become a zero-token word). */
  private def codepoints(word: Column): Column =
    when(word.isNull, lit(null).cast("array<string>"))
      .when(length(word) >= 1,
        transform(sequence(lit(1), length(word)), i => word.substr(i, lit(1))))
      .otherwise(array().cast("array<string>"))

  /** Distinct words with multiplicities — the only corpus-sized pass. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("wcnt"))

  /** Train `numMerges` BPE merges over the corpus; returns them in
    * order. Deterministic: ties on pair count break by (a, b). */
  def train(docs: DataFrame, textCol: String, numMerges: Int): Seq[Merge] = {
    require(numMerges >= 1, s"Bpe.train needs numMerges >= 1, got $numMerges")
    val words = wordCounts(docs, textCol)
    // initial representation: every character is a token
    var rep = words.select(col("wcnt"),
      array_join(transform(codepoints(col("word")),
        c => concat(lit(Sep), c, lit(Sep))), "").as("rep"))
      .cache()
    val merges = Seq.newBuilder[Merge]
    try {
      var step = 1
      var continue = true
      while (step <= numMerges && continue) {
        val toks = split(trim(col("rep"), Sep), Sep + Sep)
        val n1 = greatest(size(toks) - 1, lit(0))
        val top = rep.select(col("wcnt"),
            explode(arrays_zip(slice(toks, lit(1), n1), slice(toks, lit(2), n1))).as("p"))
          .groupBy(col("p").getField("0").as("a"), col("p").getField("1").as("b"))
          .agg(sum("wcnt").as("cnt"))
          .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
          .limit(1).collect() // bounded: exactly one row
        if (top.isEmpty) continue = false
        else {
          val (a, b, cnt) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
          val next = rep.withColumn("rep",
            replace(col("rep"), lit(Sep + a + Sep + Sep + b + Sep),
              lit(Sep + a + b + Sep))).cache()
          val toksAfter = next.agg(sum(col("wcnt") *
            size(split(trim(col("rep"), Sep), Sep + Sep))).as("t"))
            .collect()(0).getLong(0) // bounded: one row
          rep.unpersist()
          rep = next
          merges += Merge(step, a, b, cnt, toksAfter)
          step += 1
        }
      }
    } finally rep.unpersist()
    merges.result()
  }

  /** The trained merges as a DataFrame (k rows, driver-built). */
  def trainDf(spark: SparkSession, docs: DataFrame, textCol: String,
              numMerges: Int): DataFrame = {
    import spark.implicits._
    train(docs, textCol, numMerges)
      .toDF("step", "a", "b", "cnt", "toks_after")
      .select(col("step").cast("long"), col("a"), col("b"),
        col("cnt"), col("toks_after"))
  }

  /** Default ceiling on the collected word-count table for the local
    * trainer: 2M (word, count) rows is low hundreds of MB on the
    * driver — the same driver-survivability line as the Lloyd loops. */
  val DefaultMaxVocabRows: Long = 2000000L

  /**
   * Driver-local merge loop over the COLLECTED word-count table — the
   * production-merge-count path. [[train]] schedules ~2 Spark jobs per
   * merge, which is correct but job-count-bound: at a production 30k-50k
   * merge vocabulary that is 60k+ scheduled jobs of pure latency,
   * regardless of data size. The word-count table is the only
   * corpus-sized object and is usually tiny (|distinct words|), so the
   * classic trainer layout is: ONE corpus shuffle → collect word counts
   * → iterate locally. Semantics are bit-identical to [[train]]: same
   * left-greedy non-overlapping merge (the loop below IS the
   * delimiter-wrapped string replace, one token window at a time), same
   * (cnt desc, a asc, b asc) tie-break, same toksAfter accounting — the
   * conformance spec asserts equality merge-for-merge.
   *
   * The collect is guarded: more than `maxVocabRows` distinct words
   * throws [[VocabOverflowException]] (collect bounded by maxVocabRows
   * + 1 rows before the check — never materializes an unbounded frame
   * on the driver) and names [[train]] as the stay-distributed remedy.
   *
   * Pair ties order by UTF-8 BYTE comparison ([[u8Ordering]]) — the
   * exact collation Spark's UTF8String gives [[train]]'s `orderBy` —
   * so merge-for-merge parity holds unconditionally, including the
   * supplementary-plane-vs-U+E000 ties where JVM String (UTF-16 code
   * unit) order disagrees with UTF-8 byte order.
   */
  def trainLocal(docs: DataFrame, textCol: String, numMerges: Int,
                 maxVocabRows: Long = DefaultMaxVocabRows): Seq[Merge] = {
    require(numMerges >= 1, s"Bpe.trainLocal needs numMerges >= 1, got $numMerges")
    require(maxVocabRows >= 1 && maxVocabRows < Int.MaxValue,
      s"maxVocabRows must be in [1, Int.MaxValue), got $maxVocabRows")
    val collected = wordCounts(docs, textCol)
      .limit(maxVocabRows.toInt + 1).collect()
    if (collected.length > maxVocabRows)
      throw new VocabOverflowException(
        s"Bpe.trainLocal: > $maxVocabRows distinct words — the word-count " +
          "table no longer fits the driver; use Bpe.train (the distributed " +
          "per-merge loop) or raise maxVocabRows")
    // rep = token array per distinct word; multiplicity carried as count
    var reps: Array[(Array[String], Long)] =
      collected.map(r => (r.getString(0).codePoints().toArray
        .map(cp => new String(Character.toChars(cp))), r.getLong(1)))
    val merges = Seq.newBuilder[Merge]
    var step = 1
    var continue = true
    while (step <= numMerges && continue) {
      val pc = scala.collection.mutable.HashMap.empty[(String, String), Long]
      reps.foreach { case (ts, c) =>
        var i = 0
        while (i < ts.length - 1) {
          val k = (ts(i), ts(i + 1))
          pc.update(k, pc.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      if (pc.isEmpty) continue = false
      else {
        val ((a, b), cnt) = pc.minBy { case ((pa, pb), c) => (-c, pa, pb) }(
          Ordering.Tuple3(Ordering.Long, u8Ordering, u8Ordering))
        var toksAfter = 0L
        reps = reps.map { case (ts, c) =>
          val out = Array.newBuilder[String]
          var i = 0
          while (i < ts.length) {
            if (i + 1 < ts.length && ts(i) == a && ts(i + 1) == b) {
              out += a + b; i += 2
            } else { out += ts(i); i += 1 }
          }
          val merged = out.result()
          toksAfter += merged.length * c
          (merged, c)
        }
        merges += Merge(step, a, b, cnt, toksAfter)
        step += 1
      }
    }
    merges.result()
  }

  /** UTF-8 byte-wise (unsigned) string ordering — the collation Spark's
    * UTF8String applies in [[train]]'s `orderBy(a, b)` tie-break. The
    * local loop must match it exactly or the two paths pick different
    * winners on supplementary-plane-vs-U+E000..U+FFFF ties (UTF-16 code
    * units sort surrogates BELOW U+E000; UTF-8 bytes sort 4-byte
    * sequences ABOVE 3-byte ones). */
  private[pipeline] val u8Ordering: Ordering[String] = new Ordering[String] {
    def compare(x: String, y: String): Int = {
      val a = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val b = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val n = math.min(a.length, b.length)
      var i = 0
      while (i < n) {
        val d = (a(i) & 0xff) - (b(i) & 0xff)
        if (d != 0) return d
        i += 1
      }
      a.length - b.length
    }
  }

  /** [[trainLocal]] when the vocabulary fits the driver, [[train]]
    * (distributed per-merge loop) above the bound — the trainer a
    * caller should reach for by default. The fallback re-runs the
    * word-count shuffle (one extra corpus pass in the rare huge-vocab
    * regime). */
  def trainAuto(docs: DataFrame, textCol: String, numMerges: Int,
                maxVocabRows: Long = DefaultMaxVocabRows): Seq[Merge] =
    try trainLocal(docs, textCol, numMerges, maxVocabRows)
    catch { case _: VocabOverflowException => train(docs, textCol, numMerges) }

  /** [[trainAuto]] as a DataFrame (k rows, driver-built). */
  def trainDfAuto(spark: SparkSession, docs: DataFrame, textCol: String,
                  numMerges: Int,
                  maxVocabRows: Long = DefaultMaxVocabRows): DataFrame = {
    import spark.implicits._
    trainAuto(docs, textCol, numMerges, maxVocabRows)
      .toDF("step", "a", "b", "cnt", "toks_after")
      .select(col("step").cast("long"), col("a"), col("b"),
        col("cnt"), col("toks_after"))
  }

  /** All trained merges applied to a char-wrapped rep in ONE chained
    * narrow projection (the k replaces fuse inside codegen) — for
    * artifact builds where the merge list is already known, vs the
    * training loop's one-replace-per-iteration. */
  private def applyMerges(rep: Column, merges: Seq[Merge]): Column =
    merges.foldLeft(rep) { (r, m) =>
      replace(r, lit(Sep + m.a + Sep + Sep + m.b + Sep), lit(Sep + m.a + m.b + Sep))
    }

  /** The tokenizer's vocabulary artifact: every surviving token type
    * with its corpus frequency and a dense 1-based id (count desc,
    * token asc — most frequent token gets id 1). Output is bounded by
    * |alphabet| + merges.size rows — each merge mints exactly one new
    * token type and can only shrink existing types' counts — so the
    * global rank window is a documented bounded single-partition sort
    * (same shape as feature index encoding). */
  def vocab(docs: DataFrame, textCol: String, merges: Seq[Merge]): DataFrame = {
    val words = wordCounts(docs, textCol)
    val rep0 = array_join(transform(codepoints(col("word")),
      c => concat(lit(Sep), c, lit(Sep))), "")
    val toks = split(trim(applyMerges(rep0, merges), Sep), Sep + Sep)
    words.select(col("wcnt"), explode(toks).as("token"))
      .groupBy("token").agg(sum("wcnt").as("cnt"))
      .withColumn("id", row_number()
        .over(Window.orderBy(col("cnt").desc, col("token").asc)).cast("long"))
  }

  /** Apply trained merges to a text column: per-word greedy merge fold
    * — the serve-time tokenizer. Returns the per-row token count (the
    * narrow transform a token-budget pass needs); extend with the
    * token array via the same `rep` column if needed. */
  /**
   * Corpus tokenization — the production encode pass: every document
   * becomes its ordered (pos, token, token_id) sequence under the
   * trained merges and the [[vocab]] id assignment. One narrow
   * merge-fold per word (the same chained codegen'd replaces training
   * uses), a broadcast join to the vocabulary (bounded by |alphabet| +
   * |merges| rows), and one per-document window for the global token
   * position — the only shuffle, keyed on the document id. Emitting
   * token ROWS (not arrays) is deliberate: it is the shape shard
   * writers and sequence packers consume, and it keeps the oracle an
   * ordinary relational replay.
   */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             merges: Seq[Merge], vocabDf: DataFrame): DataFrame = {
    val words = filter(split(col(textCol), " "), w => length(w) > 0)
    val perWord = docs
      .filter(col(textCol).isNotNull && length(col(textCol)) > 0)
      .select(col(idCol), posexplode(words).as(Seq("wpos", "word")))
    val rep0 = array_join(transform(codepoints(col("word")),
      c => concat(lit(Sep), c, lit(Sep))), "")
    val toks = split(trim(applyMerges(rep0, merges), Sep), Sep + Sep)
    val perTok = perWord
      .select(col(idCol), col("wpos"), posexplode(toks).as(Seq("tpos", "token")))
    val w = Window.partitionBy(col(idCol)).orderBy(col("wpos"), col("tpos"))
    perTok
      .withColumn("pos", row_number().over(w).cast("long"))
      .join(broadcast(vocabDf.select(col("token"), col("id").as("token_id"))),
        Seq("token"))
      .select(col(idCol), col("pos"), col("token"), col("token_id"))
  }

  def tokenCount(textCol: org.apache.spark.sql.Column,
                 merges: Seq[Merge]): org.apache.spark.sql.Column = {
    val word = filter(split(textCol, " "), w => length(w) > 0)
    val rep0 = transform(word, w =>
      array_join(transform(codepoints(w), c => concat(lit(Sep), c, lit(Sep))), ""))
    val repK = merges.foldLeft(rep0) { (r, m) =>
      transform(r, s => replace(s,
        lit(Sep + m.a + Sep + Sep + m.b + Sep), lit(Sep + m.a + m.b + Sep)))
    }
    aggregate(repK, lit(0L),
      (acc, s) => acc + size(split(trim(s, Sep), Sep + Sep)))
  }
}
