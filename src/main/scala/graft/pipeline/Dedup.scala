package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deduplication operators for large-scale training-data pipelines: exact
 * (content-hash / key), n-gram Jaccard (inverted index), MinHash-LSH
 * (banded signatures), and SimHash (banded bit signatures).
 *
 * Every fuzzy variant is bucketed — candidate pairs come from shared
 * shingles / LSH bands, NEVER an all-pairs cross join — so the shuffle
 * volume is O(sum of bucket sizes squared), not O(N²). At 100 TB the
 * MinHash/SimHash paths are the primary ones (constant-size signatures per
 * document); the exact n-gram join is the reference answer for verification
 * and smaller corpora, with a document-frequency cutoff as the skew guard.
 *
 * All plans use built-in codegen'd functions only (split/transform/slice/
 * hash/array_intersect...) — zero UDFs.
 */
object Dedup {

  /** THE canonical-text normalization for exact dedup: lowercase, strip
    * everything but [a-z0-9 ], collapse runs of spaces, trim. One
    * definition — the canonical-dedup entry and both curation pipelines
    * ride it, and their SQL oracles restate exactly this recipe
    * (regexp_replace 'g' twice + trim). Change it here and in those
    * oracles together or the hash compare will say so. */
  def canonText(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", ""), " +", " "))

  /** Distinct word n-grams ("shingles") of whitespace-tokenized `text`,
    * space-joined, as a composable expression: n shifted `slice`s folded
    * with `zip_with(concat)` — n array copies per document total, instead
    * of one `slice` per gram inside a `transform` (higher-order lambdas
    * are interpreted per element; the per-gram slice was a 5× slowdown on
    * the posting-list build). Kept as the no-session fallback and the
    * parity reference for [[shingles]]. */
  def shinglesComposable(text: Column, n: Int): Column = {
    val toks = split(text, " ")
    val len = size(toks) - lit(n - 1)
    val slices = (1 to n).map(i => slice(toks, lit(i), len))
    val joined = slices.reduce((a, b) => zip_with(a, b, (x, y) => concat(x, lit(" "), y)))
    when(size(toks) >= n, array_distinct(joined))
      .otherwise(array().cast("array<string>"))
  }

  /** Distinct word n-grams, native: one codegen'd JVM call per row
    * ([[graft.functions.WordShingles]]) instead of the interpreted
    * per-element lambda chain — bit-identical output. The Column wraps
    * the expression node directly (ColumnBridge), so it is session-free
    * and thread-independent: no registry, no getActiveSession dispatch
    * (the round-4/5 exposure for external callers is gone). */
  def shingles(text: Column, n: Int): Column =
    graft.functions.TextFunctions.wordShingles(text, n)


  /** Exact dedup by content hash: one survivor (min id) and a copy count
    * per identical content value. Single hash-shuffle on the digest. */
  def exactByContent(df: DataFrame, idCol: String, contentCol: String): DataFrame =
    df.groupBy(md5(col(contentCol).cast("binary")).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Exact dedup by a key tuple: survivor + copy count per key. */
  def exactByKey(df: DataFrame, idCol: String, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /**
   * Streaming exact dedup: keep the FIRST record per content hash across
   * micro-batches — the ingest-time variant of [[exactByContent]] for a
   * live training-data feed. State is one row per distinct hash; with an
   * event-time column the state is evicted after `delay`
   * (`dropDuplicatesWithinWatermark` — duplicates arriving within the
   * watermark window are still suppressed), which is the unbounded-stream
   * configuration. Without one, state grows with distinct content — only
   * right for bounded reference sets.
   */
  def exactDedupStream(stream: DataFrame, contentCol: String,
                       eventTimeCol: Option[String] = None,
                       delay: String = "10 minutes"): DataFrame = {
    val hashed = stream.withColumn("content_hash",
      md5(col(contentCol).cast("binary")))
    eventTimeCol match {
      case Some(t) => hashed.withWatermark(t, delay)
        .dropDuplicatesWithinWatermark("content_hash")
      case None => hashed.dropDuplicates("content_hash")
    }
  }

  /**
   * Incremental EXACT dedup: survivors of a NEW batch against a prior
   * corpus — the "don't re-ingest what we already have" nightly op, the
   * exact sibling of the MinHash [[minhashBandIndex]]/[[lshPairsAgainstIndex]]
   * incremental path. Two steps, both keyed on the md5 content hash:
   * (1) in-batch self-dedup (min-id survivor + copy count per hash, the
   * [[exactByContent]] rule), (2) hash anti-join against the corpus's
   * distinct-hash index. The index is 16 bytes per distinct corpus doc —
   * at 100 TB the anti-join shuffles hashes, never content. An md5
   * collision could only drop an innocent new doc (same tradeoff
   * documented on [[segmentDedup]]).
   */
  def exactIncremental(newBatch: DataFrame, idCol: String, contentCol: String,
                       corpus: DataFrame, corpusContentCol: String): DataFrame = {
    val idx = corpus
      .select(md5(col(corpusContentCol).cast("binary")).as("content_hash"))
      .distinct()
    newBatch
      .groupBy(md5(col(contentCol).cast("binary")).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
      .join(idx, Seq("content_hash"), "left_anti")
  }

  /** (doc_id, grams) pairs — the shingle-set form shared by the fuzzy ops. */
  private def gramSets(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol).as("doc_id"), shingles(col(textCol), n).as("grams"))

  /** Cheap pushdown-safe precondition equivalent to "the native text
    * signature is non-null": the signature expressions return null
    * exactly when the text is null or holds fewer than `n`
    * space-separated tokens. Filtering on the signature COLUMN instead
    * gets pushed below its projection and re-evaluates the whole
    * expensive expression per row (filter + project are separate codegen
    * operators — no cross-operator subexpression elimination; the r11
    * winnow audit measured the full pass twice from exactly this). This
    * predicate re-evaluates only the tokenization. */
  private def hasTokens(textCol: String, n: Int) =
    col(textCol).isNotNull && size(split(col(textCol), " ")) >= n

  /** The persistable verify-side artifact for [[lshPairsAgainstStored]]:
    * (doc_id, grams) shingle sets as a parquet-writable frame. Stored
    * NEXT TO the band index, it makes incremental near-dup fully
    * corpus-scan-free — the nightly probe reads two small artifact
    * tables instead of re-shingling history. */
  def gramSetsFor(df: DataFrame, idCol: String, textCol: String,
                  n: Int): DataFrame = gramSets(df, idCol, textCol, n)

  /**
   * Exact n-gram Jaccard near-duplicate pairs via an inverted index:
   * explode shingles → self-join on the shingle (co-occurrence counts) →
   * Jaccard from |A∩B| and set sizes. Only documents sharing ≥1 shingle
   * ever meet, and the join shuffles by shingle — no all-pairs.
   *
   * `maxDocFreq` drops shingles present in more than that many documents
   * before the join — the skew guard at scale (a stop-shingle appearing in
   * 1M docs would otherwise form a 10¹²-pair bucket). Dropping ubiquitous
   * shingles lowers measured Jaccard slightly; leave None for exactness.
   */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        n: Int, threshold: Double,
                        maxDocFreq: Option[Int] = None): DataFrame =
    pairCounts(df, idCol, textCol, n, maxDocFreq)
      .select(col("id1"), col("id2"),
        (col("ic").cast("double") / (col("sz1") + col("sz2") - col("ic"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)

  /**
   * EXPLAIN a near-dup verdict: for each pair above `threshold`, the
   * Jaccard plus the first `k` shared shingles (lexicographic — a
   * deterministic sample of the overlap), " | "-joined into one
   * evidence string (portable to any result channel). This is the appeals/debug
   * surface a dedup pipeline owes its users: "these two were merged
   * BECAUSE they share …" — evidence, not just a score. Candidates
   * come from the same inverted-index pair counts as
   * [[ngramJaccardPairs]] (no all-pairs); the evidence join touches
   * only the surviving pairs' two gram sets.
   */
  def explainPairs(df: DataFrame, idCol: String, textCol: String,
                   n: Int, threshold: Double, k: Int = 3,
                   maxDocFreq: Option[Int] = None): DataFrame = {
    require(k >= 1, "need at least one evidence shingle")
    // ONE shingle pass feeds the pair join and both evidence sides —
    // un-persisted, the corpus re-shingles once per consumer (the
    // double-execution class: column pruning differentiates the
    // subplans, so exchange reuse cannot dedupe them). Spillable,
    // evictable — a pathological corpus degrades to recompute, not OOM.
    val g = gramSets(df, idCol, textCol, n)
      .transform(graft.plans.CacheScope.persistTracked)
    val pairs = pairCountsFromGramSets(g, maxDocFreq)
      .select(col("id1"), col("id2"),
        (col("ic").cast("double") / (col("sz1") + col("sz2") - col("ic"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
    pairs
      .join(g.select(col("doc_id").as("id1"), col("grams").as("__g1")), "id1")
      .join(g.select(col("doc_id").as("id2"), col("grams").as("__g2")), "id2")
      .select(col("id1"), col("id2"), col("jaccard"),
        array_join(
          slice(array_sort(array_intersect(col("__g1"), col("__g2"))), 1, k),
          " | ").as("evidence"))
  }


  /**
   * One-sided cross-corpus near-duplicate pairs: every (corpus doc,
   * contamination doc) pair whose n-gram Jaccard reaches `threshold` —
   * the FUZZY sibling of the exact/bloom decontamination passes
   * ([[TextAnalysis.benchmarkOverlap]]): an eval question paraphrased or
   * partially quoted inside a training document survives exact n-gram
   * membership checks but not a 0.5-Jaccard screen.
   *
   * Same 8-byte-hashed posting discipline as the self-join family, but
   * the join is strictly BETWEEN sides: the corpus never pairs with
   * itself, so the volume is Σ_g df_corpus(g)·df_contam(g) — linear in
   * corpus postings when the contamination side (an eval suite) is
   * small. `maxDocFreq` is the same skew guard, applied to COMBINED
   * doc-frequency via a semi-join riding the posting shuffle key.
   */
  def crossNearDupPairs(corpus: DataFrame, contam: DataFrame,
                        idCol: String, textCol: String, n: Int,
                        threshold: Double,
                        maxDocFreq: Option[Int] = None): DataFrame = {
    def postings(df: DataFrame) = gramSets(df, idCol, textCol, n)
      .select(col("doc_id"), size(col("grams")).as("sz"),
        explode(col("grams")).as("g0"))
      .select(col("doc_id"), col("sz"), xxhash64(col("g0")).as("g"))
    val pa = postings(corpus)
    val pb = postings(contam)
    val (fa, fb) = maxDocFreq match {
      case Some(m) =>
        val keep = pa.select("g").unionAll(pb.select("g"))
          .groupBy("g").agg(count(lit(1)).as("__df"))
          .filter(col("__df") <= m).select("g")
        (pa.join(keep, Seq("g"), "left_semi"), pb.join(keep, Seq("g"), "left_semi"))
      case None => (pa, pb)
    }
    fa.as("a").join(fb.as("b"), col("a.g") === col("b.g"))
      .groupBy(col("a.doc_id").as("doc_id"), col("b.doc_id").as("contam_id"),
        col("a.sz").as("sz1"), col("b.sz").as("sz2"))
      .agg(count(lit(1)).as("ic"))
      .select(col("doc_id"), col("contam_id"),
        (col("ic").cast("double") / (col("sz1") + col("sz2") - col("ic")))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** The corpus minus every document [[crossNearDupPairs]] flags — the
    * drop-in fuzzy decontamination filter. The flagged-id set is
    * eval-suite-bounded (≤ corpus docs with a match), so the anti-join
    * broadcasts in practice. */
  def fuzzyDecontaminate(corpus: DataFrame, contam: DataFrame,
                         idCol: String, textCol: String, n: Int,
                         threshold: Double,
                         maxDocFreq: Option[Int] = None): DataFrame = {
    val bad = crossNearDupPairs(corpus, contam, idCol, textCol, n,
      threshold, maxDocFreq).select(col("doc_id").as(idCol)).distinct()
    corpus.join(bad, Seq(idCol), "left_anti")
  }

  /** Near-dup pairs by n-gram CONTAINMENT — |A∩B| / min(|A|, |B|) — the
    * asymmetric companion to Jaccard: a small document wholly embedded in
    * a much larger one (quoted article, concatenated crawl page) scores
    * ~1.0 here while its Jaccard is ~|A|/|B| ≈ 0. Same inverted-index
    * plan and skew guard as [[ngramJaccardPairs]]. */
  def ngramContainmentPairs(df: DataFrame, idCol: String, textCol: String,
                            n: Int, threshold: Double,
                            maxDocFreq: Option[Int] = None): DataFrame =
    pairCounts(df, idCol, textCol, n, maxDocFreq)
      .select(col("id1"), col("id2"),
        (col("ic").cast("double") / least(col("sz1"), col("sz2"))).as("containment"))
      .filter(col("containment") >= threshold)

  /** Shared inverted-index co-occurrence core: (id1, id2, sz1, sz2, ic)
    * for every document pair sharing ≥1 shingle. */
  private def pairCounts(df: DataFrame, idCol: String, textCol: String,
                         n: Int, maxDocFreq: Option[Int]): DataFrame =
    pairCountsFromGramSets(gramSets(df, idCol, textCol, n), maxDocFreq)

  /** [[pairCounts]] over a caller-supplied (doc_id, grams) frame — lets
    * [[explainPairs]] share ONE (persisted) shingle computation between
    * the pair join and the evidence joins instead of re-shingling the
    * corpus per consumer. */
  private def pairCountsFromGramSets(gs: DataFrame,
                                     maxDocFreq: Option[Int]): DataFrame = {
    // Carry the set size on each posting so the pair-count aggregation can
    // compute Jaccard directly — no separate sizes join, and the shingle
    // arrays are computed once per side instead of three times. Postings
    // key on xxhash64(shingle), not the string: the shuffle carries 8
    // bytes per posting instead of an ~n-word string, and the join
    // compares longs. Distinct shingles stay distinct w.h.p. — a
    // collision only perturbs a pair's Jaccard if the two colliding
    // shingles co-occur in the SAME compared pair (p ≈ |A|·|B| / 2⁶⁴).
    val exploded = gs.select(col("doc_id"), size(col("grams")).as("sz"),
      explode(col("grams")).as("g0"))
      .select(col("doc_id"), col("sz"), xxhash64(col("g0")).as("g"))
    val counted = maxDocFreq match {
      case Some(m) =>
        // Guarded path — group-and-pair: ONE shuffle of the postings by
        // shingle. The doc-frequency guard must drop hot shingles BEFORE
        // any bucket materializes: `count(*) over (partition by g)` rides
        // the same hash-partitioning (the groupBy below reuses the
        // exchange — zero extra shuffles) and WindowExec's row buffer
        // spills to disk, so a stop-shingle present in millions of docs
        // never builds a multi-GB aggregation buffer — its postings are
        // counted, filtered out, and only then do the surviving ≤ m-entry
        // buckets collect. In-bucket pairs generate map-side.
        val byShingle = org.apache.spark.sql.expressions.Window.partitionBy("g")
        val buckets = exploded
          .withColumn("__df", count(lit(1)).over(byShingle))
          .filter(col("__df").between(2, m))
          .groupBy("g")
          .agg(sort_array(collect_list(struct(col("doc_id"), col("sz")))).as("docs"))
        val pairs = buckets.select(explode(flatten(transform(col("docs"),
          (x, i) => transform(
            slice(col("docs"), i + lit(2), size(col("docs")) - i - lit(1)),
            y => struct(x.getField("doc_id").as("id1"), y.getField("doc_id").as("id2"),
              x.getField("sz").as("sz1"), y.getField("sz").as("sz2")))))).as("p"))
        pairs.groupBy(col("p.id1").as("id1"), col("p.id2").as("id2"),
          col("p.sz1").as("sz1"), col("p.sz2").as("sz2"))
          .agg(count(lit(1)).as("ic"))
      case None =>
        // Exact path: self-join on the shingle (shuffles the postings once
        // per side). Unbounded buckets stream through the join instead of
        // materializing as one array row.
        exploded.as("a")
          .join(exploded.as("b"),
            col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
            col("a.sz").as("sz1"), col("b.sz").as("sz2"))
          .agg(count(lit(1)).as("ic"))
    }
    counted
  }

  /**
   * MinHash signatures via explode + groupBy(doc) + numHashes min
   * aggregates — bit-identical to the native
   * [[graft.functions.MinHashSignature]] path [[minhashLshPairs]] uses
   * (same Murmur3 chain per slot); kept as the differential-parity
   * reference. Hash family = Murmur3 of (shingle, seed i).
   */
  private[graft] def minhashSignatures(gs: DataFrame, numHashes: Int): DataFrame = {
    // no size > 0 filter: exploding an empty array emits nothing, and the
    // pushed-down predicate would re-run the shingling per row
    val exploded = gs.select(col("doc_id"), explode(col("grams")).as("g"))
    val sigCols = (0 until numHashes).map(i => min(hash(col("g"), lit(i))).as(s"h$i"))
    exploded.groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*)
  }

  /**
   * MinHash-LSH near-duplicate pairs: banded signatures → documents sharing
   * a (band, band-hash) bucket become candidates → exact Jaccard verify on
   * candidates only. With b bands of r rows, P[candidate] = 1-(1-J^r)^b —
   * the standard S-curve; defaults (b=16, r=2) catch J ≥ 0.5 with
   * probability ≈ 1-2·10⁻² and J ≥ 0.9 with ≈ 1-10⁻¹⁷.
   *
   * Scale shape: signatures are numHashes ints per doc (constant);
   * candidates shuffle by bucket; the verify join touches only candidate
   * pairs. This is the 100 TB fuzzy-dedup path.
   */
  /**
   * Self-tuning band layout: choose (bands, bandRows) for a family of
   * `numHashes` MinHashes targeting Jaccard `threshold`. The candidate
   * S-curve `1-(1-s^r)^b` puts its steep crossover at s* ≈ (1/b)^(1/r);
   * among exact factorizations b·r = numHashes this picks the one whose
   * s* lands closest to the target in LOG space (so overshooting 2× and
   * undershooting 2× miss equally — linear distance would bias every
   * plan toward low-threshold layouts, where the curve points crowd).
   * Feed the result straight into [[minhashLshPairs]] /
   * [[minhashBandIndex]] instead of hand-picking a layout per corpus.
   */
  def lshPlan(numHashes: Int, threshold: Double): (Int, Int) = {
    require(numHashes >= 1, "numHashes must be >= 1")
    require(threshold > 0.0 && threshold < 1.0, "threshold must be in (0,1)")
    val plans = (1 to numHashes).filter(numHashes % _ == 0).map { b =>
      val r = numHashes / b
      (b, r, math.pow(1.0 / b, 1.0 / r))
    }
    val (b, r, _) = plans.minBy { case (_, _, s) =>
      math.abs(math.log(s) - math.log(threshold))
    }
    (b, r)
  }

  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      n: Int, threshold: Double,
                      numHashes: Int = 32, bandRows: Int = 2): DataFrame = {
    val gs = gramSets(df, idCol, textCol, n)
    val buckets = minhashBandIndex(df, idCol, textCol, n, numHashes, bandRows)
    val cands = buckets.as("a")
      .join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .distinct()
    val g1 = gs.select(col("doc_id").as("id1"), col("grams").as("g1"))
    val g2 = gs.select(col("doc_id").as("id2"), col("grams").as("g2"))
    cands.join(g1, "id1").join(g2, "id2")
      .select(col("id1"), col("id2"),
        (size(array_intersect(col("g1"), col("g2"))).cast("double") /
          size(array_union(col("g1"), col("g2")))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /**
   * The persistable MinHash-LSH band index of a corpus: one row per
   * (doc_id, band, bkey), where `bkey` hashes the band's signature slice.
   * Build it ONCE over the existing corpus, write it out (bucket the
   * table by `bkey` so later probes co-locate), and every future batch
   * dedups against the corpus by joining this index — never by
   * re-pairing the corpus with itself. Same signature family as
   * [[minhashLshPairs]] (native codegen'd [[graft.functions
   * .MinHashSignature]] — a narrow map over the scan), so an index built
   * here and pairs computed there agree bucket-for-bucket.
   */
  def minhashBandIndex(df: DataFrame, idCol: String, textCol: String,
                       n: Int, numHashes: Int = 32, bandRows: Int = 2): DataFrame = {
    require(numHashes % bandRows == 0, "numHashes must be divisible by bandRows")
    val sigs = df.filter(hasTokens(textCol, n))
      .select(col(idCol).as("doc_id"),
        graft.functions.TextFunctions.minhashSignature(col(textCol), n, numHashes)
          .as("__sig"))
    val numBands = numHashes / bandRows
    val bandStructs = (0 until numBands).map { b =>
      val cols = (b * bandRows until (b + 1) * bandRows)
        .map(i => element_at(col("__sig"), i + 1))
      struct(lit(b).as("band"), hash(cols :+ lit(b): _*).as("bkey"))
    }
    sigs.select(col("doc_id"), explode(array(bandStructs: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bkey").as("bkey"))
  }

  /**
   * Incremental near-duplicate detection: probe a NEW batch of documents
   * against an EXISTING corpus via its prebuilt [[minhashBandIndex]],
   * verifying candidates by exact n-gram Jaccard — the operational shape
   * of corpus dedup at scale. A 100 TB corpus is deduplicated once; every
   * incoming crawl increment then costs O(batch) signature work + a join
   * against the (corpus × bands)-row index + exact verification of the
   * few candidate pairs, instead of re-running corpus-wide pairing.
   * Output: `(new_id, corpus_id, jaccard)` for every cross pair at or
   * above `threshold` — anti-join new docs against `new_id`s to keep
   * only novel documents.
   *
   * Recall is the LSH S-curve (see [[minhashLshPairs]]): with the default
   * 16 bands × 2 rows, a true copy (J ≈ 1) is caught with certainty for
   * practical purposes; J = 0.5 pairs with p ≈ 0.98.
   *
   * Scale shape: new-batch signatures are a narrow codegen'd map; the
   * candidate join shuffles by (band, bkey) — against a bucketed index
   * table the corpus side doesn't shuffle at all; the verify join
   * re-shingles only candidate corpus documents (the id-keyed join prunes
   * the corpus scan to candidate ids; AQE broadcasts the candidate side
   * when small, which a crawl increment's candidate set is).
   *
   * `n`, `numHashes`, `bandRows` MUST match the values the index was
   * built with; `corpus` must expose the same `idCol`/`textCol` columns
   * the index's doc_ids refer to.
   */
  def lshPairsAgainstIndex(newDocs: DataFrame, idCol: String, textCol: String,
                           corpus: DataFrame, index: DataFrame,
                           n: Int, threshold: Double,
                           numHashes: Int = 32, bandRows: Int = 2): DataFrame =
    lshPairsAgainstStored(newDocs, idCol, textCol,
      gramSets(corpus, idCol, textCol, n), index, n, threshold,
      numHashes, bandRows)

  /**
   * As [[lshPairsAgainstIndex]], but the corpus side arrives entirely as
   * PERSISTED artifacts — the band index and the [[gramSetsFor]] shingle
   * sets — so the nightly probe never touches corpus text at all: the
   * only full-text scan is the (small) new batch. This is the fully
   * incremental production shape at 100 TB — history participates as two
   * compact parquet tables (4·numHashes/bandRows bytes of bucket rows
   * and one shingle array per doc), both written once when each doc
   * first arrived.
   */
  def lshPairsAgainstStored(newDocs: DataFrame, idCol: String, textCol: String,
                            corpusGrams: DataFrame, index: DataFrame,
                            n: Int, threshold: Double,
                            numHashes: Int = 32, bandRows: Int = 2): DataFrame = {
    val newBuckets = minhashBandIndex(newDocs, idCol, textCol, n, numHashes, bandRows)
    val cands = newBuckets.as("a")
      .join(index.select(col("doc_id").as("corpus_id"),
        col("band"), col("bkey")).as("b"), Seq("band", "bkey"))
      .select(col("a.doc_id").as("new_id"), col("corpus_id"))
      .distinct()
    val ng = gramSets(newDocs, idCol, textCol, n)
      .select(col("doc_id").as("new_id"), col("grams").as("g1"))
    val cg = corpusGrams
      .select(col("doc_id").as("corpus_id"), col("grams").as("g2"))
    cands.join(ng, "new_id").join(cg, "corpus_id")
      .select(col("new_id"), col("corpus_id"),
        (size(array_intersect(col("g1"), col("g2"))).cast("double") /
          size(array_union(col("g1"), col("g2")))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /**
   * Connected components over a near-duplicate pair graph, by iterative
   * min-label propagation with pointer jumping: each round takes the min
   * over {self} ∪ neighbors' labels (one hop) and then resolves every
   * label through the label table once more (label-of-label), so chains
   * compress geometrically — a path of diameter d converges in O(log d)
   * rounds, putting diameter ~2^maxIters in reach. Near-dup components
   * are little cliques (copies of one document), so 1-2 rounds is
   * typical. If the graph somehow fails to converge inside `maxIters`,
   * the loop THROWS rather than return labels where a fragment's
   * cluster_id points at a node that itself moved on (a survivors-only
   * pipeline would silently drop those documents).
   *
   * Scale shape: only ids that appear in a pair enter the loop (the label
   * table is O(duplicated docs), far smaller than the corpus), `edges` is
   * materialized once via `localCheckpoint` so the upstream pair pipeline
   * (shingle explode + join) never re-executes per round, and each round
   * checkpoints to keep the plan from growing with iterations. At 100 TB
   * swap `localCheckpoint` for a reliable `checkpoint` dir; the joins are
   * plain hash-shuffles by id either way.
   *
   * Adaptive execution: at or below `driverEdgeThreshold` symmetrized
   * edges (a duplicate-pair graph is tiny relative to its corpus — 100k
   * edges ≈ a few MB), the component labels are computed with a driver
   * union-find in one collect instead of paying per-round job overhead;
   * above it, the distributed propagation loop runs. Both produce the
   * identical (id, min-reachable-id) labeling.
   *
   * Returns (id, label) with label = min id reachable through pairs.
   */
  def connectedComponents(pairs: DataFrame, maxIters: Int = 20,
                          driverEdgeThreshold: Long = 100000L): DataFrame = {
    // Symmetrize via ONE explode, not `pairs union pairs.swapped`: the
    // union's two branches are separate instances of the (often expensive
    // — inverted-index join) pair subtree and would execute it twice in
    // the same job. One pass emits both orientations per pair.
    val edges = pairs
      .select(explode(array(
        struct(col("id1").cast("long").as("src"), col("id2").cast("long").as("dst")),
        struct(col("id2").cast("long").as("src"), col("id1").cast("long").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .distinct()
      .localCheckpoint(true)
    if (edges.count() <= driverEdgeThreshold) return driverComponents(edges)
    var labels = edges.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("label"))
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIters) {
      val neighborMin = edges.join(labels, edges("dst") === labels("id"))
        .groupBy(col("src")).agg(min(col("label")).as("nl"))
      val stepped = labels.as("l")
        .join(neighborMin, col("l.id") === col("src"), "left")
        .select(col("l.id").as("id"), col("l.label").as("old"),
          least(col("l.label"), coalesce(col("nl"), col("l.label"))).as("label"))
      // pointer jumping: a label is itself a node id — resolve it through
      // the round's starting labels so long chains halve every round
      val lookup = labels.select(col("id").as("jid"), col("label").as("jlabel"))
      val next = stepped
        .join(lookup, stepped("label") === col("jid"), "left")
        .select(col("id"), col("old"),
          least(col("label"), coalesce(col("jlabel"), col("label"))).as("label"))
        .localCheckpoint(true)
      changed = next.filter(col("label") < col("old")).count()
      labels = next.select("id", "label")
      i += 1
    }
    if (changed > 0) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIters rounds " +
        s"($changed labels still moving) — raise maxIters; returning would " +
        "orphan cluster fragments whose cluster_id has no surviving row")
    labels
  }

  /** Driver union-find over a collected edge list: union-by-min keeps the
    * component's minimum id as every root, path compression keeps finds
    * near O(α) — the same (id, min-reachable-id) labeling as the
    * distributed loop, in one job. */
  private def driverComponents(edges: DataFrame): DataFrame = {
    val parent = scala.collection.mutable.LongMap.empty[Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    val es = edges.collect()
    es.foreach { row =>
      val (a, b) = (find(row.getLong(0)), find(row.getLong(1)))
      if (a != b) { if (a < b) parent(b) = a else parent(a) = b }
    }
    val nodes = es.flatMap(r => Seq(r.getLong(0), r.getLong(1))).distinct
    val spark = edges.sparkSession
    import spark.implicits._
    nodes.map(id => (id, find(id))).toSeq.toDF("id", "label")
  }

  /**
   * Cluster assignment + canonical-survivor selection — the step that turns
   * pairwise near-dup output into a deduplicated corpus. Every document
   * gets `cluster_id` = min doc id reachable through `pairs`
   * ([[connectedComponents]]); documents in no pair are their own
   * singleton cluster. `is_survivor` marks the one kept copy per cluster
   * (the min id). One broadcast-or-shuffle left join against the (small)
   * component table; the corpus is scanned exactly once.
   */
  def dupClusters(docs: DataFrame, idCol: String, pairs: DataFrame,
                  maxIters: Int = 20): DataFrame = {
    val comp = connectedComponents(pairs, maxIters)
    docs.select(col(idCol).cast("long").as("doc_id"))
      .join(comp, col("doc_id") === comp("id"), "left")
      .select(col("doc_id"),
        coalesce(col("label"), col("doc_id")).as("cluster_id"),
        (coalesce(col("label"), col("doc_id")) === col("doc_id")).as("is_survivor"))
  }

  /** [[dupClusters]] with a retention POLICY: the kept copy per cluster is
    * the member maximizing `scoreCol` (ties → min id), not the min id —
    * "keep the best-quality duplicate", what a curation pipeline actually
    * wants. One extra aggregation shuffles only (cluster_id, score, id)
    * triples — O(corpus) rows of three columns, state O(1) per cluster —
    * then the winner table (one row per non-singleton cluster) joins
    * back. Scale shape identical to [[dupClusters]] plus that one narrow
    * agg. */
  def dupClustersBest(docs: DataFrame, idCol: String, scoreCol: String,
                      pairs: DataFrame, maxIters: Int = 20): DataFrame = {
    val comp = connectedComponents(pairs, maxIters)
    val clustered = docs
      .select(col(idCol).cast("long").as("doc_id"), col(scoreCol).as("__score"))
      .join(comp, col("doc_id") === comp("id"), "left")
      .select(col("doc_id"), col("__score"),
        coalesce(col("label"), col("doc_id")).as("cluster_id"))
    // argmax by (score asc, id desc) struct max ⇒ max score, ties → min id
    val winners = clustered.groupBy("cluster_id")
      .agg(max(struct(col("__score"), (-col("doc_id")).as("negid"))).as("w"))
      .select(col("cluster_id"), (-col("w.negid")).as("keep_id"))
    clustered.join(winners, "cluster_id")
      .select(col("doc_id"), col("cluster_id"),
        (col("doc_id") === col("keep_id")).as("is_survivor"))
  }

  /** 64-bit SimHash per document: per-bit majority vote over xxhash64 of
    * each distinct shingle, tie (sum = 0) voting 1. Native
    * [[graft.functions.SimHash64]] — one codegen'd JVM call per row, a
    * narrow map over the scan with NO explode and NO shuffle (the
    * aggregate form below shuffles every gram). Docs with fewer than `n`
    * tokens carry no signature (null → dropped), matching the aggregate
    * form's pre-explode filter. */
  def simhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        n: Int): DataFrame = {
    df.filter(hasTokens(textCol, n))
      .select(col(idCol).as("doc_id"),
        graft.functions.TextFunctions.simhash64(col(textCol), n).as("simhash"))
  }

  /** The explode + groupBy(doc) + 64-conditional-sum form of
    * [[simhashSignatures]] — bit-identical output, kept as the
    * differential-parity reference for the native expression. */
  private[graft] def simhashSignaturesAgg(df: DataFrame, idCol: String,
                                          textCol: String, n: Int): DataFrame = {
    val gs = gramSets(df, idCol, textCol, n)
    val ex = gs.select(col("doc_id"), explode(col("grams")).as("g"))
      .select(col("doc_id"), xxhash64(col("g")).as("h"))
    val bitSums = (0 until 64).map { b =>
      sum(when(shiftrightunsigned(col("h"), b).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"b$b")
    }
    val sums = ex.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until 64).map { b =>
      when(col(s"b$b") >= 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
    sums.select(col("doc_id"), sig.as("simhash"))
  }

  /**
   * SimHash near-duplicate pairs: split the 64-bit signature into
   * `bands` equal bit-bands; pairs sharing any band are candidates
   * (pigeonhole: hamming < bands ⟹ some band equal); verify
   * popcount(xor) ≤ maxHamming. Candidates bucket by 16-bit band value.
   *
   * Scale regime: expected in-bucket pairs grow ~N²/2^width per band —
   * fine to ~1M docs at width 16; beyond that arm `maxBucket`, the
   * bucket-size skew guard: buckets holding more than that many docs are
   * dropped before the self-join (a degenerate bucket means the band value
   * is uninformative — near-identical boilerplate corpus slices — and
   * would otherwise form a quadratic join cell). Dropping a bucket can
   * only lose candidate pairs whose OTHER three bands all differ, i.e.
   * pairs near the hamming cutoff inside pathological buckets.
   */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   n: Int, maxHamming: Int, bands: Int = 4,
                   maxBucket: Option[Int] = None): DataFrame = {
    // Unfiltered projection, NOT simhashSignatures: no pre-filter is
    // needed at all here — a null signature (< n tokens) yields null
    // band keys, which the join's inferred isnotnull(bkey) drops before
    // the shuffle anyway, so adding even the cheap token-count filter
    // would be pure re-tokenization overhead.
    val sig = df.select(col(idCol).as("doc_id"),
      graft.functions.TextFunctions.simhash64(col(textCol), n).as("simhash"))
    // requireFullRecall=false: maxHamming ≥ bands is a documented
    // best-effort regime here — candidates are still only pairs sharing a
    // band, the loose threshold just widens verification (callers use it
    // to tolerate signature noise on long near-dup docs).
    hammingBandPairs(sig, "doc_id", "simhash", maxHamming, bands, maxBucket,
      requireFullRecall = false)
  }

  /**
   * Generic banded Hamming-distance pairs over ANY 64-bit signature
   * column (SimHash text signatures, perceptual image hashes, …): the
   * signature splits into `bands` equal bit-bands, rows sharing a band
   * value are candidates (pigeonhole: hamming < bands ⟹ some band
   * equal), candidates verify popcount(xor) ≤ `maxHamming`. Same scale
   * regime and `maxBucket` skew guard as [[simhashPairs]] (which
   * delegates here). Output: `id1 < id2`, `hamming`.
   */
  def hammingBandPairs(sigDf: DataFrame, idCol: String, sigCol: String,
                       maxHamming: Int, bands: Int = 4,
                       maxBucket: Option[Int] = None,
                       requireFullRecall: Boolean = true): DataFrame = {
    require(64 % bands == 0, "bands must divide 64")
    require(!requireFullRecall || maxHamming < bands,
      s"maxHamming=$maxHamming >= bands=$bands breaks the pigeonhole recall " +
        "guarantee (hamming < bands => some band equal): pairs with their " +
        "differing bits spread one per band would be silently lost. " +
        "Raise bands, lower maxHamming, or pass requireFullRecall = false " +
        "to accept best-effort recall explicitly.")
    val width = 64 / bands
    val mask = if (width == 64) -1L else (1L << width) - 1
    val sig = sigDf.select(col(idCol).as("doc_id"), col(sigCol).as("simhash"))
    val bandStructs = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        shiftrightunsigned(col("simhash"), b * width).bitwiseAND(lit(mask)).as("bkey"))
    }
    val allBuckets = sig
      .select(col("doc_id"), col("simhash"), explode(array(bandStructs: _*)).as("bb"))
      .select(col("doc_id"), col("simhash"), col("bb.band").as("band"), col("bb.bkey").as("bkey"))
    val buckets = maxBucket match {
      case Some(m) =>
        val hot = allBuckets.groupBy("band", "bkey").agg(count(lit(1)).as("sz"))
          .filter(col("sz") > m).select("band", "bkey")
        allBuckets.join(broadcast(hot), Seq("band", "bkey"), "left_anti")
      case None => allBuckets
    }
    // Hamming is pair-determined, so filtering BEFORE the distinct is
    // equivalent and shrinks the dedup shuffle to only surviving pairs
    // (a multi-band pair would otherwise be carried `bands` times).
    buckets.as("a")
      .join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("id1", "id2")
  }

  /**
   * STREAMING near-duplicate suppression: keep a doc only if NONE of its
   * SimHash bands was seen before — the streaming analog of
   * [[simhashPairs]]'s banded blocking, with the candidate-verify step
   * traded for recall (any shared band ⟹ suppressed). One narrow
   * [[graft.functions.SimHash64]] per row, explode to `bands` band keys,
   * state = one row per distinct (band, key) — bounded by the corpus's
   * distinct band values, evicted by watermark when an event-time column
   * is given.
   *
   * Semantics notes: (1) suppression is by FIRST band collision, stricter
   * than the batch pipeline's hamming-verified pairs (pigeonhole gives
   * the same candidate set; here candidates are dropped, not verified —
   * streaming can't revisit). (2) EVERY doc's novel bands enter state,
   * including a doc that is itself suppressed — so suppression is
   * transitive across near-dup chains, like the batch pipeline's
   * connected components. (3) The BATCH form (no eventTimeCol on a
   * static frame) assigns each band to its MIN-id holder — deterministic
   * under any partitioning, and the min-id doc of every near-dup
   * component always survives. The STREAMING form's within-batch band
   * ownership is arrival-arbitrary: copies landing in the SAME
   * micro-batch can split ownership and ALL be suppressed — collapse
   * identical copies upstream with [[exactDedupStream]] and read the
   * contract as at-most-one-survivor for same-batch near-dup arrivals
   * (cross-batch arrivals, the steady-state case, behave exactly).
   * False-positive rate is the banded-LSH collision probability at
   * 64/bands-bit bands: ~n/2^(64/bands) per band per doc.
   */
  def simhashDedupStream(stream: DataFrame, idCol: String, textCol: String,
                         n: Int, bands: Int = 4,
                         eventTimeCol: Option[String] = None,
                         delay: String = "10 minutes"): DataFrame = {
    require(64 % bands == 0, "bands must divide 64")
    val width = 64 / bands
    val mask = if (width == 64) -1L else (1L << width) - 1
    // docs too short for a signature are omitted — they carry no
    // near-dup signal; union them back downstream if they should survive.
    // Token-count pre-filter, not isNotNull on the signature column: the
    // pushed-down predicate re-runs simhash64 per row.
    val sig = stream.filter(hasTokens(textCol, n))
      .withColumn("__sig",
        graft.functions.TextFunctions.simhash64(col(textCol), n))
    val withBands = sig
      .withColumn("__band", explode(array((0 until bands).map { b =>
        concat(lit(s"$b:"),
          shiftrightunsigned(col("__sig"), b * width).bitwiseAND(lit(mask)))
      }: _*)))
    // a surviving doc kept ALL its bands (each was first into state);
    // count them back to one row per doc. Streaming chains two stateful
    // operators (dedup → agg), which append mode only allows with a
    // watermark and an event-time-windowed aggregation — a doc's bands
    // share its timestamp, so they land in one window together.
    eventTimeCol match {
      case Some(t) =>
        withBands.withWatermark(t, delay)
          .dropDuplicatesWithinWatermark("__band")
          .groupBy(window(col(t), delay), col(idCol))
          .agg(count(lit(1)).as("__kept_bands"))
          .filter(col("__kept_bands") === bands)
          .select(col(idCol), lit(true).as("is_first"))
      case None =>
        // deterministic batch ownership: min id per band (an arbitrary
        // dropDuplicates winner can SPLIT a same-batch duplicate pair's
        // bands between the copies and suppress the whole cluster)
        withBands.groupBy(col("__band"))
          .agg(min(col(idCol)).as("__owner"))
          .groupBy(col("__owner").as(idCol))
          .agg(count(lit(1)).as("__kept_bands"))
          .filter(col("__kept_bands") === bands)
          .select(col(idCol), lit(true).as("is_first"))
    }
  }

  /**
   * Exact repeated-span detection (Lee et al., "Deduplicating Training
   * Data Makes Language Models Better"): every position whose L-token
   * gram occurs ≥ `minCount` times in the corpus (any doc, including its
   * own) is "covered"; maximal runs of covered positions merge into
   * duplicated spans. Output per doc: `(doc_id, n_spans, n_dup_tokens,
   * max_span)` — span token counts are interval-union lengths, so
   * overlapping grams never double-count. Docs with no duplicated span
   * report zeros.
   *
   * Scale shape: positional grams explode narrow off the scan; occurrence
   * counting is `count(*) over (partition by gram-hash)` riding ONE
   * shuffle (WindowExec spills, a million-fold boilerplate gram never
   * buffers in memory); island merging is a lag/running-sum window per
   * doc (second shuffle, integers only); span aggregation re-shuffles the
   * covered positions (by then only the duplicated fraction of the
   * corpus). No joins except the final doc-aligned left join.
   *
   * Tradeoff (mirrors [[segmentDedup]]): occurrences are counted over
   * `xxhash64(gram)`, not the gram string — the shuffle carries 8 bytes
   * per position instead of an L-word string. A 64-bit collision would
   * mark a position spuriously covered (a false duplicated span);
   * p ≈ distinct-grams² / 2⁶⁴ corpus-wide, negligible even at 100 TB.
   * Partition the window by the gram string if exactness is required.
   */
  def duplicateSpans(df: DataFrame, idCol: String, textCol: String,
                     L: Int, minCount: Int = 2): DataFrame = {
    require(L >= 1, "L must be >= 1")
    require(minCount >= 2, "minCount must be >= 2")
    val toks = split(col(textCol), " ")
    val base = df.select(col(idCol).as("doc_id"))
    // guard the sequence: Spark's sequence(0, -1) counts DOWN
    val g = df.filter(size(toks) >= L)
      .select(col(idCol).as("doc_id"),
        posexplode(transform(sequence(lit(0), size(toks) - L),
          i => xxhash64(array_join(slice(toks, i + 1, lit(L)), " "))))
          .as(Seq("pos", "h")))
    val byH = org.apache.spark.sql.expressions.Window.partitionBy("h")
    val covered = g.withColumn("__cnt", count(lit(1)).over(byH))
      .filter(col("__cnt") >= minCount)
      .select("doc_id", "pos")
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    val islands = covered
      .withColumn("__brk",
        when(lag(col("pos"), 1).over(byDoc).isNull ||
          col("pos") > lag(col("pos"), 1).over(byDoc) + (L - 1), 1).otherwise(0))
      .withColumn("__island", sum(col("__brk")).over(byDoc))
    val spans = islands.groupBy("doc_id", "__island")
      .agg(min(col("pos")).as("s"), max(col("pos")).as("e"))
    val agg = spans.groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"),
        sum(col("e") - col("s") + L).as("n_dup_tokens"),
        max(col("e") - col("s") + L).cast("long").as("max_span"))
    base.join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_dup_tokens"), lit(0L)).as("n_dup_tokens"),
        coalesce(col("max_span"), lit(0L)).as("max_span"))
  }

  /**
   * Corpus-level segment (pseudo-line) boilerplate removal — the
   * CCNet/RefinedWeb line-dedup step: split every doc into consecutive
   * `segWords`-word segments; a segment whose document frequency exceeds
   * `maxDocFreq` is boilerplate (headers, navigation, license blurbs) and
   * is removed from EVERY doc, including the first. Output per doc:
   * `(doc_id, n_segs, n_kept, text_clean)` — surviving segments rejoined
   * in original order; docs whose every segment was boilerplate survive
   * with an empty `text_clean` (dropping rows would silently shrink the
   * corpus under a join).
   *
   * Scale shape: segments explode narrow off the scan; document frequency
   * is ONE groupBy on the 64-bit segment hash (postings carry 8-byte
   * keys, partial count before the shuffle, a boilerplate segment in 10M
   * docs is one counter, never a buffered bucket); the hot-segment set —
   * small by construction, it's the > maxDocFreq tail — broadcasts back
   * as a left-anti filter; reassembly is ONE groupBy(doc_id). A hash
   * collision could only drop an innocent segment that collides with a
   * boilerplate one (p ≈ n_hot × n_segs / 2⁶⁴).
   */
  def segmentDedup(df: DataFrame, idCol: String, textCol: String,
                   segWords: Int, maxDocFreq: Int): DataFrame = {
    require(segWords >= 1, "segWords must be >= 1")
    require(maxDocFreq >= 1, "maxDocFreq must be >= 1")
    val toks = split(col(textCol), " ")
    val nSegs = ceil(size(toks).cast("double") / segWords).cast("int")
    // null text: size(split) = -1, so nSegs is ceil(-1/segWords) — null-
    // guarded AND clamped (at segWords = 1 the ceil is -1, not 0)
    val base = df.select(col(idCol).as("doc_id"),
      greatest(coalesce(nSegs, lit(0)), lit(0)).as("n_segs"))
    // null text → size() = -1 → sequence(0, -1) counts DOWN in Spark and
    // would emit phantom null segments; such docs have no segments at all
    val segs = df.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        posexplode(transform(sequence(lit(0), nSegs - 1),
          i => array_join(slice(toks, i * segWords + 1, lit(segWords)), " ")))
          .as(Seq("seg_idx", "seg")))
      .select(col("doc_id"), col("seg_idx"), xxhash64(col("seg")).as("h"), col("seg"))
    // document frequency per segment: distinct (h, doc) first so a
    // segment repeated WITHIN one doc counts once
    val hot = segs.dropDuplicates("h", "doc_id")
      .groupBy("h").agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDocFreq)
      .select("h")
    val kept = segs.join(broadcast(hot), Seq("h"), "left_anti")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          sort_array(collect_list(struct(col("seg_idx"), col("seg")))),
          s => s.getField("seg")), " ").as("text_clean"))
    // left join so fully-boilerplate (and empty/null-text) docs survive
    base.join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_segs"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("text_clean"), lit("")).as("text_clean"))
  }

  /**
   * EXACT edit-distance (Levenshtein) near-duplicate pairs over a fixed
   * prefix of each document, via PassJoin-style segment blocking (Li,
   * Deng, Feng — "PASS-JOIN: a partition-based method for similarity
   * joins", PVLDB 2012): partition each prefix into `maxDist + 1`
   * contiguous segments; if ed(a, b) ≤ maxDist then at least one of a's
   * segments is untouched by the edit script and therefore occurs
   * verbatim in b, shifted by at most `maxDist` positions. So candidates
   * are the pairs sharing (segment index, segment text) against a window
   * index of ±maxDist shifted substrings — ONE equi-join shuffle keyed on
   * short byte strings, never an all-pairs cross join — and each
   * candidate is then verified with the real `levenshtein` (built-in,
   * codegen'd). The blocking is lossless, so the output is bit-identical
   * to the O(N²) brute force.
   *
   * Keys per document: `maxDist+1` segments + ≤ `(maxDist+1)(2·maxDist+1)`
   * windows — constants. At 100 TB the shuffle is O(N · maxDist²) narrow
   * rows and the verify cost is bounded by true-ish candidates only.
   *
   * Skew note: documents SHORTER than `prefixLen` leave their tail
   * segments empty, and empty segments match every other empty window —
   * short docs therefore pool into one candidate bucket (still exactly
   * verified, but quadratic in their count). The pool is ENFORCED
   * bounded: an aggregate riding the plan counts short docs and the job
   * FAILS via `assert_true` past `maxShortDocs` (same guard pattern as
   * `semanticDedup`'s cell-size precondition) — pre-filter very short
   * texts or shrink `prefixLen` on short-doc corpora. Dropping the empty
   * matches instead would silently lose pairs whose every non-empty
   * segment was edited.
   */
  def editDistancePairs(df: DataFrame, idCol: String, textCol: String,
                        prefixLen: Int = 24, maxDist: Int = 2,
                        maxShortDocs: Long = 100000L): DataFrame = {
    require(maxDist >= 1, "maxDist must be >= 1")
    require(prefixLen % (maxDist + 1) == 0,
      s"prefixLen=$prefixLen must divide into maxDist+1=${maxDist + 1} equal segments")
    require(maxShortDocs >= 0, "maxShortDocs must be >= 0")
    val segLen = prefixLen / (maxDist + 1)
    val docs = df.select(col(idCol).as("doc_id"),
      substring(col(textCol), 1, prefixLen).as("p"))
    // short-doc pool guard: one aggregate over the (already narrow)
    // prefix projection, cross-joined back as a 1-row broadcast global —
    // the quadratic-pool precondition fails loudly instead of silently
    // spilling a giant bucket
    val shortGuard = docs
      .agg(coalesce(sum(when(length(col("p")) < prefixLen, 1L)), lit(0L)).as("__short"))
      .select(assert_true(col("__short") <= maxShortDocs,
        concat(lit("editDistancePairs: "), col("__short"),
          lit(s" docs shorter than prefixLen=$prefixLen exceeds " +
            s"maxShortDocs=$maxShortDocs — empty tail segments pool every " +
            "short doc into one quadratic candidate bucket; pre-filter " +
            "short texts or shrink prefixLen"))).as("__g"))
    // join keys ride as xxhash64(segment-index, text): 8 bytes through
    // the shuffle instead of a string. A hash collision can only ADD a
    // spurious candidate — the levenshtein verify rejects it — never
    // drop a true pair (equal strings always hash equal), so exactness
    // is preserved.
    // a-side: the maxDist+1 disjoint segments of the prefix
    val segs = docs.select(col("doc_id"), col("p"), explode(array(
      (0 to maxDist).map(i =>
        xxhash64(lit(i), substring(col("p"), i * segLen + 1, segLen))): _*)).as("seg"))
    // b-side: every segment-length window within ±maxDist of each
    // segment's home position (clipped at the string start)
    val wins = docs.select(col("doc_id"), col("p"), explode(array(
      (for {
        i <- 0 to maxDist
        d <- -maxDist to maxDist
        pos = i * segLen + 1 + d if pos >= 1
      } yield xxhash64(lit(i), substring(col("p"), pos, segLen))): _*)).as("w"))
    // ed ≤ k holds in both orientations, so the a.id < b.id half-space
    // still sees every qualifying pair (each side partitions ITS string).
    val cand = segs.as("a").join(wins.as("b"),
        col("a.seg") === col("b.w") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_id1"), col("b.doc_id").as("doc_id2"),
        col("a.p").as("p1"), col("b.p").as("p2"))
      .distinct()
    // the guard must survive column pruning: referencing __g in a FILTER
    // (not a dropped projection) keeps the assert in the executed plan —
    // same pattern as semanticDedup's cell-size filter
    cand.crossJoin(shortGuard)
      .filter(col("__g").isNull)
      .select(col("doc_id1"), col("doc_id2"),
        levenshtein(col("p1"), col("p2")).as("dist"))
      .filter(col("dist") <= maxDist)
  }

  /**
   * LOSSLESS set-similarity self-join via prefix filtering (the
   * All-Pairs/PPJoin candidate rule): order every document's shingles
   * by a single global order (ascending document frequency, rarest
   * first), keep only each document's first `|x| - ⌈t·|x|⌉ + 1` tokens
   * as postings, and pair documents sharing a PREFIX token.
   *
   * Why that is complete: J(x,y) ≥ t implies `|x∩y| ≥ ⌈t·|x|⌉` (the
   * union is at least `|x|`). Let m be the intersection token smallest
   * in the global order. If m sat outside x's prefix, every
   * intersection token would sit in x's order-suffix of length
   * `⌈t·|x|⌉ − 1` — too short. So m is in BOTH prefixes and the pair
   * survives candidate generation; the exact Jaccard verify then keeps
   * only true matches. Unlike the `maxDocFreq` guard (which drops hot
   * shingles and perturbs measured Jaccard unless the cutoff clears the
   * corpus) or MinHash-LSH (probabilistic recall), prefix filtering is
   * exact BY CONSTRUCTION at any skew: the prefix keeps each document's
   * RAREST tokens, so posting buckets are naturally the smallest ones —
   * frequency ordering is itself the skew mitigation.
   *
   * The prefix length uses the rational threshold `tNum/tDen` with
   * integer ceil — a float `ceil(0.3·10)` evaluating to 4 instead of 3
   * would silently shorten a prefix and lose pairs. The final cut is
   * the same cross-multiplied integer compare. Output (id1, id2,
   * jaccard) matches [[ngramJaccardPairs]] bit-for-bit.
   */
  def prefixFilterJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                               n: Int, tNum: Long, tDen: Long): DataFrame = {
    require(tNum > 0 && tDen > 0 && tNum <= tDen, "threshold must be in (0, 1]")
    // hash every shingle ONCE per document (8-byte tokens from here on):
    // the postings shuffle longs and — unlike the string formulation —
    // the exact-verify intersection below compares longs too, which
    // halves its cost. Same collision argument as pairCounts.
    // no size > 0 filter (the explode below emits nothing for empties; a
    // pushed-down size predicate re-runs the shingling per row)
    val gs = gramSets(df, idCol, textCol, n)
      .select(col("doc_id"),
        transform(col("grams"), g => xxhash64(g)).as("grams"))
    val posts = gs.select(col("doc_id"), size(col("grams")).as("sz"),
        explode(col("grams")).as("g"))
    // doc frequency as a window over the posting exchange itself — the
    // groupBy+join formulation would shuffle the postings a second time
    // to bring the counts back; the window reads them off the same
    // hash-partitioning it counted on
    val byG = org.apache.spark.sql.expressions.Window.partitionBy("g")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("df"), col("g"))
    val prefix = posts.withColumn("df", count(lit(1)).over(byG))
      .withColumn("__r", row_number().over(w))
      // integer ceil: alpha = (tNum·sz + tDen − 1) div tDen
      .filter(col("__r") <=
        col("sz") - expr(s"($tNum * sz + $tDen - 1) div $tDen") + 1)
      .select(col("doc_id"), col("g"))
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .distinct()
    val sets = gs.select(col("doc_id"), col("grams"), size(col("grams")).as("sz"))
    cand
      .join(sets.select(col("doc_id").as("id1"), col("grams").as("g1"),
        col("sz").as("sz1")), "id1")
      .join(sets.select(col("doc_id").as("id2"), col("grams").as("g2"),
        col("sz").as("sz2")), "id2")
      .withColumn("ic", size(array_intersect(col("g1"), col("g2"))).cast("long"))
      .filter(col("ic") * tDen >= lit(tNum) * (col("sz1") + col("sz2") - col("ic")))
      .select(col("id1"), col("id2"),
        (col("ic").cast("double") / (col("sz1") + col("sz2") - col("ic")))
          .as("jaccard"))
  }
}
