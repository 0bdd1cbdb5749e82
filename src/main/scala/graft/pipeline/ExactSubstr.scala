package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Cross-document EXACT-substring dedup (the ExactSubstr class of Lee et
 * al. 2022, "Deduplicating Training Data Makes Language Models Better"),
 * in bucketed anchor + bidirectional-extension form: sample content-
 * defined anchor k-grams (Karp–Rabin "0 mod stride" on the md5-56 gram
 * hash), bucket-join anchors across documents, and extend each anchor
 * pair code-point-wise in both directions to the MAXIMAL shared run —
 * emitting (id1, id2, start1, start2, span_len) for every shared
 * substring ≥ `minLen` chars. The exact complement to the winnowing
 * fingerprint screen: winnowing tells you THAT two docs share ≥ w+k−1
 * chars; this tells you WHERE and exactly HOW MUCH, which is what a
 * span-level scrubber (cut the quoted region, keep the rest) needs.
 *
 * Guarantees. Every emitted span is a genuine maximal common substring
 * occurrence — the extension verifies characters, so hash collisions
 * can only fail to SEED a span, never fabricate one. A shared span of
 * length L ≥ minLen is found unless none of its L−k+1 anchor positions
 * samples (probability (1−1/stride)^(L−k+1) — ~2·10⁻⁸ at the default
 * stride=4, k=20, minLen=80); sampling is content-determined, so both
 * copies always agree and misses are corpus-independent.
 *
 * Scale shape (100 TB discipline): the anchor pass is one codegen'd
 * JVM call per row that explodes only the ~1/stride sampled positions
 * (selection before explosion, as the winnowing family); the bucket
 * join is guarded postings — anchors in more than `maxDocFreq`
 * documents are corpus boilerplate and are cut BEFORE the self-join,
 * and a document repeating one anchor gram more than `maxOccPerDoc`
 * times fails LOUDLY (within-doc repetition multiplies pair volume
 * quadratically; the remedy is a cap raise or upstream boilerplate
 * stripping, not a silent explosion). Pair volume is
 * Σ_g (df·occ)² over rare anchors only; extension is O(span) per
 * candidate; texts attach via two hash joins keyed on doc id.
 *
 * Reference scope analog: the reference engine's dedup surface is
 * record-level (`bullet-storm`'s TopK/CountDistinct sketches); span
 * dedup is part of this engine's LLM-curation extension, per SURVEY §2.
 */
object ExactSubstr {

  /** Anchor rows (doc_id, pos, g): every 1-based position whose k-gram
    * md5-56 hash ≡ 0 (mod stride), carrying the gram itself as the
    * bucket key — joins on the literal gram are collision-free and
    * replay in any SQL engine as `substr(text, pos, k)`. */
  def anchors(df: DataFrame, idCol: String, textCol: String,
              k: Int, stride: Int): DataFrame = {
    require(k >= 2, s"exactSubstr: k must be >= 2, got $k")
    require(stride >= 1, s"exactSubstr: stride must be >= 1, got $stride")
    df.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        explode(graft.functions.TextFunctions.modAnchorPositions(
          col(textCol), k, stride)).as("pos"),
        col(textCol).as("__t"))
      .select(col("doc_id"), col("pos"),
        col("__t").substr(col("pos").cast("int"), lit(k)).as("g"))
  }

  /** [[anchors]] plus the LOUD within-doc occurrence guard: a doc
    * repeating one anchor gram o times contributes o² candidate pairs
    * per partner, so at `maxOccPerDoc` the job fails with the remedy
    * instead of silently exploding. Expects (doc_id, __t) input. */
  private def guardedAnchors(docs: DataFrame, k: Int, stride: Int,
                             maxOccPerDoc: Int,
                             prePartition: Option[Column] = None): DataFrame = {
    val byDocG = Window.partitionBy("doc_id", "g")
    // optional caller-chosen clustering for the anchor frame: hash-
    // partitioning by a SUBSET of every downstream window/join key lets
    // the whole chain ride one exchange (see spansAgainstStored)
    val base = anchors(docs, "doc_id", "__t", k, stride)
    prePartition.fold(base)(c => base.repartition(c))
      .withColumn("__occ", count(lit(1)).over(byDocG))
      .filter(assert_true(col("__occ") <= maxOccPerDoc,
        concat(lit("exactSubstr: doc "), col("doc_id"),
          lit(" repeats one anchor gram "), col("__occ"),
          lit(s" times > maxOccPerDoc=$maxOccPerDoc — within-doc " +
            "repetition multiplies candidate pairs quadratically; raise " +
            "the cap or strip the repeated boilerplate upstream"))).isNull)
      .drop("__occ")
  }

  /**
   * All maximal shared substrings of length ≥ `minLen` between distinct
   * documents: (id1, id2, start1, start2, span_len), id1 < id2,
   * positions 1-based. Distinct — every anchor inside one shared run
   * extends to the same maximal span.
   */
  def sharedSpans(df: DataFrame, idCol: String, textCol: String,
                  k: Int, stride: Int, minLen: Int,
                  maxDocFreq: Int = 8, maxOccPerDoc: Int = 16): DataFrame = {
    require(minLen >= k,
      s"exactSubstr: minLen ($minLen) must be >= the anchor gram k ($k) — " +
        "shorter spans cannot contain an anchor")
    require(maxDocFreq >= 2,
      s"exactSubstr: maxDocFreq < 2 would drop every joinable anchor")
    require(maxOccPerDoc >= 1, "exactSubstr: maxOccPerDoc must be >= 1")
    val docs = df.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), col(textCol).as("__t"))
    // persisted: the df guard and BOTH posting sides consume this frame,
    // and the recompute is the whole anchor pass (per-char md5 sampling +
    // a window) — the double-execution class. Spillable; same caller
    // clearCache / CacheScope contract as Winnowing.matchPairs.
    val guarded = guardedAnchors(docs, k, stride, maxOccPerDoc)
      .transform(graft.plans.CacheScope.persistTracked)
    // silent boilerplate cut: anchors present in > maxDocFreq documents
    // are corpus-wide noise (same policy as the n-gram/winnowing postings)
    val rare = guarded.groupBy("g")
      .agg(countDistinct(col("doc_id")).as("__df"))
      .filter(col("__df") <= maxDocFreq)
      .select("g")
    val posting = guarded.join(rare, "g")
    val cand = posting.select(col("g"), col("doc_id").as("id1"), col("pos").as("p1"))
      .join(posting.select(col("g"), col("doc_id").as("id2"), col("pos").as("p2")), "g")
      .filter(col("id1") < col("id2"))
      .select("id1", "p1", "id2", "p2").distinct()
    val withText = cand
      .join(docs.select(col("doc_id").as("id1"), col("__t").as("__t1")), "id1")
      .join(docs.select(col("doc_id").as("id2"), col("__t").as("__t2")), "id2")
    withText
      .withColumn("__ext", graft.functions.TextFunctions.commonExtension(
        col("__t1"), col("p1"), col("__t2"), col("p2")))
      .select(col("id1"), col("id2"),
        (col("p1") - col("__ext")(0)).as("start1"),
        (col("p2") - col("__ext")(0)).as("start2"),
        (col("__ext")(0) + col("__ext")(1)).as("span_len"))
      .filter(col("span_len") >= minLen)
      .distinct()
  }

  /** Per-pair contamination rollup of [[sharedSpans]]: the longest
    * shared exact substring and the number of distinct shared runs —
    * the decision table a scrubber thresholds on. */
  def sharedSpanSummary(df: DataFrame, idCol: String, textCol: String,
                        k: Int, stride: Int, minLen: Int,
                        maxDocFreq: Int = 8, maxOccPerDoc: Int = 16): DataFrame =
    sharedSpans(df, idCol, textCol, k, stride, minLen, maxDocFreq, maxOccPerDoc)
      .groupBy("id1", "id2")
      .agg(max(col("span_len")).as("max_span"),
        count(lit(1)).as("n_spans"))

  /**
   * Build-once anchor index: the guarded rare anchor postings
   * (g, doc_id, pos) — df cut and the loud within-doc occurrence guard
   * baked in at build time. Write to parquet when the corpus is built;
   * per release, [[spansAgainstStored]] probes it with just the delta.
   * The expensive O(len) md5 anchor pass over corpus text runs ONCE, at
   * build time.
   */
  def anchorIndex(corpus: DataFrame, idCol: String, textCol: String,
                  k: Int, stride: Int,
                  maxDocFreq: Int = 8, maxOccPerDoc: Int = 16): DataFrame = {
    require(maxDocFreq >= 1, "maxDocFreq must be >= 1")
    require(maxOccPerDoc >= 1, "maxOccPerDoc must be >= 1")
    val docs = corpus.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), col(textCol).as("__t"))
    // persisted across the df guard + posting projection (the one-shot
    // index build); spillable, caller clearCache/CacheScope contract as elsewhere
    val guarded = guardedAnchors(docs, k, stride, maxOccPerDoc)
      .transform(graft.plans.CacheScope.persistTracked)
    val rare = guarded.groupBy("g")
      .agg(countDistinct(col("doc_id")).as("__df"))
      .filter(col("__df") <= maxDocFreq)
      .select("g")
    guarded.join(rare, "g").select("g", "doc_id", "pos")
  }

  /**
   * Incremental exact-substring probe against a STORED anchor index:
   * (new_id, corpus_id, start_new, start_corpus, span_len) for every
   * maximal shared run ≥ `minLen` between a delta document and an
   * indexed corpus document. The corpus's anchor pass is never re-run —
   * the plan reads the index plus the delta, and touches corpus TEXT
   * only through an id-keyed join for the matched candidates' extension
   * step (at scale that join drives row-group pruning on the text
   * table; the md5 sampling pass, the expensive part, is index-build
   * work). Strictly two-sided: delta docs never pair with each other —
   * run [[sharedSpans]] over the delta for that.
   */
  def spansAgainstStored(newDocs: DataFrame, idCol: String, textCol: String,
                         corpusText: DataFrame, storedAnchors: DataFrame,
                         k: Int, stride: Int, minLen: Int,
                         maxDocFreq: Int = 8, maxOccPerDoc: Int = 16): DataFrame = {
    require(minLen >= k, s"minLen ($minLen) must be >= the anchor gram k ($k)")
    require(maxDocFreq >= 2,
      s"spansAgainstStored: maxDocFreq < 2 would drop every delta anchor")
    val delta = newDocs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), col(textCol).as("__t"))
    // the delta side carries its OWN df cut (the index side's cut was
    // baked in at build time): a boilerplate anchor present across a
    // big delta would otherwise join the stored postings unguarded.
    // Distinct-doc counting rides two chained windows (first-row flag
    // per (g, doc) summed per g) instead of a groupBy + join-back, so
    // the expensive anchor pass stays SINGLE-consumer — the probe plan
    // keeps exactly one delta-side anchor evaluation (PlanSpec pins it).
    // Skew: a pathological gram concentrates its delta rows in one
    // spillable window partition — the same window-over-postings
    // discipline as the n-gram df guard, with the per-doc factor capped
    // by the loud maxOccPerDoc guard upstream; the one-shot anchorIndex
    // build uses the map-side-combinable groupBy shape instead.
    val byGDoc = Window.partitionBy("g", "doc_id").orderBy("pos")
    val byG = Window.partitionBy("g")
    // ONE gram-keyed exchange feeds the whole delta-side chain (r15,
    // guide §2.4): hash-clustering by g alone satisfies every window
    // here — guardedAnchors' (doc_id, g) occurrence guard and both df
    // windows only need rows of one (composite) key co-located, and
    // partitioning by the g subset co-locates them — and the posting
    // join is g-keyed too, so the delta side reaches it already
    // clustered. Left to EnsureRequirements, each window picked its own
    // full-key hash partitioning: 3 exchanges per probe (per BATCH in
    // the streaming twin) where one suffices. Skew bound: a hot gram
    // concentrates in one partition exactly as the byG window already
    // forced today; maxOccPerDoc + the df cut bound the volume.
    val cand = guardedAnchors(delta, k, stride, maxOccPerDoc,
        Some(col("g")))
      .withColumn("__first",
        when(row_number().over(byGDoc) === 1, 1L).otherwise(0L))
      .withColumn("__df", sum(col("__first")).over(byG))
      .filter(col("__df") <= maxDocFreq)
      .select(col("g"), col("doc_id").as("new_id"), col("pos").as("pn"))
      .join(storedAnchors
        .select(col("g"), col("doc_id").as("corpus_id"), col("pos").as("pc")), "g")
      // no dedup here: (new_id, pn, corpus_id, pc) tuples are unique by
      // construction — g is a function of (doc, pos) and both anchor
      // sets hold one row per (g, doc, pos) — so the old distinct() was
      // a pure extra exchange per probe; the FINAL distinct below still
      // collapses anchor pairs that extend to the same maximal span.
      .select("new_id", "pn", "corpus_id", "pc")
    val ct = corpusText.filter(col(textCol).isNotNull)
      .select(col(idCol).as("corpus_id"), col(textCol).as("__tc"))
    cand
      .join(delta.select(col("doc_id").as("new_id"), col("__t").as("__tn")), "new_id")
      .join(ct, "corpus_id")
      .withColumn("__ext", graft.functions.TextFunctions.commonExtension(
        col("__tn"), col("pn"), col("__tc"), col("pc")))
      .select(col("new_id"), col("corpus_id"),
        (col("pn") - col("__ext")(0)).as("start_new"),
        (col("pc") - col("__ext")(0)).as("start_corpus"),
        (col("__ext")(0) + col("__ext")(1)).as("span_len"))
      .filter(col("span_len") >= minLen)
      .distinct()
  }

  /**
   * Streaming decontamination: drive [[spansAgainstStored]] from a
   * micro-batch stream of arriving documents — the streaming twin the
   * other dedup families carry (simhash/winnowing suppression streams),
   * completing the per-release probe as a CONTINUOUS one. Each
   * micro-batch probes the stored anchor index independently (the probe
   * is stateless across batches — candidate pairs are delta×corpus, so
   * batch boundaries cannot lose a pair), and spans land under
   * `outPath/batch=<id>` via idempotent per-batch OVERWRITE: a batch
   * replayed after a crash rewrites its own directory instead of
   * appending duplicates, which is what makes restart parity exact
   * (StreamingRestartSpec pins it). Read results back with
   * `spark.read.parquet(outPath)` — the `batch` partition column
   * records arrival provenance.
   *
   * Note the delta-side `maxDocFreq` cut is PER BATCH (each batch is
   * its own probe): a boilerplate anchor spread across batches is
   * bounded per batch by construction, same volume envelope as running
   * the probe per release.
   */
  def decontaminationStream(stream: DataFrame, idCol: String, textCol: String,
                            corpusText: DataFrame, storedAnchors: DataFrame,
                            k: Int, stride: Int, minLen: Int,
                            outPath: String, checkpoint: String,
                            maxDocFreq: Int = 8, maxOccPerDoc: Int = 16)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(minLen >= k, s"minLen ($minLen) must be >= the anchor gram k ($k)")
    // hoist the stored-artifact load out of the per-batch plan (r15,
    // VERDICT r14 item 5): the anchor index is probed in full by every
    // micro-batch, so it materializes ONCE here (spillable, registered
    // with the caller's CacheScope on this thread) instead of
    // re-scanning its parquet per batch. Corpus TEXT stays lazy — each
    // batch touches it only through the candidate-keyed extension fetch.
    val anchors = graft.plans.CacheScope.persistTracked(
      storedAnchors.select(col("g"), col("doc_id"), col("pos")))
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                       batchId: Long) =>
        spansAgainstStored(batch.toDF(), idCol, textCol, corpusText,
          anchors, k, stride, minLen, maxDocFreq, maxOccPerDoc)
          .write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
        ()
      }
      .start()
  }

  /**
   * Per-document SCRUB report: for every doc appearing as the LATER
   * (id2 — keep-first-occurrence) side of a shared span, merge its
   * span intervals into maximal contaminated runs (classic gaps-and-
   * islands over [start, start+len): a row opens a new island when its
   * start clears the running max end; adjacent runs fuse) and emit
   * (doc_id, n_runs, contaminated_chars, doc_len) — the integers a
   * span-level scrubber needs to cut quoted regions and re-emit the
   * remainder, and the corpus-health numbers a mix card reports. All
   * window work is partitioned by doc (never a global sort); interval
   * counts per doc are span-guarded upstream.
   */
  def contaminationReport(df: DataFrame, idCol: String, textCol: String,
                          k: Int, stride: Int, minLen: Int,
                          maxDocFreq: Int = 8, maxOccPerDoc: Int = 16): DataFrame = {
    val runs = contaminatedRuns(df, idCol, textCol, k, stride, minLen,
      maxDocFreq, maxOccPerDoc)
    runs.groupBy("doc_id")
      .agg(count(lit(1)).as("n_runs"),
        sum(col("re") - col("rs")).as("contaminated_chars"))
      .join(df.filter(col(textCol).isNotNull)
        .select(col(idCol).as("doc_id"),
          length(col(textCol)).cast("long").as("doc_len")), "doc_id")
      .select("doc_id", "n_runs", "contaminated_chars", "doc_len")
  }

  /** The merged maximal contaminated runs per later-side doc:
    * (doc_id, rs, re) half-open char intervals — the shared islands
    * stage behind [[contaminationReport]] and [[scrubbedText]].
    * Gaps-and-islands over [start2, start2+len): a row opens a new
    * island when its start clears the running max end; adjacent runs
    * fuse. Window work is partitioned by doc, never a global sort. */
  private def contaminatedRuns(df: DataFrame, idCol: String, textCol: String,
                               k: Int, stride: Int, minLen: Int,
                               maxDocFreq: Int, maxOccPerDoc: Int): DataFrame = {
    val spans = sharedSpans(df, idCol, textCol, k, stride, minLen,
      maxDocFreq, maxOccPerDoc)
    // distinct: the same contaminated region reached from two different
    // partner docs is one region
    val regions = spans.select(col("id2").as("doc_id"), col("start2").as("s"),
      (col("start2") + col("span_len")).as("e")).distinct()
    val byDoc = Window.partitionBy("doc_id").orderBy("s", "e")
    val prevMax = max(col("e"))
      .over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    regions
      .withColumn("__new",
        when(prevMax.isNull || col("s") > prevMax, 1L).otherwise(0L))
      .withColumn("__grp", sum(col("__new"))
        .over(byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("__grp"))
      .agg(min(col("s")).as("rs"), max(col("e")).as("re"))
      .select("doc_id", "rs", "re")
  }

  /**
   * The scrub itself: each later-side doc's text with its merged
   * contaminated runs CUT OUT — (doc_id, clean_text) for every doc that
   * had at least one run (unaffected docs pass through a pipeline
   * untouched and are not re-emitted). Kept segments are the interval
   * complement of the islands, assembled by a per-doc lag window (each
   * island contributes the gap before it; one trailing segment closes
   * the doc) and an ordered concatenation — every step relational and
   * engine-portable, which is how the oracle replays the splice
   * byte-for-byte. All window/group work is keyed on the doc id.
   */
  def scrubbedText(df: DataFrame, idCol: String, textCol: String,
                   k: Int, stride: Int, minLen: Int,
                   maxDocFreq: Int = 8, maxOccPerDoc: Int = 16): DataFrame = {
    val docs = df.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), col(textCol).as("__t"))
    // eagerly materialized: the gap window AND the tail aggregate both
    // consume the islands, and re-deriving them re-runs the whole span
    // pipeline (the double-execution class); the frame is tiny —
    // a handful of intervals per contaminated doc
    val runs = contaminatedRuns(df, idCol, textCol, k, stride, minLen,
      maxDocFreq, maxOccPerDoc)
      .localCheckpoint(true)
    val byDoc = Window.partitionBy("doc_id").orderBy("rs")
    // the gap BEFORE each island, [prev re (or 1), rs)
    val gaps = runs
      .withColumn("seg_start", coalesce(lag(col("re"), 1).over(byDoc), lit(1L)))
      .select(col("doc_id"), col("seg_start"), col("rs").as("seg_end"))
    // the tail segment after the last island: a NULL end means "to the
    // end of the doc" — resolved inside the single text join below, so
    // corpus text is joined exactly ONCE (a second length()-only join
    // of the text table would double the operator's largest input)
    val tails = runs.groupBy("doc_id").agg(max(col("re")).as("seg_start"))
      .select(col("doc_id"), col("seg_start"),
        lit(null).cast("long").as("seg_end"))
    gaps.unionByName(tails)
      .join(docs, "doc_id")
      .select(col("doc_id"), col("seg_start"),
        col("__t").substr(col("seg_start").cast("int"),
          (coalesce(col("seg_end"), length(col("__t")).cast("long") + 1L)
            - col("seg_start")).cast("int")).as("piece"))
      .groupBy("doc_id")
      // collect_list order is nondeterministic — sort by segment start
      // before joining the pieces
      .agg(array_join(transform(
        sort_array(collect_list(struct(col("seg_start").as("s"), col("piece").as("p")))),
        x => x.getField("p")), "").as("clean_text"))
  }
}
