package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
 * SIGMOD 2003 — the MOSS algorithm): hash every k-gram of a document,
 * slide a window of `w` consecutive k-gram hashes, and keep each
 * window's MINIMUM hash. The selected set is a position-robust
 * fingerprint with guaranteed density ≈ 2/(w+1) and the winnowing
 * guarantee: any shared substring of length ≥ w + k − 1 between two
 * documents contributes at least one SHARED fingerprint — the property
 * MinHash does not give (MinHash bounds resemblance of the whole set;
 * winnowing localizes matches), which is why plagiarism/clone detection
 * uses it.
 *
 * Scale shape: k-gram expansion is narrow (explode over positions); the
 * window minimum is a per-document ordered frame (bounded by document
 * length, never a global sort); the fingerprint SET is one distinct
 * shuffle. Pair generation is the same guarded-postings discipline as
 * the n-gram dedup family: fingerprints above `maxDocFreq` documents are
 * corpus-wide boilerplate and are dropped BEFORE the join (a semi-join
 * riding the posting key), so pair volume is Σ_fp df(fp)² over rare
 * fingerprints only.
 *
 * Hashes are the engine's md5-portability convention (56-bit md5 prefix
 * as BIGINT — [[graft.operators.Sharding]]): every step replays in an
 * external SQL engine, which is how the oracle pins the whole pass.
 *
 * Relationship to [[graft.functions.WinnowFingerprint]] (the native
 * codegen'd expression behind `TextAnalysis.fingerprints`): that is the
 * SERVING form — per-row, word-level k-grams, xxhash64, no shuffle,
 * oracled by a copy-invariance property. This module is the RELATIONAL
 * form — char-level grams, md5-portable, every intermediate value
 * replayable — and adds the corpus-level match-pair stage. Use the
 * native expression to fingerprint; use this to AUDIT a fingerprint
 * pipeline end-to-end or to run the pair join with the df guard.
 */
object Winnowing {

  /** Per-document winnowing fingerprint set: (doc_id, fp) DISTINCT
    * rows. `k` = gram length (chars), `w` = window length (grams).
    * Documents shorter than k + w − 1 chars have no full window and
    * emit nothing. */
  def fingerprints(df: DataFrame, idCol: String, textCol: String,
                   k: Int, w: Int): DataFrame = {
    require(k >= 2 && w >= 1, s"need k >= 2 and w >= 1, got k=$k w=$w")
    val grams = df
      .filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), col(textCol).as("__t"))
      .filter(length(col("__t")) >= k + w - 1)
      .select(col("doc_id"),
        explode(sequence(lit(1), length(col("__t")) - (k - 1))).as("pos"),
        col("__t"))
      .select(col("doc_id"), col("pos"),
        conv(substring(md5(col("__t").substr(col("pos"), lit(k))), 1, 14),
          16, 10).cast("long").as("h"))
    // full windows only: the frame must hold exactly w grams
    val win = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.currentRow, w - 1)
    grams
      .select(col("doc_id"), min(col("h")).over(win).as("fp"),
        count(lit(1)).over(win).as("__n"))
      .filter(col("__n") === w)
      .select("doc_id", "fp").distinct()
  }

  /** The native form of [[fingerprints]] — VALUE-IDENTICAL selected set
    * (same md5-prefix hash, same full-window minima; the randomized
    * differential pins equality), computed as ONE codegen'd JVM call
    * per row ([[graft.functions.WinnowMd5Fingerprint]]) and exploded
    * AFTER selection: only the ~2/(w+1)-density fingerprints ever
    * become rows, where the relational form shuffles every char
    * position through a per-doc window sort. No distinct needed — the
    * native selection already dedupes per document. This is the 100 TB
    * fingerprint pass; keep [[fingerprints]] as the replayable audit
    * twin. */
  def fingerprintsNative(df: DataFrame, idCol: String, textCol: String,
                         k: Int, w: Int): DataFrame = {
    require(k >= 2 && w >= 1, s"need k >= 2 and w >= 1, got k=$k w=$w")
    df.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        explode(graft.functions.TextFunctions.winnowMd5Fingerprint(
          col(textCol), k, w)).as("fp"))
  }

  /**
   * Streaming winnowing dedup suppression — [[graft.pipeline.Dedup
   * .simhashDedupStream]]'s discipline on the winnowing fingerprint set:
   * every selected fingerprint claims first-arrival ownership in the
   * dedup state; a document is novel (`is_first`) iff it claimed at
   * least `minNovelFrac` of its own fingerprints. Exact copies claim
   * none and near-exact copies only the few windows their edit touched —
   * both suppressed — while a doc that merely QUOTES an earlier one
   * keeps its majority-novel tail and survives (partial overlap is
   * [[crossMatchPairs]]' job, not suppression's). Unlike simhash's
   * fixed band count, the per-doc fingerprint count varies, so each
   * exploded row carries its document's total and the claim test
   * compares against it.
   *
   * With `eventTimeCol`: watermarked `dropDuplicatesWithinWatermark` on
   * the fingerprint + a windowed count-back per doc (the two-stateful-op
   * chain append mode requires; a doc's fingerprints share its
   * timestamp, so they land in one window). Without: deterministic
   * batch ownership by min doc id per fingerprint (an arbitrary
   * dropDuplicates winner can split a same-batch duplicate pair's
   * fingerprints between the copies and suppress the whole cluster).
   * Docs too short for any full window carry no signal and are omitted
   * (same contract as simhash's null-signature rows).
   */
  def winnowDedupStream(stream: DataFrame, idCol: String, textCol: String,
                        k: Int, w: Int,
                        minNovelFrac: Double = 0.5,
                        eventTimeCol: Option[String] = None,
                        delay: String = "10 minutes"): DataFrame = {
    require(k >= 2 && w >= 1, s"need k >= 2 and w >= 1, got k=$k w=$w")
    require(minNovelFrac > 0 && minNovelFrac <= 1,
      s"minNovelFrac must be in (0, 1], got $minNovelFrac")
    // no size(__fps) > 0 filter: exploding an empty array emits no rows,
    // so short docs are omitted anyway — and the filter predicate gets
    // pushed below the projection where it RE-EVALUATES the whole
    // O(len·w) winnow expression per row (the r11 plan audit measured
    // the pass twice per branch from exactly this)
    val fps = stream
      .filter(col(textCol).isNotNull)
      .withColumn("__fps", graft.functions.TextFunctions.winnowMd5Fingerprint(
        col(textCol), k, w))
      .withColumn("__nfp", size(col("__fps")).cast("long"))
      .withColumn("__fp", explode(col("__fps")))
    eventTimeCol match {
      case Some(t) =>
        fps.withWatermark(t, delay)
          .dropDuplicatesWithinWatermark("__fp")
          .groupBy(window(col(t), delay), col(idCol), col("__nfp"))
          .agg(count(lit(1)).as("__kept"))
          .filter(col("__kept").cast("double") >= lit(minNovelFrac) * col("__nfp"))
          .select(col(idCol), lit(true).as("is_first"))
      case None =>
        // single fingerprint pass: ownership (min doc id per fingerprint)
        // rides a window over the exploded rows instead of a separate
        // groupBy, so the O(len·w) native winnow expression executes ONCE —
        // the prior two-consumer shape (ownership groupBy + a sizes
        // distinct join on the same unpersisted frame) re-ran it over the
        // whole corpus per consumer. Each row already carries its doc's
        // total (__nfp), so the claim test needs no sizes join at all.
        fps
          .withColumn("__owner",
            min(col(idCol)).over(Window.partitionBy("__fp")))
          .groupBy(col(idCol), col("__nfp"))
          .agg(sum(when(col(idCol) === col("__owner"), 1L).otherwise(0L))
            .as("__kept"))
          .filter(col("__kept").cast("double") >= lit(minNovelFrac) * col("__nfp"))
          .select(col(idCol), lit(true).as("is_first"))
    }
  }

  /**
   * Cross-corpus winnowing screen: every (corpus doc, probe doc) pair
   * sharing ≥ `minShared` fingerprints — the decontamination form of
   * [[matchPairs]]. Winnowing's guarantee makes this the right screen
   * for PARTIAL contamination (an eval question quoted inside a long
   * training document shares a fingerprint whenever the quoted span is
   * ≥ w + k − 1 chars), where whole-set Jaccard dilutes to nothing.
   * Strictly between sides — the corpus never self-pairs — so volume is
   * Σ_fp df_corpus(fp)·df_probe(fp), linear in corpus postings when the
   * probe side (an eval suite) is small; `maxDocFreq` bounds the
   * corpus-side df per fingerprint (boilerplate cut, same as the
   * self-join form).
   *
   * Caching contract (same as [[matchPairs]]): the corpus fingerprint
   * frame is persisted because the df guard and the posting join both
   * consume it, and a lazily-returned plan cannot unpersist its own
   * inputs. The blocks are spillable and LRU-evictable, but a
   * long-lived session composing many operators should
   * `spark.catalog.clearCache()` between pipelines, or wrap the
   * consumption in [[graft.plans.CacheScope]] (releases exactly this
   * operator's persists, leaves other pipelines' caches alone) — the
   * same contract the other persisting operators (linkage, FK
   * discovery) carry.
   */
  def crossMatchPairs(corpus: DataFrame, probe: DataFrame,
                      idCol: String, textCol: String,
                      k: Int, w: Int, minShared: Long,
                      maxDocFreq: Int = 1000): DataFrame = {
    require(minShared >= 1, "minShared must be >= 1")
    require(maxDocFreq >= 1, "maxDocFreq must be >= 1")
    val pfp = fingerprintsNative(probe, idCol, textCol, k, w)
      .select(col("fp"), col("doc_id").as("probe_id"))
    val cfp = fingerprintsNative(corpus, idCol, textCol, k, w)
      .transform(graft.plans.CacheScope.persistTracked)
    val rare = cfp.groupBy("fp").agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxDocFreq)
      .select("fp")
    cfp.join(rare, "fp")
      .select(col("fp"), col("doc_id").as("corpus_id"))
      .join(pfp, "fp")
      .groupBy("corpus_id", "probe_id")
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }

  /**
   * Build-once winnowing fingerprint index: the RARE postings
   * (fp, doc_id) after the `maxDocFreq` boilerplate cut — the persisted
   * artifact an incremental decontamination probe joins against WITHOUT
   * rescanning corpus text (the [[graft.pipeline.Dedup]] band-index
   * pattern applied to winnowing). Write this to parquet when the
   * corpus is built; per release, [[pairsAgainstStored]] reads it back
   * plus only the delta. The df cut is baked in at build time, so the
   * per-fingerprint posting list in the artifact is bounded by
   * construction.
   *
   * Caching contract (same as [[matchPairs]]): the fingerprint frame is
   * persisted across its two consumers (the df guard and the posting
   * projection); callers composing many operators in one session should
   * `spark.catalog.clearCache()` between pipelines or wrap the
   * consumption in [[graft.plans.CacheScope]].
   */
  def fingerprintIndex(corpus: DataFrame, idCol: String, textCol: String,
                       k: Int, w: Int, maxDocFreq: Int = 1000): DataFrame = {
    require(maxDocFreq >= 1, "maxDocFreq must be >= 1")
    val fp = fingerprintsNative(corpus, idCol, textCol, k, w)
      .transform(graft.plans.CacheScope.persistTracked)
    val rare = fp.groupBy("fp").agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxDocFreq)
      .select("fp")
    fp.join(rare, "fp").select(col("fp"), col("doc_id"))
  }

  /** UNCUT (fp, doc_id) postings — the index MAINTENANCE storage form
    * (r14, the ANN-family append/tombstone discipline on the text
    * index): the df boilerplate cut is corpus-GLOBAL, so a maintained
    * index stores raw postings per part (base + appended deltas) and
    * applies the cut over the live union at probe time
    * ([[maintainedIndex]]). Baking the cut into each part — what
    * appending [[fingerprintIndex]] outputs would do — silently
    * disagrees with a full rebuild whenever a fingerprint's df crosses
    * the cut only globally (df 6 in the base + 6 in a delta passes both
    * local cuts at 10 and must be CUT at 12; WinnowingSpec pins exactly
    * that case). One pass over the part's text, distinct (fp, doc) by
    * native selection. */
  def fingerprintPostings(part: DataFrame, idCol: String, textCol: String,
                          k: Int, w: Int): DataFrame =
    fingerprintsNative(part, idCol, textCol, k, w)
      .select(col("fp"), col("doc_id"))

  /** The maintained fingerprint index: stored posting parts unioned,
    * tombstoned docs removed by anti-join, the global df cut applied
    * over what remains — postings-for-postings EQUAL to
    * [[fingerprintIndex]] of the live corpus (spec-pinned), at the cost
    * of one pass over the NARROW postings, never corpus text. Append =
    * write another part (idempotent per-batch dirs); takedown = add to
    * the tombstone frame; compaction = materialize this result as the
    * new single part and reset the tombstones. */
  def maintainedIndex(parts: Seq[DataFrame], tombstones: DataFrame,
                      maxDocFreq: Int = 1000): DataFrame = {
    require(parts.nonEmpty, "no posting parts")
    require(maxDocFreq >= 1, "maxDocFreq must be >= 1")
    val live = parts.map(_.select(col("fp"), col("doc_id")))
      .reduce(_ unionByName _)
      .join(tombstones.select(col("doc_id")).distinct(),
        Seq("doc_id"), "left_anti")
      .transform(graft.plans.CacheScope.persistTracked)
    val rare = live.groupBy("fp").agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxDocFreq)
      .select("fp")
    live.join(rare, "fp").select(col("fp"), col("doc_id"))
  }

  /**
   * Incremental winnowing probe against a STORED fingerprint index:
   * (new_id, corpus_id, shared) for every new document sharing ≥
   * `minShared` selected fingerprints with an indexed corpus document.
   * The corpus participates only as the [[fingerprintIndex]] artifact —
   * the probe plan scans the index parquet plus the delta, never corpus
   * text, which is what lets a decontamination screen re-run per corpus
   * release at the cost of the release, not the corpus. Strictly
   * two-sided (a new doc never pairs with another new doc — run
   * [[matchPairs]] over the delta for that), volume Σ_fp
   * df_index(fp)·df_delta(fp) with the index side bounded at build time
   * and the delta side by this call's own `maxDocFreq` cut: a
   * boilerplate fingerprint appearing across a large delta would
   * otherwise join the stored postings unguarded (the index-side cut
   * bounds each posting LIST, not how many delta rows probe it). The
   * cut rides a window over the delta fingerprint rows — already
   * distinct per (fp, doc) by native selection, so one count-over-fp
   * frame IS the df — keeping the expensive O(len·w) winnow expression
   * single-consumer (PlanSpec pins one delta-side pass, exactly the
   * [[ExactSubstr.spansAgainstStored]] discipline).
   */
  def pairsAgainstStored(newDocs: DataFrame, idCol: String, textCol: String,
                         storedPostings: DataFrame,
                         k: Int, w: Int, minShared: Long,
                         maxDocFreq: Int = 1000): DataFrame = {
    require(minShared >= 1, "minShared must be >= 1")
    require(maxDocFreq >= 1, "maxDocFreq must be >= 1")
    fingerprintsNative(newDocs, idCol, textCol, k, w)
      .withColumn("__df", count(lit(1)).over(Window.partitionBy("fp")))
      .filter(col("__df") <= maxDocFreq)
      .select(col("fp"), col("doc_id").as("new_id"))
      .join(storedPostings.select(col("fp"), col("doc_id").as("corpus_id")), "fp")
      .groupBy("new_id", "corpus_id")
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }

  /**
   * Streaming winnowing decontamination: drive [[pairsAgainstStored]]
   * from a micro-batch stream of arriving documents — the stored-index
   * streaming twin ([[graft.pipeline.ExactSubstr.decontaminationStream]]
   * is the span-level sibling; [[winnowDedupStream]] covers
   * suppression, this covers the index probe). Each micro-batch probes
   * the stored postings independently (stateless across batches — a
   * document's fingerprints all arrive with it, so batch boundaries
   * cannot split a (new_id, corpus_id) shared-count), and matches land
   * under `outPath/batch=<id>` via idempotent per-batch OVERWRITE: a
   * replayed batch rewrites its own directory, making restart parity
   * exact. Read results back with `spark.read.parquet(outPath)`.
   *
   * The delta-side `maxDocFreq` cut is PER BATCH — each batch is its
   * own probe, so a boilerplate fingerprint's join volume is bounded
   * per batch by construction.
   */
  def decontaminationStream(stream: DataFrame, idCol: String, textCol: String,
                            storedPostings: DataFrame,
                            k: Int, w: Int, minShared: Long,
                            outPath: String, checkpoint: String,
                            maxDocFreq: Int = 1000)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(minShared >= 1, "minShared must be >= 1")
    // validate BEFORE the stream starts: deferring this to
    // pairsAgainstStored inside foreachBatch would surface a bad
    // argument only as an async first-batch failure
    require(maxDocFreq >= 1, "maxDocFreq must be >= 1")
    // hoist the stored-artifact load out of the per-batch plan (r15,
    // VERDICT r14 item 5): the posting index is probed in full by every
    // micro-batch, so it materializes ONCE here (spillable, registered
    // with the caller's CacheScope on this thread) instead of
    // re-scanning its parquet per batch.
    val postings = graft.plans.CacheScope.persistTracked(
      storedPostings.select(col("fp"), col("doc_id")))
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                       batchId: Long) =>
        pairsAgainstStored(batch.toDF(), idCol, textCol, postings,
          k, w, minShared, maxDocFreq)
          .write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
        ()
      }
      .start()
  }

  /**
   * Document pairs sharing ≥ `minShared` winnowing fingerprints, with
   * the shared count and each side's fingerprint-set size (for a
   * containment/overlap readout). `maxDocFreq` drops corpus-wide
   * boilerplate fingerprints before the self-join — the same skew guard
   * as [[Dedup]]'s n-gram postings.
   *
   * Caching contract: the fingerprint frame below is persisted (three
   * consumers — sizes, the df guard, both posting sides) and CANNOT be
   * unpersisted by this method, because the returned frame is lazy and
   * still reads it. Blocks are spillable and LRU-evictable; callers
   * composing many operators in one long-lived session should
   * `spark.catalog.clearCache()` between pipelines (Bench/Verify do
   * exactly this per entry) or wrap the consumption in
   * [[graft.plans.CacheScope]].
   */
  def matchPairs(df: DataFrame, idCol: String, textCol: String,
                 k: Int, w: Int, minShared: Long,
                 maxDocFreq: Int = 1000): DataFrame = {
    require(minShared >= 1, "minShared must be >= 1")
    require(maxDocFreq >= 2, "maxDocFreq < 2 would drop every joinable fingerprint")
    // the NATIVE fingerprint pass (selection before explosion);
    // persisted because sizes, the df guard, and both posting sides all
    // consume it (the double-execution class). Spillable.
    val fp = fingerprintsNative(df, idCol, textCol, k, w)
      .transform(graft.plans.CacheScope.persistTracked)
    val sizes = fp.groupBy("doc_id").agg(count(lit(1)).as("n_fp"))
    val rare = fp.groupBy("fp").agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxDocFreq)
      .select("fp")
    val posting = fp.join(rare, "fp")
    val pairs = posting.select(col("fp"), col("doc_id").as("id1"))
      .join(posting.select(col("fp"), col("doc_id").as("id2")), "fp")
      .filter(col("id1") < col("id2"))
      .groupBy("id1", "id2").agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
    pairs
      .join(sizes.select(col("doc_id").as("id1"), col("n_fp").as("n_fp1")), "id1")
      .join(sizes.select(col("doc_id").as("id2"), col("n_fp").as("n_fp2")), "id2")
      .select(col("id1"), col("id2"), col("shared"), col("n_fp1"), col("n_fp2"))
  }
}
