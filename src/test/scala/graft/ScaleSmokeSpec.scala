package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * 10x scale-up smoke for the guarded pair-join family — the test-scope
 * twin of Bench's `b13` block (which measures the WALL ratios at sf0.1):
 * on a 10x id-remapped, per-replica-perturbed corpus, every guarded op
 * must (a) complete without tripping a guard and (b) produce ~10x the
 * pair volume — near-linear OUTPUT growth is the structural evidence
 * that the postings discipline holds (a quadratic path would grow
 * ~100x; a silently-overcut df guard would grow ~1x).
 *
 * Replicas rotate ten letters of the corpus alphabet so each replica
 * carries its own vocabulary: the dup structure WITHIN a replica is
 * preserved (the letter map is a bijection, so equal texts stay equal
 * and shared substrings stay shared), while across replicas almost no
 * gram collides — 10x volume at the same dup-rate, the realistic
 * scale-up shape.
 */
class ScaleSmokeSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def docsRep(n: Int): DataFrame = {
    val base = SparkEntry.rd(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val alpha = "etaonrishd"
    (0 until n).map { r =>
      val rot = alpha.drop(r % alpha.length) + alpha.take(r % alpha.length)
      base.select((col("doc_id") + lit(r * 10000000L)).as("doc_id"),
        (if (r == 0) col("text")
         else translate(col("text"), alpha, rot)).as("text"))
    }.reduce(_ unionByName _)
  }

  private def assertLinear(name: String, rows1: Long, rows10: Long): Unit = {
    assert(rows1 > 0, s"$name: 1x run found nothing — the smoke tests nothing")
    // per-replica pair counts vary (hash selections differ under the
    // letter rotation) and a handful of cross-replica accidental pairs
    // are possible; 6x-14x brackets "linear", excludes 1x and 100x
    assert(rows10 >= rows1 * 6 && rows10 <= rows1 * 14,
      s"$name: pair volume went $rows1 -> $rows10 at 10x corpus " +
        "(expected ~10x: either a quadratic path or an overcut guard)")
  }

  test("winnowing matchPairs: 10x corpus, no guard trip, ~10x pairs") {
    val r1 = graft.pipeline.Winnowing.matchPairs(docsRep(1), "doc_id", "text",
      k = 24, w = 8, minShared = 5, maxDocFreq = 3).count()
    val r10 = graft.pipeline.Winnowing.matchPairs(docsRep(10), "doc_id", "text",
      k = 24, w = 8, minShared = 5, maxDocFreq = 3).count()
    assertLinear("winnow", r1, r10)
  }

  test("minhash LSH pairs: 10x corpus, no guard trip, ~10x pairs") {
    val r1 = graft.pipeline.Dedup.minhashLshPairs(docsRep(1), "doc_id", "text",
      n = 3, threshold = 0.5).count()
    val r10 = graft.pipeline.Dedup.minhashLshPairs(docsRep(10), "doc_id", "text",
      n = 3, threshold = 0.5).count()
    assertLinear("minhash", r1, r10)
  }

  test("guarded n-gram Jaccard pairs: 10x corpus, no guard trip, ~10x pairs") {
    val r1 = graft.pipeline.Dedup.ngramJaccardPairs(docsRep(1), "doc_id", "text",
      n = 3, threshold = 0.5, maxDocFreq = Some(200)).count()
    val r10 = graft.pipeline.Dedup.ngramJaccardPairs(docsRep(10), "doc_id", "text",
      n = 3, threshold = 0.5, maxDocFreq = Some(200)).count()
    assertLinear("ngram_guarded", r1, r10)
  }

  test("tf dot pairs: 10x corpus under a 10x-sized budget, ~10x pairs") {
    // budgets scale with intended input; both runs get the same raised
    // budget so the growth comparison stays apples-to-apples
    val r1 = graft.pipeline.Retrieval.tfDotPairs(docsRep(1), "doc_id", "text",
      minDot = 300L, maxHeadTokens = 640, maxHeadMadds = 20000000000L,
      maxTailBroadcastPairs = 200000000L).count()
    val r10 = graft.pipeline.Retrieval.tfDotPairs(docsRep(10), "doc_id", "text",
      minDot = 300L, maxHeadTokens = 640, maxHeadMadds = 20000000000L,
      maxTailBroadcastPairs = 200000000L).count()
    assertLinear("tf_dot", r1, r10)
  }

  test("exact-substring spans: 10x corpus, no guard trip, ~10x spans") {
    def plantAndRun(n: Int): Long = {
      val d = docsRep(n)
      val planted = d.filter(col("doc_id") % 10000000L < 15 &&
          length(col("text")) >= 220)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat(lit("P-"), col("doc_id").cast("string"), lit(": "),
            substring(col("text"), 31, 160), lit(" :S")).as("text"))
      graft.pipeline.ExactSubstr.sharedSpans(d.unionByName(planted),
        "doc_id", "text", k = 20, stride = 4, minLen = 100,
        maxDocFreq = 8, maxOccPerDoc = 16).count()
    }
    assertLinear("exact_substr", plantAndRun(1), plantAndRun(10))
  }

  test("kCore on 10 disjoint graph replicas: same peel depth, 10x membership") {
    val li = SparkEntry.rd(spark, dir, "lineitem")
      .filter(col("l_orderkey") % 5 === 0)
      .select(col("l_orderkey").as("g"), col("l_partkey").as("i"))
    def rep(n: Int): DataFrame = (0 until n).map { r =>
      li.select((col("g") + lit(r * 100000000L)).as("g"),
        (col("i") + lit(r * 100000000L)).as("i"))
    }.reduce(_ unionByName _)
    def core(n: Int): Long = graft.pipeline.Graph.kCore(
      graft.pipeline.Graph.cooccurrenceEdges(rep(n), "g", "i"),
      "a", "b", k = 12).count()
    val c1 = core(1)
    // id-remapped replicas are EXACT graph copies: the 12-core is
    // precisely 10 copies of the base 12-core, and the peel depth (a
    // per-replica property) cannot grow with replica count
    assert(core(10) === c1 * 10)
  }

  test("incremental probes: 10x DELTA against a FIXED stored index scales matches ~10x") {
    // "re-run per release at the cost of the release, not the corpus":
    // the index is built ONCE from the 1x corpus; the delta (planted
    // partial copies of corpus docs, id-remapped per replica) grows 10x
    // and the match volume must track the delta — the structural
    // evidence that probe work is delta-proportional. The 10x delta
    // repeats each probe TEXT verbatim (ids differ), so every replica
    // matches exactly the base replica's corpus partners.
    val corpus = SparkEntry.rd(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
      .filter(col("doc_id") < 250)
    def delta(n: Int): DataFrame = (0 until n).map { r =>
      corpus.filter(col("doc_id") < 40 && length(col("text")) >= 200)
        .select((col("doc_id") + lit(1000000L + r * 10000000L)).as("doc_id"),
          concat(lit("L-"), col("doc_id").cast("string"), lit(s"-$r: "),
            substring(col("text"), 21, 150), lit(" :R")).as("text"))
    }.reduce(_ unionByName _)
    // winnowing: stored fingerprint postings, delta-side probe
    val wIdx = graft.pipeline.Winnowing.fingerprintIndex(
      corpus, "doc_id", "text", k = 24, w = 8, maxDocFreq = 10)
      .localCheckpoint(true)
    def wProbe(n: Int): Long = graft.pipeline.Winnowing.pairsAgainstStored(
      delta(n), "doc_id", "text", wIdx, k = 24, w = 8, minShared = 3).count()
    val w1 = wProbe(1)
    assert(w1 > 0, "winnow probe found nothing — fixture broke")
    assert(wProbe(10) === w1 * 10,
      "verbatim-replica delta must match exactly 10x the base probe")
    // exact-substring: stored anchor postings, delta-side probe
    val aIdx = graft.pipeline.ExactSubstr.anchorIndex(
      corpus, "doc_id", "text", k = 20, stride = 4,
      maxDocFreq = 8, maxOccPerDoc = 16).localCheckpoint(true)
    def aProbe(n: Int): Long = graft.pipeline.ExactSubstr.spansAgainstStored(
      delta(n), "doc_id", "text", corpus, aIdx, k = 20, stride = 4,
      minLen = 100, maxDocFreq = 8 * n, maxOccPerDoc = 16).count()
    val a1 = aProbe(1)
    assert(a1 > 0, "substr probe found nothing — fixture broke")
    assert(aProbe(10) === a1 * 10,
      "verbatim-replica delta must span exactly 10x the base probe")
    spark.catalog.clearCache()
  }

  test("ANN/embed stored-index probes: 10x DELTA against FIXED artifacts scales matches ~10x") {
    // the embedding family's delta-proportionality evidence, same shape
    // as the text-probe test above: artifacts built ONCE from the 1x
    // corpus, the query/delta batch grows 10x via verbatim re-id'd
    // replicas, and both the ADC top-k and the banded near-dup must
    // return exactly 10x the base rows with per-replica results equal to
    // the base replica's (determinism + no corpus-side rework).
    val emb = SparkEntry.rd(spark, dir, "embeddings")
      .filter(col("vec_id") < 200)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .localCheckpoint(true)
    val tmp = java.nio.file.Files.createTempDirectory("ann_scale").toString
    val (cdf, bdf, adf) = graft.pipeline.Similarity.annIndexBuild(
      emb, "vec_id", "embedding", dim = 64, nlist = 8, m = 8, ksub = 16, iters = 2)
    cdf.write.mode("overwrite").parquet(s"$tmp/cents")
    bdf.write.mode("overwrite").parquet(s"$tmp/books")
    adf.write.mode("overwrite").parquet(s"$tmp/assign")
    // EVERY replica is re-id'd (r+1 offset), base included: a query
    // keeping a corpus id would self-exclude its own vector from the
    // top-k while the re-id'd replicas keep it — uniform ids make the
    // per-replica result sets comparable
    def queries(n: Int): DataFrame = (0 until n).map { r =>
      emb.filter(col("vec_id") < 5)
        .select((col("vec_id") + lit((r + 1) * 1000000L)).as("vec_id"), col("embedding"))
    }.reduce(_ unionByName _)
    def annProbe(n: Int) = graft.pipeline.Similarity.annIndexProbe(
      queries(n), "vec_id", "embedding",
      spark.read.parquet(s"$tmp/cents"), spark.read.parquet(s"$tmp/books"),
      spark.read.parquet(s"$tmp/assign"), rerankVecs = emb,
      k = 5, dim = 64, nprobe = 3, rerank = 20)
    val base = annProbe(1).collect()
      .map(r => (r.getLong(0) % 1000000L, r.getLong(1))).toSet
    assert(base.size === 25, s"5 queries x k=5 expected, got ${base.size}")
    val x10 = annProbe(10).collect()
      .map(r => (r.getLong(0) % 1000000L, r.getLong(1))).toSet
    // every replica returns the base replica's neighbors exactly
    assert(x10 === base, "replica results diverged from the base probe")
    assert(annProbe(10).count() === 250)
    // banded near-dup: same 10x-delta discipline
    val idx = graft.pipeline.Similarity.embedBandIndex(
      emb, "vec_id", "embedding", dim = 64, numPlanes = 16, bands = 8)
      .localCheckpoint(true)
    def ndProbe(n: Int): Long = graft.pipeline.Similarity.nearDupAgainstStored(
      queries(n), "vec_id", "embedding", emb, idx,
      threshold = 0.4, dim = 64, numPlanes = 16, bands = 8).count()
    val nd1 = ndProbe(1)
    assert(nd1 > 0, "near-dup probe found nothing — fixture broke")
    assert(ndProbe(10) === nd1 * 10,
      "verbatim-replica delta must pair exactly 10x the base probe")
    // MAINTENANCE append: encoding a 10x delta against the FIXED stored
    // parameters costs one pass over the delta — rows exactly 10x, and
    // per-replica (cell, codes) equal to the base replica's
    // (deterministic encode, no retraining, artifacts untouched).
    def append(n: Int) = graft.pipeline.Similarity.annIndexAppend(
      queries(n), "vec_id", "embedding",
      spark.read.parquet(s"$tmp/cents"), spark.read.parquet(s"$tmp/books"),
      dim = 64)
    val a1 = append(1).collect()
      .map(r => (r.getLong(0) % 1000000L, r.getInt(1), r.getSeq[Int](2))).toSet
    assert(a1.size === 5, s"5 appended rows expected, got ${a1.size}")
    val a10 = append(10).collect()
      .map(r => (r.getLong(0) % 1000000L, r.getInt(1), r.getSeq[Int](2))).toSet
    assert(a10 === a1, "replica encodes diverged from the base replica")
    assert(append(10).count() === 50,
      "10x delta must append exactly 10x the assignment rows")
    spark.catalog.clearCache()
  }
}
