package graft

import graft.pipeline.Winnowing
import org.apache.spark.sql.functions._

/** Conformance for winnowing fingerprints (Schleimer et al. 2003). */
class WinnowingSpec extends SparkTestBase {
  private val s = spark
  import s.implicits._

  test("the winnowing guarantee: a shared substring of length >= w + k - 1 shares a fingerprint") {
    // k = 5, w = 4 -> any common substring of length >= 8 must yield at
    // least one COMMON selected fingerprint, wherever it sits in either
    // document (the local-match property MinHash does not give)
    val shared = "ZQXJVKWP" // 8 chars, alphabet distinct from the noise
    val docs = Seq(
      (1L, s"aaaaaaaaaa${shared}bbbbbbbbbb"),
      (2L, s"cccc${shared}dddddddddddddddd")).toDF("doc_id", "text")
    val fp = Winnowing.fingerprints(docs, "doc_id", "text", k = 5, w = 4)
    val common = fp.groupBy("fp").agg(countDistinct("doc_id").as("n"))
      .filter(col("n") === 2).count()
    assert(common >= 1, "guaranteed shared fingerprint missing")
  }

  test("density: selected fingerprints are far fewer than k-grams; short docs emit nothing") {
    val text = (1 to 40).map(i => ('a' + i % 26).toChar).mkString * 5
    val docs = Seq((1L, text), (2L, "tiny")).toDF("doc_id", "text")
    val fp = Winnowing.fingerprints(docs, "doc_id", "text", k = 5, w = 4)
    val nGrams = text.length - 4
    val nFp = fp.filter(col("doc_id") === 1L).count()
    assert(nFp > 0 && nFp < nGrams / 2,
      s"expected winnowed density well under the gram count, got $nFp of $nGrams")
    assert(fp.filter(col("doc_id") === 2L).count() === 0,
      "a doc shorter than k + w - 1 has no full window")
  }

  test("randomized differential: fingerprints match a local reference winnow on 30 random docs") {
    val rnd = new scala.util.Random(90125L)
    val k = 6; val w = 5
    val docs = (1L to 30L).map { i =>
      // random strings over a 4-char alphabet: dense gram collisions,
      // so window minima and duplicate grams get exercised hard
      (i, (1 to (20 + rnd.nextInt(60))).map(_ => "abcd"(rnd.nextInt(4))).mkString)
    }
    val got = Winnowing.fingerprints(docs.toDF("doc_id", "text"), "doc_id", "text", k, w)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // local reference: same md5-prefix hash, same full-window minima
    val mdig = java.security.MessageDigest.getInstance("MD5")
    def h(s: String): Long = {
      val hex = mdig.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(14), 16)
    }
    val expected = docs.flatMap { case (id, t) =>
      if (t.length < k + w - 1) Seq.empty
      else {
        val grams = (0 to t.length - k).map(i => h(t.substring(i, i + k)))
        grams.sliding(w).filter(_.size == w).map(win => (id, win.min)).toSet
      }
    }.toSet
    assert(got === expected,
      s"diff: spark-only=${(got -- expected).take(3)} ref-only=${(expected -- got).take(3)}")
    // the native codegen'd twin (WinnowMd5Fingerprint) selects the SAME set
    val native = Winnowing.fingerprintsNative(
        docs.toDF("doc_id", "text"), "doc_id", "text", k, w)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(native === expected,
      s"native diff: extra=${(native -- expected).take(3)} missing=${(expected -- native).take(3)}")
  }

  test("winnowDedupStream batch path: copy suppressed, quoting doc survives, min-id wins in-batch") {
    val base = "the quick brown fox jumps over the lazy dog and keeps running far away"
    val docs = Seq(
      (1L, base),
      (2L, base),                                   // exact copy — suppressed
      (3L, base + " tail"),                         // near-exact — suppressed
      (4L, s"totally different and much longer prefix text goes here then ${base.take(26)} " +
        "plus a long novel tail of many entirely different words continuing onward"),
      (5L, "entirely novel content sharing nothing with the earlier documents at all")
    ).toDF("doc_id", "text")
    val first = Winnowing.winnowDedupStream(docs, "doc_id", "text", k = 8, w = 4)
      .collect().map(_.getLong(0)).toSet
    assert(!first.contains(2L), s"exact copy must be suppressed, got $first")
    assert(!first.contains(3L), s"near-exact copy must be suppressed, got $first")
    assert(first.contains(1L) && first.contains(5L), first.toString)
    // doc 4 QUOTES a short span of doc 1 but is majority-novel — kept
    // (partial overlap is crossMatchPairs' job, not suppression's)
    assert(first.contains(4L), first.toString)
  }

  test("crossMatchPairs: a quoted span is caught; unrelated corpus docs are not") {
    val quote = "ZQXJVKWPTHMRBLDY" * 3 // 48 chars >= w + k - 1 = 11
    val corpus = Seq(
      (10L, s"aaaaaaaaaaaaaaaaaaa${quote}bbbbbbbbbbbbbbbbbbb"), // quotes the probe
      (11L, "completely unrelated training content with nothing shared at all here")
    ).toDF("doc_id", "text")
    val probe = Seq((1L, s"cccc${quote}dddddddddd")).toDF("doc_id", "text")
    val got = Winnowing.crossMatchPairs(corpus, probe, "doc_id", "text",
        k = 5, w = 4, minShared = 1, maxDocFreq = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((10L, 1L)), got.toString)
  }

  test("matchPairs finds the overlapping pair and honors minShared + the df guard") {
    val base = "the quick brown fox jumps over the lazy dog and keeps running far"
    val docs = Seq(
      (1L, base),
      (2L, base + " with a small tail change"),
      (3L, "completely unrelated content that shares nothing with the others at all")
    ).toDF("doc_id", "text")
    val pairs = Winnowing.matchPairs(docs, "doc_id", "text",
      k = 8, w = 4, minShared = 3, maxDocFreq = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)), pairs.toString)
    // a maxDocFreq of 2 on a fingerprint present in all 3 docs drops it:
    // raising minShared beyond the surviving overlap empties the result
    val strict = Winnowing.matchPairs(docs, "doc_id", "text",
      k = 8, w = 4, minShared = 1000, maxDocFreq = 10)
    assert(strict.count() === 0)
  }

  test("stored-index probe is batch-split-invariant: union of per-batch probes == whole-delta probe") {
    // the q_winnow_index_stream oracle reuses the persist entry's
    // single-probe SQL on exactly this argument: a doc's fingerprints
    // all arrive with it, so per-pair shared-counts never cross
    // batches, and with the delta df cut at identity the per-batch
    // probes partition the whole-delta probe's rows
    val s2 = spark
    import s2.implicits._
    val quote = "SHARED-RUN-QWJXZVKPYGHMBTFDNRLS"
    val corpus = (1L to 6L).map(i =>
      (i, s"corpus doc $i holds $quote plus own words $i here")).toDF("doc_id", "text")
    val idx = Winnowing.fingerprintIndex(corpus, "doc_id", "text",
      k = 8, w = 4, maxDocFreq = 100).localCheckpoint(true)
    val delta = (100L to 119L).map(i =>
      (i, s"arrival $i quoting $quote and trailing words $i")).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      Winnowing.pairsAgainstStored(df, "doc_id", "text", idx,
        k = 8, w = 4, minShared = 1)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val whole = rows(delta)
    val unioned = rows(delta.filter(col("doc_id") % 2 === 0)) ++
      rows(delta.filter(col("doc_id") % 2 === 1))
    assert(whole === unioned, s"batch split changed the probe: " +
      s"whole=${whole.size} union=${unioned.size}")
    assert(whole.nonEmpty)
    spark.catalog.clearCache()
  }

  test("maintainedIndex == full rebuild; the df cut binds GLOBALLY across parts") {
    // 12 docs share one long boilerplate run, split 6 (base) / 6
    // (appended delta); unique tails keep each doc fingerprint-bearing.
    // With maxDocFreq = 8 the boilerplate fingerprints pass either
    // part's LOCAL cut (df 6) but must be CUT over the live union
    // (df 10 after the two takedowns) — the case a locally-cut
    // appended part gets silently
    // wrong, and exactly why maintenance stores UNCUT postings.
    val boiler = "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG AGAIN AND AGAIN"
    val docs = (1L to 12L).map(i =>
      (i, s"$boiler tail-$i-" + ('a' + i.toInt).toChar.toString * 20))
      .toDF("doc_id", "text")
    val base = docs.filter(col("doc_id") <= 6)
    val delta = docs.filter(col("doc_id") > 6)
    val tomb = Seq(4L, 9L).toDF("doc_id") // one takedown per part
    val p0 = Winnowing.fingerprintPostings(base, "doc_id", "text", k = 8, w = 4)
    val p1 = Winnowing.fingerprintPostings(delta, "doc_id", "text", k = 8, w = 4)
    val maintained = Winnowing.maintainedIndex(Seq(p0, p1), tomb, maxDocFreq = 8)
    val live = docs.filter(!col("doc_id").isin(4L, 9L))
    val rebuilt = Winnowing.fingerprintIndex(live, "doc_id", "text",
      k = 8, w = 4, maxDocFreq = 8)
    assert(maintained.exceptAll(rebuilt).isEmpty &&
      rebuilt.exceptAll(maintained).isEmpty,
      "maintained postings must equal a full rebuild of the live corpus")
    // the global cut actually FIRED: a locally-cut union keeps the
    // boilerplate postings (each part sees df 6 <= 8) that the rebuild
    // cuts at the global df 10 > 8
    val locallyCut = Winnowing.maintainedIndex(
      Seq(Winnowing.fingerprintIndex(base, "doc_id", "text", k = 8, w = 4,
            maxDocFreq = 8),
          Winnowing.fingerprintIndex(delta, "doc_id", "text", k = 8, w = 4,
            maxDocFreq = 8)),
      tomb, maxDocFreq = Int.MaxValue)
    assert(locallyCut.count() > maintained.count(),
      "fixture must exercise a fingerprint whose df crosses the cut only globally")
    // tombstoned docs are gone
    assert(maintained.filter(col("doc_id").isin(4L, 9L)).count() === 0)
  }

  test("oracle-parity guard: the index-probe fixtures' max delta-side df sits far under the default cut") {
    // winnowIndexProbeOracleSql (shared by q_winnow_index_persist and
    // q_winnow_index_stream) does NOT model pairsAgainstStored's
    // delta-side maxDocFreq cut — parity rests on the fact that no
    // delta fingerprint on the documents fixture comes anywhere near
    // the default 1000. Make that fact EXECUTABLE: rebuild both
    // entries' exact delta (docs >= 250 plus planted copies of 0-99,
    // k=24/w=8) on every available SF and assert the max fingerprint
    // doc-frequency stays under a 10x safety margin. A fixture or SF
    // change that breaks the assumption now fails HERE with the reason,
    // not in Verify as a confusing value diff.
    val dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
      .filter(d => java.nio.file.Files.isDirectory(java.nio.file.Paths.get(d)))
    assert(dirs.nonEmpty, "no testdata fixture present")
    dirs.foreach { d =>
      val docs = spark.read.parquet(s"$d/documents.parquet")
      val delta = docs.filter(col("doc_id") >= 250)
        .select(col("doc_id"), col("text"))
        .unionByName(docs.filter(col("doc_id") < 100)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      val maxDf = Winnowing.fingerprints(delta, "doc_id", "text", k = 24, w = 8)
        .groupBy("fp").agg(count(lit(1)).as("df"))
        .agg(max(col("df"))).head().getLong(0)
      assert(maxDf < 100,
        s"$d: max delta fingerprint df $maxDf is within 10x of the default " +
          "1000 cut — the shared oracle SQL no longer models the probe")
    }
  }
}
