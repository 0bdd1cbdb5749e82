package graft

import graft.pipeline.ExactSubstr
import org.apache.spark.sql.functions._

/** Conformance for anchor-based exact-substring dedup (the ExactSubstr
  * class of Lee et al. 2022, bucketed-anchor + extension form). */
class ExactSubstrSpec extends SparkTestBase {
  private val s = spark
  import s.implicits._

  test("a planted shared substring is found at its exact positions and maximal length") {
    // 50 chars with no repeated 8-gram (a periodic plant would add
    // genuine cross-occurrence spans)
    val shared = "QWJXZVKPYGHMBTFDNRLSCUAEI0123456789qwertyuioplkjhg"
    val docs = Seq(
      (1L, s"aaaabbbbcc${shared}ddddeeee"),
      (2L, s"ffff${shared}gggghhhhiiiijjjj")).toDF("doc_id", "text")
    val spans = ExactSubstr.sharedSpans(docs, "doc_id", "text",
      k = 8, stride = 2, minLen = 20, maxDocFreq = 4, maxOccPerDoc = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(spans.length === 1, s"expected exactly the planted span, got ${spans.toSeq}")
    // 1-based: doc 1 starts the span at 11, doc 2 at 5; maximal = 50
    assert(spans.head === ((1L, 2L, 11L, 5L, 50L)))
  }

  test("spans shorter than minLen are dropped; disjoint texts emit nothing") {
    val docs = Seq(
      (1L, "ABCDEFGHIJKLMNOP-one-xxxxxxxxxxxxxxxxxxxx"),
      (2L, "ABCDEFGHIJKLMNOP-two-yyyyyyyyyyyyyyyyyyyy"),
      (3L, "zzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzz")).toDF("doc_id", "text")
    // docs 1/2 share exactly 21 chars ("ABCDEFGHIJKLMNOP-" + "on"? no —
    // they diverge at "one"/"two", sharing "ABCDEFGHIJKLMNOP-" = 17)
    // maxOccPerDoc = 32: the xxxx/yyyy/zzzz filler is itself a repeated
    // gram (stride 1 samples all of them), which is exactly what the
    // loud guard counts — room for the filler, tripping is GuardTripSpec's
    // job
    val spans = ExactSubstr.sharedSpans(docs, "doc_id", "text",
      k = 8, stride = 1, minLen = 30, maxDocFreq = 4, maxOccPerDoc = 32)
    assert(spans.count() === 0)
    val loose = ExactSubstr.sharedSpans(docs, "doc_id", "text",
      k = 8, stride = 1, minLen = 10, maxDocFreq = 4, maxOccPerDoc = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    assert(loose.toSeq === Seq((1L, 2L, 17L)))
  }

  test("randomized differential: spans match a local quadratic reference on 25 random docs") {
    val rnd = new scala.util.Random(5150L)
    val k = 6; val stride = 2; val minLen = 12
    // 4-char alphabet + planted cross-copies: dense accidental repeats
    val base = (1L to 25L).map { i =>
      (i, (1 to (30 + rnd.nextInt(50))).map(_ => "abcd"(rnd.nextInt(4))).mkString)
    }
    val docs = base ++ base.take(5).map { case (i, t) =>
      (i + 100L, "xx" + t.substring(5, math.min(t.length, 35)) + "yy")
    }
    // high maxDocFreq/maxOccPerDoc: the reference below has no guards,
    // so the pipeline must not cut anything for the comparison to hold
    val got = ExactSubstr.sharedSpans(docs.toDF("doc_id", "text"), "doc_id", "text",
        k, stride, minLen, maxDocFreq = 1000, maxOccPerDoc = 10000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    // local reference: all maximal shared runs >= minLen whose diagonal
    // holds at least one sampled anchor (the same md5-56 % stride rule)
    val mdig = java.security.MessageDigest.getInstance("MD5")
    def h56(s: String): Long = {
      val d = mdig.digest(s.getBytes("UTF-8"))
      (0 until 7).foldLeft(0L)((acc, b) => (acc << 8) | (d(b) & 0xffL))
    }
    val expected = scala.collection.mutable.Set.empty[(Long, Long, Long, Long, Long)]
    for (((i1, t1), x) <- docs.zipWithIndex; (i2, t2) <- docs.drop(x + 1)) {
      val (idA, tA, idB, tB) = if (i1 < i2) (i1, t1, i2, t2) else (i2, t2, i1, t1)
      for (p1 <- 0 until tA.length; p2 <- 0 until tB.length
           if tA(p1) == tB(p2) &&
             (p1 == 0 || p2 == 0 || tA(p1 - 1) != tB(p2 - 1))) {
        // maximal run starting here on this diagonal
        var len = 0
        while (p1 + len < tA.length && p2 + len < tB.length &&
          tA(p1 + len) == tB(p2 + len)) len += 1
        if (len >= minLen) {
          // anchored iff some sampled k-gram lies fully inside the run
          val anchored = (0 to len - k).exists { o =>
            h56(tA.substring(p1 + o, p1 + o + k)) % stride == 0
          }
          if (anchored)
            expected += ((idA, idB, p1 + 1L, p2 + 1L, len.toLong))
        }
      }
    }
    assert(got === expected.toSet,
      s"missing=${(expected.toSet -- got).take(5)} extra=${(got -- expected.toSet).take(5)}")
  }

  test("hash-collision anchors cannot fabricate spans: every reported span verifies char-for-char") {
    val rnd = new scala.util.Random(2112L)
    val docs = (1L to 12L).map { i =>
      (i, (1 to 60).map(_ => "ab"(rnd.nextInt(2))).mkString)
    }.toDF("doc_id", "text")
    val txt = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    ExactSubstr.sharedSpans(docs, "doc_id", "text",
        k = 4, stride = 1, minLen = 8, maxDocFreq = 100, maxOccPerDoc = 10000)
      .collect().foreach { r =>
        val (id1, id2, s1, s2, len) =
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
        val a = txt(id1).substring(s1.toInt - 1, s1.toInt - 1 + len.toInt)
        val b = txt(id2).substring(s2.toInt - 1, s2.toInt - 1 + len.toInt)
        assert(a === b, s"span ($id1,$id2,$s1,$s2,$len) does not verify")
      }
  }

  test("scrubbedText cuts disjoint runs and keeps the glue in order") {
    val q1 = "QWJXZVKPYGHMBTFDNRLSCUAEI" // 25 chars, no repeated 6-gram
    val q2 = "0123456789zyxwvutsrqponml"
    val docs = Seq(
      (1L, s"first-source $q1 end"),
      (2L, s"second-source $q2 end"),
      (3L, s"AAA${q1}BBB${q2}CCC")).toDF("doc_id", "text")
    val out = graft.pipeline.ExactSubstr.scrubbedText(docs, "doc_id", "text",
        k = 6, stride = 1, minLen = 20, maxDocFreq = 4, maxOccPerDoc = 8)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // doc 3 is the later side of both pairs: two DISJOINT islands
    // [4,29) and [32,57) cut, glue kept
    assert(out(3L) === "AAABBBCCC", out.toString)
    assert(!out.contains(1L) && !out.contains(2L),
      "earlier-side docs must pass through untouched (not re-emitted)")
  }

  test("scrubbedText fuses OVERLAPPING runs into one cut (the island-merge path)") {
    val q1 = "QWJXZVKPYGHMBTFDNRLSCUAEI"
    val q2 = "0123456789zyxwvutsrqponml"
    val d3 = s"AAA${q1}BBB${q2}CCC"
    // doc 0 holds a 30-char window straddling the q1/BBB/q2 junction of
    // doc 3 — its span [20,50) in doc 3 overlaps BOTH quote islands
    // ([4,29) from doc 1, [32,57) from doc 2), so all three must fuse
    // into a single [4,57) cut. doc 0 has the LOWEST id so the span
    // lands on doc 3's (later) side.
    val d0 = "XX" + d3.substring(19, 49) + "YY"
    val docs = Seq(
      (0L, d0),
      (1L, s"first-source $q1 end"),
      (2L, s"second-source $q2 end"),
      (3L, d3)).toDF("doc_id", "text")
    val out = graft.pipeline.ExactSubstr.scrubbedText(docs, "doc_id", "text",
        k = 6, stride = 1, minLen = 20, maxDocFreq = 4, maxOccPerDoc = 8)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(3L) === "AAACCC", out.toString)
  }

  test("scrub idempotence: a second scrub over the patched corpus is a fixpoint no-op") {
    // a scrubber re-runs per corpus release, so scrub(scrub(C)) must
    // equal scrub(C): the first pass cuts the later-side copy of every
    // shared run while the first occurrence keeps its text, so the
    // patched corpus holds each span ONCE — nothing left to find.
    val q1 = "QWJXZVKPYGHMBTFDNRLSCUAEI"
    val q2 = "0123456789zyxwvutsrqponml"
    val docs = Seq(
      (1L, s"first-source $q1 end"),
      (2L, s"second-source $q2 end"),
      (3L, s"AAA${q1}BBB${q2}CCC"),
      (4L, s"untouched clean document with its own words only here"))
      .toDF("doc_id", "text")
    def scrub(df: org.apache.spark.sql.DataFrame) =
      graft.pipeline.ExactSubstr.scrubbedText(df, "doc_id", "text",
        k = 6, stride = 1, minLen = 20, maxDocFreq = 4, maxOccPerDoc = 8)
    val first = scrub(docs)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(first === Map(3L -> "AAABBBCCC"), first.toString)
    // patch the scrubbed text back into the corpus (what a release does)
    val patched = docs.join(
        first.toSeq.toDF("doc_id", "clean_text"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("clean_text"), col("text")).as("text"))
    assert(scrub(patched).count() === 0,
      "second scrub must find nothing — the scrubber is a fixpoint")
    // and the clean doc was never re-emitted by either pass
    assert(!first.contains(4L))
  }

  test("commonExtension byte-walk differential: random mixed-width unicode matches a code-point reference") {
    // the production helper walks UTF-8 bytes in place; pin it against
    // the obviously-correct decode-to-code-points form over strings
    // mixing 1-, 2-, 3- and 4-byte characters (incl. supplementary
    // plane) at every anchor position
    import org.apache.spark.unsafe.types.UTF8String
    val alphabet = Array("a", "b", "ñ", "б", "日", "本", "😀", "🚀")
    val rnd = new scala.util.Random(424242L)
    def randText(): String =
      (1 to (5 + rnd.nextInt(40))).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    def reference(s1: String, p1: Int, s2: String, p2: Int): (Long, Long) = {
      val a = s1.codePoints.toArray
      val b = s2.codePoints.toArray
      val i = p1 - 1
      val j = p2 - 1
      if (i >= a.length || j >= b.length) return (0L, 0L)
      var r = 0
      while (i + r < a.length && j + r < b.length && a(i + r) == b(j + r)) r += 1
      var l = 0
      while (i - l - 1 >= 0 && j - l - 1 >= 0 && a(i - l - 1) == b(j - l - 1)) l += 1
      (l.toLong, r.toLong)
    }
    for (_ <- 1 to 300) {
      val s1 = randText()
      // splice cut at a CODE-POINT boundary: a raw char-index substring
      // over this alphabet can split a surrogate pair, and
      // UTF8String.fromString rewrites the lone surrogate to '?' — the
      // reference (UTF-16 String) and the unit under test (UTF-8 bytes)
      // would then compare different strings
      val s2 = if (rnd.nextBoolean()) randText()
        else {
          val cps = s1.codePointCount(0, s1.length)
          val cut = s1.offsetByCodePoints(0, 1 + rnd.nextInt(math.max(1, cps - 1)))
          randText() + s1.substring(0, cut) + randText()
        }
      val n1 = s1.codePointCount(0, s1.length)
      val n2 = s2.codePointCount(0, s2.length)
      val p1 = 1 + rnd.nextInt(n1 + 1) // may run one past the end
      val p2 = 1 + rnd.nextInt(n2 + 1)
      val got = graft.functions.TextFunctionHelpers.commonExtension(
        UTF8String.fromString(s1), p1.toLong, UTF8String.fromString(s2), p2.toLong)
      val exp = reference(s1, p1, s2, p2)
      assert((got.getLong(0), got.getLong(1)) === exp,
        s"s1=$s1 p1=$p1 s2=$s2 p2=$p2")
    }
  }

  test("multibyte gram hashing: native byte-slice md5 equals the relational substring md5") {
    // pins the zero-copy byte-offset walk in the helpers: grams sliced at
    // code-point boundaries over 1-4 byte chars must digest the same
    // bytes Spark's substring produces
    val s2 = spark
    import s2.implicits._
    val docs = Seq(
      (1L, "añб😀x" * 12), // 1-, 2-, 2-, 4-byte chars interleaved
      (2L, "日本語テキストの重複検出は文字単位で動く" * 3)).toDF("doc_id", "text")
    val native = graft.pipeline.Winnowing
      .fingerprintsNative(docs, "doc_id", "text", k = 5, w = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val relational = graft.pipeline.Winnowing
      .fingerprints(docs, "doc_id", "text", k = 5, w = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(native === relational)
  }

  test("supplementary-plane text: positions and extension count code points, not UTF-16 units") {
    val emoji = "😀" // U+1F600, one code point, two UTF-16 units
    val sharedRun = s"${emoji}ZQXJVKWP${emoji}ZQXJVKWP"
    val docs = Seq(
      (1L, s"abc$sharedRun"),
      (2L, s"defgh$sharedRun")).toDF("doc_id", "text")
    val spans = ExactSubstr.sharedSpans(docs, "doc_id", "text",
        k = 5, stride = 1, minLen = 10, maxDocFreq = 4, maxOccPerDoc = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // code-point positions: doc 1 run starts at 4, doc 2 at 6; len = 18
    assert(spans.toSeq === Seq((1L, 2L, 4L, 6L, 18L)))
  }
}
