package graft

import graft.pipeline.Dedup
import org.apache.spark.sql.functions._

class DedupSpec extends SparkTestBase {

  // Planted corpus: 1-2 near-identical, 3 unrelated, 4 exact copy of 3.
  private lazy val docs = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog tonight"),
      (3L, "completely different text about spark query engines here"),
      (4L, "completely different text about spark query engines here"),
      (5L, "a b") // shorter than n=3 → no shingles
    ).toDF("doc_id", "text")
  }

  test("shingles: distinct word n-grams; short docs have none") {
    val out = docs.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(1L).size === 8)
    assert(out(1L).contains("the quick brown"))
    assert(out(5L) === Seq.empty)
  }

  test("native word_shingles is bit-identical to the composable form") {
    val s = spark
    import s.implicits._
    val tricky = docs.select(col("doc_id"), col("text"))
      .union(Seq((10L, ""), (11L, "a  b c d"), (12L, "x y z"), (13L, "x y z x y z x y"))
        .toDF("doc_id", "text"))
      .union(Seq(14L).toDF("doc_id").select(col("doc_id"), lit(null).cast("string").as("text")))
    val native = tricky.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val composable = tricky.select(col("doc_id"), Dedup.shinglesComposable(col("text"), 3).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(native === composable)
    // double space → empty token inside a gram, same on both paths
    assert(native(11L).contains("a  b"))
    // repeated grams dedupe in first-occurrence order
    assert(native(13L) === Seq("x y z", "y z x", "z x y"))
  }

  test("native word_shingles parity holds on 200 randomized strings x n in 1..4") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    val alphabet = Seq("a", "b", "cd", "é", "字", "", " ") // empties → double spaces
    val strs = (1 to 200).map { i =>
      val len = rnd.nextInt(12)
      (i.toLong, Seq.fill(len)(alphabet(rnd.nextInt(alphabet.size))).mkString(" "))
    }
    val df = strs.toDF("doc_id", "text")
    for (n <- 1 to 4) {
      val native = df.select(col("doc_id"), Dedup.shingles(col("text"), n).as("g"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      val composable = df.select(col("doc_id"), Dedup.shinglesComposable(col("text"), n).as("g"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      assert(native === composable, s"parity failed at n=$n")
    }
  }

  test("native simhash64 is bit-identical to the explode+aggregate form") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val alphabet = Seq("a", "b", "cd", "é", "字", "", " ")
    val strs = (1 to 200).map { i =>
      val len = rnd.nextInt(16)
      (i.toLong, Seq.fill(len)(alphabet(rnd.nextInt(alphabet.size))).mkString(" "))
    }
    val df = strs.toDF("doc_id", "text")
      .union(Seq(900L).toDF("doc_id").select(col("doc_id"), lit(null).cast("string").as("text")))
    for (n <- Seq(1, 3)) {
      val native = Dedup.simhashSignatures(df, "doc_id", "text", n)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val agg = Dedup.simhashSignaturesAgg(df, "doc_id", "text", n)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(native === agg, s"simhash parity failed at n=$n")
    }
    // docs with < n tokens (incl. null text) drop out of BOTH forms
    val nativeIds = Dedup.simhashSignatures(df, "doc_id", "text", 3)
      .collect().map(_.getLong(0)).toSet
    assert(!nativeIds.contains(900L))
  }

  test("native minhash_signature is bit-identical to the min-aggregate form") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(13)
    val alphabet = Seq("a", "b", "cd", "é", "字", "", " ")
    val strs = (1 to 200).map { i =>
      val len = rnd.nextInt(16)
      (i.toLong, Seq.fill(len)(alphabet(rnd.nextInt(alphabet.size))).mkString(" "))
    }
    val df = strs.toDF("doc_id", "text")
      .union(Seq(900L).toDF("doc_id").select(col("doc_id"), lit(null).cast("string").as("text")))
    graft.functions.TextFunctions.ensure(s)
    for (n <- Seq(1, 3)) {
      val native = df.select(col("doc_id"),
          graft.functions.TextFunctions.minhashSignature(col("text"), n, 8).as("sig"))
        .filter(col("sig").isNotNull)
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toVector).toMap
      val gs = df.select(col("doc_id"), Dedup.shingles(col("text"), n).as("grams"))
      val agg = Dedup.minhashSignatures(gs, 8)
        .collect().map(r => r.getLong(0) -> (1 to 8).map(i => r.getInt(i)).toVector).toMap
      assert(native === agg, s"minhash parity failed at n=$n")
    }
  }

  test("duplicateSpans merges covered positions into maximal interval-union spans") {
    val s = spark
    import s.implicits._
    // L=3. Docs 1 and 2 share "c d e f" → grams "c d e" (pos 2/1) and
    // "d e f" (pos 3/2): overlapping → ONE merged span of 4 tokens each.
    // Doc 3 repeats doc 1's leading gram "a b c" AND shares the tail gram
    // "x y z" with doc 4 at a distant position → TWO separate spans.
    val df = Seq(
      (1L, "a b c d e f"),
      (2L, "q c d e f r"),
      (3L, "a b c q q q q x y z"),
      (4L, "p p x y z"),
      (5L, "totally unique words only here")
    ).toDF("doc_id", "text")
    val out = Dedup.duplicateSpans(df, "doc_id", "text", L = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // doc 1: grams "a b c"(0) shared with doc3, "c d e"(2), "d e f"(3)
    // shared with doc2 → spans [0,2] (3 toks) and [2,5] (4 toks)? No:
    // pos 0 covered, pos 2,3 covered → pos0 alone ([0,2], 3 toks) merges
    // with pos2? 2 <= 0 + L - 1 = 2 → SAME island → one span pos 0..3 →
    // 3 - 0 + 3 = 6 tokens.
    assert(out(1L) === ((1L, 6L, 6L)))
    assert(out(2L) === ((1L, 4L, 4L)))      // pos 1,2 → one span, 4 tokens
    // pos 0 ("a b c"), pos 3,4 ("q q q" self-repeats inside the q-run →
    // covered, merged to a 4-token span), pos 7 ("x y z") → three spans
    assert(out(3L) === ((3L, 10L, 4L)))
    assert(out(4L) === ((1L, 3L, 3L)))      // pos 2
    assert(out(5L) === ((0L, 0L, 0L)))
    // a doc-internal repeat also counts (minCount is corpus-wide)
    val selfDup = Seq((9L, "m n o s t u v m n o")).toDF("doc_id", "text")
    val sd = Dedup.duplicateSpans(selfDup, "doc_id", "text", L = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2))).head
    assert(sd === ((2L, 6L))) // "m n o" at pos 0 and 7 → two 3-token spans
  }

  test("segmentDedup strips corpus-frequent segments, keeps docs whole") {
    val s = spark
    import s.implicits._
    // 2-word segments; "b o" is in 3 docs (> maxDocFreq 2) → boilerplate.
    // Doc 4 is ONLY boilerplate and must survive with empty text.
    val df = Seq(
      (1L, "b o u1 u2"),
      (2L, "b o u3 u4"),
      (3L, "b o u5 u6 tail"),
      (4L, "b o"),
      (5L, "u7 u8")
    ).toDF("doc_id", "text")
    val withNull = df.union(
      Seq(6L).toDF("doc_id").select(col("doc_id"), lit(null).cast("string").as("text")))
    val out = Dedup.segmentDedup(withNull, "doc_id", "text", segWords = 2, maxDocFreq = 2)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getString(3)))).toMap
    // null text: no phantom segments (sequence(0,-1) counts DOWN in Spark)
    assert(out(6L) === ((0, 0L, "")))
    // segWords = 1: ceil(-1/1) = -1 must still clamp to 0, not surface
    val one = Dedup.segmentDedup(withNull, "doc_id", "text", segWords = 1, maxDocFreq = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(one(6L) === 0)
    assert(out(1L) === ((2, 1L, "u1 u2")))
    assert(out(2L) === ((2, 1L, "u3 u4")))
    assert(out(3L) === ((3, 2L, "u5 u6 tail"))) // short last segment kept
    assert(out(4L) === ((1, 0L, "")))           // fully-boilerplate doc survives
    assert(out(5L) === ((1, 1L, "u7 u8")))
  }

  test("segmentDedup invariants on random corpora: identity below the cap, order kept") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(31)
    // unique per-doc words → no segment can repeat across docs
    val docs = (1 to 80).map { i =>
      (i.toLong, (0 until rnd.nextInt(25) + 1).map(j => s"d${i}w$j").mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val out = Dedup.segmentDedup(df, "doc_id", "text", segWords = 3, maxDocFreq = 1)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getString(3)))).toMap
    docs.foreach { case (id, text) =>
      val (nSegs, nKept, clean) = out(id)
      val expectSegs = math.ceil(text.split(" ", -1).length / 3.0).toInt
      // nothing is corpus-frequent → reassembly must be the identity
      assert(nSegs === expectSegs && nKept === expectSegs.toLong)
      assert(clean === text, s"doc $id reassembly broke")
    }
  }

  test("segmentDedup: within-doc repeats count once toward document frequency") {
    val s = spark
    import s.implicits._
    // "x y" repeats 3x inside doc 1 but is in only 2 DOCS → df = 2 ≤ 2,
    // kept everywhere
    val df = Seq(
      (1L, "x y x y x y"),
      (2L, "x y z w")
    ).toDF("doc_id", "text")
    val out = Dedup.segmentDedup(df, "doc_id", "text", segWords = 2, maxDocFreq = 2)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out(1L) === "x y x y x y")
    assert(out(2L) === "x y z w")
  }

  test("exactByContent groups identical docs under one survivor") {
    val out = Dedup.exactByContent(docs, "doc_id", "text").collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 5L -> 1L))
  }

  test("ngramJaccardPairs finds near-dups and exact dups, not unrelated") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L), (3L, 4L)))
  }

  test("connectedComponents/dupClusters: transitive chains collapse to min id") {
    val s = spark
    import s.implicits._
    // chain 1-2-3 (transitive: 1,3 never directly paired), island 4-5,
    // singletons 6,7
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id1", "id2")
    val ids = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L).toDF("doc_id")
    val out = Dedup.dupClusters(ids, "doc_id", pairs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out === Map(
      1L -> (1L, true), 2L -> (1L, false), 3L -> (1L, false),
      4L -> (4L, true), 5L -> (4L, false),
      6L -> (6L, true), 7L -> (7L, true)))
  }

  test("connectedComponents converges on a long path graph within maxIters") {
    val s = spark
    import s.implicits._
    // path 10-11-12-...-20: diameter 10, needs several propagation rounds.
    // driverEdgeThreshold = 0 forces the DISTRIBUTED loop (the adaptive
    // driver union-find would otherwise absorb any small fixture).
    val pairs = (10L until 20L).map(i => (i, i + 1)).toDF("id1", "id2")
    val labels = Dedup.connectedComponents(pairs, driverEdgeThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.keySet === (10L to 20L).toSet)
    assert(labels.values.toSet === Set(10L))
  }

  test("driver union-find and distributed propagation produce identical labels") {
    val s = spark
    import s.implicits._
    // chains + cliques + islands in one graph
    val rnd = new scala.util.Random(5)
    val pairs = ((10L until 20L).map(i => (i, i + 1)) ++
      Seq((100L, 101L), (100L, 102L), (101L, 102L), (200L, 300L)) ++
      (0 until 30).map(_ => (rnd.nextInt(40).toLong + 400L, rnd.nextInt(40).toLong + 400L)))
      .filter { case (a, b) => a != b }
      .toDF("id1", "id2")
    val driver = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Dedup.connectedComponents(pairs, driverEdgeThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(driver === dist)
  }

  test("dupClusters on the planted corpus matches the pair graph") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
    val out = Dedup.dupClusters(docs, "doc_id", pairs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out === Map(
      1L -> (1L, true), 2L -> (1L, false),
      3L -> (3L, true), 4L -> (3L, false),
      5L -> (5L, true)))
  }

  test("exactDedupStream keeps only the first copy across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val deduped = Dedup.exactDedupStream(
      mem.toDF().toDF("doc_id", "text"), "text")
    val sq = deduped.writeStream.format("memory")
      .queryName("dedup_stream_out").outputMode("append").start()
    try {
      mem.addData((1L, "same content"), (2L, "other content"))
      sq.processAllAvailable()
      // duplicate arrives in a LATER micro-batch — state must remember
      mem.addData((3L, "same content"), (4L, "third content"))
      sq.processAllAvailable()
    } finally sq.stop()
    val out = spark.table("dedup_stream_out")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out === Set(1L, 2L, 4L))
  }

  test("exactDedupStream with a watermark builds the state-evicting plan") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, java.sql.Timestamp)]
    val deduped = Dedup.exactDedupStream(
      mem.toDF().toDF("doc_id", "text", "ts"), "text",
      eventTimeCol = Some("ts"), delay = "5 seconds")
    val sq = deduped.writeStream.format("memory")
      .queryName("dedup_stream_wm").outputMode("append").start()
    try {
      val t0 = new java.sql.Timestamp(1000L)
      mem.addData((1L, "dup", t0), (2L, "dup", t0), (3L, "solo", t0))
      sq.processAllAvailable()
    } finally sq.stop()
    val out = spark.table("dedup_stream_wm")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out === Set(1L, 3L))
  }

  test("simhashDedupStream (batch form): one survivor per signature cluster, novel docs kept") {
    val s = spark
    import s.implicits._
    val text1 = "the quick brown fox jumps over the lazy dog today and tomorrow"
    val text2 = "completely different text about spark query engines here now"
    val df = Seq(
      (1L, text1), (2L, text1), (3L, text1), // identical → all bands shared
      (4L, text2),
      (5L, "a b")                            // too short for 3-grams → omitted
    ).toDF("doc_id", "text")
    val kept = Dedup.simhashDedupStream(df, "doc_id", "text", n = 3)
      .collect().map(_.getLong(0)).toSet
    // batch ownership is min-id: the MIN of the identical trio survives —
    // deterministically — plus the novel doc; the short doc is omitted
    assert(kept === Set(1L, 4L))
    // partition-independent (an arbitrary dropDuplicates winner could
    // split band ownership across copies and suppress the whole cluster)
    val kept8 = Dedup.simhashDedupStream(df.repartition(8), "doc_id", "text", n = 3)
      .collect().map(_.getLong(0)).toSet
    assert(kept8 === Set(1L, 4L))
  }

  test("simhashDedupStream suppresses a later-batch near-dup; watermark windows flush") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, java.sql.Timestamp)]
    val t0 = new java.sql.Timestamp(10000L)
    val tLate = new java.sql.Timestamp(200000L)
    val text = "the quick brown fox jumps over the lazy dog today and tomorrow"
    val other = "completely different text about spark query engines here now"
    val out = Dedup.simhashDedupStream(
      mem.toDF().toDF("doc_id", "text", "ts"), "doc_id", "text", n = 3,
      eventTimeCol = Some("ts"), delay = "5 seconds")
    val sq = out.writeStream.format("memory")
      .queryName("simhash_stream_out").outputMode("append").start()
    try {
      mem.addData((1L, text, t0), (2L, other, t0))
      sq.processAllAvailable()
      // identical doc in a LATER micro-batch: band state must remember
      mem.addData((3L, text, t0))
      sq.processAllAvailable()
      // far-future row advances the watermark past the first window
      mem.addData((99L, "x y z q r s t u v w", tLate))
      sq.processAllAvailable()
    } finally sq.stop()
    val kept = spark.table("simhash_stream_out")
      .collect().map(_.getLong(0)).toSet
    assert(kept.contains(1L) && kept.contains(2L))
    assert(!kept.contains(3L))
  }

  test("minhashLshPairs agrees with the exact inverted-index answer") {
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(lsh === exact)
  }

  test("simhashPairs: identical docs at hamming 0; near-dups within budget") {
    val s = spark
    import s.implicits._
    // long docs (many shingles) so per-bit majorities are stable: 1↔2
    // differ in one word of fifty, 3 is an exact copy of 1, 4 unrelated.
    val base = (1 to 50).map(i => s"w$i").mkString(" ")
    val nearDup = base.replace("w25", "changed")
    val other = (1 to 50).map(i => s"v$i").mkString(" ")
    val d = Seq((1L, base), (2L, nearDup), (3L, base), (4L, other))
      .toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(d, "doc_id", "text", 3, maxHamming = 12)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(pairs((1L, 3L)) === 0) // exact copies → identical signature
    assert(pairs.contains((1L, 2L)) && pairs((1L, 2L)) <= 12)
    assert(!pairs.keySet.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("simhashPairs maxBucket guard drops degenerate buckets, keeps normal pairs") {
    val s = spark
    import s.implicits._
    val base = (1 to 50).map(i => s"w$i").mkString(" ")
    val other = (1 to 50).map(i => s"v$i").mkString(" ")
    // 10 exact copies of `base` form a size-10 bucket in EVERY band; the
    // (100, 101) pair of `other` copies sits in small buckets
    val d = ((1L to 10L).map(i => (i, base)) ++ Seq((100L, other), (101L, other)))
      .toDF("doc_id", "text")
    val guarded = Dedup.simhashPairs(d, "doc_id", "text", 3, maxHamming = 3,
        maxBucket = Some(5))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(guarded === Set((100L, 101L))) // degenerate bucket dropped
    val unguarded = Dedup.simhashPairs(d, "doc_id", "text", 3, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(unguarded.size === 45 + 1) // all 10-choose-2 pairs + (100,101)
  }

  test("simhash signature is a stable deterministic long per content") {
    val a = Dedup.simhashSignatures(docs, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Dedup.simhashSignatures(docs, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
    assert(a(3L) === a(4L))
    assert(a(1L) !== a(3L))
  }

  test("maxDocFreq drops ubiquitous shingles from the posting list") {
    val s = spark
    import s.implicits._
    // "x y z" appears in all 3 docs → dropped at maxDocFreq=2; docs 1/2
    // still pair through their other shared shingles.
    val d = Seq(
      (1L, "x y z a b c d e"),
      (2L, "x y z a b c d f"),
      (3L, "x y z q r s t u")
    ).toDF("doc_id", "text")
    val strict = Dedup.ngramJaccardPairs(d, "doc_id", "text", 3, 0.3, maxDocFreq = Some(2))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(strict === Set((1L, 2L)))
  }

  test("containment catches a small doc embedded in a big one that Jaccard misses") {
    val s = spark
    import s.implicits._
    val small = "alpha beta gamma delta epsilon"
    val big = small + " " + (1 to 40).map(i => s"w$i").mkString(" ")
    val d = Seq((1L, small), (2L, big), (3L, "totally unrelated words only here"))
      .toDF("doc_id", "text")
    // small: 3 shingles, all present in big (43 shingles) → containment 1.0,
    // Jaccard 3/43 ≈ 0.07
    val cont = Dedup.ngramContainmentPairs(d, "doc_id", "text", 3, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(cont === Set((1L, 2L, 1.0)))
    val jac = Dedup.ngramJaccardPairs(d, "doc_id", "text", 3, 0.5).count()
    assert(jac === 0)
  }

  test("lshPairsAgainstIndex: new batch probes corpus index, cross-set pairs only") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "completely different text about spark query engines here"),
      (3L, "another unrelated corpus document about weather patterns now")
    ).toDF("doc_id", "text")
    val newBatch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog today"),    // copy of 1
      (11L, "the quick brown fox jumps over the lazy dog tonight"),  // near-dup of 1
      (12L, "genuinely novel content that matches nothing in corpus"),
      (13L, "genuinely novel content that matches nothing in corpus") // dup WITHIN batch — not a cross pair
    ).toDF("doc_id", "text")
    val index = Dedup.minhashBandIndex(corpus, "doc_id", "text", n = 3)
    val out = Dedup.lshPairsAgainstIndex(newBatch, "doc_id", "text", corpus, index,
      n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(out.map(p => (p._1, p._2)) === Set((10L, 1L), (11L, 1L)))
    assert(out.find(_._1 == 10L).get._3 === 1.0)
    // and it agrees with the exact cross-set Jaccard answer
    val exactCross = Dedup.ngramJaccardPairs(
        corpus.unionByName(newBatch), "doc_id", "text", 3, 0.5)
      .filter(col("id2") >= 10 && col("id1") < 10)
      .collect().map(r => (r.getLong(1), r.getLong(0), r.getDouble(2))).toSet
    assert(out === exactCross)
  }

  test("dupClustersBest keeps the highest-scoring cluster member; ties → min id") {
    val s = spark
    import s.implicits._
    val pairs = Seq((1L, 2L), (2L, 6L), (3L, 4L)).toDF("id1", "id2")
    val scored = Seq((1L, 0.1), (2L, 0.9), (6L, 0.4), // cluster 1: best is 2
      (3L, 0.5), (4L, 0.5),                           // cluster 3: tie → 3
      (5L, 0.0)                                       // singleton survives
    ).toDF("doc_id", "quality")
    val out = Dedup.dupClustersBest(scored, "doc_id", "quality", pairs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out(1L) === (1L, false) && out(2L) === (1L, true) && out(6L) === (1L, false))
    assert(out(3L) === (3L, true) && out(4L) === (3L, false))
    assert(out(5L) === (5L, true))
  }

  test("hammingBandPairs rejects maxHamming >= bands (pigeonhole recall broken)") {
    val s = spark
    import s.implicits._
    val sig = Seq((1L, 0L)).toDF("id", "sig")
    val ex = intercept[IllegalArgumentException] {
      Dedup.hammingBandPairs(sig, "id", "sig", maxHamming = 4, bands = 4)
    }
    assert(ex.getMessage.contains("pigeonhole"))
  }

  test("exactIncremental: in-batch self-dedup then corpus-hash anti-join") {
    val s = spark
    import s.implicits._
    val corpus = Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "alpha"),                 // re-ingest of corpus content → dropped
      (12L, "gamma"), (11L, "gamma"), // in-batch dupe → min id survives
      (13L, "delta")
    ).toDF("doc_id", "text")
    val out = Dedup.exactIncremental(batch, "doc_id", "text", corpus, "text")
      .collect().map(r => r.getAs[Long]("keep_id") -> r.getAs[Long]("n_copies"))
      .toMap
    assert(out === Map(11L -> 2L, 13L -> 1L))
  }

  test("crossNearDupPairs is strictly one-sided and Jaccard-exact") {
    val s = spark
    import s.implicits._
    // corpus docs 1,2 are near-dups of EACH OTHER (must NOT be reported);
    // doc 1 shares all its 3-grams with eval doc 100 (J = 1); doc 3 is
    // unrelated. Eval docs 100,101 are near-dups of each other too —
    // also must not be reported.
    val corpus = Seq(
      (1L, "the quick brown fox jumps high"),
      (2L, "the quick brown fox jumps higher"),
      (3L, "completely different text entirely here")).toDF("doc_id", "text")
    val eval_ = Seq(
      (100L, "the quick brown fox jumps high"),
      (101L, "the quick brown fox jumps high today")).toDF("doc_id", "text")
    val got = Dedup.crossNearDupPairs(corpus, eval_, "doc_id", "text",
        n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val ids = got.map(t => (t._1, t._2)).toSet
    assert(ids.contains((1L, 100L)))
    assert(got.find(t => t._1 == 1L && t._2 == 100L).get._3 === 1.0)
    assert(!ids.exists(p => p._1 == 3L), "unrelated doc must not pair")
    assert(ids.forall(p => p._1 <= 3L && p._2 >= 100L), "pairs must cross sides")
  }

  test("crossNearDupPairs guarded == exact when cutoff exceeds every df") {
    val s = spark
    import s.implicits._
    val corpus = Seq((1L, "a b c d e f"), (2L, "a b c d x y")).toDF("doc_id", "text")
    val eval_ = Seq((9L, "a b c d e f")).toDF("doc_id", "text")
    def run(m: Option[Int]) = Dedup.crossNearDupPairs(corpus, eval_,
        "doc_id", "text", n = 3, threshold = 0.3, maxDocFreq = m)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(run(None) === run(Some(100)))
  }

  test("fuzzyDecontaminate drops exactly the flagged corpus docs") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      (1L, "what is the capital of france exactly"),
      (2L, "trains are a popular mode of transport"),
      (3L, "the capital of france is paris obviously")).toDF("doc_id", "text")
    val eval_ = Seq((50L, "what is the capital of france exactly")).toDF("doc_id", "text")
    val kept = Dedup.fuzzyDecontaminate(corpus, eval_, "doc_id", "text",
        n = 3, threshold = 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(2L, 3L)) // doc 1 is a verbatim eval leak
  }

  test("lshPairsAgainstStored: persisted artifacts give the identical answer to the fresh index") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six seven")).toDF("doc_id", "text")
    val newB = Seq(
      (10L, "alpha beta gamma delta epsilon zeta"),  // exact copy of 1
      (11L, "totally different words here now")).toDF("doc_id", "text")
    val fresh = Dedup.lshPairsAgainstIndex(newB, "doc_id", "text", corpus,
        Dedup.minhashBandIndex(corpus, "doc_id", "text", n = 3),
        n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val dir = java.nio.file.Files.createTempDirectory("graft_lshidx").toString
    Dedup.minhashBandIndex(corpus, "doc_id", "text", n = 3)
      .write.parquet(s"$dir/idx")
    Dedup.gramSetsFor(corpus, "doc_id", "text", n = 3)
      .write.parquet(s"$dir/grams")
    val stored = Dedup.lshPairsAgainstStored(newB, "doc_id", "text",
        s.read.parquet(s"$dir/grams"), s.read.parquet(s"$dir/idx"),
        n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(stored === fresh)
    assert(stored === Set((10L, 1L)))
  }

  test("explainPairs: deterministic lexicographic evidence for merged pairs") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta zeta"),
      (3L, "one two three four five")).toDF("doc_id", "text")
    val got = Dedup.explainPairs(docs, "doc_id", "text", n = 3,
        threshold = 0.3, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getString(3)).toMap
    // shared trigrams: "alpha beta gamma", "beta gamma delta" — the 2
    // lexicographically-first shared shingles, pipe-joined
    assert(got((1L, 2L)) === "alpha beta gamma | beta gamma delta")
    assert(!got.keySet.exists(p => p._1 == 3L || p._2 == 3L))
    intercept[IllegalArgumentException](
      Dedup.explainPairs(docs, "doc_id", "text", 3, 0.3, k = 0))
  }
}
