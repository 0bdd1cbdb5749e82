package graft

import graft.pipeline.TextAnalysis
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkTestBase {

  private lazy val docs = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "the cat and the dog ran to the house of cards"),
      (2L, "le chat et la maison est une belle chose pour un jour"),
      (3L, "der hund und die katze ist ein tier"),
      (4L, "你好 世界 这 是 中文"),
      (5L, "zzz qqq www"),
      (6L, "mixed42 tokens, with punct! and digits 7")
    ).toDF("doc_id", "text")
  }

  test("bm25TopK ranks by term relevance and matches the hand formula") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      (1L, "cat cat cat dog"),        // heavy on cat
      (2L, "cat dog bird fish mouse"),
      (3L, "dog dog dog dog"),
      (4L, "bird fish mouse horse")   // no query terms
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bm25TopK(corpus, "doc_id", "text", Seq("cat"), k = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    // ranking: doc 1 (tf 3) > doc 2 (tf 1) > docs 3,4 (tf 0, score 0)
    assert(out.map(_._1).take(2) === Seq(1L, 2L))
    assert(out.drop(2).forall(_._2 === 0.0))
    // hand-check doc 2: N=4, df=2, dl=5, avgdl=17/4
    val idf = math.log((4 - 2 + 0.5) / (2 + 0.5) + 1.0)
    val expected = idf * (1.0 * 2.2) / (1.0 + 1.2 * (0.25 + 0.75 * 5 / (17.0 / 4)))
    assert(math.abs(out.toMap.apply(2L) - expected) < 1e-12)
  }

  test("bm25TopK multi-term: per-term idf weights rare terms higher") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      (1L, "rare common common"),
      (2L, "common common common"),
      (3L, "common other other"),
      (4L, "other other other")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bm25TopK(corpus, "doc_id", "text",
      Seq("rare", "common"), k = 4).collect().map(_.getLong(0))
    // doc 1 holds the rare term → top; 4 has neither → bottom
    assert(out.head === 1L)
    assert(out.last === 4L)
  }

  test("native winnow_fingerprint is bit-identical to the composable form") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val alphabet = Seq("a", "b", "cd", "é", "字", "")
    val strs = (1 to 150).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(14))(alphabet(rnd.nextInt(alphabet.size))).mkString(" "))
    } :+ (999L, null.asInstanceOf[String])
    val df = strs.toDF("doc_id", "text")
    for ((k, w) <- Seq((3, 4), (2, 2), (1, 3))) {
      graft.functions.TextFunctions.ensure(s)
      val native = df.select(col("doc_id"),
        graft.functions.TextFunctions.winnowFingerprint(col("text"), k, w).as("f"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val composable = df.select(col("doc_id"),
        TextAnalysis.winnowComposable(col("text"), k, w).as("f"))
        .collect().map(r => r.getLong(0) ->
          Option(r.getSeq[Long](1)).getOrElse(Seq.empty)).toMap
      assert(native === composable, s"parity failed at k=$k w=$w")
    }
  }

  test("repetitionStats: repeated n-grams raise the ratio, short docs are 0") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      (1L, "a b c a b c a b"),  // 6 grams, 3 distinct (abc bca cab) → 0.5
      (2L, "u v w x y z"),      // 4 grams all distinct → 0.0
      (3L, "a b")               // no grams → 0.0
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionStats(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) === ((6L, 3L, 0.5)))
    assert(out(2L) === ((4L, 4L, 0.0)))
    assert(out(3L) === ((0L, 0L, 0.0)))
  }

  test("benchmarkOverlap flags docs sharing n-grams with the benchmark") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      (10L, "the quick brown fox jumps high"),
      (11L, "a completely unrelated piece of text"),
      (12L, "quick brown fox jumps")  // 2 shared grams with bench 1
    ).toDF("doc_id", "text")
    val bench = Seq((1L, "the quick brown fox sleeps")).toDF("bid", "text")
    val out = TextAnalysis.benchmarkOverlap(corpus, "doc_id", "text",
      bench, "bid", "text", n = 3, minOverlap = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // doc 10 shares "the quick brown" + "quick brown fox"; doc 12 only
    // "quick brown fox"; doc 11 nothing
    assert(out === Map((10L, 1L) -> 2L))
  }

  test("benchmarkOverlapBloom equals the exact path even with a tiny filter") {
    val s = spark
    import s.implicits._
    val corpus = (0L until 200L).map { i =>
      (i, s"filler${i} tokens about topic${i % 7} item${i} end${i}")
    }.toDF("doc_id", "text")
      .union(Seq(
        (500L, "the quick brown fox jumps high"),
        (501L, "quick brown fox jumps over things")).toDF("doc_id", "text"))
    val bench = Seq((1L, "the quick brown fox jumps")).toDF("bid", "text")
    val exact = TextAnalysis.benchmarkOverlap(corpus, "doc_id", "text",
      bench, "bid", "text", n = 3, minOverlap = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // 64 bits for ~800 corpus grams: false positives are certain, so this
    // certifies the verify join actually removes them.
    val bloomed = TextAnalysis.benchmarkOverlapBloom(corpus, "doc_id", "text",
      bench, "bid", "text", n = 3, minOverlap = 1,
      estimatedGrams = 8, numBits = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(bloomed === exact)
    assert(exact.contains((500L, 1L)) && exact.contains((501L, 1L)))
  }

  test("langId: marker languages, CJK, and und are all detected") {
    val out = TextAnalysis.langId(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(5)).toMap
    assert(out === Map(1L -> "en", 2L -> "fr", 3L -> "de", 4L -> "zh", 5L -> "und", 6L -> "en"))
  }

  test("textStats: counts and ratios") {
    val row = TextAnalysis.textStats(docs, "doc_id", "text")
      .filter(col("doc_id") === 1L).collect()(0)
    assert(row.getLong(1) === 45L)  // chars
    assert(row.getLong(2) === 11L)  // words
    assert(row.getDouble(4) === 6.0 / 11.0) // the×3, and, to, of
  }

  test("tokenCount splits letter runs, digit runs, and symbols") {
    val s = spark
    import s.implicits._
    val df = Seq(Tuple1("ab12cd, x!")).toDF("t")
    // ab | 12 | cd | , | x | ! → 6
    assert(df.select(TextAnalysis.tokenCount(col("t"))).collect()(0).getInt(0) === 6)
  }

  test("fingerprints: identical docs share fp_hash; edits preserve overlap") {
    val s = spark
    import s.implicits._
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val edited = base.replace("w15", "x")
    val d = Seq((1L, base), (2L, base), (3L, edited)).toDF("doc_id", "text")
    val fp = TextAnalysis.fingerprints(d, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getSeq[Long](1), r.getLong(3))).toMap
    assert(fp(1L)._2 === fp(2L)._2) // identical → identical fingerprint hash
    val sim = d.filter(col("doc_id").isin(1L, 3L))
    val fps = TextAnalysis.fingerprints(sim, "doc_id", "text")
    val pair = fps.as("a").join(fps.as("b"),
        col("a.doc_id") < col("b.doc_id"))
      .select(TextAnalysis.fingerprintSimilarity(col("a.fingerprint"), col("b.fingerprint")))
      .collect()(0).getDouble(0)
    assert(pair > 0.5 && pair < 1.0) // local edit: high but not full overlap
  }

  test("fingerprints: short docs degrade gracefully") {
    val s = spark
    import s.implicits._
    val d = Seq((1L, "a b c d"), (2L, "a b"), (3L, "")).toDF("doc_id", "text")
    val fp = TextAnalysis.fingerprints(d, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(fp(1L) === 1) // 2 grams < w → single min
    assert(fp(2L) === 0) // shorter than k → empty
    assert(fp(3L) === 0)
  }

  test("redactPii scrubs emails, IPv4s, and phones; counts each category") {
    val s = spark
    import s.implicits._
    val d = Seq(
      (1L, "mail alice.smith+x@corp.example.org and bob@ex.io now"),
      (2L, "from 192.168.0.1 to 10.0.0.255 end"),
      (3L, "call +14155551234 or +4930123456 today"),
      (4L, "no pii here at all"),
      (5L, "mixed a@b.co 1.2.3.4 +1234567 done")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.redactPii(d, "doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(1L) === ("mail <EMAIL> and <EMAIL> now", 2L, 0L, 0L))
    assert(out(2L) === ("from <IP> to <IP> end", 0L, 2L, 0L))
    assert(out(3L) === ("call <PHONE> or <PHONE> today", 0L, 0L, 2L))
    assert(out(4L) === ("no pii here at all", 0L, 0L, 0L))
    assert(out(5L) === ("mixed <EMAIL> <IP> <PHONE> done", 1L, 1L, 1L))
  }

  test("chunkOverlap: consecutive chunks share `overlap` tokens; tail may be short") {
    val s = spark
    import s.implicits._
    // 10 tokens, chunk 4, overlap 2 → starts 0,2,4,6,8
    val d = Seq(
      (1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"),
      (2L, "a b"),   // single short chunk
      (3L, "")       // no chunks
    ).toDF("doc_id", "text")
    val out = TextAnalysis.chunkOverlap(d, "doc_id", "text", chunk = 4, overlap = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))
    val doc1 = out.filter(_._1 == 1L).sortBy(_._2)
    assert(doc1.map(c => (c._3, c._4)).toSeq ===
      Seq((0, 4), (2, 4), (4, 4), (6, 4), (8, 2)))
    assert(doc1.head._5 === "t0 t1 t2 t3")
    assert(doc1(1)._5 === "t2 t3 t4 t5") // overlaps previous by 2 tokens
    assert(doc1.last._5 === "t8 t9")     // short tail, nothing lost
    assert(out.filter(_._1 == 2L).toSeq === Seq((2L, 0, 0, 2, "a b")))
    assert(!out.exists(_._1 == 3L))
    // every token index is covered by at least one chunk
    val covered = doc1.flatMap(c => c._3 until (c._3 + c._4)).toSet
    assert(covered === (0 until 10).toSet)
  }

  test("chunkOverlap invariants hold on random docs x (chunk, overlap) configs") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(23)
    val docs = (1 to 120).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(60) + 1)(s"w${rnd.nextInt(9)}").mkString(" "))
    }
    val nToks = docs.map { case (id, t) => id -> t.split(" ", -1).length }.toMap
    val df = docs.toDF("doc_id", "text")
    for ((chunk, overlap) <- Seq((8, 0), (8, 4), (16, 15), (5, 2))) {
      val step = chunk - overlap
      val out = TextAnalysis.chunkOverlap(df, "doc_id", "text", chunk, overlap)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))
      out.groupBy(_._1).foreach { case (id, cs) =>
        val n = nToks(id)
        val sorted = cs.sortBy(_._2)
        // chunk_idx is dense from 0; start = idx * step; len = min(chunk, n - start)
        sorted.zipWithIndex.foreach { case ((_, idx, start, len, text), i) =>
          assert(idx === i && start === i * step)
          assert(len === math.min(chunk, n - start) && len >= 1)
          assert(text.split(" ", -1).length === len)
        }
        // full coverage, no token lost, no start beyond the doc
        assert(sorted.last._3 < n)
        assert(sorted.flatMap(c => c._3 until (c._3 + c._4)).toSet === (0 until n).toSet)
        // when a chunk is full, the next one shares exactly `overlap` tokens
        sorted.sliding(2).foreach {
          case Array(a, b) if a._4 == chunk =>
            assert(b._3 === a._3 + step)
            assert(a._3 + a._4 - b._3 === overlap)
          case _ => ()
        }
      }
    }
  }

  test("qualityRules: metrics and per-rule verdicts match hand computation") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "the cat and the dog ran to a tree"),   // 9 words, stopword-rich → pass
      (2L, "one two"),                             // too few words
      (3L, "pneumonoultramicroscopics volcanoconiosisy supercalifragilistic expialidocious antidisestablishment"), // mean len > 10, no stopwords
      (4L, "# # # the # and # a # of #"),          // symbol soup
      (5L, "1 2 3 4 5 the and 6 7 8 9 10 11 12")   // alpha frac low (2/14)
    ).toDF("doc_id", "text")
    val out = TextAnalysis.qualityRules(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Boolean]("pass"))
    assert(out(1L).getAs[Long]("n_words") === 9L)
    assert(math.abs(out(1L).getAs[Double]("mean_word_len") - 25.0 / 9) < 1e-12)
    assert(out(1L).getAs[Long]("stop_hits") === 5L) // the×2, and, to, a
    assert(!out(2L).getAs[Boolean]("ok_words") && !out(2L).getAs[Boolean]("pass"))
    assert(!out(3L).getAs[Boolean]("ok_mean_len") && !out(3L).getAs[Boolean]("ok_stop"))
    assert(!out(4L).getAs[Boolean]("ok_symbols"))
    assert(out(4L).getAs[Double]("symbol_ratio") === 7.0 / 11)
    assert(!out(5L).getAs[Boolean]("ok_alpha"))
    assert(out(5L).getAs[Double]("alpha_frac") === 2.0 / 14)
  }

  test("unigramLogProb: hand-checked two-doc corpus; stop-soup outscores rare") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "a a a b"),
      (2L, "b c")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.unigramLogProb(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    // corpus: a=3, b=2, c=1, N=6
    val ll1 = 3 * math.log(3.0 / 6) + math.log(2.0 / 6)
    val ll2 = math.log(2.0 / 6) + math.log(1.0 / 6)
    assert(out(1L).getAs[Long]("n_toks") === 4L)
    assert(math.abs(out(1L).getAs[Double]("ll") - ll1) < 6e-5)
    assert(math.abs(out(2L).getAs[Double]("avg_ll") - ll2 / 2) < 6e-5)
    // common-token doc scores higher per token than the rare-token doc
    assert(out(1L).getAs[Double]("avg_ll") > out(2L).getAs[Double]("avg_ll"))
  }

  test("bigramLogProb: hand-checked corpus; scrambled word order scores lower") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "the cat sat"),
      (2L, "the cat ran"),
      (3L, "the sat cat"), // scrambled: rare continuations of common contexts
      (4L, "the cat sat"),
      (5L, "x")            // single token: no bigrams, omitted
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLogProb(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(!out.contains(5L))
    // bigrams: (the,cat)=3 (cat,sat)=2 (cat,ran)=1 (the,sat)=1 (sat,cat)=1
    // ctx: the=4, cat=3, sat=1
    val ll1 = math.log(3.0 / 4) + math.log(2.0 / 3)
    assert(out(1L).getAs[Long]("n_bigrams") === 2L)
    assert(math.abs(out(1L).getAs[Double]("ll2") - ll1) < 6e-5)
    // doc 3 picks the RARE continuation of 'the' -> strictly lower avg
    assert(out(3L).getAs[Double]("avg_ll2") < out(1L).getAs[Double]("avg_ll2"))
  }

  test("tfidfTopTerms: idf zeroes ubiquitous terms; rare term ranks first") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "common common rare"),
      (2L, "common other"),
      (3L, "common other")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfTopTerms(df, "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getInt(3)) ->
        (r.getString(1), r.getDouble(2))).toMap
    // 'common' is in all 3 docs: idf = ln(1) = 0 everywhere
    val (t1, s1) = out((1L, 1))
    assert(t1 === "rare" && math.abs(s1 - math.log(3.0)) < 6e-5)
    assert(out((1L, 2))._2 === 0.0) // 'common', tf 2 x idf 0
    // doc 2: 'other' (df 2) beats 'common' (idf 0)
    assert(out((2L, 1))._1 === "other")
  }

  test("dsirWeights: docs made of target-domain tokens weigh positive") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "alpha alpha beta", "tgt"),
      (2L, "alpha beta gamma", "tgt"),
      (3L, "delta delta epsilon", "bg"),
      (4L, "alpha beta delta", "bg"),
      (5L, "delta epsilon epsilon", "bg")
    ).toDF("doc_id", "text", "source")
    val out = TextAnalysis.dsirWeights(df, "doc_id", "text", "source", Seq("tgt"))
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("weight")).toMap
    // hand formula: V=5, N_b=15, N_t=6; p_t(tok)=(cnt_t+1)/11, p_b=(cnt_b+1)/20
    def w(toks: (String, Int)*): Double = {
      val cntT = Map("alpha" -> 3, "beta" -> 2, "gamma" -> 1).withDefaultValue(0)
      val cntB = Map("alpha" -> 4, "beta" -> 3, "gamma" -> 1, "delta" -> 4, "epsilon" -> 3)
      toks.map { case (t, c) =>
        c * (math.log((cntT(t) + 1.0) / 11) - math.log((cntB(t) + 1.0) / 20))
      }.sum
    }
    assert(math.abs(out(1L) - w("alpha" -> 2, "beta" -> 1)) < 6e-5)
    assert(math.abs(out(3L) - w("delta" -> 2, "epsilon" -> 1)) < 6e-5)
    // target-style docs rank above background-only docs
    assert(out(1L) > 0 && out(2L) > 0)
    assert(out(3L) < 0 && out(5L) < 0)
  }

  test("charEntropy: known closed-form values") {
    val s = spark
    import s.implicits._
    val out = Seq((1L, "aaaa"), (2L, "ab"), (3L, "abcd"), (4L, "aab"))
      .toDF("doc_id", "text")
      .select($"doc_id", TextAnalysis.charEntropy($"text").as("h"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) === 0.0)         // single symbol
    assert(out(2L) === 1.0)         // two equiprobable symbols
    assert(out(3L) === 2.0)         // four equiprobable symbols
    // H(2/3, 1/3) = log2(3) - 2/3 ≈ 0.9183
    assert(out(4L) === 0.9183)
  }

  test("sourceQualityFilter keeps sources at or above the corpus mean, integer-exactly") {
    val s = spark
    import s.implicits._
    // srcA: 2 docs x 4 tokens (mean 4); srcB: 2 docs x 2 tokens (mean 2);
    // srcC: 1 doc x 3 tokens (mean 3). Global: 15 tokens / 5 docs = 3.
    // Kept: srcA (4 > 3) and srcC (3 >= 3, boundary inclusive); srcB dropped.
    val docs = Seq(
      (1L, "a b c d", "srcA"), (2L, "e f g h", "srcA"),
      (3L, "a b", "srcB"), (4L, "c d", "srcB"),
      (5L, "x y z", "srcC")).toDF("doc_id", "text", "source")
    val got = TextAnalysis.sourceQualityFilter(docs, "doc_id", "text", "source")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "srcA", 2L -> "srcA", 5L -> "srcC"))
  }

  test("qualityBlend ranks by blended per-lang percentiles and keeps topK") {
    val s = spark
    import s.implicits._
    // en: doc 1 long+diverse, doc 2 short+repetitive, doc 3 middling.
    // With topK=2 doc 2 (lowest on both signals) must be the one cut.
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "en"),
      (2L, "spam spam", "en"),
      (3L, "one two three two", "en"),
      (4L, "solo", "fr")).toDF("doc_id", "text", "lang")
    val out = TextAnalysis.qualityBlend(docs, "doc_id", "text", "lang", topK = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(4)))
    assert(out.toSet === Set(("en", 1L, 1L), ("en", 3L, 2L), ("fr", 4L, 1L)))
  }

  test("qualityBlend single-doc language gets percent_rank 0, never NaN") {
    val s = spark
    import s.implicits._
    val docs = Seq((9L, "only document here", "xx")).toDF("doc_id", "text", "lang")
    val r = TextAnalysis.qualityBlend(docs, "doc_id", "text", "lang", topK = 5)
      .collect()
    assert(r.length === 1 && r(0).getDouble(3) === 0.0)
  }

  test("cooccurWindow counts window-bounded unordered pairs with multiplicity") {
    val s = spark
    import s.implicits._
    // "a b a c": window=2 pairs per position:
    //   i=1 (a): (a,b), (a,a)   i=2 (b): (a,b), (b,c)   i=3 (a): (a,c)
    // → {a,b}:2  {a,a}:1  {b,c}:1  {a,c}:1
    val docs = Seq((1L, "a b a c")).toDF("doc_id", "text")
    val got = TextAnalysis.cooccurWindow(docs, "text", window = 2, minCount = 1L)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(got === Map(("a", "b") -> 2L, ("a", "a") -> 1L,
      ("b", "c") -> 1L, ("a", "c") -> 1L))
  }

  test("cooccurPairs native expression: randomized differential vs the composable form") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(20260814L)
    val vocab = Seq("a", "bb", "ccc", "", "Ω", "δδ", "x1", "zz") // incl. empty + unicode
    val docs = (1L to 120L).map { i =>
      val n = rnd.nextInt(12) // 0..11 tokens
      (i, (0 until n).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }.toDF("doc_id", "text")
    for (w <- Seq(1, 2, 5)) {
      // the original nested-lambda formulation, kept as the reference
      val ws = split(col("text"), " ")
      val composable = flatten(transform(sequence(lit(0), size(ws) - 2), i => {
        val w0 = element_at(ws, i + 1)
        transform(slice(ws, i + 2, lit(w)), t =>
          concat_ws(" ", least(w0, t), greatest(w0, t)))
      }))
      val ref = docs.filter(col("text") =!= "" && size(ws) >= 2)
        .select(explode(composable).as("p")).groupBy("p").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val native = docs.filter(col("text") =!= "")
        .select(explode(graft.functions.TextFunctions
          .cooccurPairs(col("text"), w)).as("p"))
        .groupBy("p").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(native === ref, s"window=$w")
    }
  }

  test("oovReport: deterministic vocab cut, per-doc OOV counts") {
    val s = spark
    import s.implicits._
    // vocab of 2: 'a' (3 hits) and 'b' (2 hits); 'c' and 'd' are OOV.
    val docs = Seq((1L, "a a b c"), (2L, "a b d")).toDF("doc_id", "text")
    val got = TextAnalysis.oovReport(docs, "doc_id", "text", vocabSize = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map(1L -> ((4L, 1L)), 2L -> ((3L, 1L))))
  }

  test("codeSwitch flags mixed-language docs, monolingual stays unflagged") {
    val s = spark
    import s.implicits._
    // doc 1: 4-word chunks — first chunk English markers, second French.
    // doc 2: all-English. doc 3: no markers at all → und, not switched.
    val docs = Seq(
      (1L, "the cat is big le chat est grand"),
      (2L, "the dog is very big and loud too"),
      (3L, "zzz yyy xxx www")).toDF("doc_id", "text")
    val out = TextAnalysis.codeSwitch(docs, "doc_id", "text", chunkWords = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getBoolean(5)))).toMap
    assert(out(1L) === ((2L, 2L, "en", true)))
    assert(out(2L) === ((2L, 1L, "en", false)))
    assert(out(3L) === ((1L, 0L, "und", false)))
  }

  test("codeSwitch dominant-language tie breaks deterministically (count, then name)") {
    val s = spark
    import s.implicits._
    // one en chunk, one fr chunk → tie on count 1; 'en' < 'fr' wins.
    val docs = Seq((1L, "the cat is big le chat est grand")).toDF("doc_id", "text")
    val r = TextAnalysis.codeSwitch(docs, "doc_id", "text", chunkWords = 4).collect()(0)
    assert(r.getString(3) === "en" && r.getLong(4) === 1L)
  }

  test("cooccurWindow ignores sub-2-token docs and honors minCount") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "x"), (2L, ""), (3L, "p q"), (4L, "p q")).toDF("doc_id", "text")
    val got = TextAnalysis.cooccurWindow(docs, "text", window = 3, minCount = 2L)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(got === Map(("p", "q") -> 2L))
  }

  test("unicode_normalize: NFC recomposes, NFD decomposes, null and fast paths hold") {
    val s = spark
    import s.implicits._
    import graft.functions.TextFunctions.unicodeNormalize
    import org.apache.spark.sql.functions.{col, length}
    val df = Seq(
      (1L, "a\u0301 plain"),        // decomposed a-acute
      (2L, "\u00e1 plain"),          // already composed (fast path)
      (3L, null.asInstanceOf[String])).toDF("id", "t")
    val got = df.select(col("id"),
        unicodeNormalize(col("t"), "NFC").as("nfc"),
        unicodeNormalize(col("t"), "NFD").as("nfd"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(got(1L)._1 === "\u00e1 plain")
    assert(got(2L)._1 === "\u00e1 plain")
    assert(got(1L)._2 === "a\u0301 plain")
    assert(got(2L)._2 === "a\u0301 plain")
    assert(got(3L) === ((null, null)))
    // SQL-name access through the registry
    graft.functions.TextFunctions.ensure(s)
    val viaSql = df.selectExpr("unicode_normalize(t, 'NFC') AS n")
      .collect().map(_.getString(0)).toSet
    assert(viaSql === Set("\u00e1 plain", null))
    // NFC canonicalization unifies the exact-dedup key
    assert(df.filter(col("t").isNotNull)
      .select(unicodeNormalize(col("t"), "NFC").as("k"))
      .distinct().count() === 1L)
  }

  test("calibrateScores: per-source percent rank, ties share, singleton is 0.0") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "s1", 10L), (2L, "s1", 20L), (3L, "s1", 20L), (4L, "s1", 40L),
      (5L, "s2", 999L)).toDF("doc_id", "source", "score")
    val got = TextAnalysis.calibrateScores(df, "doc_id", "source", "score")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got(1L) === 0.0)
    assert(got(2L) === got(3L), "ties share a calibrated value")
    assert(got(2L) === 1.0 / 3.0)
    assert(got(4L) === 1.0)
    assert(got(5L) === 0.0, "a single-doc source calibrates to 0.0")
  }
}
