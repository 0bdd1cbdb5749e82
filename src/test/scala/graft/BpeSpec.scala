package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Bpe

class BpeSpec extends SparkTestBase {

  test("train learns the hand-computable merges on a tiny corpus") {
    val s = spark
    import s.implicits._
    // "low lower lowest low low": pair counts round 1 —
    // (l,o) 5, (o,w) 5, (w,e) 2, (e,r) 1, (e,s) 1, (s,t) 1
    val docs = Seq("low lower lowest low low", "low lower").toDF("text")
    val merges = Bpe.train(docs, "text", 3)
    assert(merges.map(m => (m.step, m.a, m.b, m.cnt)) == Seq(
      (1, "l", "o", 7L),    // lo   (tie with (o,w) broken by a asc)
      (2, "lo", "w", 7L),   // low
      (3, "low", "e", 3L))) // lowe — beats (e,r) at 2
  }

  test("merge fold semantics: consecutive and overlapping pairs") {
    val s = spark
    import s.implicits._
    // aaaa -> (a,a) appears 3 times (overlapping count), merge is
    // left-greedy: [aa, aa]; then (aa,aa) merges to [aaaa]
    val docs = Seq("aaaa").toDF("text")
    val merges = Bpe.train(docs, "text", 2)
    assert(merges.map(m => (m.a, m.b, m.cnt, m.toksAfter)) == Seq(
      ("a", "a", 3L, 2L), ("aa", "aa", 1L, 1L)))
  }

  test("vocab: final token types, counts weighted by word frequency, dense ids") {
    val s = spark
    import s.implicits._
    val docs = Seq("low lower lowest low low", "low lower").toDF("text")
    val merges = Bpe.train(docs, "text", 3) // lo, low, lowe
    val v = Bpe.vocab(docs, "text", merges)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // reps: low(4)->[low]; lower(2)->[lowe,r]; lowest(1)->[lowe,s,t]
    assert(v.toSet === Set(
      ("low", 4L, 1L), ("lowe", 3L, 2L), ("r", 2L, 3L),
      ("s", 1L, 4L), ("t", 1L, 5L)))
    // each merge mints exactly one new token type: |vocab| <= chars + k
    val chars = docs.selectExpr("explode(split(text, ''))")
      .where(col("col") =!= " ").distinct().count()
    assert(v.length <= chars + merges.length)
  }

  test("toks_after decreases by cnt each step; tokenCount replays training") {
    val s = spark
    import s.implicits._
    val docs = Seq("spark scala spark", "spark row scan", "scala scan scan")
      .toDF("text")
    val merges = Bpe.train(docs, "text", 4)
    val init = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .agg(sum(length(col("w")))).as[Long].head()
    var prev = init
    merges.foreach { m =>
      assert(m.toksAfter == prev - m.cnt,
        s"step ${m.step}: ${m.toksAfter} != $prev - ${m.cnt}")
      prev = m.toksAfter
    }
    // serve-time tokenizer agrees with the training loop's count
    val served = docs.select(Bpe.tokenCount(col("text"), merges).as("n"))
      .agg(sum("n")).as[Long].head()
    assert(served == merges.last.toksAfter)
    // and with no merges, it counts characters
    val chars = docs.select(Bpe.tokenCount(col("text"), Nil).as("n"))
      .agg(sum("n")).as[Long].head()
    assert(chars == init)
  }

  test("encode: ordered token rows reassemble every doc; ids match vocab; count matches tokenCount") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "low lower lowest"), (2L, "low low"), (3L, ""))
      .toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", 3)
    val v = Bpe.vocab(docs, "text", merges)
    val enc = Bpe.encode(docs, "doc_id", "text", merges, v)
    // concatenating tokens in pos order reproduces the text minus spaces
    val rebuilt = enc.orderBy("doc_id", "pos")
      .groupBy("doc_id").agg(concat_ws("", collect_list("token")).as("txt"))
      .as[(Long, String)].collect().toMap
    assert(rebuilt(1L) === "lowlowerlowest")
    assert(rebuilt(2L) === "lowlow")
    assert(!rebuilt.contains(3L)) // empty doc yields no tokens
    // every token id matches the vocab assignment
    val vm = v.as[(String, Long, Long)].collect()
      .map { case (t, _, i) => t -> i }.toMap
    enc.as[(Long, Long, String, Long)].collect().foreach {
      case (_, _, tok, id) => assert(vm(tok) === id)
    }
    // positions are 1..n dense per doc
    val pos = enc.filter(col("doc_id") === 1).orderBy("pos")
      .select("pos").as[Long].collect()
    assert(pos === (1L to pos.length).toArray)
    // row count agrees with the serve-time tokenCount fold
    val n1 = enc.count()
    val n2 = docs.select(Bpe.tokenCount(col("text"), merges).as("n"))
      .agg(sum("n")).as[Long].head()
    assert(n1 === n2)
  }

  test("trainLocal matches the distributed loop merge-for-merge (incl. early stop)") {
    val s = spark
    import s.implicits._
    val docs = Seq("low lower lowest low low", "low lower",
      "newer newest new widest wide wide").toDF("text")
    val dist = Bpe.train(docs, "text", 12)
    val local = Bpe.trainLocal(docs, "text", 12)
    assert(local === dist)
    // a merge count past exhaustion stops at the same step on both paths
    val distAll = Bpe.train(Seq("ab ab ba").toDF("text"), "text", 50)
    val localAll = Bpe.trainLocal(Seq("ab ab ba").toDF("text"), "text", 50)
    assert(localAll === distAll)
    assert(localAll.size < 50)
  }

  test("randomized differential: trainLocal == train on random corpora across shapes") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(5150L)
    for (trial <- 1 to 3) {
      // random words over a tiny alphabet force heavy pair ties — the
      // (cnt desc, a, b) tie-break must agree between the paths
      val vocab = (1 to 12).map(_ =>
        (1 to (2 + rnd.nextInt(6))).map(_ => "abc"(rnd.nextInt(3))).mkString)
      val docs = (1 to 15).map(_ =>
        (1 to (3 + rnd.nextInt(8))).map(_ => vocab(rnd.nextInt(vocab.size)))
          .mkString(" ")).toDF("text")
      val nm = 4 + trial * 3
      val dist = Bpe.train(docs, "text", nm)
      val local = Bpe.trainLocal(docs, "text", nm)
      assert(local === dist, s"trial $trial (numMerges=$nm) diverged")
    }
  }

  test("trainLocal tie-break matches train on supplementary-plane vs U+E000 ties") {
    val s = spark
    import s.implicits._
    // pair (a, U+E000) ties pair (a, U+1F600) at count 1. Spark's UTF8String
    // (UTF-8 byte) order puts U+E000 (EE 80 80) BELOW U+1F600 (F0 9F 98 80);
    // JVM UTF-16 code-unit order puts the surrogate pair (D83D DE00)
    // below U+E000 — the one divergence window the local loop had.
    val pua = "\uE000"                                  // EE 80 80
    val smiley = new String(Character.toChars(0x1F600)) // F0 9F 98 80
    val docs = Seq(s"a$pua a$smiley").toDF("text")
    val dist = Bpe.train(docs, "text", 2)
    val local = Bpe.trainLocal(docs, "text", 2)
    assert(local === dist)
    assert(dist.head.b === pua) // UTF-8 byte order picks U+E000 first
  }

  test("trainLocal vocab guard trips loudly; trainAuto falls back to distributed") {
    val s = spark
    import s.implicits._
    val docs = (1 to 50).map(i => s"w$i x$i").toDF("text")
    val e = intercept[IllegalArgumentException] {
      Bpe.trainLocal(docs, "text", 2, maxVocabRows = 10L)
    }
    assert(e.getMessage.contains("distinct words") &&
      e.getMessage.contains("Bpe.train"), e.getMessage)
    // the fallback dispatches on the dedicated TYPE, not message text —
    // rewording the message must not be able to disable it
    assert(e.isInstanceOf[Bpe.VocabOverflowException])
    // auto path completes via the distributed loop under the same bound
    val auto = Bpe.trainAuto(docs, "text", 2, maxVocabRows = 10L)
    assert(auto === Bpe.train(docs, "text", 2))
  }
}
