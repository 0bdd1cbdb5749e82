package graft

import graft.pipeline.Sampling
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkTestBase {

  private lazy val rows = {
    val s = spark
    import s.implicits._
    (1L to 10000L).map(i => (i, if (i % 3 == 0) "en" else if (i % 3 == 1) "fr" else "de"))
      .toDF("id", "lang")
  }

  test("hashSample keeps ≈ fraction and is exactly stable under repartitioning") {
    val kept = Sampling.hashSample(rows, "id", 0.2)
    val n = kept.count()
    assert(math.abs(n - 2000) < 200, s"kept $n of 10000 at fraction 0.2")
    val ids1 = kept.collect().map(_.getLong(0)).toSet
    val ids2 = Sampling.hashSample(rows.repartition(17), "id", 0.2)
      .collect().map(_.getLong(0)).toSet
    assert(ids1 === ids2) // partitioning-independent, unlike df.sample
  }

  test("weightedSample matches the brute-force exponential-keys selection") {
    val s = spark
    import s.implicits._
    // weights 1..4 by id mod 4 (+1); brute-force the same A-ES keys locally
    val df = (1L to 2000L).map(i => (i, (i % 4 + 1).toDouble)).toDF("id", "w")
    def u(id: Long): Double = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex, 16) + 0.5) / 4294967296.0
    }
    val expected = (1L to 2000L)
      .map(i => i -> math.log(u(i)) / (i % 4 + 1).toDouble)
      .sortBy(-_._2).take(100).map(_._1).toSet
    val got = Sampling.weightedSample(df, "id", col("w"), k = 100)
      .collect().map(_.getLong(0)).toSet
    assert(got === expected)
    // heavier weights must be overrepresented: w=4 ids ≫ w=1 ids
    val byW = got.groupBy(i => i % 4 + 1).view.mapValues(_.size).toMap
    assert(byW.getOrElse(4L, 0) > byW.getOrElse(1L, 0))
  }

  test("weightedSample never selects non-positive or null weights") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 5.0), (2L, 0.0), (3L, -1.0), (4L, 2.0))
      .toDF("id", "w")
      .union(Seq((5L, Option.empty[Double])).toDF("id", "w"))
    val got = Sampling.weightedSample(df, "id", col("w"), k = 10)
      .collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 4L))
  }

  test("thresholdHex maps fractions to fixed-width lowercase hex") {
    assert(Sampling.thresholdHex(0.0) === "0000")
    assert(Sampling.thresholdHex(0.5) === "8000")
    assert(Sampling.thresholdHex(0.2) === "3333")
    // fraction 1.0 must beat every 4-char hex bucket lexicographically —
    // a 5-char "10000" would silently keep only buckets below "1000"
    assert(Sampling.thresholdHex(1.0) === "g")
    assert(Sampling.hashSample(rows, "id", 1.0).count() === 10000L)
  }

  test("stratifiedHashSample respects per-stratum rates") {
    val kept = Sampling.stratifiedHashSample(rows, "id", "lang",
      Map("en" -> 0.6, "fr" -> 0.1), defaultFraction = 0.3)
    val byLang = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val strata = rows.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(byLang("en").toDouble / strata("en") - 0.6) < 0.05)
    assert(math.abs(byLang("fr").toDouble / strata("fr") - 0.1) < 0.05)
    assert(math.abs(byLang("de").toDouble / strata("de") - 0.3) < 0.05)
  }

  test("splitLabel is disjoint, exhaustive, and key-stable") {
    val labeled = rows.select(col("id"),
      Sampling.splitLabel(col("id"), 0.1, 0.2).as("split"))
    val counts = labeled.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet === Set("train", "val", "test"))
    assert(counts.values.sum === 10000L)
    assert(math.abs(counts("val") - 1000L) < 150)
    assert(math.abs(counts("test") - 2000L) < 200)
    // the same key gets the same label when the frame is rebuilt
    val again = rows.repartition(7).select(col("id"),
      Sampling.splitLabel(col("id"), 0.1, 0.2).as("split"))
    assert(labeled.collect().map(r => r.getLong(0) -> r.getString(1)).toMap ===
      again.collect().map(r => r.getLong(0) -> r.getString(1)).toMap)
  }

  test("temperatureFractions: T=1 reproduces weights, T→∞ flattens, clamp at 1") {
    val w = Map("a" -> 0.6, "b" -> 0.3, "c" -> 0.1)
    val t1 = Sampling.temperatureFractions(w, temperature = 1.0)
    assert(math.abs(t1("a") - 0.6) < 1e-12 && math.abs(t1("c") - 0.1) < 1e-12)
    val flat = Sampling.temperatureFractions(w, temperature = 1e9)
    assert(flat.values.forall(f => math.abs(f - 1.0 / 3) < 1e-6))
    // sharpening (T<1) skews toward the heavy source
    val sharp = Sampling.temperatureFractions(w, temperature = 0.5)
    assert(sharp("a") > 0.7 && sharp("c") < 0.05)
    // scale can push a source past 1.0 — clamped
    val clamped = Sampling.temperatureFractions(w, temperature = 1.0, scale = 2.0)
    assert(clamped("a") === 1.0)
    intercept[IllegalArgumentException] {
      Sampling.temperatureFractions(w, temperature = 0.0)
    }
  }

  test("temperatureMixture drops unlisted sources and equals per-source hashSample") {
    val s = spark
    import s.implicits._
    val df = (1L to 3000L).map(i => (i, s"src${i % 3}")).toDF("id", "src")
    val w = Map("src0" -> 0.8, "src1" -> 0.2)
    val out = Sampling.temperatureMixture(df, "id", "src", w, temperature = 1.0)
    val got = out.collect().map(r => r.getLong(0)).toSet
    assert(!out.collect().exists(_.getString(1) == "src2")) // whitelist
    val fr = Sampling.temperatureFractions(w, 1.0)
    val expect = Seq("src0", "src1").flatMap { src =>
      Sampling.hashSample(df.filter($"src" === src), "id", fr(src))
        .collect().map(_.getLong(0))
    }.toSet
    assert(got === expect)
  }

  test("epochMixture: floor(w) copies each, fraction gets one more, 0-based epochs") {
    val s = spark
    import s.implicits._
    val df = (1L to 3000L).map(i => (i, s"src${i % 3}")).toDF("id", "src")
    val out = Sampling.epochMixture(df, "id", "src",
      Map("src0" -> 2.25, "src1" -> 1.0, "src2" -> 0.5)).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    val bySrc = out.groupBy(_._2).view.mapValues(_.length).toMap
    val perId = out.groupBy(_._1).view.mapValues(_.map(_._3).sorted.toSeq).toMap
    // every replicated id carries consecutive epochs 0..n-1
    assert(perId.values.forall(es => es == (0 until es.length)))
    // src1 at weight 1.0: exactly one copy each
    assert(bySrc("src1") === 1000)
    // src0 at 2.25: between 2x and 3x, near 2.25x
    assert(bySrc("src0") > 2000 && bySrc("src0") < 3000)
    assert(math.abs(bySrc("src0") - 2250) < 150)
    // src2 at 0.5: roughly half, and ids match hashSample's kept set
    val src2Ids = out.filter(_._2 == "src2").map(_._1).toSet
    val expect = Sampling.hashSample(df.filter($"src" === "src2"), "id", 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(src2Ids === expect)
    // deterministic under repartitioning
    val again = Sampling.epochMixture(df.repartition(13), "id", "src",
      Map("src0" -> 2.25, "src1" -> 1.0, "src2" -> 0.5)).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(again === out.toSet)
  }

  test("deterministicShuffle: total permutation, seed-keyed, partition-stable") {
    val s = spark
    import s.implicits._
    val df = (1L to 2000L).map(i => (i, s"p$i")).toDF("id", "payload")
    val out = Sampling.deterministicShuffle(df, "id", seed = 7L)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("shuffle_rank")).toMap
    // a bijection onto 1..N (two-phase bucket ranks compose correctly)
    assert(out.values.toSeq.sorted === (1L to 2000L))
    // same seed is partition-stable; a different seed is a different order
    val again = Sampling.deterministicShuffle(df.repartition(17), "id", 7L)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("shuffle_rank")).toMap
    assert(again === out)
    val other = Sampling.deterministicShuffle(df, "id", 8L)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("shuffle_rank")).toMap
    assert(other !== out)
    // the per-row ranking window is PARTITIONED by the hash-prefix bucket
    // (an unpartitioned row_number would single-partition at scale); only
    // the 256-row offset table uses an unpartitioned running sum
    val plan = Sampling.deterministicShuffle(df, "id", 7L)
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("row_number()") && l.contains("windowspecdefinition(__b")),
      plan.take(1500))
  }

  test("sampleKPerGroup: exact per-group cap, deterministic, WindowGroupLimit plan") {
    val s = spark
    import s.implicits._
    val df = (1L to 3000L).map(i => (i, s"g${i % 3}")).toDF("id", "g")
    val out = Sampling.sampleKPerGroup(df, Seq("g"), "id", k = 10, seed = 7L).collect()
    val byG = out.groupBy(_.getString(1))
    assert(byG.keySet === Set("g0", "g1", "g2"))
    assert(byG.values.forall(_.length == 10))
    // stable under repartitioning
    val again = Sampling.sampleKPerGroup(df.repartition(13), Seq("g"), "id", 10, 7L)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(again === out.map(r => (r.getLong(0), r.getString(1))).toSet)
    // a group smaller than k keeps all its rows
    val tiny = Sampling.sampleKPerGroup(
      df.filter($"id" <= 5), Seq("g"), "id", 10, 7L).count()
    assert(tiny === 5L)
    // the rank filter pushes into the window as a group limit
    val plan = Sampling.sampleKPerGroup(df, Seq("g"), "id", 10, 7L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(1200))
  }

  test("topKPerGroup: highest scores win, ties break low-id, rank is 1-based") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "a", 10.0), (2L, "a", 30.0), (3L, "a", 20.0), (4L, "a", 30.0),
      (5L, "b", 1.0)
    ).toDF("id", "g", "score")
    val out = Sampling.topKPerGroup(df, Seq("g"), "score", "id", k = 2)
      .select("g", "id", "rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // ties at 30.0: id=2 beats id=4; id=4 takes rank 2; group b keeps its
    // single row
    assert(out === Set(("a", 2L, 1L), ("a", 4L, 2L), ("b", 5L, 1L)))
    val plan = Sampling.topKPerGroup(df, Seq("g"), "score", "id", 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(1200))
  }

  test("negativePairs: k per anchor, never self, deterministic across runs") {
    val s = spark
    import s.implicits._
    val docs = (1L to 20L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    def run() = Sampling.negativePairs(docs, "doc_id", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val a = run()
    assert(a.length === 60)
    assert(a.groupBy(_._1).forall(_._2.length == 3), "exactly k per anchor")
    assert(a.forall(t => t._1 != t._3), "no self-pairs")
    assert(a === run(), "deterministic")
  }

  test("negativePairs refuses a single-document corpus") {
    val s = spark
    import s.implicits._
    val one = Seq((1L, "only")).toDF("doc_id", "text")
    val e = intercept[Exception](
      Sampling.negativePairs(one, "doc_id", k = 2).collect())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("negativePairs")), msgs(e).mkString("|"))
  }

  test("negProbeRank survives rank·stride past Long.MaxValue (4e9-doc corpus)") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    val strideA = 2654435761L
    // r=4e9: r·A ≈ 1.06e19 > Long.MaxValue — the old BIGINT % wrapped
    // negative here and matched no rank; decimal pmod stays in [0, n)
    val rows = Seq((4000000000L, 1L, 4100000000L), (7L, 2L, 11L))
      .toDF("r", "j", "n")
    val got = rows.select(Sampling.negProbeRank(
        col("r"), col("j"), col("n"), strideA, 40503L).as("nr"))
      .collect().map(_.getLong(0))
    val want = rows.collect().map { row =>
      val (r, j, n) = (row.getLong(0), row.getLong(1), row.getLong(2))
      ((BigInt(r) * strideA + BigInt(j) * 40503L) mod BigInt(n)).toLong
    }
    assert(got.toSeq === want.toSeq)
    assert(got.forall(v => v >= 0), "probe rank must be a valid non-negative rank")
  }

  test("bottomKSample: exact size, deterministic, and merge = one-shot") {
    val s = spark
    import s.implicits._
    val df = (1L to 200L).map(i => (i, if (i % 2 == 0) "even" else "odd"))
      .toDF("id", "seg")
    val one = Sampling.bottomKSample(df, "seg", "id", k = 7)
    val sz = one.groupBy("seg").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sz === Map("even" -> 7L, "odd" -> 7L))
    // deterministic across runs
    val again = Sampling.bottomKSample(df, "seg", "id", k = 7)
    assert(one.collect().map(_.getLong(0)).sorted.toSeq ===
      again.collect().map(_.getLong(0)).sorted.toSeq)
    // mergeable: bottom-k of per-half bottom-k's == one-shot bottom-k
    val a = Sampling.bottomKSample(df.filter(col("id") <= 100), "seg", "id", 7)
    val b = Sampling.bottomKSample(df.filter(col("id") > 100), "seg", "id", 7)
    val merged = Sampling.bottomKSample(a.unionByName(b), "seg", "id", 7)
    assert(merged.collect().map(r => (r.getLong(0), r.getString(1))).toSet ===
      one.collect().map(r => (r.getLong(0), r.getString(1))).toSet)
    // a segment smaller than k yields all of it, not a crash
    val tiny = Sampling.bottomKSample(
      Seq((1L, "x")).toDF("id", "seg"), "seg", "id", 7)
    assert(tiny.count() === 1L)
    intercept[IllegalArgumentException](
      Sampling.bottomKSample(df, "seg", "id", 0))
  }
}
