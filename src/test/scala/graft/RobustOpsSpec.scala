package graft

import graft.operators.Robust
import graft.pipeline.Dedup
import org.apache.spark.sql.functions._

/** Conformance for the prefix-filtering similarity join and MAD
  * outlier flagging. */
class RobustOpsSpec extends SparkTestBase {
  private val s = spark
  import s.implicits._

  test("prefix filter finds exactly the pairs the full inverted index finds") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "a b c d e f g h i k"),   // J(1,2) high
      (3L, "a b c d e f g h i j"),   // exact copy of 1
      (4L, "z y x w v u t s r q"),   // disjoint
      (5L, "z y x w v u t s r j"),   // near 4
      (6L, "m n")                    // too short for 3-grams
    ).toDF("doc_id", "text")
    def norm(dfr: org.apache.spark.sql.DataFrame) =
      dfr.select("id1", "id2", "jaccard")
        .as[(Long, Long, Double)].collect().toSet
    val got = norm(Dedup.prefixFilterJaccardPairs(docs, "doc_id", "text", 3, 1L, 2L))
    val want = norm(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5))
    assert(got === want)
    assert(got.exists { case (a, b, j) => a == 1L && b == 3L && j == 1.0 })
  }

  test("prefix filter: integer ceil keeps the boundary pair") {
    // 4 shingles, t = 3/4: alpha = 3, prefix length 4 - 3 + 1 = 2.
    // J = 3/5 < 3/4 excluded; J = 3/4 pairs don't exist here, so build
    // one with 3 of 4 shared and union 4: impossible — instead verify a
    // J = 4/5 pair (6-token docs, 4 shared 3-grams of 4/4) survives.
    val docs = Seq(
      (1L, "a b c d e f"),   // grams: abc bcd cde def (4)
      (2L, "a b c d e g")    // grams: abc bcd cde deg -> 3 shared, union 5
    ).toDF("doc_id", "text")
    val out = Dedup.prefixFilterJaccardPairs(docs, "doc_id", "text", 3, 3L, 5L)
      .as[(Long, Long, Double)].collect()
    assert(out.length === 1 && out.head._3 === 0.6)
  }

  test("MAD outliers: spike flagged, bulk not, zero-MAD group safe") {
    val df = (Seq.fill(20)(("a", 10.0)) ++ Seq(("a", 10.5), ("a", 1e9)) ++
      Seq.fill(5)(("b", 7.0))).zipWithIndex
      .map { case ((g, v), i) => (i.toLong, g, v) }.toDF("id", "g", "v")
    val out = Robust.madOutliers(df, "g", "v", 3)
      .select("id", "g", "v", "is_outlier")
      .as[(Long, String, Double, Boolean)].collect()
    val flagged = out.filter(_._4).map(_._3).toSet
    assert(flagged === Set(10.5, 1e9)) // zero-MAD group: any deviation flags
    // group b: all identical -> mad 0, |v-med| = 0 not > 0 -> unflagged
    assert(out.filter(_._2 == "b").forall(!_._4))
    // 10.5 in group a: med 10, mad 0 -> |0.5| > 0 -> flagged? MAD of a:
    // deviations are twenty 0s, 0.5, 1e9 -> median deviation 0, so 10.5
    // IS flagged by the 3*0 cut — the classic zero-MAD degeneracy.
    // Assert it explicitly so the behavior is pinned, not accidental.
    assert(out.exists(r => r._3 == 10.5 && r._4))
  }

  test("Privacy: audit counts, summary, and suppression agree on a planted fixture") {
    val s = spark
    import s.implicits._
    import graft.operators.Privacy
    // classes: (1,a)x5 safe, (1,b)x2 at risk, (2,a)x1 at risk, null class x3
    val df = (Seq.fill(5)((Some(1), "a")) ++ Seq.fill(2)((Some(1), "b")) ++
      Seq((Some(2), "a")) ++ Seq.fill(3)((Option.empty[Int], "a")))
      .zipWithIndex.map { case ((n, sgm), i) => (i.toLong, n, sgm) }
      .toDF("id", "nat", "seg")
    val classes = Privacy.kAnonymityClasses(df, Seq("nat", "seg"), k = 3)
      .collect().map(r => (Option(r.get(0)), r.getString(1)) ->
        (r.getLong(2), r.getBoolean(3))).toMap
    assert(classes((Some(1), "a")) === ((5L, false)))
    assert(classes((Some(1), "b")) === ((2L, true)))
    assert(classes((Some(2), "a")) === ((1L, true)))
    // NULL quasi values form ONE class of their own (still linkable)
    assert(classes((None, "a")) === ((3L, false)))
    val sRow = Privacy.kAnonymitySummary(df, Seq("nat", "seg"), k = 3).collect()(0)
    assert(sRow.getLong(0) === 11L, "n_rows")
    assert(sRow.getLong(1) === 4L, "n_classes")
    assert(sRow.getLong(2) === 2L, "n_small_classes")
    assert(sRow.getLong(3) === 3L, "rows_at_risk")
    assert(sRow.getLong(4) === 1L, "min_class_size")
    assert(sRow.getLong(5) === 8L, "rows_after_suppress")
    val kept = Privacy.suppress(df, Seq("nat", "seg"), k = 3)
    assert(kept.count() === 8L)
    assert(kept.filter(col("nat") === 2).count() === 0L)
    intercept[IllegalArgumentException](Privacy.suppress(df, Nil, 3))
    intercept[IllegalArgumentException](Privacy.suppress(df, Seq("nat"), 1))
  }

  test("Privacy.dpCounts: exact thresholds, bounded noise, hand-replayed draw") {
    val s = spark
    import s.implicits._
    import graft.operators.Privacy
    // p = 1/2, b = 8: integer weights 2^(8-|m|), total 3*2^8 - 2 = 766
    val (th, total) = Privacy.geometricThresholds(8, 1L, 2L)
    assert(total === 766L)
    assert(th.head === ((-8, 1L)) && th.last === ((8, 766L)))
    assert(th.map(_._2) === th.map(_._2).sorted, "cumulative bounds monotone")
    val df = (0 until 400).map(i => (i.toLong, s"k${i % 40}")).toDF("id", "key")
    val noisy = Privacy.dpCounts(df, Seq("key"), seed = "g7")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(noisy.size === 40)
    // every key: |noise| <= b around the true count of 10, never below 0
    noisy.values.foreach(v => assert(v >= 2L && v <= 18L, s"noise out of bound: $v"))
    // hand-replay one draw end-to-end: u = poly_hash16("g7|k7") % 766,
    // inverse-CDF walk over the same thresholds
    val h = graft.functions.FeatureFunctionHelpers
      .polyHash16(org.apache.spark.unsafe.types.UTF8String.fromString("g7|k7"))
    val u = java.lang.Math.floorMod(h.longValue, 766L)
    val m = th.find(u < _._2).get._1
    assert(noisy("k7") === math.max(10L + m, 0L))
    // deterministic: same seed reproduces; different seed moves some key
    val again = Privacy.dpCounts(df, Seq("key"), seed = "g7")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again === noisy)
    val other = Privacy.dpCounts(df, Seq("key"), seed = "z3")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(other !== noisy)
    // clamp at zero: a count of 1 with the worst-case -8 draw floors at 0
    val tiny = Seq.tabulate(30)(i => (i.toLong, s"solo$i")).toDF("id", "key")
      .groupBy("key").agg(count(lit(1)).as("one"))
    val tinyNoisy = Privacy.dpCounts(tiny, Seq("key"), seed = "g7").collect()
    tinyNoisy.foreach(r => assert(r.getLong(1) >= 0L))
    intercept[IllegalArgumentException](Privacy.dpCounts(df, Nil, "g7"))
    intercept[IllegalArgumentException](Privacy.geometricThresholds(8, 2L, 2L))
    intercept[IllegalArgumentException](Privacy.geometricThresholds(40, 1L, 2L))
  }

  test("Privacy.lDiversity: homogeneous class flagged, null sensitive ignored") {
    val s = spark
    import s.implicits._
    import graft.operators.Privacy
    // A: 4 rows / 3 sources (diverse); B: 3 rows one source (homogeneous
    // — k-anonymous at k=3 yet leaking); C: null sensitive ignored
    val df = Seq(
      ("A", Option("a")), ("A", Option("b")), ("A", Option("c")), ("A", Option("a")),
      ("B", Option("x")), ("B", Option("x")), ("B", Option("x")),
      ("C", Option("y")), ("C", Option.empty[String]))
      .toDF("quasi", "src")
    val classes = Privacy.lDiversityClasses(df, Seq("quasi"), "src", l = 3)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(classes("A") === ((4L, 3L, false)))
    assert(classes("B") === ((3L, 1L, true)))
    assert(classes("C") === ((2L, 1L, true)))
    val sRow = Privacy.lDiversitySummary(df, Seq("quasi"), "src", l = 3).collect()(0)
    assert((sRow.getLong(0), sRow.getLong(1), sRow.getLong(2), sRow.getLong(3))
      === ((3L, 2L, 5L, 1L)))
    intercept[IllegalArgumentException](
      Privacy.lDiversityClasses(df, Seq("src"), "src", 3))
    intercept[IllegalArgumentException](
      Privacy.lDiversityClasses(df, Seq("quasi"), "src", 1))
  }

  test("ReleaseManifest: order-independent, localizes a change, hand-replayed fp") {
    val s = spark
    import s.implicits._
    import graft.operators.ReleaseManifest.contentManifest
    val rows = Seq((0L, Option("alpha")), (1L, Option("beta")), (2L, Option("gamma")),
      (16L, Option("delta")), (17L, Option.empty[String]))
    val df = rows.toDF("id", "v")
    def asMap(m: org.apache.spark.sql.DataFrame) =
      m.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val m1 = asMap(contentManifest(df, "id", Seq("id", "v"), 16))
    assert(m1.keySet === Set(0L, 1L, 2L))
    assert(m1(0L)._1 === 2L && m1(1L)._1 === 2L && m1(2L)._1 === 1L)
    // row order and partitioning never change the fingerprint
    val m2 = asMap(contentManifest(
      df.repartition(7, col("v")), "id", Seq("id", "v"), 16))
    assert(m2 === m1)
    // a single-row change flips ONLY its bucket
    val df3 = Seq((0L, Option("alpha")), (1L, Option("beta")), (2L, Option("gammaX")),
      (16L, Option("delta")), (17L, Option.empty[String])).toDF("id", "v")
    val m3 = asMap(contentManifest(df3, "id", Seq("id", "v"), 16))
    assert(m3(0L) === m1(0L) && m3(1L) === m1(1L) && (m3(2L) !== m1(2L)))
    // null and empty string are distinguishable (sentinel coalesce)
    val df4 = Seq((0L, Option("alpha")), (1L, Option("beta")), (2L, Option("gamma")),
      (16L, Option("delta")), (17L, Option(""))).toDF("id", "v")
    assert(asMap(contentManifest(df4, "id", Seq("id", "v"), 16))(1L) !== m1(1L))
    // hand-replay bucket 0 (ids 0 and 16) end-to-end
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(payload: String): BigInt = {
      val hex = md.digest(payload.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(14)
      BigInt(hex, 16)
    }
    val expected = ((h("0\u0001alpha") + h("16\u0001delta"))
      mod BigInt(2305843009213693951L)).toLong
    assert(m1(0L)._2 === expected)
  }

  test("AbTest.twoProportion: hand-computed z2, degenerate pool yields NULL") {
    val s = spark
    import s.implicits._
    import graft.operators.AbTest
    // A: 3/6 convert, B: 1/4 convert
    // diff = 3*4 - 1*6 = 6; num = 36 * 10 = 360
    // den  = 4 * 6 * 6 * 4 = 576; z2 = 0.625
    val df = (Seq.fill(3)(("A", true)) ++ Seq.fill(3)(("A", false)) ++
      Seq.fill(1)(("B", true)) ++ Seq.fill(3)(("B", false)))
      .toDF("variant", "conv")
    val r = AbTest.twoProportion(df, "variant", "conv", "A", "B").collect()(0)
    assert(r.getLong(2) === 6L && r.getLong(3) === 3L)
    assert(r.getLong(4) === 4L && r.getLong(5) === 1L)
    assert(r.getDouble(6) === 0.5 && r.getDouble(7) === 0.25)
    assert(r.getDouble(8) === 0.25)
    assert(math.abs(r.getDouble(9) - 0.625) < 1e-15, r.getDouble(9).toString)
    // nobody converts anywhere: pooled variance 0, z2 undefined -> NULL
    val none = (Seq.fill(2)(("A", false)) ++ Seq.fill(2)(("B", false)))
      .toDF("variant", "conv")
    val r2 = AbTest.twoProportion(none, "variant", "conv", "A", "B").collect()(0)
    assert(r2.isNullAt(9), "z2 must be NULL, not Infinity/NaN")
    intercept[IllegalArgumentException](
      AbTest.twoProportion(df, "variant", "conv", "A", "A"))
  }

  test("AbTest segmented: per-segment z2, absent-variant segments dropped") {
    val s = spark
    import s.implicits._
    import graft.operators.AbTest
    val df = (Seq.fill(3)(("s1", "A", true)) ++ Seq.fill(3)(("s1", "A", false)) ++
      Seq.fill(1)(("s1", "B", true)) ++ Seq.fill(3)(("s1", "B", false)) ++
      Seq.fill(2)(("s2", "A", true))).toDF("seg0", "variant", "conv")
    val got = AbTest.twoProportionBySegment(df, "seg0", "variant", "conv",
      "A", "B").collect()
    assert(got.length === 1, "s2 has no B side - no comparison exists")
    val r = got(0)
    assert(r.getString(0) === "s1")
    assert(math.abs(r.getDouble(8) - 0.625) < 1e-12)
  }

  test("Benford: string-extracted digits, absent digits visible, chi-square sane") {
    val s = spark
    import s.implicits._
    import graft.operators.Benford
    // powers of ten land on digit 1 EXACTLY (the log10-floor trap)
    val vals = Seq(1L, 10L, 100L, 1000L, 2L, 25L, 3L, 900L, -5L, 0L)
      .map(Tuple1(_)).toDF("v")
    val audit = Benford.leadingDigitAudit(vals, "v")
    val byDigit = audit.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(byDigit(1L)._1 === 4L, "1, 10, 100, 1000 all lead with 1")
    assert(byDigit(2L)._1 === 2L && byDigit(3L)._1 === 1L && byDigit(9L)._1 === 1L)
    assert(byDigit(4L)._1 === 0L, "absent digits stay visible as zero")
    assert(byDigit.values.forall(_._2 === 8L), "n excludes <= 0 measures")
    assert(math.abs(byDigit.values.map(_._3).sum - 1.0) < 1e-12)
    val chi = Benford.chiSquare(audit)
    assert(chi > 0.0 && chi.isFinite)
    // a float measure is rejected with the rescale recipe
    val e = intercept[IllegalArgumentException] {
      Benford.leadingDigitAudit(Seq(Tuple1(1.5)).toDF("v"), "v")
    }
    assert(e.getMessage.contains("INTEGRAL"))
  }
}
