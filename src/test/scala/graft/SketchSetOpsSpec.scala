package graft

import graft.operators.SketchSetOps

class SketchSetOpsSpec extends SparkTestBase {

  test("distinctOverlap: exact-regime set cardinalities match brute force") {
    val s = spark
    import s.implicits._
    // a = {0..299}, b = {200..449}: |a∩b| = 100, |a∖b| = 200, |b∖a| = 150
    val df = ((0 until 300).map(i => ("click", i.toLong)) ++
      (200 until 450).map(i => ("purchase", i.toLong)) ++
      (0 until 50).map(i => ("view", i.toLong)))  // third segment filtered out
      .toDF("event_type", "user_id")
    val r = SketchSetOps.distinctOverlap(df, "event_type", Seq("user_id"),
      "click", "purchase", lgK = 12).collect()(0)
    assert(r.getString(0) === "click" && r.getString(1) === "purchase")
    assert(r.getLong(2) === 300L, "n_a")
    assert(r.getLong(3) === 250L, "n_b")
    assert(r.getLong(4) === 450L, "n_union")
    assert(r.getLong(5) === 100L, "n_intersect")
    assert(r.getLong(6) === 200L, "n_a_not_b")
    assert(r.getLong(7) === 150L, "n_b_not_a")
  }

  test("distinctOverlap: an absent segment behaves as the empty set") {
    val s = spark
    import s.implicits._
    val df = (0 until 10).map(i => ("click", i.toLong)).toDF("event_type", "user_id")
    val r = SketchSetOps.distinctOverlap(df, "event_type", Seq("user_id"),
      "click", "purchase", lgK = 12).collect()(0)
    assert(r.getLong(2) === 10L && r.getLong(3) === 0L)
    assert(r.getLong(4) === 10L && r.getLong(5) === 0L)
    assert(r.getLong(6) === 10L && r.getLong(7) === 0L)
  }

  test("thetaPartials persist to parquet and re-merge to the exact union count") {
    val s = spark
    import s.implicits._
    import graft.operators.SketchSetOps
    // overlapping halves: seg a holds ids 0-59 and 40-99 across snapshots
    val h1 = (0 until 60).map(i => ("a", i.toString)) ++
      (0 until 10).map(i => ("b", i.toString))
    val h2 = (40 until 100).map(i => ("a", i.toString))
    val tmp = java.nio.file.Files.createTempDirectory("graft_sk_test").toString
    SketchSetOps.thetaPartials(h1.toDF("seg0", "id"), "seg0", Seq("id"), lgK = 12)
      .write.mode("overwrite").parquet(tmp)
    val stored = spark.read.parquet(tmp)
    val fresh = SketchSetOps.thetaPartials(h2.toDF("seg0", "id"), "seg0", Seq("id"), lgK = 12)
    val got = SketchSetOps.mergedDistinct(stored.unionByName(fresh), lgK = 12)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a" -> 100L, "b" -> 10L))
  }

  test("kllPartials persist to parquet and re-merge to exact percentile_disc quantiles") {
    val s = spark
    import s.implicits._
    import graft.operators.SketchSetOps
    // seg a: values 1..100 split across two snapshots; seg b: one snapshot
    val h1 = (1 to 60).map(i => ("a", i.toLong)) ++ (1 to 10).map(i => ("b", i * 10L))
    val h2 = (61 to 100).map(i => ("a", i.toLong))
    val tmp = java.nio.file.Files.createTempDirectory("graft_kll_test").toString
    SketchSetOps.kllPartials(h1.toDF("seg0", "v"), "seg0", "v", k = 1024)
      .write.mode("overwrite").parquet(tmp)
    val stored = spark.read.parquet(tmp)
    val fresh = SketchSetOps.kllPartials(h2.toDF("seg0", "v"), "seg0", "v", k = 1024)
    val got = SketchSetOps.mergedQuantiles(stored.unionByName(fresh),
        Seq(0.25, 0.5, 0.9), k = 1024)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    // percentile_disc (INCLUSIVE): smallest value whose rank >= p
    assert(got === Map(
      ("a", 0.25) -> 25.0, ("a", 0.5) -> 50.0, ("a", 0.9) -> 90.0,
      ("b", 0.25) -> 30.0, ("b", 0.5) -> 50.0, ("b", 0.9) -> 90.0))
  }

  test("freqPartials persist to parquet and re-merge to exact top-k counts") {
    val s = spark
    import s.implicits._
    import graft.operators.SketchSetOps
    // counts split across snapshots: x appears 5+3, y 4+0, z 1+2, w 0+1
    val h1 = Seq.fill(5)(("a", "x")) ++ Seq.fill(4)(("a", "y")) ++ Seq(("a", "z"))
    val h2 = Seq.fill(3)(("a", "x")) ++ Seq.fill(2)(("a", "z")) ++ Seq(("a", "w"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_fi_test").toString
    SketchSetOps.freqPartials(h1.toDF("seg0", "item"), "seg0", "item", maxMapSize = 64)
      .write.mode("overwrite").parquet(tmp)
    val stored = spark.read.parquet(tmp)
    val fresh = SketchSetOps.freqPartials(h2.toDF("seg0", "item"), "seg0", "item", maxMapSize = 64)
    val got = SketchSetOps.mergedTopK(stored.unionByName(fresh), k = 3, maxMapSize = 64)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // exact regime: counts merge additively, top-3 by (-count, key)
    assert(got.toSeq === Seq(("a", "x", 8L), ("a", "y", 4L), ("a", "z", 3L)))
  }

  test("overlapFromPartials: set algebra between persisted snapshots, absent side = empty") {
    val s = spark
    import s.implicits._
    import graft.operators.SketchSetOps
    // seg a: {0..59} vs {40..99} → |A|=60 |B|=60 |∪|=100 |∩|=20
    // seg b: present only in snapshot A → B side empty
    val h1 = (0 until 60).map(i => ("a", i.toString)) ++
      (0 until 10).map(i => ("b", i.toString))
    val h2 = (40 until 100).map(i => ("a", i.toString))
    val tmp = java.nio.file.Files.createTempDirectory("graft_ov_test").toString
    SketchSetOps.thetaPartials(h1.toDF("seg0", "id"), "seg0", Seq("id"), lgK = 12)
      .write.mode("overwrite").parquet(tmp)
    val snapA = spark.read.parquet(tmp)
    val snapB = SketchSetOps.thetaPartials(h2.toDF("seg0", "id"), "seg0", Seq("id"), lgK = 12)
    val got = SketchSetOps.overlapFromPartials(snapA, snapB, lgK = 12)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    assert(got("a") === ((60L, 60L, 100L, 20L, 40L, 40L)))
    assert(got("b") === ((10L, 0L, 10L, 0L, 10L, 0L)))
  }

  test("overlapFromPartials: NULL segments merge into ONE row; int segs cast, not crash") {
    val s = spark
    import s.implicits._
    import graft.operators.SketchSetOps
    // null seg on BOTH sides — a raw full-outer join would leave two
    // unmatched null rows; the operator must emit one merged row
    val h1 = Seq((Option.empty[String], "x"), (Option.empty[String], "y"),
      (Some("a"), "p")).toDF("seg0", "id")
    val h2 = Seq((Option.empty[String], "y"), (Option.empty[String], "z"))
      .toDF("seg0", "id")
    val pa = SketchSetOps.thetaPartials(h1, "seg0", Seq("id"), lgK = 12)
    val pb = SketchSetOps.thetaPartials(h2, "seg0", Seq("id"), lgK = 12)
    val rows = SketchSetOps.overlapFromPartials(pa, pb, lgK = 12)
      .collect().map(r => Option(r.getString(0)) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows.size === 2)
    assert(rows(None) === ((2L, 2L, 3L, 1L)), s"null segs must merge: $rows")
    assert(rows(Some("a")) === ((1L, 0L, 1L, 0L)))
    // integer segment keys: the shared (seg, sk) contract must accept
    // them (cast to string), matching mergedDistinct
    val ia = SketchSetOps.thetaPartials(
      Seq((7, "x"), (7, "y")).toDF("seg0", "id"), "seg0", Seq("id"), lgK = 12)
    val ib = SketchSetOps.thetaPartials(
      Seq((7, "y")).toDF("seg0", "id"), "seg0", Seq("id"), lgK = 12)
    val irow = SketchSetOps.overlapFromPartials(ia, ib, lgK = 12).collect()(0)
    assert(irow.getString(0) === "7" && irow.getLong(4) === 1L)
  }

  test("mergedQuantiles: a dead segment (all-null values) keeps a marker row") {
    val s = spark
    import s.implicits._
    import graft.operators.SketchSetOps
    val vals = Seq(("live", Some(10L)), ("live", Some(20L)),
      ("dead", Option.empty[Long])).toDF("seg0", "v")
    val parts = SketchSetOps.kllPartials(vals, "seg0", "v", k = 256)
    val got = SketchSetOps.mergedQuantiles(parts, Seq(0.5), k = 256)
      .collect().map(r => r.getString(0) ->
        (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(got("live") === ((Some(0.5), Some(10.0))))
    // the dead segment stays VISIBLE as (seg, NULL, NULL), never dropped
    assert(got("dead") === ((None, None)), got.toString)
  }

  test("freqPartials: null items count under the reference 'null' key") {
    val s = spark
    import s.implicits._
    import graft.operators.SketchSetOps
    val items = Seq(("a", Some("x")), ("a", Option.empty[String]),
      ("a", Option.empty[String])).toDF("seg0", "item")
    val got = SketchSetOps.mergedTopK(
        SketchSetOps.freqPartials(items, "seg0", "item", maxMapSize = 64),
        k = 2, maxMapSize = 64)
      .collect().map(r => (r.getString(1), r.getLong(2)))
    assert(got.toSeq === Seq(("null", 2L), ("x", 1L)))
  }

  test("hllPartials persist to parquet and re-merge within 2% of exact") {
    val s = spark
    import s.implicits._
    val a = (0 until 3000).map(i => ("seg", i.toLong)).toDF("seg0", "k")
    val b = (1500 until 5000).map(i => ("seg", i.toLong)).toDF("seg0", "k")
    val tmp = java.nio.file.Files.createTempDirectory("graft_hll_test").toString
    SketchSetOps.hllPartials(a, "seg0", Seq("k"), lgK = 14)
      .write.mode("overwrite").parquet(tmp)
    val merged = SketchSetOps.mergedHllDistinct(
      s.read.parquet(tmp).unionByName(
        SketchSetOps.hllPartials(b, "seg0", Seq("k"), lgK = 14)))
    val est = merged.collect()(0).getLong(1)
    assert(math.abs(est - 5000L) <= 100L, s"estimate $est vs exact 5000")
  }

  test("hllPartials: lgK outside [4, 21] is rejected loudly") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", 1L)).toDF("seg0", "k")
    val e = intercept[IllegalArgumentException] {
      SketchSetOps.hllPartials(df, "seg0", Seq("k"), lgK = 25)
    }
    assert(e.getMessage.contains("lgK"))
  }
}
