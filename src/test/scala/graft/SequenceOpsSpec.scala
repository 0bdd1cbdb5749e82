package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** Conformance for the round-8 sequence/ordering operators: CDC
  * latest-wins apply, Markov transitions, cohort retention, balanced
  * sharding, curriculum interleave, RANGE-frame trailing windows, and
  * the shared two-phase prefix-sum they ride on. */
class SequenceOpsSpec extends SparkTestBase {
  private val s = spark
  import s.implicits._

  // ---- CdcMerge -----------------------------------------------------

  private def log = Seq(
    // (k, t, tie, op, a)
    (1L, 10L, 1L, "U", "x"), (1L, 20L, 2L, "U", "y"),   // latest wins -> y
    (2L, 10L, 3L, "U", "x"), (2L, 20L, 4L, "D", "x"),   // deleted last -> gone
    (3L, 10L, 5L, "D", "x"), (3L, 20L, 6L, "U", "z"),   // resurrected -> z
    (4L, 10L, 7L, "U", "a"), (4L, 10L, 8L, "U", "b")    // same t, tie breaks -> b
  ).toDF("k", "t", "tie", "op", "a")

  test("cdc: latest (t, tie) wins; trailing delete removes the key") {
    val m = CdcMerge(log, "k", "t", "tie", "op", "D")
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[String]("a")).toMap
    assert(m === Map(1L -> "y", 3L -> "z", 4L -> "b"))
  }

  test("cdc: plan is an aggregate (map-side partials), not a window sort") {
    val plan = CdcMerge(log, "k", "t", "tie", "op", "D")
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate") || plan.contains("SortAggregate"))
    assert(!plan.contains("Window"))
  }

  test("cdc stream: out-of-order loses, tombstone emits deleted, stale batch silent") {
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = s.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[CdcMerge.CdcRecord]
    val q = CdcMerge.applyStream(in.toDS(), deleteOp = "D")
      .writeStream.format("memory").queryName("cdc")
      .outputMode(OutputMode.Append).start()
    def images() = s.table("cdc").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
        r.getBoolean(4))).toSeq
    try {
      in.addData(
        CdcMerge.CdcRecord(1L, 10L, 1L, "U", "a"),
        CdcMerge.CdcRecord(1L, 20L, 2L, "U", "b"),   // same batch: 20 wins
        CdcMerge.CdcRecord(2L, 10L, 3L, "U", "x"))
      q.processAllAvailable()
      assert(images().toSet === Set((1L, 20L, "U", "b", false),
        (2L, 10L, "U", "x", false)))
      // batch 2: stale update for key 1 (silent), tombstone for key 2
      in.addData(
        CdcMerge.CdcRecord(1L, 15L, 4L, "U", "stale"),
        CdcMerge.CdcRecord(2L, 30L, 5L, "D", ""))
      q.processAllAvailable()
      val after = images()
      assert(after.size === 3)                       // only key 2 re-emitted
      assert(after.toSet.contains((2L, 30L, "D", "", true)))
      assert(!after.exists(_._4 == "stale"))
    } finally q.stop()
  }

  // ---- Transitions --------------------------------------------------

  test("transitions: adjacent pairs per entity, counts + src totals") {
    val ev = Seq(
      (1L, 1L, 1L, "a"), (1L, 2L, 2L, "b"), (1L, 3L, 3L, "a"),
      (2L, 1L, 4L, "a"), (2L, 2L, 5L, "b"),
      (3L, 1L, 6L, "c")                       // lone event -> no pair
    ).toDF("e", "ts", "id", "st")
    val out = Transitions.transitionCounts(ev, "e", "ts", "id", "st")
      .collect().map(r => (r.getAs[String]("src"), r.getAs[String]("dst")) ->
        (r.getAs[Long]("n"), r.getAs[Long]("src_total"))).toMap
    assert(out === Map(("a", "b") -> (2L, 2L), ("b", "a") -> (1L, 1L)))
  }

  test("transitions stream: O(1) last-event state; stragglers dropped, not spliced") {
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = s.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Transitions.Ev]
    val q = Transitions.transitionsStream(in.toDS())
      .writeStream.format("memory").queryName("trans")
      .outputMode(OutputMode.Append).start()
    def rows() = s.table("trans").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    try {
      in.addData(Transitions.Ev(1L, 1L, 1L, "a"), Transitions.Ev(1L, 2L, 2L, "b"),
        Transitions.Ev(2L, 1L, 3L, "x"))
      q.processAllAvailable()
      assert(rows().toSet === Set((1L, "a", "b", 2L)))
      // batch 2: continuation across batches + a straggler older than state
      in.addData(Transitions.Ev(1L, 3L, 4L, "c"),   // b -> c
        Transitions.Ev(2L, 0L, 5L, "stale"))        // dropped
      q.processAllAvailable()
      assert(rows().toSet === Set((1L, "a", "b", 2L), (1L, "b", "c", 3L)))
    } finally q.stop()
  }

  // ---- Retention ----------------------------------------------------

  test("retention: cohort = first period; offsets count distinct entities") {
    val ev = Seq(
      (1L, 0L), (1L, 5L), (1L, 25L),   // cohort 0, active p0 p2
      (2L, 12L), (2L, 22L),            // cohort 1, active p1 p2
      (3L, 3L), (3L, 7L)               // cohort 0, active p0 only (dedup!)
    ).toDF("e", "ts")
    val out = Retention.retentionMatrix(ev, "e", "ts", 10L)
      .collect().map(r => (r.getAs[Long]("cohort"), r.getAs[Long]("offset")) ->
        r.getAs[Long]("n_active")).toMap
    assert(out === Map((0L, 0L) -> 2L, (0L, 2L) -> 1L,
      (1L, 0L) -> 1L, (1L, 1L) -> 1L))
  }

  // ---- PrefixSum / Sharding / Curriculum ----------------------------

  test("prefix sum matches a sequential scan at any partitioning") {
    val df = (1 to 997).map(i => (i.toLong, (i % 13 + 1).toLong))
      .toDF("id", "c").repartition(7)
    val got = PrefixSum.withRunningSum(df, Seq(col("id").asc), "c", "cum")
      .orderBy("id").select("id", "cum").as[(Long, Long)].collect()
    var run = 0L
    (1 to 997).zip(got).foreach { case (i, (id, cum)) =>
      run += (i % 13 + 1); assert(id === i.toLong && cum === run)
    }
  }

  test("sharding: every shard except the last lands within one row of capacity") {
    val df = (1 to 500).map(i => (i.toLong, (i % 97 + 1).toLong)).toDF("id", "c")
    val out = Sharding.assignShards(df, "id", "c", 300L)
      .groupBy("shard").agg(sum("c").as("tot")).orderBy("shard")
      .as[(Long, Long)].collect()
    assert(out.map(_._1).toSeq === out.indices.map(_.toLong)) // dense ids
    // a shard closes only once its first unit passes a boundary: total
    // >= capacity - (max row cost - 1) for all but the last
    out.dropRight(1).foreach { case (_, tot) => assert(tot >= 300L - 96L) }
    assert(out.map(_._2).sum === (1 to 500).map(i => (i % 97 + 1).toLong).sum)
  }

  test("curriculum: positions are collision-free and round-robin tiers") {
    val df = (1 to 103).map(i => (i.toLong, ((i * 37) % 101).toLong))
      .toDF("id", "score")
    val rows = Curriculum.interleave(df, "id", "score", 4)
      .select("id", "rank", "tier", "pos")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.map(_._4).distinct.length === rows.length)  // pos unique
    rows.foreach { case (_, r, t, p) =>
      assert(t === (r - 1) * 4 / 103)
      assert(p % 4 === t)                                    // interleave lane
    }
    // within a tier, ascending rank => ascending pos with stride k
    rows.groupBy(_._3).foreach { case (_, tier) =>
      val sorted = tier.sortBy(_._2).map(_._4)
      assert(sorted === sorted.sorted)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b - a === 4); case _ => }
    }
  }

  // ---- trailingRange ------------------------------------------------

  test("trailing RANGE frame: ts-distance based, includes same-ts peers") {
    val ev = Seq(
      (1L, 100L, 5L), (1L, 150L, 3L), (1L, 150L, 7L),  // same-ts peers
      (1L, 260L, 2L),                                   // frame (60,260] keeps everything above
      (1L, 500L, 9L),                                   // isolated
      (2L, 100L, 1L)
    ).toDF("k", "ts", "v")
    val out = TimeSeries.trailingRange(ev, "k", "ts", "v", 200L)
      .select("k", "ts", "v", "trail_n", "trail_sum")
      .as[(Long, Long, Long, Long, Long)].collect()
      .groupBy(t => (t._1, t._2, t._3)).map { case (k, v) => k -> v.head }
    assert(out((1L, 100L, 5L))._4 === 1L)
    // both 150-ts rows see each other AND the 100-ts row
    assert(out((1L, 150L, 3L))._4 === 3L)
    assert(out((1L, 150L, 7L))._5 === 15L)
    // 260: frame (60, 260] -> 100, both 150s and itself all in
    assert(out((1L, 260L, 2L))._4 === 4L)
    assert(out((1L, 500L, 9L))._4 === 1L)
    assert(out((2L, 100L, 1L))._4 === 1L)
  }

  test("cdc transformWithState twin: identical emissions to flatMapGroupsWithState") {
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = s.sqlContext
    val prior = s.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[CdcMerge.CdcRecord]
      val q = CdcMerge.applyStreamTws(in.toDS(), deleteOp = "D")
        .writeStream.format("memory").queryName("cdc_tws")
        .outputMode(OutputMode.Append).start()
      def images() = s.table("cdc_tws").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
          r.getBoolean(4))).toSeq
      try {
        in.addData(
          CdcMerge.CdcRecord(1L, 10L, 1L, "U", "a"),
          CdcMerge.CdcRecord(1L, 20L, 2L, "U", "b"),
          CdcMerge.CdcRecord(2L, 10L, 3L, "U", "x"))
        q.processAllAvailable()
        assert(images().toSet === Set((1L, 20L, "U", "b", false),
          (2L, 10L, "U", "x", false)))
        in.addData(
          CdcMerge.CdcRecord(1L, 15L, 4L, "U", "stale"),  // loses to state
          CdcMerge.CdcRecord(2L, 30L, 5L, "D", ""))
        q.processAllAvailable()
        assert(images().toSet === Set((1L, 20L, "U", "b", false),
          (2L, 10L, "U", "x", false), (2L, 30L, "D", "", true)))
      } finally q.stop()
    } finally prior match {
      case Some(v) =>
        s.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None =>
        s.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("state store reader: offline CDC state matches the stream's emissions") {
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = s.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft_state_rd").toString
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[CdcMerge.CdcRecord]
    val q = CdcMerge.applyStream(in.toDS(), deleteOp = "D")
      .writeStream.format("memory").queryName("cdc_inspect")
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(
        CdcMerge.CdcRecord(1L, 10L, 1L, "U", "a"),
        CdcMerge.CdcRecord(1L, 20L, 2L, "U", "b"),
        CdcMerge.CdcRecord(2L, 30L, 3L, "D", ""))
      q.processAllAvailable()
    } finally q.stop()
    // read the checkpoint OFFLINE: per-key winners, no replay
    val state = graft.streaming.StateInspect
      .flatKeyValue(s, ckpt)
      .select(col("state_key"), col("state_value.seq"),
        col("state_value.op"), col("state_value.payload"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getString(3))).toSet
    assert(state === Set((1L, 20L, "U", "b"), (2L, 30L, "D", "")),
      state.toString)
  }

  test("state store reader: transformWithState typed variable reads by name") {
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = s.sqlContext
    val prior = s.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_state_tws").toString
    try {
      val in = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[CdcMerge.CdcRecord]
      val q = CdcMerge.applyStreamTws(in.toDS(), deleteOp = "D")
        .writeStream.format("memory").queryName("cdc_tws_inspect")
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append).start()
      try {
        in.addData(CdcMerge.CdcRecord(7L, 10L, 1L, "U", "z"))
        q.processAllAvailable()
      } finally q.stop()
      val state = graft.streaming.StateInspect
        .flatKeyValue(s, ckpt, stateVarName = Some("cur"))
        .select(col("state_key"), col("state_value.seq"),
          col("state_value.payload"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      assert(state === Set((7L, 10L, "z")), state.toString)
    } finally prior match {
      case Some(v) =>
        s.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None =>
        s.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
