package graft

import graft.operators.Sessionize
import org.apache.spark.sql.functions._

class SessionizeSpec extends SparkTestBase {

  private lazy val events = {
    val s = spark
    import s.implicits._
    // user 1: three events inside one gap, then a 100-unit jump → 2 sessions
    // user 2: every event 100 apart → one session per event
    Seq(
      (1L, 10L, 100L), (2L, 12L, 101L), (3L, 15L, 102L),
      (4L, 115L, 103L),
      (5L, 10L, 200L), (6L, 110L, 201L), (7L, 210L, 202L)
    ).toDF("eid", "ts", "uid")
      .select(col("eid"), col("ts"), when(col("uid") < 200, 1L).otherwise(2L).as("uid"))
  }

  test("assign: session breaks exactly when the gap EXCEEDS the threshold") {
    val out = Sessionize.assign(events, "uid", "ts", gapUnits = 10, tieCol = "eid")
      .collect().map(r => r.getAs[Long]("eid") -> r.getAs[Long]("session_idx")).toMap
    // user 1: gaps 2, 3 (≤10 → same session), 100 (> 10 → new)
    assert(out(1L) === 1L && out(2L) === 1L && out(3L) === 1L)
    assert(out(4L) === 2L)
    // user 2: every gap is 100 → each event its own session
    assert(out(5L) === 1L && out(6L) === 2L && out(7L) === 3L)
    // a gap EQUAL to the threshold does NOT break (strict >)
    val s = spark
    import s.implicits._
    val eq = Sessionize.assign(
      Seq((1L, 0L, 1L), (2L, 10L, 1L)).toDF("eid", "ts", "uid"),
      "uid", "ts", gapUnits = 10, tieCol = "eid")
      .collect().map(_.getAs[Long]("session_idx")).toSet
    assert(eq === Set(1L))
  }

  test("summarize: per-session counts and bounds; stable under repartitioning") {
    val out = Sessionize.summarize(events, "uid", "ts", 10, "eid")
      .collect().map(r => (r.getLong(0), r.getAs[Long]("session_idx")) ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("start_ts"), r.getAs[Long]("end_ts"))).toMap
    assert(out((1L, 1L)) === ((3L, 10L, 15L)))
    assert(out((1L, 2L)) === ((1L, 115L, 115L)))
    assert(out((2L, 2L)) === ((1L, 110L, 110L)))
    val again = Sessionize.summarize(events.repartition(7), "uid", "ts", 10, "eid")
      .collect().map(r => (r.getLong(0), r.getAs[Long]("session_idx"))).toSet
    assert(again === out.keySet)
  }

  test("summarizeStream: event-time session windows close and emit once the watermark passes") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, java.sql.Timestamp)]
    val out = Sessionize.summarizeStream(
      mem.toDF().toDF("uid", "ts"), "uid", "ts",
      gap = "10 seconds", watermarkDelay = "0 seconds")
    val sq = out.writeStream.format("memory")
      .queryName("sess_stream_out").outputMode("append").start()
    try {
      def t(sec: Long) = new java.sql.Timestamp(sec * 1000L)
      // user 1: events at 1 s and 5 s coalesce (gap < 10 s) into one session
      mem.addData((1L, t(1)), (1L, t(5)))
      sq.processAllAvailable()
      // an event far past the session's end advances the watermark beyond
      // it → the closed session emits in append mode
      mem.addData((2L, t(100)))
      sq.processAllAvailable()
      mem.addData((2L, t(300)))
      sq.processAllAvailable()
    } finally sq.stop()
    val rows = spark.table("sess_stream_out")
      .collect().map(r => (r.getLong(0),
        r.getTimestamp(1).getTime / 1000, r.getTimestamp(2).getTime / 1000,
        r.getTimestamp(3).getTime / 1000, r.getLong(4)))
    // user 1's merged session: window [1, 15) (last event 5 s + 10 s gap),
    // last_event_ts carries the batch-comparable max event time
    assert(rows.contains((1L, 1L, 15L, 5L, 2L)), rows.toSeq)
    // user 2's first session closed by the 300 s event
    assert(rows.contains((2L, 100L, 110L, 100L, 1L)), rows.toSeq)
  }

  test("statefulSessions: order-dependent payload, in-batch close, and timeout close") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, java.sql.Timestamp, String)]
    val out = Sessionize.statefulSessions(
      mem.toDF().toDF("user", "ts", "etype"), "user", "ts", "etype",
      gapMs = 10000L, watermarkDelay = "0 seconds")
    val sq = out.writeStream.format("memory")
      .queryName("stateful_sess_out").outputMode("append").start()
    try {
      def t(sec: Long) = new java.sql.Timestamp(sec * 1000L)
      // u1: click->view->view in one session (1 type switch);
      // u2: two events 500 s apart in the SAME batch -> in-batch close
      mem.addData(("u1", t(1), "click"), ("u1", t(4), "view"),
        ("u1", t(8), "view"), ("u2", t(2), "click"), ("u2", t(502), "buy"))
      sq.processAllAvailable()
      // watermark is now 502 s >> u1's last+gap (18 s): u1 times out on
      // the next batch
      mem.addData(("u3", t(600), "view"))
      sq.processAllAvailable()
      mem.addData(("u3", t(601), "view"))
      sq.processAllAvailable()
    } finally sq.stop()
    val rows = spark.table("stateful_sess_out")
      .collect().map(r => (r.getString(0), r.getLong(1) / 1000,
        r.getLong(2) / 1000, r.getLong(3), r.getString(4), r.getString(5),
        r.getLong(6))).toSet
    // u2's first session closed IN-BATCH by the 502 s event
    assert(rows.contains(("u2", 2L, 2L, 1L, "click", "click", 0L)), rows)
    // u1's session closed by event-time timeout with the journey payload
    assert(rows.contains(("u1", 1L, 8L, 3L, "click", "view", 1L)), rows)
  }

  test("statefulSessions: within-watermark late events extend backwards, never rewrite newest") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, java.sql.Timestamp, String)]
    val out = Sessionize.statefulSessions(
      mem.toDF().toDF("user", "ts", "etype"), "user", "ts", "etype",
      gapMs = 10000L, watermarkDelay = "600 seconds") // generous lateness budget
    val sq = out.writeStream.format("memory")
      .queryName("stateful_late_out").outputMode("append").start()
    try {
      def t(sec: Long) = new java.sql.Timestamp(sec * 1000L)
      // batch 1 opens u1 at [100, 108] with one click->view switch
      mem.addData(("u1", t(100), "click"), ("u1", t(108), "view"))
      sq.processAllAvailable()
      // batch 2: three LATE events inside the watermark —
      //  t=104 mid-session: merges, n+1, no field rewrites
      //  t=95 before start (within gap): start/firstType move back
      //  t=50 more than gap before start: own singleton closed session
      mem.addData(("u1", t(104), "view"), ("u1", t(95), "search"),
        ("u1", t(50), "ad"))
      sq.processAllAvailable()
      // close u1 by advancing the watermark far past last+gap
      mem.addData(("u2", t(2000), "view"))
      sq.processAllAvailable()
      mem.addData(("u2", t(2001), "view"))
      sq.processAllAvailable()
    } finally sq.stop()
    val rows = spark.table("stateful_late_out")
      .collect().map(r => (r.getString(0), r.getLong(1) / 1000,
        r.getLong(2) / 1000, r.getLong(3), r.getString(4), r.getString(5),
        r.getLong(6))).toSet
    // the too-early late event is its own session, emitted immediately
    assert(rows.contains(("u1", 50L, 50L, 1L, "ad", "ad", 0L)), rows)
    // the open session absorbed t=104 and t=95: start pulled back to 95,
    // firstType to the late "search", last/lastType still the on-time
    // (108, view), switches still the on-time 1
    assert(rows.contains(("u1", 95L, 108L, 4L, "search", "view", 1L)), rows)
  }

  test("one shuffle: lag, running sum, and the summary agg share the entity partitioning") {
    val plan = Sessionize.summarize(events, "uid", "ts", 10, "eid")
      .queryExecution.executedPlan.toString
    // exactly one exchange (by uid); the window pair and the groupBy reuse it
    val exchanges = plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") && !l.contains("Reused"))
    assert(exchanges === 1, plan.take(1500))
  }
}
