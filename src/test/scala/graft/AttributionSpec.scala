package graft

import graft.operators.Attribution
import org.apache.spark.sql.functions._

class AttributionSpec extends SparkTestBase {

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("batch: joins only touchpoints inside the window, boundary inclusive at conv") {
    val s = spark
    import s.implicits._
    val conv = Seq(("u1", ts(100), 1L), ("u2", ts(200), 2L))
      .toDF("user", "cts", "conv_id")
    val touch = Seq(
      ("u1", ts(95), 10L),  // in window
      ("u1", ts(100), 11L), // boundary: touchTs == convTs counts
      ("u1", ts(39), 12L),  // 61 s before: outside 60 s window
      ("u2", ts(250), 13L), // after the conversion
      ("u3", ts(199), 14L)  // wrong user
    ).toDF("user", "tts", "touch_id")
    val got = Attribution.attribute(conv, touch, "user", "cts", "tts", windowSec = 60)
      .select(col("conv_id"), col("touch_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 10L), (1L, 11L)))
  }

  test("batch plan: equi-join on the key, no nested loop") {
    val s = spark
    import s.implicits._
    val conv = Seq(("u1", ts(1), 1L)).toDF("user", "cts", "conv_id")
    val touch = Seq(("u1", ts(1), 2L)).toDF("user", "tts", "touch_id")
    val p = Attribution.attribute(conv, touch, "user", "cts", "tts", 60)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p.take(600))
  }

  test("streaming: stream-stream join attributes within the window and evicts state") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val convMem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, java.sql.Timestamp, Long)]
    val touchMem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, java.sql.Timestamp, Long)]
    val out = Attribution.attribute(
      convMem.toDF().toDF("user", "cts", "conv_id"),
      touchMem.toDF().toDF("user", "tts", "touch_id"),
      "user", "cts", "tts", windowSec = 60,
      watermarkDelay = Some("0 seconds"))
      .select(col("conv_id"), col("touch_id"))
    val sq = out.writeStream.format("memory")
      .queryName("attr_out").outputMode("append").start()
    try {
      touchMem.addData(("u1", ts(95), 10L), ("u1", ts(30), 12L))
      sq.processAllAvailable()
      convMem.addData(("u1", ts(100), 1L))
      sq.processAllAvailable()
      // advance both watermarks far past everything so results flush
      touchMem.addData(("zz", ts(10000), 99L))
      convMem.addData(("zz", ts(10000), 99L))
      sq.processAllAvailable()
    } finally sq.stop()
    val got = spark.table("attr_out")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1L, 10L)), got)     // in-window click attributed
    assert(!got.exists(_._2 == 12L), got)    // 70 s-old click not attributed
  }
}
