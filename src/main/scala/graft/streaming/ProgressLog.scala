package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.types._

/**
 * Engine-level streaming observability: a [[StreamingQueryListener]]
 * that keeps every micro-batch's progress as structured rows —
 * batch id, input rows, processed rate, trigger latency, state rows —
 * queryable as a DataFrame while the stream runs. This is the layer
 * BELOW [[QueryRunner.queryStats]] (which counts per registered
 * query): per-BATCH engine health, the numbers an operator pages on
 * (rate collapsing, state exploding, trigger latency creeping toward
 * the interval).
 *
 * Bounded by construction: a ring of the last `capacity` batches per
 * stream — observability state must never become the memory leak it is
 * meant to catch. Attach once per session; the listener serves every
 * query on it, keyed by query name (runId-keyed for anonymous
 * queries).
 */
final class ProgressLog(capacity: Int = 1024) extends StreamingQueryListener {
  require(capacity >= 1, "capacity must be >= 1")

  private case class Entry(query: String, batchId: Long, inputRows: Long,
                           processedPerSec: Double, triggerMs: Long,
                           stateRows: Long)
  // one ring PER STREAM: a chatty query must not evict the quiet one's
  // history (the quiet-but-stateful stream is the one an operator
  // cares about)
  private val bufs =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.ArrayDeque[Entry]]()

  override def onQueryStarted(
      e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryTerminated(
      e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(
      e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    val name = Option(p.name).getOrElse(p.runId.toString)
    val stateRows = Option(p.stateOperators).map(_.map(_.numRowsTotal).sum)
      .getOrElse(0L)
    val trigger = Option(p.durationMs.get("triggerExecution"))
      .map(_.longValue()).getOrElse(0L)
    val buf = bufs.computeIfAbsent(name,
      _ => new java.util.ArrayDeque[Entry]())
    buf.synchronized {
      buf.addLast(Entry(name, p.batchId, p.numInputRows,
        p.processedRowsPerSecond, trigger, stateRows))
      while (buf.size() > capacity) buf.removeFirst()
    }
  }

  private val schema = StructType(Seq(
    StructField("query", StringType, nullable = false),
    StructField("batch_id", LongType, nullable = false),
    StructField("input_rows", LongType, nullable = false),
    StructField("processed_per_sec", DoubleType, nullable = false),
    StructField("trigger_ms", LongType, nullable = false),
    StructField("state_rows", LongType, nullable = false)))

  /** The captured batches as a DataFrame (driver-bounded: ≤ capacity
    * rows PER STREAM) — joinable, filterable, chartable like any
    * frame. */
  def toDF(spark: SparkSession): DataFrame = {
    val out = Vector.newBuilder[Row]
    bufs.forEach { (_, buf) =>
      buf.synchronized {
        val it = buf.iterator()
        while (it.hasNext) { val x = it.next()
          out += Row(x.query, x.batchId, x.inputRows, x.processedPerSec,
            x.triggerMs, x.stateRows) }
      }
    }
    val rows = out.result()
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava), schema)
  }
}

object ProgressLog {
  /** Attach a fresh log to the session; detach with
    * `spark.streams.removeListener(log)` when done. */
  def attach(spark: SparkSession, capacity: Int = 1024): ProgressLog = {
    val log = new ProgressLog(capacity)
    spark.streams.addListener(log)
    log
  }
}
