package graft

import graft.operators.{CdcMerge, TimeSeries, TrailingUniques}
import graft.pipeline.Dedup
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode

import scala.collection.mutable

/**
 * Checkpoint-restart parity for the STATEFUL pipeline operators — the
 * same discipline the runner's Kafka-shape e2e enforces
 * (QueryRunnerSpec): kill the query mid-stream, land new data while it
 * is down, restart the rebuilt pipeline on the SAME checkpoint, and
 * prove the operator's state survived by an output only the carried
 * state can produce (a flag scored against pre-crash moments, a stale
 * CDC record staying silent, a duplicate suppressed across the crash).
 * Each test's phase-2 assertion FAILS if the state store restarted
 * empty, so a regression in how these operators interact with
 * checkpoint recovery cannot pass silently.
 */
class StreamingRestartSpec extends SparkTestBase {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def writeFile(dir: String, name: String, lines: Seq[String]): Unit = {
    val tmpPath = java.nio.file.Paths.get(dir, s".$name.tmp")
    java.nio.file.Files.write(tmpPath, lines.mkString("\n").getBytes("UTF-8"))
    java.nio.file.Files.move(tmpPath, java.nio.file.Paths.get(dir, name),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** Await the source commit log catching up to the offset log so a stop
    * here cannot replay the last batch on restart (at-least-once edge —
    * same guard as the runner's Kafka-shape e2e). */
  private def awaitCommitted(ckpt: String): Unit = {
    def logMax(sub: String): Long = {
      val files = Option(new java.io.File(s"$ckpt/$sub").list()).getOrElse(Array.empty)
      files.filter(_.forall(_.isDigit)).map(_.toLong).foldLeft(-1L)(math.max)
    }
    val deadline = System.currentTimeMillis() + 30000
    while (logMax("commits") < logMax("offsets") &&
      System.currentTimeMillis() < deadline) Thread.sleep(100)
    assert(logMax("commits") >= logMax("offsets"),
      s"commit log never caught up: offsets=${logMax("offsets")} commits=${logMax("commits")}")
  }

  test("anomaliesStream: restart carries per-key moments across the crash") {
    val s = spark
    import s.implicits._
    val inDir = tmp("graft-anom-in"); val ckpt = tmp("graft-anom-ckpt")
    val flags = mutable.ArrayBuffer.empty[TimeSeries.AnomalyFlag]
    def start() = TimeSeries.anomaliesStream(
        s.readStream.schema("key LONG, bucket LONG, cnt LONG").json(inDir)
          .as[TimeSeries.BucketObs], z = 3, minBuckets = 12)
      .writeStream.outputMode(OutputMode.Append)
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[TimeSeries.AnomalyFlag], _: Long) =>
        flags.synchronized { flags ++= b.collect() }; ()
      }.start()

    // phase 1: 20 quiet buckets (cnt 1..3 cycling) build the moments
    val q1 = start()
    try {
      writeFile(inDir, "f1.json", (0 until 20).map(b =>
        s"""{"key": 1, "bucket": $b, "cnt": ${1 + b % 3}}"""))
      q1.processAllAvailable()
      awaitCommitted(ckpt)
    } finally q1.stop()
    assert(flags.isEmpty, "quiet phase must not flag")

    // spike lands while the query is DOWN
    writeFile(inDir, "f2.json",
      Seq("""{"key": 1, "bucket": 20, "cnt": 1000}"""))

    // phase 2: rebuilt pipeline, same checkpoint — the spike must score
    // against the PRE-CRASH moments (n=20), which only restored state
    // can produce (a fresh state would sit below minBuckets and stay
    // silent — and silence here means state was lost)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val got = flags.synchronized(flags.toList)
    assert(got.map(f => (f.key, f.bucket, f.cnt, f.n, f.s)) ===
      List((1L, 20L, 1000L, 20L, (0 until 20).map(b => 1L + b % 3).sum)),
      s"expected one flag against restored n=20 moments, got $got")
  }

  test("applyStream: restart keeps the (seq, tie) winner — stale records stay silent") {
    val s = spark
    import s.implicits._
    val inDir = tmp("graft-cdc-in"); val ckpt = tmp("graft-cdc-ckpt")
    val images = mutable.ArrayBuffer.empty[CdcMerge.CdcImage]
    def start() = CdcMerge.applyStream(
        s.readStream
          .schema("key LONG, seq LONG, tie LONG, op STRING, payload STRING")
          .json(inDir).as[CdcMerge.CdcRecord], deleteOp = "D")
      .writeStream.outputMode(OutputMode.Append)
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[CdcMerge.CdcImage], _: Long) =>
        images.synchronized { images ++= b.collect() }; ()
      }.start()

    val q1 = start()
    try {
      writeFile(inDir, "f1.json", Seq(
        """{"key": 1, "seq": 5, "tie": 1, "op": "U", "payload": "v5"}""",
        """{"key": 2, "seq": 2, "tie": 1, "op": "U", "payload": "w2"}"""))
      q1.processAllAvailable()
      awaitCommitted(ckpt)
    } finally q1.stop()
    assert(images.synchronized(images.map(i => i.key -> i.seq).toSet) ===
      Set(1L -> 5L, 2L -> 2L))
    images.synchronized(images.clear())

    // while down: a STALE record for key 1 and a fresh one for key 2
    writeFile(inDir, "f2.json", Seq(
      """{"key": 1, "seq": 3, "tie": 9, "op": "U", "payload": "stale"}""",
      """{"key": 2, "seq": 7, "tie": 1, "op": "U", "payload": "w7"}"""))

    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val got = images.synchronized(images.toList)
    // restored state (key 1 at seq 5) absorbs the stale record silently;
    // an empty restart would have emitted key 1 at seq 3
    assert(got.map(i => (i.key, i.seq, i.payload)) === List((2L, 7L, "w7")),
      s"stale record must lose against RESTORED state, got $got")
  }

  test("exactDedupStream: a duplicate arriving after the crash is still suppressed") {
    val s = spark
    val inDir = tmp("graft-dedup-in"); val ckpt = tmp("graft-dedup-ckpt")
    val kept = mutable.ArrayBuffer.empty[(Long, String)]
    def start() = Dedup.exactDedupStream(
        s.readStream.schema("id LONG, content STRING").json(inDir), "content")
      .writeStream.outputMode(OutputMode.Append)
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val rows = b.select(col("id"), col("content")).collect()
          .map(r => (r.getLong(0), r.getString(1)))
        kept.synchronized { kept ++= rows }; ()
      }.start()

    val q1 = start()
    try {
      writeFile(inDir, "f1.json", Seq(
        """{"id": 1, "content": "x"}""", """{"id": 2, "content": "y"}"""))
      q1.processAllAvailable()
      awaitCommitted(ckpt)
    } finally q1.stop()
    assert(kept.synchronized(kept.map(_._1).toSet) === Set(1L, 2L))
    kept.synchronized(kept.clear())

    // while down: a duplicate of pre-crash content and one novel doc
    writeFile(inDir, "f2.json", Seq(
      """{"id": 3, "content": "x"}""", """{"id": 4, "content": "z"}"""))

    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    // only the novel doc survives — the duplicate was suppressed by
    // dedup state RESTORED from the checkpoint (an empty restart would
    // have passed id 3 through)
    assert(kept.synchronized(kept.toList) === List((4L, "z")),
      s"duplicate must stay suppressed across restart, got ${kept.toList}")
  }

  test("simhashDedupStream: near-dup band ownership survives restart; watermark flushes") {
    val s = spark
    val inDir = tmp("graft-sim-in"); val ckpt = tmp("graft-sim-ckpt")
    val kept = mutable.ArrayBuffer.empty[Long]
    def start() = Dedup.simhashDedupStream(
        s.readStream.schema("doc_id LONG, text STRING, ts TIMESTAMP").json(inDir),
        "doc_id", "text", n = 3, eventTimeCol = Some("ts"), delay = "10 seconds")
      .writeStream.outputMode(OutputMode.Append)
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val rows = b.select(col("doc_id")).collect().map(_.getLong(0))
        kept.synchronized { kept ++= rows }; ()
      }.start()

    val text = "the quick brown fox jumps over the lazy dog again and again"
    // phase 1: the original doc claims all its bands, then CRASH before
    // any window flushes (watermark still at epoch)
    val q1 = start()
    try {
      writeFile(inDir, "f1.json", Seq(
        s"""{"doc_id": 1, "text": "$text", "ts": "2026-01-01T00:00:05.000Z"}"""))
      q1.processAllAvailable()
      awaitCommitted(ckpt)
    } finally q1.stop()
    assert(kept.isEmpty, "nothing flushes before the watermark moves")

    // while down: an IDENTICAL near-dup in the same window
    writeFile(inDir, "f2.json", Seq(
      s"""{"doc_id": 2, "text": "$text", "ts": "2026-01-01T00:00:06.000Z"}"""))

    val q2 = start()
    try {
      q2.processAllAvailable()
      // far-future doc pushes the watermark past the first window's end
      // so it flushes (separate batch — the watermark only advances
      // after the batch carrying the late timestamp completes)
      writeFile(inDir, "f3.json", Seq(
        """{"doc_id": 9, "text": "completely different words entirely novel content here", "ts": "2026-01-01T00:05:00.000Z"}"""))
      q2.processAllAvailable()
    } finally q2.stop()
    val got = kept.synchronized(kept.toList)
    // doc 1 flushes with ALL its bands (restored dropDuplicates state
    // still owns them); doc 2's bands all lost to the restored state so
    // it never reaches the band-count bar — had the state restarted
    // empty, doc 2 would have claimed the bands and been emitted
    assert(got.contains(1L), s"original must flush after restart, got $got")
    assert(!got.contains(2L), s"near-dup must stay suppressed across restart, got $got")
  }

  test("winnowDedupStream: fingerprint ownership survives restart; copy stays suppressed") {
    val s = spark
    val inDir = tmp("graft-win-in"); val ckpt = tmp("graft-win-ckpt")
    val kept = mutable.ArrayBuffer.empty[Long]
    def start() = graft.pipeline.Winnowing.winnowDedupStream(
        s.readStream.schema("doc_id LONG, text STRING, ts TIMESTAMP").json(inDir),
        "doc_id", "text", k = 8, w = 4,
        eventTimeCol = Some("ts"), delay = "10 seconds")
      .writeStream.outputMode(OutputMode.Append)
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val rows = b.select(col("doc_id")).collect().map(_.getLong(0))
        kept.synchronized { kept ++= rows }; ()
      }.start()

    val text = "the quick brown fox jumps over the lazy dog again and again today"
    // phase 1: the original claims its fingerprints, CRASH pre-flush
    val q1 = start()
    try {
      writeFile(inDir, "f1.json", Seq(
        s"""{"doc_id": 1, "text": "$text", "ts": "2026-01-01T00:00:05.000Z"}"""))
      q1.processAllAvailable()
      awaitCommitted(ckpt)
    } finally q1.stop()
    assert(kept.isEmpty, "nothing flushes before the watermark moves")

    // while down: an EXACT copy in the same window
    writeFile(inDir, "f2.json", Seq(
      s"""{"doc_id": 2, "text": "$text", "ts": "2026-01-01T00:00:06.000Z"}"""))

    val q2 = start()
    try {
      q2.processAllAvailable()
      // far-future novel doc pushes the watermark past the first window
      writeFile(inDir, "f3.json", Seq(
        """{"doc_id": 9, "text": "completely different words entirely novel content in this one here", "ts": "2026-01-01T00:05:00.000Z"}"""))
      q2.processAllAvailable()
    } finally q2.stop()
    val got = kept.synchronized(kept.toList)
    // doc 1 flushes having claimed ALL its fingerprints (restored
    // dropDuplicates state still owns them); doc 2 claims none against
    // the RESTORED state — an empty restart would have emitted it
    assert(got.contains(1L), s"original must flush after restart, got $got")
    assert(!got.contains(2L), s"copy must stay suppressed across restart, got $got")
  }

  test("decontaminationStream: committed batch not re-emitted after restart; post-crash batch still probes") {
    val s = spark
    import s.implicits._
    val inDir = tmp("graft-substr-in"); val ckpt = tmp("graft-substr-ckpt")
    val outDir = tmp("graft-substr-out") + "/spans"
    val idxDir = tmp("graft-substr-idx") + "/idx"
    // 39 chars, no repeated 8-gram — the contamination plant
    val quoted = "QWJXZVKPYGHMBTFDNRLSCUAEI0123456789qwer"
    val corpus = Seq(
      (1L, s"corpus document holds $quoted plus its own tail words here"),
      (2L, "a completely unrelated corpus document with different words"))
      .toDF("doc_id", "text")
    graft.pipeline.ExactSubstr.anchorIndex(corpus, "doc_id", "text",
        k = 8, stride = 1, maxDocFreq = 8, maxOccPerDoc = 32)
      .write.mode("overwrite").parquet(idxDir)
    def start() = graft.pipeline.ExactSubstr.decontaminationStream(
      s.readStream.schema("doc_id LONG, text STRING").json(inDir),
      "doc_id", "text", corpus, s.read.parquet(idxDir),
      k = 8, stride = 1, minLen = 30, outPath = outDir, checkpoint = ckpt,
      maxDocFreq = 8, maxOccPerDoc = 32)

    // phase 1: one contaminated arrival, committed, then CRASH
    val q1 = start()
    try {
      // ':'/'#' delimiters differ from the corpus's surrounding spaces,
      // so the extension stops exactly at the 39-char plant
      writeFile(inDir, "f1.json", Seq(
        s"""{"doc_id": 100, "text": "first arrival quoting:$quoted#end"}"""))
      q1.processAllAvailable()
      awaitCommitted(ckpt)
    } finally q1.stop()

    // while down: a second contaminated arrival lands
    writeFile(inDir, "f2.json", Seq(
      s"""{"doc_id": 101, "text": "second arrival also quoting>$quoted!tail"}"""))

    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    val got = s.read.parquet(outDir)
      .select(col("new_id"), col("corpus_id"), col("span_len"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    // exactly one span per arrival: the committed batch-0 output was NOT
    // re-emitted on restart (idempotent per-batch overwrite + resumed
    // offsets), and the post-crash batch probed the same stored index
    assert(got === Seq((100L, 1L, 39L), (101L, 1L, 39L)), got.toString)
  }

  test("nearDupStream: committed batch not re-emitted after restart; post-crash batch still probes the band index") {
    val s = spark
    import s.implicits._
    val inDir = tmp("graft-embed-in"); val ckpt = tmp("graft-embed-ckpt")
    val outDir = tmp("graft-embed-out") + "/pairs"
    val idxDir = tmp("graft-embed-idx") + "/idx"
    def axis(a: Int): Seq[Double] =
      (0 until 8).map(i => if (i == a) 1.0 else 0.0)
    val corpus = Seq((1L, axis(0)), (2L, axis(3)), (3L, axis(6)))
      .toDF("vec_id", "embedding")
    graft.pipeline.Similarity.embedBandIndex(corpus, "vec_id", "embedding",
        dim = 8, numPlanes = 16, bands = 8)
      .write.mode("overwrite").parquet(idxDir)
    def start() = graft.pipeline.Similarity.nearDupStream(
      s.readStream.schema("vec_id LONG, embedding ARRAY<DOUBLE>").json(inDir),
      "vec_id", "embedding", corpus, s.read.parquet(idxDir),
      threshold = 0.99, dim = 8, outPath = outDir, checkpoint = ckpt,
      numPlanes = 16, bands = 8)
    def vecJson(id: Long, a: Int): String =
      s"""{"vec_id": $id, "embedding": [${axis(a).mkString(",")}]}"""

    // phase 1: one near-dup arrival (copy of corpus vector 1), committed,
    // then CRASH
    val q1 = start()
    try {
      writeFile(inDir, "f1.json", Seq(vecJson(100L, 0)))
      q1.processAllAvailable()
      awaitCommitted(ckpt)
    } finally q1.stop()

    // while down: a second near-dup (copy of corpus vector 2) lands
    writeFile(inDir, "f2.json", Seq(vecJson(101L, 3)))

    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    val got = s.read.parquet(outDir)
      .select(col("new_id"), col("corpus_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    // exactly one pair per arrival: the committed batch-0 output was NOT
    // re-emitted on restart (idempotent per-batch overwrite + resumed
    // offsets), and the post-crash batch probed the same stored index
    assert(got === Seq((100L, 1L), (101L, 2L)), got.toString)
  }

  test("annProbeStream: committed batch not re-emitted after restart; post-crash batch still probes the stored index") {
    val s = spark
    import s.implicits._
    val inDir = tmp("graft-ann-in"); val ckpt = tmp("graft-ann-ckpt")
    val outDir = tmp("graft-ann-out") + "/topk"
    val idxDir = tmp("graft-ann-idx")
    // 3 well-separated axis clusters, 8 dims, ids 0..29
    val corpus = (0 until 30).map { i =>
      val v = Array.fill(8)(0.05 * (i % 5)); v((i % 3) * 2) += 10.0
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
    val (cdf, bdf, adf) = graft.pipeline.Similarity.annIndexBuild(
      corpus, "vec_id", "embedding", dim = 8, nlist = 3, m = 4, ksub = 8, iters = 2)
    cdf.write.mode("overwrite").parquet(s"$idxDir/cents")
    bdf.write.mode("overwrite").parquet(s"$idxDir/books")
    adf.write.mode("overwrite").parquet(s"$idxDir/assign")
    def start() = graft.pipeline.Similarity.annProbeStream(
      s.readStream.schema("vec_id LONG, embedding ARRAY<DOUBLE>").json(inDir),
      "vec_id", "embedding",
      s.read.parquet(s"$idxDir/cents"), s.read.parquet(s"$idxDir/books"),
      s.read.parquet(s"$idxDir/assign"), rerankVecs = corpus,
      k = 3, dim = 8, nprobe = 2, rerank = 10,
      outPath = outDir, checkpoint = ckpt)
    def qJson(id: Long, like: Int): String = {
      val v = Array.fill(8)(0.05 * (like % 5)); v((like % 3) * 2) += 10.0
      s"""{"vec_id": $id, "embedding": [${v.mkString(",")}]}"""
    }

    val q1 = start()
    try {
      writeFile(inDir, "f1.json", Seq(qJson(1000L, 0))) // cluster-0 query
      q1.processAllAvailable()
      awaitCommitted(ckpt)
    } finally q1.stop()

    // while down: a cluster-1 query lands
    writeFile(inDir, "f2.json", Seq(qJson(1001L, 1)))

    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    val got = s.read.parquet(outDir)
      .select(col("query_id"), col("neighbor_id"), col("sim")).collect()
    // exactly k rows per arrival — the committed batch-0 output was NOT
    // re-emitted on restart; the post-crash batch probed the same index
    assert(got.length === 6, got.mkString(", "))
    val byQ = got.groupBy(_.getLong(0))
    assert(byQ.keySet === Set(1000L, 1001L))
    // each query's top neighbor is its own source vector (sim 1.0)
    assert(byQ(1000L).maxBy(_.getDouble(2)).getLong(1) === 0L)
    assert(byQ(1001L).maxBy(_.getDouble(2)).getLong(1) === 1L)
  }

  test("annIndexAppendStream: committed batch not re-appended after restart; appends equal a one-shot encode") {
    val s = spark
    import s.implicits._
    val inDir = tmp("graft-annap-in"); val ckpt = tmp("graft-annap-ckpt")
    val apDir = tmp("graft-annap-appends"); val idxDir = tmp("graft-annap-idx")
    val corpus = (0 until 30).map { i =>
      val v = Array.fill(8)(0.05 * (i % 5)); v((i % 3) * 2) += 10.0
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
    val (cdf, bdf, _) = graft.pipeline.Similarity.annIndexBuild(
      corpus, "vec_id", "embedding", dim = 8, nlist = 3, m = 4, ksub = 8, iters = 2)
    cdf.write.mode("overwrite").parquet(s"$idxDir/cents")
    bdf.write.mode("overwrite").parquet(s"$idxDir/books")
    def start() = graft.pipeline.Similarity.annIndexAppendStream(
      s.readStream.schema("vec_id LONG, embedding ARRAY<DOUBLE>").json(inDir),
      "vec_id", "embedding",
      s.read.parquet(s"$idxDir/cents"), s.read.parquet(s"$idxDir/books"),
      dim = 8, appendsPath = apDir, checkpoint = ckpt)
    def vJson(id: Long, like: Int): String = {
      val v = Array.fill(8)(0.05 * (like % 5)); v((like % 3) * 2) += 10.0
      s"""{"vec_id": $id, "embedding": [${v.mkString(",")}]}"""
    }

    val q1 = start()
    try {
      writeFile(inDir, "f1.json", Seq(vJson(100L, 0), vJson(101L, 1)))
      q1.processAllAvailable()
      awaitCommitted(ckpt)
    } finally q1.stop()

    // while down: another vector lands
    writeFile(inDir, "f2.json", Seq(vJson(102L, 2)))

    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    val appends = s.read.parquet(apDir)
      .select(col("neighbor_id"), col("cell"), col("codes"))
    // the committed batch was NOT re-appended: exactly one row per
    // arrived vector, across both batch directories
    assert(appends.count() === 3)
    assert(appends.select("neighbor_id").as[Long].collect().toSet ===
      Set(100L, 101L, 102L))
    // streamed encodes equal a one-shot batch encode of the same vectors
    // (fixed artifacts -> deterministic codes), so probe math is
    // arrival-invariant by construction
    val newVecs = Seq(100L -> 0, 101L -> 1, 102L -> 2).map { case (id, like) =>
      val v = Array.fill(8)(0.05 * (like % 5)); v((like % 3) * 2) += 10.0
      (id, v.toSeq)
    }.toDF("vec_id", "embedding")
    val oneShot = graft.pipeline.Similarity.annIndexAppend(newVecs,
      "vec_id", "embedding",
      s.read.parquet(s"$idxDir/cents"), s.read.parquet(s"$idxDir/books"), dim = 8)
    assert(appends.exceptAll(oneShot).isEmpty && oneShot.exceptAll(appends).isEmpty)
  }

  test("statefulSessions: an open session spans the crash and closes with pre-crash events") {
    val s = spark
    import s.implicits._
    val inDir = tmp("graft-sess-in"); val ckpt = tmp("graft-sess-ckpt")
    val closed = mutable.ArrayBuffer.empty[graft.operators.ClosedSession]
    def start() = graft.operators.Sessionize.statefulSessions(
        s.readStream.schema("user STRING, ts TIMESTAMP, etype STRING").json(inDir),
        "user", "ts", "etype", gapMs = 60000L, watermarkDelay = "30 seconds")
      .writeStream.outputMode(OutputMode.Append)
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[graft.operators.ClosedSession], _: Long) =>
        closed.synchronized { closed ++= b.collect() }; ()
      }.start()

    // phase 1: two events open u1's session, then CRASH with it open
    val q1 = start()
    try {
      writeFile(inDir, "f1.json", Seq(
        """{"user": "u1", "ts": "2026-01-01T10:00:00.000Z", "etype": "view"}""",
        """{"user": "u1", "ts": "2026-01-01T10:00:10.000Z", "etype": "click"}"""))
      q1.processAllAvailable()
      awaitCommitted(ckpt)
    } finally q1.stop()
    assert(closed.isEmpty, "session must still be open at the crash")

    // while down: a third event INSIDE the same session's gap, plus a
    // far-future event from another user that will push the watermark
    // past u1's last + gap and time the session out
    writeFile(inDir, "f2.json", Seq(
      """{"user": "u1", "ts": "2026-01-01T10:00:20.000Z", "etype": "buy"}"""))

    val q2 = start()
    try {
      q2.processAllAvailable()
      writeFile(inDir, "f3.json", Seq(
        """{"user": "w", "ts": "2026-01-01T10:10:00.000Z", "etype": "view"}"""))
      q2.processAllAvailable()
    } finally q2.stop()
    val got = closed.synchronized(closed.toList).filter(_.entity == "u1")
    // n=3 with the 10:00:00 start and view->buy endpoints is derivable
    // ONLY from restored state — a fresh store would open at 10:00:20
    // with n=1 and firstType "buy"
    assert(got.map(c => (c.n_events, c.first_type, c.last_type, c.type_switches)) ===
      List((3L, "view", "buy", 2L)),
      s"expected the pre-crash session to absorb the post-restart event, got $got")
    assert(got.head.start_ms === java.time.Instant.parse("2026-01-01T10:00:00Z").toEpochMilli)
  }

  test("applyStreamTws (transformWithState/RocksDB): restored ValueState absorbs a stale record") {
    val s = spark
    import s.implicits._
    val prior = s.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val inDir = tmp("graft-tws-in"); val ckpt = tmp("graft-tws-ckpt")
      val images = mutable.ArrayBuffer.empty[CdcMerge.CdcImage]
      def start() = CdcMerge.applyStreamTws(
          s.readStream
            .schema("key LONG, seq LONG, tie LONG, op STRING, payload STRING")
            .json(inDir).as[CdcMerge.CdcRecord], deleteOp = "D")
        .writeStream.outputMode(OutputMode.Append)
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[CdcMerge.CdcImage], _: Long) =>
          images.synchronized { images ++= b.collect() }; ()
        }.start()

      val q1 = start()
      try {
        writeFile(inDir, "f1.json", Seq(
          """{"key": 1, "seq": 5, "tie": 1, "op": "U", "payload": "v5"}""",
          """{"key": 2, "seq": 2, "tie": 1, "op": "U", "payload": "w2"}"""))
        q1.processAllAvailable()
        awaitCommitted(ckpt)
      } finally q1.stop()
      assert(images.synchronized(images.map(i => i.key -> i.seq).toSet) ===
        Set(1L -> 5L, 2L -> 2L))
      images.synchronized(images.clear())

      // while down: a STALE record for key 1 and a fresh one for key 2 —
      // same adversarial shape as the flatMapGroupsWithState twin above,
      // now against the RocksDB-backed typed ValueState
      writeFile(inDir, "f2.json", Seq(
        """{"key": 1, "seq": 3, "tie": 9, "op": "U", "payload": "stale"}""",
        """{"key": 2, "seq": 7, "tie": 1, "op": "U", "payload": "w7"}"""))

      val q2 = start()
      try q2.processAllAvailable() finally q2.stop()
      val got = images.synchronized(images.toList)
      assert(got.map(i => (i.key, i.seq, i.payload)) === List((2L, 7L, "w7")),
        s"stale record must lose against RESTORED RocksDB state, got $got")
    } finally prior match {
      case Some(v) => s.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => s.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("runner additive window: restart re-arms the query; accumulation resumes without replay") {
    // The runner's DESIGNED restart contract for aggregation state
    // (QueryRunner registry docs): specs persist, partials rebuild from
    // the stream. For an ADDITIVE (no-reset) window that means (a) the
    // re-armed query keeps its id/window shape, (b) committed pre-crash
    // data does NOT replay into the accumulator, and (c) accumulation is
    // cumulative across post-restart batches. All three are asserted.
    import graft.model._
    import graft.streaming.QueryRunner
    val inDir = tmp("graft-add-in"); val ckpt = tmp("graft-add-ckpt")
    def pipeline = spark.readStream
      .schema("event_id LONG, etype STRING").json(inDir)
    val spec = QuerySpec("additive",
      filter = Some(Binary(Field("etype"), Lit("click"), BinOp.EQUALS)),
      aggregation = GroupAll(Seq(GroupOp(GroupOpType.COUNT, None, "cnt"))),
      window = Some(WindowSpec(WindowUnit.RECORD, 3, WindowUnit.ALL, 0)),
      durationMs = 600000L)
    def awaitUntil(deadlineMs: Long)(cond: => Boolean): Boolean = {
      val deadline = System.currentTimeMillis() + deadlineMs
      while (!cond && System.currentTimeMillis() < deadline) Thread.sleep(100)
      cond
    }
    def clicks(ids: Range): Seq[String] =
      ids.map(i => s"""{"event_id": $i, "etype": "click"}""")

    // phase 1: 3 clicks -> one additive window clip (cnt 3), then CRASH
    val r1 = new QueryRunner(spark)
    val sq1 = r1.runStream(pipeline, Some(ckpt), triggerMs = 200, tickIntervalMs = 100)
    try {
      r1.register(spec)
      writeFile(inDir, "f1.json", clicks(1 to 3))
      assert(awaitUntil(30000)(r1.results.exists(c =>
        c.queryId == "additive" && c.meta.contains("window_number"))),
        "phase-1 additive window never emitted")
      awaitCommitted(ckpt)
    } finally sq1.stop()

    // while down: 3 more clicks land
    writeFile(inDir, "f2.json", clicks(4 to 6))

    // phase 2: fresh runner, SAME checkpoint; a further batch streams in
    // AFTER the restart so the accumulator must carry across batches
    val r2 = new QueryRunner(spark)
    val sq2 = r2.runStream(pipeline, Some(ckpt), triggerMs = 200, tickIntervalMs = 100)
    try {
      assert(awaitUntil(30000)(r2.results.exists(c =>
        c.queryId == "additive" && c.meta.contains("window_number"))),
        s"post-restart window never emitted: ${r2.results.map(_.meta)}")
      writeFile(inDir, "f3.json", clicks(7 to 9))
      assert(awaitUntil(30000)(r2.results.count(c =>
        c.queryId == "additive" && c.meta.contains("window_number")) >= 2),
        s"second post-restart window never emitted: ${r2.results.map(_.meta)}")
    } finally sq2.stop()
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val counts = r2.results.filter(_.meta.contains("window_number"))
      .sortBy(_.meta("window_number").asInstanceOf[Long])
      .map(_.records.head)
      .map(r => mapper.readTree(r).get("cnt").asLong())
    // no replay: the first post-restart window holds file2's first 3
    // clicks (a replay would emit 3 from file1 first AND re-count them);
    // additive: the second window holds ALL 6 post-restart clicks
    assert(counts === Seq(3L, 6L),
      s"expected cumulative (3, 6) over post-restart clicks only, got $counts")
  }

  test("ProgressLog: per-batch engine metrics captured, ring-bounded") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val log = graft.streaming.ProgressLog.attach(s, capacity = 2)
    try {
      val in = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[Long]
      val q = in.toDS().groupBy().count()
        .writeStream.format("memory").queryName("plog_q")
        .outputMode("complete").start()
      try {
        in.addData(1L, 2L, 3L); q.processAllAvailable()
        in.addData(4L);         q.processAllAvailable()
        in.addData(5L, 6L);     q.processAllAvailable()
      } finally q.stop()
      // listener events are delivered asynchronously
      var rows = Array.empty[org.apache.spark.sql.Row]
      val deadline = System.currentTimeMillis() + 30000
      while (rows.length < 2 && System.currentTimeMillis() < deadline) {
        Thread.sleep(100)
        rows = log.toDF(s).filter(col("query") === "plog_q")
          .filter(col("input_rows") > 0).collect()
      }
      // ring capacity 2: at most the LAST two batches are retained
      assert(rows.length === 2, rows.mkString(";"))
      val byBatch = rows.map(r => r.getLong(1) -> r.getLong(2)).toMap
      assert(byBatch.values.toSeq.sorted === Seq(1L, 2L),
        s"expected the last two batches (1 and 2 rows), got $byBatch")
      assert(rows.forall(_.getLong(5) >= 1L), "state rows visible")
    } finally s.streams.removeListener(log)
  }

  test("trailingUniquesStream: the restored sketch dedups keys seen before the crash") {
    val s = spark
    import s.implicits._
    val inDir = tmp("graft-tu-in"); val ckpt = tmp("graft-tu-ckpt")
    val updates = mutable.ArrayBuffer.empty[TrailingUniques.TrailingUpdate]
    def start() = TrailingUniques.trailingUniquesStream(
        s.readStream.schema("key LONG, bucket LONG").json(inDir)
          .as[TrailingUniques.Obs], window = 3)
      .writeStream.outputMode(OutputMode.Update)
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[TrailingUniques.TrailingUpdate], _: Long) =>
        updates.synchronized { updates ++= b.collect() }; ()
      }.start()

    // phase 1: keys 1..5 in bucket 0, keys 6..10 in bucket 1 — target
    // bucket 2's sketch now holds all ten
    val q1 = start()
    try {
      writeFile(inDir, "f1.json",
        (1 to 5).map(k => s"""{"key": $k, "bucket": 0}""") ++
          (6 to 10).map(k => s"""{"key": $k, "bucket": 1}"""))
      q1.processAllAvailable()
      awaitCommitted(ckpt)
    } finally q1.stop()

    // while down: keys 1..5 AGAIN, now in bucket 2
    writeFile(inDir, "f2.json", (1 to 5).map(k => s"""{"key": $k, "bucket": 2}"""))

    // phase 2: bucket 2's trailing count must be 10 — the RESTORED
    // sketch absorbs the replayed keys idempotently; an empty restart
    // would report 5
    updates.synchronized(updates.clear())
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val b2 = updates.synchronized(updates.filter(_.bucket == 2L).map(_.nTrailing))
    assert(b2 === Seq(10L),
      s"bucket 2 must count all ten keys from restored state, got $b2")
  }
}
