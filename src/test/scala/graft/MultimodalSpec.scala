package graft

import graft.pipeline.Multimodal
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkTestBase {

  private lazy val docs = {
    val s = spark
    import s.implicits._
    Seq((1L, "hello world", "en", "src0", 11L),
        (2L, "bye", "en", "src1", 3L),
        (10L, "another document body", "de", "src0", 21L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("fromDocuments produces the binary + metadata-struct convention") {
    val m = Multimodal.fromDocuments(docs)
    assert(m.schema.fieldNames.toSeq === Seq("media_id", "content", "meta"))
    val row = m.filter(col("media_id") === 1L).collect()(0)
    assert(new String(row.getAs[Array[Byte]](1)) === "hello world")
    val meta = row.getStruct(2)
    assert(meta.getString(0) === "fmt1")      // 1 % 3
    assert(meta.getInt(1) === 64 + 16)        // 1 % 8 → 80
    assert(meta.getLong(3) === 11L)
  }

  test("metaStats never reads the content column (pruned scan)") {
    val plan = Multimodal.metaStats(Multimodal.fromDocuments(docs))
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("content"))
  }

  /** Expected luminance of synthetic pixel (x, y) in image `id` — the
    * same closed form the DuckDB oracle uses. */
  private def lum(x: Int, y: Int, id: Long): Long = (x + 3L * y + 7L * id) % 256L

  test("syntheticImages writes genuine PNG bytes with id-derived dimensions") {
    implicit val s: SparkSession = spark
    val m = Multimodal.syntheticImages(docs)
    assert(m.schema.fieldNames.toSeq === Seq("media_id", "content", "meta"))
    val row = m.filter(col("media_id") === 1L).collect()(0)
    val bytes = row.getAs[Array[Byte]](1)
    // PNG magic: 0x89 'P' 'N' 'G'
    assert((bytes(0) & 0xFF) === 0x89 && bytes(1) === 'P'.toByte &&
      bytes(2) === 'N'.toByte && bytes(3) === 'G'.toByte)
    val meta = row.getStruct(2)
    assert(meta.getString(0) === "png")
    assert(meta.getInt(1) === 80)  // 64 + (1 % 8) * 16
    assert(meta.getInt(2) === 80)  // 64 + (1 % 5) * 16
  }

  test("decodeImages: REAL codec round trip reproduces the pixel pattern exactly") {
    implicit val s: SparkSession = spark
    val feats = Multimodal.decodeImages(Multimodal.syntheticImages(docs))
      .collect().map(f => f.media_id -> f).toMap
    val f1 = feats(1L)
    assert(f1.ok && f1.width === 80 && f1.height === 80 && f1.n_pixels === 6400L)
    val expectedSum = (for (y <- 0 until 80; x <- 0 until 80) yield lum(x, y, 1L)).sum
    assert(f1.lum_sum === expectedSum)
    // histogram covers every pixel exactly once
    assert(f1.lum_hist.sum === f1.n_pixels)
    // doc 10: 64+2*16=96 wide, 64+0*16=64 tall
    assert(feats(10L).width === 96 && feats(10L).height === 64)
  }

  test("decodeImages survives corrupt/non-image content as ok=false rows") {
    implicit val s: SparkSession = spark
    // text bytes are not a decodable image: every row must survive,
    // flagged, with zeroed features — never fail the job
    val feats = Multimodal.decodeImages(Multimodal.fromDocuments(docs))
      .collect()
    assert(feats.length === 3)
    assert(feats.forall(f => !f.ok && f.width === 0 && f.lum_sum === 0L))
  }

  test("resizeImages: re-decoding the resized PNG yields the resampled pattern") {
    implicit val s: SparkSession = spark
    val resized = Multimodal.resizeImages(Multimodal.syntheticImages(docs), 32, 24)
    val back = Multimodal.decodeImages(resized.toDF())
      .collect().map(f => f.media_id -> f).toMap
    val b1 = back(1L)
    assert(b1.ok && b1.width === 32 && b1.height === 24)
    // nearest neighbor by integer floor from the 80x80 source of id 1
    val expectedSum = (for (y <- 0 until 24; x <- 0 until 32)
      yield lum(x * 80 / 32, y * 80 / 24, 1L)).sum
    assert(b1.lum_sum === expectedSum)
    // corrupt input passes through flagged, not thrown
    val bad = Multimodal.resizeImages(Multimodal.fromDocuments(docs), 32, 24)
      .collect()
    assert(bad.forall(r => !r.ok && r.content.isEmpty))
  }

  test("sampleFrames: REAL animated-GIF demux reproduces every sampled frame's pattern") {
    implicit val s: SparkSession = spark
    def flum(x: Int, y: Int, f: Int, id: Long): Long = (x + 3L * y + 7L * id + 11L * f) % 256L
    val anims = Multimodal.syntheticAnimations(docs) // ids 1, 2, 10
    // GIF magic
    val raw = anims.filter(col("media_id") === 1L).collect()(0).getAs[Array[Byte]](1)
    assert(new String(raw.take(6), "US-ASCII").startsWith("GIF8"))
    val frames = Multimodal.sampleFrames(anims, everyN = 2)
      .collect().groupBy(_.media_id)
    // id 1: 2 + 1%4 = 3 frames → sampled 0, 2; id 2: 4 frames → 0, 2;
    // id 10: 2 + 10%4 = 4 frames → 0, 2
    assert(frames(1L).map(_.frame_idx).sorted.toSeq === Seq(0, 2))
    assert(frames(1L).head.n_frames === 3)
    assert(frames(2L).head.n_frames === 4)
    val f2 = frames(1L).find(_.frame_idx == 2).get
    assert(f2.width === 32 && f2.height === 24)
    val expected = (for (y <- 0 until 24; x <- 0 until 32) yield flum(x, y, 2, 1L)).sum
    assert(f2.lum_sum === expected, "GIF demux round trip must be bit-exact")
    // non-container content (text bytes) contributes zero rows, no throw
    assert(Multimodal.sampleFrames(Multimodal.fromDocuments(docs), 2).count() === 0L)
  }

  test("decodeAudio: REAL WAV codec round trip recovers every PCM sample") {
    implicit val s: SparkSession = spark
    def sample(i: Int, id: Long): Int = ((7 * i + 13 * id) % 2003).toInt - 1001
    val wavs = Multimodal.syntheticAudio(docs)
    // RIFF/WAVE magic
    val raw = wavs.filter(col("media_id") === 1L).collect()(0).getAs[Array[Byte]](1)
    assert(new String(raw.take(4), "US-ASCII") === "RIFF")
    assert(new String(raw.slice(8, 12), "US-ASCII") === "WAVE")
    val feats = Multimodal.decodeAudio(wavs)
      .collect().map(f => f.media_id -> f).toMap
    val f1 = feats(1L)
    assert(f1.ok && f1.sample_rate === 8000)
    assert(f1.n_samples === 1200L) // 1000 + 200 * (1 % 5)
    val expected = (0 until 1200).map(i => math.abs(sample(i, 1L)))
    assert(f1.abs_sum === expected.map(_.toLong).sum)
    assert(f1.max_abs === expected.max)
    // text bytes are not WAV: flagged, not thrown
    val bad = Multimodal.decodeAudio(Multimodal.fromDocuments(docs)).collect()
    assert(bad.forall(f => !f.ok && f.abs_sum === 0L))
  }

  test("decodeAudio honors container byte order: AIFF (big-endian) decodes correctly") {
    implicit val s: SparkSession = spark
    // same PCM samples, BIG-endian AIFF container: features must equal
    // the WAV path's (assuming LE for a BE stream would byte-swap every
    // sample into garbage with ok=true — the silent-corruption case)
    val samples = (0 until 500).map(i => ((7 * i + 13) % 2003) - 1001)
    val fmtBE = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, true)
    val pcm = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (v, i) =>
      pcm(2 * i) = ((v >> 8) & 0xFF).toByte // big-endian: high byte first
      pcm(2 * i + 1) = (v & 0xFF).toByte
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmtBE, samples.length.toLong),
      javax.sound.sampled.AudioFileFormat.Type.AIFF, bos)
    val sDf = spark
    import sDf.implicits._
    val media = Seq((1L, bos.toByteArray)).toDF("media_id", "content")
    val f = Multimodal.decodeAudio(media).collect()(0)
    assert(f.ok && f.n_samples === 500L)
    assert(f.abs_sum === samples.map(v => math.abs(v).toLong).sum)
    assert(f.max_abs === samples.map(math.abs).max)
  }

  test("imageAHash: deterministic, byte-identical images hash equal, corrupt flags") {
    implicit val s: SparkSession = spark
    val imgs = Multimodal.syntheticImages(docs)
    val h1 = Multimodal.imageAHash(imgs).collect().map(x => x.media_id -> x).toMap
    val h2 = Multimodal.imageAHash(imgs).collect().map(x => x.media_id -> x).toMap
    assert(h1.keySet === Set(1L, 2L, 10L))
    assert(h1.values.forall(_.ok))
    h1.keys.foreach(k => assert(h1(k).ahash === h2(k).ahash)) // deterministic
    // distinct synthetic patterns should not all collapse to one hash
    assert(h1.values.map(_.ahash).toSet.size > 1)
    import s.implicits._
    val bad = Seq((99L, Array[Byte](1, 2, 3))).toDF("media_id", "content")
    assert(!Multimodal.imageAHash(bad).collect().head.ok)
  }

  test("imageNearDupPairs: planted byte-identical copy found at hamming 0; no cartesian") {
    implicit val s: SparkSession = spark
    val imgs = Multimodal.syntheticImages(docs)
    val planted = imgs.filter(col("media_id") === 1L)
      .withColumn("media_id", col("media_id") + 1000L)
    val pairs = Multimodal.imageNearDupPairs(imgs.unionByName(planted), maxHamming = 0)
    val got = pairs.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Number](2).longValue))
    assert(got.contains((1L, 1001L, 0L)), got.mkString(", "))
    val p = pairs.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(1000))
  }

  test("audioAHash: deterministic; identical clips equal; short/corrupt flag ok=false") {
    implicit val s: SparkSession = spark
    import s.implicits._
    val wavs = Multimodal.syntheticAudio(docs)
    val h1 = Multimodal.audioAHash(wavs).collect().map(x => x.media_id -> x).toMap
    val h2 = Multimodal.audioAHash(wavs).collect().map(x => x.media_id -> x).toMap
    assert(h1.keySet === Set(1L, 2L, 10L))
    assert(h1.values.forall(_.ok))
    h1.keys.foreach(k => assert(h1(k).ahash === h2(k).ahash))
    assert(h1.values.map(_.ahash).toSet.size > 1)
    val bad = Seq((99L, Array[Byte](9, 9, 9))).toDF("media_id", "content")
    assert(!Multimodal.audioAHash(bad).collect().head.ok)
    // planted byte-identical copy surfaces at hamming 0
    val planted = wavs.filter(col("media_id") === 2L)
      .withColumn("media_id", col("media_id") + 1000L)
    val pairs = Multimodal.audioNearDupPairs(wavs.unionByName(planted), maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Number](2).longValue))
    assert(pairs.contains((2L, 1002L, 0L)), pairs.mkString(", "))
  }

  test("videoAHash: deterministic per-GIF fingerprint; planted copy at hamming 0") {
    implicit val s: SparkSession = spark
    import s.implicits._
    val anims = Multimodal.syntheticAnimations(docs)
    val h1 = Multimodal.videoAHash(anims).collect().map(x => x.media_id -> x).toMap
    val h2 = Multimodal.videoAHash(anims).collect().map(x => x.media_id -> x).toMap
    assert(h1.keySet === Set(1L, 2L, 10L))
    assert(h1.values.forall(v => v.ok && v.n_frames >= 2))
    h1.keys.foreach(k => assert(h1(k).vhash === h2(k).vhash))
    val bad = Seq((99L, Array[Byte](0, 1, 2))).toDF("media_id", "content")
    assert(!Multimodal.videoAHash(bad).collect().head.ok)
    val planted = anims.filter(col("media_id") === 10L)
      .withColumn("media_id", col("media_id") + 1000L)
    val pairs = Multimodal.videoNearDupPairs(anims.unionByName(planted), maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Number](2).longValue))
    assert(pairs.contains((10L, 1010L, 0L)), pairs.mkString(", "))
  }

  test("featureSummary joins decode output back to metadata") {
    implicit val s: SparkSession = spark
    val out = Multimodal.featureSummary(Multimodal.syntheticImages(docs))
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getBoolean(2), r.getLong(3))).toMap
    assert(out(1L) === (("png", true, 6400L)))   // 80x80
    assert(out(10L) === (("png", true, 6144L)))  // 96x64
    assert(out.keySet === Set(1L, 2L, 10L))
  }
}
