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

  test("decodeStub: deterministic histogram features of the raw bytes") {
    implicit val s: SparkSession = spark
    val feats = Multimodal.decodeStub(Multimodal.fromDocuments(docs))
      .collect().map(f => f.media_id -> f).toMap
    assert(feats(1L).n_bytes === 11L)
    assert(feats(1L).features.length === 16)
    assert(math.abs(feats(1L).features.sum - 1.0) < 1e-9)
    // 'h' = 0x68 → bin 6; "hello world" has h,e,l,l,o,w,o,r,l,d in 0x60-0x7f
    assert(feats(1L).features(6) > 0.5)
    val again = Multimodal.decodeStub(Multimodal.fromDocuments(docs))
      .collect().map(f => f.media_id -> f.features.toSeq).toMap
    assert(again(10L) === feats(10L).features.toSeq)
  }

  test("resizeStub: output size tracks target area, metadata updates") {
    implicit val s: SparkSession = spark
    val out = Multimodal.resizeStub(Multimodal.fromDocuments(docs), 32, 32)
      .collect().map(r => r.media_id -> r).toMap
    assert(out.values.forall(r => r.width == 32 && r.height == 32))
    // doc 1: 80x80=6400 → 32x32=1024 area → ~16% of 11 bytes ≥ 1
    assert(out(1L).content.length >= 1)
    val again = Multimodal.resizeStub(Multimodal.fromDocuments(docs), 32, 32)
      .collect().map(r => r.media_id -> r.content.toSeq).toMap
    assert(again === out.view.mapValues(_.content.toSeq).toMap)
  }

  test("sampleFramesStub: bounded frames per item, strided indices") {
    implicit val s: SparkSession = spark
    val frames = Multimodal.sampleFramesStub(
      Multimodal.fromDocuments(docs), everyN = 2, frameBytes = 4)
      .collect().groupBy(_.media_id)
    // doc 10: 21 bytes / 4 = 5 frames → indices 0, 2, 4
    assert(frames(10L).map(_.frame_idx).sorted.toSeq === Seq(0, 2, 4))
    assert(frames(10L).forall(_.frame.length <= 4))
    // doc 2: 3 bytes → 1 frame, index 0
    assert(frames(2L).map(_.frame_idx).toSeq === Seq(0))
  }

  test("featureSummary joins decode output back to metadata") {
    implicit val s: SparkSession = spark
    val out = Multimodal.featureSummary(Multimodal.fromDocuments(docs))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out === Map(1L -> ("fmt1", 11L), 2L -> ("fmt2", 3L), 10L -> ("fmt1", 21L)))
  }
}
