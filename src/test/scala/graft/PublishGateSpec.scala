package graft

import graft.operators.PublishGate
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class PublishGateSpec extends SparkTestBase {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_wap").toString + "/tbl"

  test("publish → read current; second publish becomes current; history kept") {
    val s = spark
    import s.implicits._
    val dir = tmp()
    val v1 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    assert(PublishGate.publish(s, v1, dir, Seq("nonempty" -> (_.count() > 0)))
      === "v1")
    assert(PublishGate.currentVersion(s, dir) === Some("v1"))
    assert(PublishGate.current(s, dir).count() === 2L)

    val v2 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    assert(PublishGate.publish(s, v2, dir, Nil) === "v2")
    assert(PublishGate.current(s, dir).count() === 3L)
    // v1 remains readable (time travel)
    assert(s.read.parquet(s"$dir/v1").count() === 2L)
    assert(PublishGate.staleStaging(s, dir) === Seq.empty)
  }

  test("failing audit keeps the previous version serving and the staging stale") {
    val s = spark
    import s.implicits._
    val dir = tmp()
    PublishGate.publish(s, Seq((1L, "x")).toDF("id", "v"), dir, Nil)
    val bad = Seq((1L, "x"), (1L, "dup")).toDF("id", "v")
    val uniq: DataFrame => Boolean =
      d => d.select("id").distinct().count() == d.count()
    val e = intercept[IllegalStateException] {
      PublishGate.publish(s, bad, dir, Seq("unique_ids" -> uniq))
    }
    assert(e.getMessage.contains("unique_ids"))
    assert(PublishGate.currentVersion(s, dir) === Some("v1"))
    assert(PublishGate.current(s, dir).count() === 1L)
    assert(PublishGate.staleStaging(s, dir) === Seq("_staging_v2"))
    // gc reclaims only the staging; v1 untouched; a later publish skips v2
    assert(PublishGate.gcStaging(s, dir) === Seq("_staging_v2"))
    assert(PublishGate.staleStaging(s, dir) === Seq.empty)
    assert(PublishGate.publish(s, bad.limit(1), dir, Nil) === "v2")
  }

  test("audits run against the PERSISTED bytes, not the in-memory plan") {
    val s = spark
    import s.implicits._
    val dir = tmp()
    var auditedCount = -1L
    PublishGate.publish(s, Seq((7L, "z")).toDF("id", "v"), dir,
      Seq("capture" -> { d => auditedCount = d.count(); true }))
    assert(auditedCount === 1L)
  }

  test("reading an unpublished table is a loud error; a kept staging never collides") {
    val s = spark
    import s.implicits._
    val dir = tmp()
    val e = intercept[IllegalStateException](PublishGate.current(s, dir))
    assert(e.getMessage.contains("no published version"))
    // a failed staging left in place bumps the next version number
    intercept[IllegalStateException] {
      PublishGate.publish(s, Seq((1L, "x")).toDF("id", "v"), dir,
        Seq("always_fails" -> (_ => false)))
    }
    assert(PublishGate.publish(s, Seq((1L, "x")).toDF("id", "v"), dir, Nil)
      === "v2")
    assert(PublishGate.staleStaging(s, dir) === Seq("_staging_v1"))
  }

  test("publishBatch: replayed batch ids are skipped - exactly-once materialization") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val dir = tmp()
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    val q = in.toDS().groupBy().count()
      .writeStream.outputMode("complete")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                       id: Long) =>
        PublishGate.publishBatch(s, b.toDF(), dir, id); ()
      }.start()
    try {
      in.addData(1L, 2L); q.processAllAvailable()
      in.addData(3L);     q.processAllAvailable()
    } finally q.stop()
    assert(PublishGate.lastPublishedBatch(s, dir) === Some(1L))
    assert(PublishGate.current(s, dir).collect()(0).getLong(0) === 3L)
    // a REPLAY of batch 1 (same id) must be a no-op...
    val replay = Seq(Tuple1(3L)).toDF("count")
    assert(PublishGate.publishBatch(s, replay, dir, 1L) === None)
    assert(PublishGate.currentVersion(s, dir) === Some("v2"))
    // ...and the next real batch publishes
    assert(PublishGate.publishBatch(s, Seq(Tuple1(4L)).toDF("count"), dir, 2L)
      === Some("v3"))
    assert(PublishGate.current(s, dir).collect()(0).getLong(0) === 4L)
  }
}
