package graft

import graft.operators.MerkleSync
import org.apache.spark.sql.functions._

/** Conformance for Merkle-manifest table reconciliation. */
class MerkleSyncSpec extends SparkTestBase {
  private val s = spark
  import s.implicits._

  private def tbl(rows: Seq[(Long, String)]) = rows.toDF("k", "v")

  test("identical tables produce identical manifests at every level") {
    val a = tbl((1L to 500L).map(i => (i, s"v$i")))
    val b = tbl(scala.util.Random.shuffle((1L to 500L).map(i => (i, s"v$i"))))
    val d = MerkleSync.diffManifests(
      MerkleSync.manifest(a, "k", Seq("v")),
      MerkleSync.manifest(b, "k", Seq("v")))
    assert(d.count() === 0, "partitioning/order must not change digests")
  }

  test("a single changed row dirties exactly one path root-to-leaf") {
    val a = tbl((1L to 500L).map(i => (i, s"v$i")))
    val b = tbl((1L to 500L).map(i => (i, if (i == 137L) "CHANGED" else s"v$i")))
    val d = MerkleSync.diffManifests(
        MerkleSync.manifest(a, "k", Seq("v"), fanout = 16, depth = 3),
        MerkleSync.manifest(b, "k", Seq("v"), fanout = 16, depth = 3))
      .select("level", "bucket").as[(Long, Long)].collect().sortBy(_._1)
    // one dirty bucket per level, 0..3, forming a div-16 chain
    assert(d.map(_._1).toSeq === Seq(0L, 1L, 2L, 3L))
    val byLevel = d.toMap
    assert(byLevel(0L) === 0L)
    assert(byLevel(2L) === byLevel(3L) / 16)
    assert(byLevel(1L) === byLevel(2L) / 16)
  }

  test("diffKeys resolves adds, deletes, and payload changes under dirty leaves") {
    val a = tbl((1L to 300L).map(i => (i, s"v$i")))           // 77 deleted in b
    val b = tbl(((1L to 300L).filter(_ != 77L).map(i =>
      (i, if (i == 200L) "NEW" else s"v$i")) :+ (999L, "added")))
    val dirty = MerkleSync.diffManifests(
        MerkleSync.manifest(a, "k", Seq("v")),
        MerkleSync.manifest(b, "k", Seq("v")))
      .filter(col("level") === 3).select("bucket").as[Long].collect()
    val out = MerkleSync.diffKeys(a, b, "k", Seq("v"), dirty.toSeq)
      .as[(Long, String)].collect().toMap
    assert(out === Map(77L -> "a", 200L -> "both", 999L -> "b"))
  }

  test("row count guards the XOR blind spot: a doubled row still dirties its leaf") {
    val a = tbl(Seq((1L, "x")))
    val b = tbl(Seq((1L, "x"), (1L, "x"))) // XOR digests cancel to equal
    val d = MerkleSync.diffManifests(
      MerkleSync.manifest(a, "k", Seq("v")),
      MerkleSync.manifest(b, "k", Seq("v")))
    assert(d.filter(col("level") === 3).count() === 1)
  }

  test("null position is content: (x, NULL) vs (NULL, x) payloads differ") {
    // xxhash64 skips NULL inputs — without per-column null markers these
    // two rows hash identically and the difference is invisible
    val a = Seq((1L, Option("x"), Option.empty[String])).toDF("k", "p", "q")
    val b = Seq((1L, Option.empty[String], Option("x"))).toDF("k", "p", "q")
    val d = MerkleSync.diffManifests(
      MerkleSync.manifest(a, "k", Seq("p", "q")),
      MerkleSync.manifest(b, "k", Seq("p", "q")))
    assert(d.filter(col("level") === 3).count() === 1)
  }

  test("manifest refuses an untiny leaf domain") {
    val e = intercept[IllegalArgumentException] {
      MerkleSync.manifest(tbl(Seq((1L, "x"))), "k", Seq("v"),
        fanout = 16, depth = 12)
    }
    assert(e.getMessage.contains("tiny-table"))
  }
}
