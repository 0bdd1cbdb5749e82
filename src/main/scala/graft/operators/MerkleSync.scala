package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Merkle-style table reconciliation — how two 100 TB replicas (regions,
 * vendor copies, backup restores) find their differences by exchanging
 * KILOBYTES of digests instead of re-shipping rows: every row hashes to
 * one of `fanout^depth` leaf buckets; each level's bucket digest is the
 * XOR of its rows' content hashes plus a row count (XOR alone is blind
 * to even-multiplicity duplicates — the count catches the common
 * cases). The whole tree costs ONE corpus pass per side (leaf
 * aggregation, map-side combined) + `depth` rollups over the tiny leaf
 * table; comparing trees narrows a mismatch to leaf buckets containing
 * ~N/fanout^depth rows each, which [[diffKeys]] then resolves exactly
 * with a bucket-filtered anti-join — the only stage that re-touches
 * rows, and only under differing leaves.
 *
 * Digests are xxhash64-based and the combines are commutative integer
 * ops (XOR / sum), so manifests are deterministic under any partitioning
 * and replayable by any engine.
 */
object MerkleSync {

  private def leafCount(fanout: Int, depth: Int): Long = {
    require(fanout >= 2 && depth >= 1 && depth <= 12,
      "fanout >= 2, 1 <= depth <= 12")
    val n = math.pow(fanout, depth)
    require(n <= 1e7, s"fanout^depth = $n leaf buckets is beyond the tiny-table regime")
    n.toLong
  }

  /** Row content hash: xxhash64 over key + payload columns (column
    * order fixed by the caller's list). xxhash64 SKIPS null inputs, so
    * two rows whose payloads differ only by which column holds the NULL
    * would hash identically — each column is therefore preceded by a
    * never-null 0/1 null marker, which keeps the hashed sequence
    * distinct across null positions. */
  private def rowHash(keyCol: String, payloadCols: Seq[String]): Column =
    xxhash64((keyCol +: payloadCols).flatMap(c =>
      Seq(col(c).isNull.cast("int"), col(c))): _*)

  /**
   * The full per-level manifest: (level, bucket, digest, n_rows) for
   * level 0 (root, bucket 0) through `depth` (leaves). Leaf bucket =
   * pmod(xxhash64(key), fanout^depth); level-d bucket = leaf div
   * fanout^(depth-d).
   */
  def manifest(df: DataFrame, keyCol: String, payloadCols: Seq[String],
               fanout: Int = 16, depth: Int = 3): DataFrame = {
    val leaves = leafCount(fanout, depth)
    val leaf = df
      .select(pmod(xxhash64(col(keyCol)), lit(leaves)).as("__leaf"),
        rowHash(keyCol, payloadCols).as("__h"))
      .groupBy("__leaf")
      .agg(expr("bit_xor(__h)").as("digest"), count(lit(1)).as("n_rows"))
    (0 to depth).map { d =>
      val span = math.pow(fanout, depth - d).toLong
      leaf.groupBy(expr(s"__leaf div ${span}L").as("bucket"))
        .agg(expr("bit_xor(digest)").as("digest"), sum("n_rows").as("n_rows"))
        .select(lit(d.toLong).as("level"), col("bucket"), col("digest"),
          col("n_rows"))
    }.reduce(_.unionAll(_))
  }

  /** Buckets whose digests disagree between two manifests (either a
    * changed digest/count or presence on one side only). */
  def diffManifests(ma: DataFrame, mb: DataFrame): DataFrame = {
    val a = ma.select(col("level"), col("bucket"),
      col("digest").as("digest_a"), col("n_rows").as("n_rows_a"))
    val b = mb.select(col("level"), col("bucket"),
      col("digest").as("digest_b"), col("n_rows").as("n_rows_b"))
    a.join(b, Seq("level", "bucket"), "full_outer")
      .filter(!(col("digest_a") <=> col("digest_b")) ||
        !(col("n_rows_a") <=> col("n_rows_b")))
  }

  /**
   * Exact row-level resolution under the differing LEAVES only: both
   * sides filter to rows hashing into `leaves` (an isin over a bounded
   * leaf list — the narrowing is the point) and full-outer anti-match
   * on (key, content hash). Output: key, side ('a'|'b'|'both'), where
   * 'a'/'b' = row present or differing on that side.
   */
  def diffKeys(dfa: DataFrame, dfb: DataFrame, keyCol: String,
               payloadCols: Seq[String], leaves: Seq[Long],
               fanout: Int = 16, depth: Int = 3): DataFrame = {
    require(leaves.nonEmpty, "no differing leaves — tables already match")
    require(leaves.size <= 10000, s"${leaves.size} differing leaves: beyond " +
      "the targeted-repair regime, re-ship the partition instead")
    val n = leafCount(fanout, depth)
    def side(df: DataFrame) = df
      .filter(pmod(xxhash64(col(keyCol)), lit(n)).isin(leaves: _*))
      .select(col(keyCol).as("key"), rowHash(keyCol, payloadCols).as("h"))
    val a = side(dfa).withColumn("in_a", lit(1))
    val b = side(dfb).withColumn("in_b", lit(1))
    a.join(b, Seq("key", "h"), "full_outer")
      // keep only (key, version-hash) rows unmatched on a side: a-only =
      // missing/stale in b, b-only = missing/stale in a; a key with one
      // of each changed payload
      .filter(col("in_a").isNull || col("in_b").isNull)
      .groupBy("key")
      .agg(max(col("in_a")).as("a"), max(col("in_b")).as("b"))
      .select(col("key"),
        when(col("a") === 1 && col("b") === 1, "both")
          .otherwise(when(col("a") === 1, "a").otherwise("b")).as("side"))
  }
}
