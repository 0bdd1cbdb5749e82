package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/**
 * Tamper-evident content manifest for a dataset release: a compact
 * per-bucket fingerprint that any engine (or a downstream consumer who
 * only has the parquet files) can recompute to prove the copy it
 * received is byte-for-byte the release that was published. The
 * integrity complement to [[SnapshotDiff]] (which needs both frames
 * side by side — the manifest travels as k rows).
 *
 * Mechanics, chosen for 100 TB:
 *  - bucket = id mod nBuckets → a narrow map, no extra shuffle key.
 *  - per-row hash = first 14 hex chars (56 bits) of md5 over the
 *    released columns, each null-coalesced to a sentinel so null vs
 *    empty-string is visible. md5 hex is bit-identical across Spark,
 *    DuckDB, Python — the same portability convention as
 *    [[graft.pipeline.Sampling]]'s bucket hashing.
 *  - bucket fingerprint = SUM of row hashes in exact DECIMAL(38,0)
 *    (2^56 per row × 10^21 rows stays inside 38 digits), reduced mod
 *    the Mersenne prime 2^61−1 to one BIGINT. Addition is commutative
 *    and associative, so the fingerprint is ORDER- and
 *    PARTITIONING-INDEPENDENT and map-side combinable — no ordered
 *    string_agg, no per-bucket row materialization, one narrow pass +
 *    one bounded aggregation. Any single-row change flips the bucket
 *    fingerprint unless a 56-bit hash collision cancels it.
 *
 * Verification: recompute on the copy, join on bucket, compare (n_rows,
 * fp). A mismatched bucket localizes the damage to 1/nBuckets of the
 * release for targeted re-transfer — the same reason object stores
 * checksum per part, not per object.
 */
object ReleaseManifest {

  private val MersennePrime61 = 2305843009213693951L // 2^61 - 1

  def contentManifest(df: DataFrame, idCol: String, cols: Seq[String],
                      nBuckets: Int): DataFrame = {
    require(cols.nonEmpty, "need at least one released column")
    require(nBuckets >= 1 && nBuckets <= (1 << 20),
      s"nBuckets must be in [1, 2^20], got $nBuckets")
    val payload = concat_ws("\u0001",
      cols.map(c => coalesce(col(c).cast("string"), lit("\u0002"))): _*)
    val rowH = conv(substring(md5(payload.cast("binary")), 1, 14), 16, 10)
      .cast(DecimalType(38, 0))
    df.select(pmod(col(idCol), lit(nBuckets.toLong)).as("bucket"), rowH.as("__h"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"),
        pmod(sum(col("__h")), lit(MersennePrime61).cast(DecimalType(38, 0)))
          .cast("long").as("fp"))
  }
}
