package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Small-files compaction: measure a parquet directory's layout, decide
 * the output file count from MEASURED bytes (never a guessed
 * repartition), and rewrite clustered on a key. The small-files problem
 * is the classic 100 TB operational failure — a streaming or
 * over-parallel writer leaves thousands of KB-sized files, and every
 * downstream scan pays a task + open + footer parse per file. The fix
 * is mechanical but must be driven by measurement: `ceil(totalBytes /
 * targetBytes)` output files, written via `repartitionByRange` on the
 * cluster key so compaction also SORTS the data into zone-map-friendly
 * ranges (see [[ScanPruning]] — compaction is where clustering is
 * cheapest, the data is already being rewritten).
 *
 * Driver work is one FileSystem listing (O(#files) metadata rows, no
 * data read) — the same bounded-driver discipline as every other
 * operator. The rewrite itself is one range shuffle of the data.
 */
object Compaction {

  /** One measured layout row: (n_files, total_bytes, min_bytes,
    * max_bytes, n_small) where `n_small` counts files under
    * `smallBytes`. Metadata only — no data is read. */
  def layoutStats(spark: SparkSession, dir: String,
                  smallBytes: Long): (Long, Long, Long, Long, Long) = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(p).filter(f => f.isFile &&
      f.getPath.getName.endsWith(".parquet"))
    require(files.nonEmpty, s"no parquet files under $dir")
    val sizes = files.map(_.getLen)
    (sizes.length.toLong, sizes.sum, sizes.min, sizes.max,
      sizes.count(_ < smallBytes).toLong)
  }

  /** The compaction decision: output file count for `totalBytes` at
    * `targetBytes` per file — `ceil`, floor 1. Deterministic pure
    * arithmetic, exposed for tests and for the entry's gate. */
  def planFileCount(totalBytes: Long, targetBytes: Long): Int = {
    require(targetBytes > 0, "targetBytes must be positive")
    math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
  }

  /** Compact `inDir` (parquet) into `outDir` with AT MOST
    * [[planFileCount]]-many files, range-clustered on `keyCol` —
    * `repartitionByRange` writes no file for an empty range partition,
    * so a key domain narrower than the plan (or range-sampling skew)
    * yields fewer files, never more. Returns the planned count; read
    * the actual layout back with [[layoutStats]]. The write is one
    * range shuffle; rows are preserved exactly (the caller's oracle
    * should pin that — see `q_compaction`). */
  def compact(spark: SparkSession, inDir: String, outDir: String,
              keyCol: String, targetBytes: Long): Int = {
    val (_, totalBytes, _, _, _) = layoutStats(spark, inDir, smallBytes = 1L)
    val n = planFileCount(totalBytes, targetBytes)
    spark.read.parquet(inDir)
      .repartitionByRange(n, org.apache.spark.sql.functions.col(keyCol))
      .sortWithinPartitions(keyCol)
      .write.mode("overwrite").parquet(outDir)
    n
  }
}
