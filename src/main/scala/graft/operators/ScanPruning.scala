package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Zone-map scan-pruning estimator: the file/row-group skipping decision a
 * parquet reader makes from footer min/max statistics, lifted into an
 * auditable table. `skipReport` answers "if this corpus were laid out in
 * these buckets, how much of a scan would predicate [lo, hi] skip without
 * opening a file?" — the question that decides whether a 100 TB table is
 * worth re-clustering (see [[ZOrder]] for the re-clustering side; this is
 * the measurement side).
 *
 * Scale shape: one map-side-combined groupBy over the bucket key — the
 * output is metadata-sized (one row per bucket), never corpus-sized. The
 * skip decision itself is a per-bucket range-overlap test, evaluated on
 * that metadata table; nothing rescans the data.
 */
object ScanPruning {

  /** Per-bucket zone map: row count and value min/max under `bucket`. */
  def zoneMap(df: DataFrame, bucket: Column, value: Column): DataFrame =
    df.groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(value).as("v_min"), max(value).as("v_max"))

  /** Zone map + per-bucket skippability for range predicate
    * `value BETWEEN lo AND hi`: a bucket is skippable iff its value range
    * cannot intersect [lo, hi] — exactly the footer-stats test, so
    * "skippable" here is conservative in the same way (a non-skippable
    * bucket may still contain zero matching rows). */
  def skipReport(df: DataFrame, bucket: Column, value: Column,
                 lo: Column, hi: Column): DataFrame =
    zoneMap(df, bucket, value)
      .withColumn("skippable", col("v_max") < lo || col("v_min") > hi)
      .withColumn("scanned_rows",
        when(col("skippable"), lit(0L)).otherwise(col("n_rows")))
}
