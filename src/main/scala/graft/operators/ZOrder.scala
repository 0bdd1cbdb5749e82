package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Z-order (Morton) clustering: interleave the bits of several integer
 * dimensions into one sort key so that range-partitioning on the key
 * co-locates rows that are close in EVERY dimension at once.
 *
 * Why this matters at 100 TB: parquet prunes with per-file/row-group
 * min-max stats, which a single-column sort only makes selective for that
 * one column. Sorting by z-value keeps each file's bounding box small in
 * all interleaved dimensions, so predicates on ANY of them skip most
 * files — the standard multi-dimensional clustering recipe (the same
 * layout Delta/Iceberg `OPTIMIZE ZORDER BY` produces, built here from
 * plain Spark primitives: a narrow codegen'd bit expression +
 * `repartitionByRange` + `sortWithinPartitions`).
 *
 * The z-value is pure integer shift/mask arithmetic — the identical
 * formula evaluates in any SQL engine ([[zValueSql]] emits it for the
 * DuckDB oracle, generated from the SAME loop so the two cannot drift).
 * Dimensions must be non-negative and fit in `bits` bits (enforced —
 * silently truncated high bits would interleave garbage).
 */
object ZOrder {

  /** Bit positions of dimension `j` of `d` in the interleaved key:
    * source bit `i` lands at `i·d + j` (dimension 0 owns the low bit). */
  def zValue(dims: Seq[Column], bits: Int = 16): Column = {
    require(dims.nonEmpty, "z-order needs at least one dimension")
    require(bits * dims.size <= 63, s"${dims.size} dims × $bits bits exceeds a signed long")
    val terms = for {
      (dim, j) <- dims.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(dim.cast("long"), i).bitwiseAND(lit(1L)),
      i * dims.size + j)
    terms.reduce(_.bitwiseOR(_))
  }

  /** The same interleave as ANSI-ish SQL over column names — the oracle
    * side of [[zValue]], generated from the same index math. */
  def zValueSql(dims: Seq[String], bits: Int = 16): String = {
    require(dims.nonEmpty && bits * dims.size <= 63)
    val terms = for {
      (dim, j) <- dims.zipWithIndex
      i <- 0 until bits
    } yield s"(((CAST($dim AS BIGINT) >> $i) & 1) << ${i * dims.size + j})"
    terms.mkString("(", " | ", ")")
  }

  /** Guard column: true iff every dimension fits `bits` bits. */
  private def fits(dims: Seq[Column], bits: Int): Column =
    dims.map(d => d.cast("long").between(0L, (1L << bits) - 1))
      .reduce(_ && _)

  /**
   * Re-layout `df` into `numFiles` z-clustered ranges: rows range-
   * partition on the z-value and sort within each partition, so a
   * subsequent `.write.parquet` emits files whose min-max stats are
   * tight in every clustered dimension. One shuffle (the range
   * exchange — unavoidable for any global re-clustering); the z
   * computation itself is narrow and codegen'd. Throws at runtime if a
   * dimension overflows `bits` (an out-of-range value would silently
   * scatter the layout).
   */
  def cluster(df: DataFrame, dimCols: Seq[String], numFiles: Int,
              bits: Int = 16): DataFrame = {
    val dims = dimCols.map(col)
    val z = when(fits(dims, bits), zValue(dims, bits))
      .otherwise(raise_error(concat(
        lit(s"z-order dimension out of [0, 2^$bits) for row "),
        concat_ws(",", dims: _*))))
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }

  /** [[cluster]] with the Hilbert index instead of the Morton interleave
    * (2-D only): identical one-range-exchange plan, tighter per-file
    * rectangles — consecutive Hilbert addresses are always grid-adjacent,
    * so a file boundary never straddles a Z-shaped jump and zone maps
    * prune more (see [[graft.functions.HilbertIndex]]). */
  def clusterHilbert(df: DataFrame, xCol: String, yCol: String,
                     numFiles: Int, bits: Int = 16): DataFrame = {
    val dims = Seq(col(xCol), col(yCol))
    val h = when(fits(dims, bits),
        graft.functions.SpatialFunctions.hilbertIndex(col(xCol), col(yCol), bits))
      .otherwise(raise_error(concat(
        lit(s"hilbert dimension out of [0, 2^$bits) for row "),
        concat_ws(",", dims: _*))))
    df.withColumn("__h", h)
      .repartitionByRange(numFiles, col("__h"))
      .sortWithinPartitions("__h")
      .drop("__h")
  }
}
