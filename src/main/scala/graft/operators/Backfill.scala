package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Partition-level backfill planner: compare a derived table against its
 * source, one row per partition, and classify each as `ok`, `missing`
 * (source has it, dest doesn't), `stale` (both have it but content
 * disagrees), or `orphan` (dest has a partition the source no longer
 * does — a retention run or a late upstream delete). The plan's
 * `missing` + `stale` rows ARE the work list of an incremental
 * re-materialization job; `orphan` is the deletion list.
 *
 * Content comparison is (row count, order-insensitive content
 * checksum) per partition — the same md5-sum discipline as
 * [[Sharding.manifest]]: any dropped/duplicated/altered row flips the
 * checksum, row order doesn't. Two map-side-combined aggregates (one
 * per side, reduce side bounded by the partition domain) and one
 * full-outer join on the partition key; source/dest data never meet
 * row-to-row. This is [[SnapshotDiff]]'s partition-granular sibling:
 * row-level diff says WHAT changed, the backfill plan says WHICH
 * partitions to rebuild.
 */
object Backfill {

  /** Join-side sentinel for a NULL partition value (full-outer joins
    * never match NULL keys; a null partition is still ONE partition).
    * NUL-prefixed so no real partition string can collide. */
  private val NullPart = "\u0000null"

  private def summary(df: DataFrame, partCol: String,
                      contentCols: Seq[String]): DataFrame = {
    // "|"-separated so ("1","23") and ("12","3") hash differently; the
    // checksum arithmetic (15 hex digits -> decimal(38,0) sum -> mod
    // 2^61) is the Sharding.manifest recipe: portable to the SQL oracle
    // and overflow-free at any row count. NULL content cells render as
    // a single space.
    val content = concat_ws("|",
      contentCols.map(c => coalesce(col(c).cast("string"), lit(" "))): _*)
    val h = conv(substring(md5(content), 1, 15), 16, 10).cast("decimal(38,0)")
    df.groupBy(col(partCol).cast("string").as("part"))
      .agg(count(lit(1)).as("n"),
        pmod(sum(h), lit(BigDecimal(2305843009213693952L))
          .cast("decimal(38,0)")).cast("long").as("chk"))
  }

  /** The plan: (part, status, n_src, n_dst) ordered by caller. `status`
    * ∈ {ok, missing, stale, orphan}. NULL partition values group under
    * one "null-partition" row per side (data with no partition key is
    * still data — it must not vanish from the plan). */
  def plan(src: DataFrame, dst: DataFrame, partCol: String,
           contentCols: Seq[String]): DataFrame = {
    require(contentCols.nonEmpty, "need at least one content column")
    val sSrc = summary(src, partCol, contentCols)
      .select(coalesce(col("part"), lit(NullPart)).as("part"),
        col("n").as("n_src"), col("chk").as("chk_src"))
    val sDst = summary(dst, partCol, contentCols)
      .select(coalesce(col("part"), lit(NullPart)).as("part"),
        col("n").as("n_dst"), col("chk").as("chk_dst"))
    sSrc.join(sDst, Seq("part"), "full_outer")
      .select(
        when(col("part") === NullPart, lit(null).cast("string"))
          .otherwise(col("part")).as("part"),
        when(col("n_dst").isNull, "missing")
          .when(col("n_src").isNull, "orphan")
          .when(col("n_src") === col("n_dst") &&
            col("chk_src") === col("chk_dst"), "ok")
          .otherwise("stale").as("status"),
        coalesce(col("n_src"), lit(0L)).as("n_src"),
        coalesce(col("n_dst"), lit(0L)).as("n_dst"))
  }
}
