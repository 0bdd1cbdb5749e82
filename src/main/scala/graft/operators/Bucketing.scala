package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/**
 * Bucketed co-located joins — the 100 TB strategy for joins that repeat
 * on the same key (fact-to-fact joins, repeated enrichment, incremental
 * merges): pay the shuffle ONCE at write time by bucketing both tables on
 * the join key with the same bucket count, and every later join on that
 * key is exchange-free — each task reads bucket i of both sides and joins
 * locally. With `sortBy` on the same key the sort inside sort-merge join
 * is also free (buckets are written pre-sorted, one file per bucket).
 *
 * This is Spark's own bucketing (`DataFrameWriter.bucketBy` +
 * `spark.table`), packaged with the write discipline that makes it work:
 * same key, same bucket count, single file per bucket. At 100 TB the
 * shuffle this removes is the dominant cost of every repeated join — a
 * nightly enrichment join against a bucketed dimension/history table
 * touches no network at all.
 */
object Bucketing {

  /**
   * Write `df` as a bucketed, bucket-sorted parquet table in the session
   * catalog. `coalesceToBuckets` additionally ensures ONE file per bucket
   * (repartition by the key into `numBuckets` tasks before the write) —
   * many small writers would otherwise each emit a file per bucket, and
   * a bucket scattered across k files costs k seeks per task at read.
   */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    numBuckets: Int,
                    coalesceToBuckets: Boolean = true,
                    mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(numBuckets >= 1, "numBuckets must be >= 1")
    val shaped =
      if (coalesceToBuckets) df.repartition(numBuckets, df.col(key)) else df
    shaped.write.mode(mode)
      .bucketBy(numBuckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)
  }

  /**
   * Equi-join two tables previously written with [[writeBucketed]] on the
   * same bucket count. The plan contains no Exchange on either side —
   * `BucketingSpec` asserts it. `leftKey`/`rightKey` may differ in name
   * (l_orderkey vs o_orderkey); what must match is the bucketing spec.
   *
   * FAILS LOUDLY (catalog check, before any job runs) when the tables are
   * not actually co-bucketed — unbucketed, different bucket counts, or
   * bucketed on other columns. A silent mismatch would still "work": Spark
   * quietly reinstates the shuffle Exchange this API exists to eliminate,
   * and at the scale bucketing targets that is the dominant job cost
   * coming back with no signal.
   */
  def cooperativeJoin(spark: SparkSession, leftTable: String, leftKey: String,
                      rightTable: String, rightKey: String): DataFrame = {
    def spec(table: String, key: String) = {
      val id = spark.sessionState.sqlParser.parseTableIdentifier(table)
      val bs = spark.sessionState.catalog.getTableMetadata(id).bucketSpec
        .getOrElse(throw new IllegalArgumentException(
          s"$table is not bucketed — write it with writeBucketed first"))
      require(bs.bucketColumnNames == Seq(key),
        s"$table is bucketed on ${bs.bucketColumnNames.mkString(",")}, " +
          s"not on the join key $key — the join would shuffle")
      bs
    }
    val lb = spec(leftTable, leftKey)
    val rb = spec(rightTable, rightKey)
    require(lb.numBuckets == rb.numBuckets,
      s"bucket counts differ ($leftTable=${lb.numBuckets}, " +
        s"$rightTable=${rb.numBuckets}) — the join would shuffle one side")
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l.col(leftKey) === r.col(rightKey))
  }
}
