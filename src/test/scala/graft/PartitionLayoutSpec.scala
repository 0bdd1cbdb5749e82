package graft

import org.apache.spark.sql.functions._

/** Storage-layout pruning: a `partitionBy` directory layout must turn
  * an equality filter on the partition column into PartitionFilters —
  * pruned BEFORE any file is opened — and carry zero cost in the row
  * data (the partition column lives in the path, not the pages). This
  * is the 100 TB layout contract: lang/source/date-partitioned corpora
  * are scanned per-slice, not per-corpus-with-filter. */
class PartitionLayoutSpec extends SparkTestBase {
  private val s = spark
  import s.implicits._

  test("partitionBy layout: equality filter becomes a PartitionFilter, files prune") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    try {
      val docs = SparkEntry.rd(s, "/root/testdata/sf0.001", "documents")
      docs.write.mode("overwrite").partitionBy("lang").parquet(dir)
      val back = s.read.parquet(dir).filter(col("lang") === "en")
      val plan = back.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters: [isnotnull(lang"), plan.take(1200))
      assert(plan.contains("lang#") && plan.contains("= en"), plan.take(1200))
      // correctness of the pruned read
      val want = docs.filter(col("lang") === "en").count()
      assert(back.count() === want && want > 0)
      // the row-group data no longer stores the partition column: the
      // ReadSchema struct (what the parquet pages actually deliver)
      // must exclude it, even though it appears in the scan's output
      val readSchema = plan.split("ReadSchema: ").last.takeWhile(_ != '\n')
      assert(readSchema.startsWith("struct<") && !readSchema.contains("lang"),
        readSchema)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
