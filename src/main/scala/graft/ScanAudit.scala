package graft

import org.apache.spark.sql.SparkSession

/** Emit the per-entry parquet-scan count over every driver entry's
  * EXECUTED plan — the committed baseline behind `ScanCountAuditSpec`.
  * A plan that re-executes an expensive subtree (the double-execution
  * class: two consumers + column pruning defeating exchange reuse)
  * shows up as extra scans of the same table; freezing today's counts
  * turns any future regrowth into a test failure instead of a bench
  * surprise. Usage: `runMain graft.ScanAudit <sfDir> <outFile>`. */
object ScanAudit {
  def scanCount(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Scan parquet"))

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val out = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)

      // AQE may re-coalesce cached-plan output (persistTracked frames)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rows = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        spark.catalog.clearCache()
        Some(s""" "$name": ${scanCount(fn(spark, sfDir))}""")
      } catch { case e: Throwable =>
        System.err.println(s"[scan-audit] $name failed: ${e.getMessage}"); None
      }
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out),
      rows.mkString("{\n", ",\n", "\n}\n"))
    println(s"[scan-audit] ${rows.size} entries -> $out")
    spark.stop()
  }
}
