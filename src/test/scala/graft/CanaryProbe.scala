package graft

import org.apache.spark.sql.SparkSession

/** Scratch probe for the Bench box canary — surfaces the exception the
  * fenced canary block swallows. */
object CanaryProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions.{col, sum, xxhash64}
    def once(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, 150000000L, 1L, 32)
        .select(xxhash64(col("id")).as("h"))
        .groupBy((col("h") % 1024L).as("k"))
        .agg(sum(col("h") % 1024L).as("s"))
        .agg(sum(col("s"))).head()
      (System.nanoTime() - t0) / 1e9
    }
    once()
    println(s"[canary] ${Seq(once(), once(), once()).sorted.apply(1)}")
    spark.stop()
  }
}
