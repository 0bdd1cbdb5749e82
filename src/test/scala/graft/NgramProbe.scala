package graft

import graft.pipeline.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: ngram pair timing with/without InferFiltersFromGenerate. */
object NgramProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time(tag: String): Unit = {
      for (r <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5).count()
        println(f"NGRAM $tag round=$r pairs=$n t=${(System.nanoTime() - t0) / 1e9}%.2f")
      }
    }
    time("native")
    spark.conf.set("spark.sql.optimizer.excludedRules",
      "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
    time("native+noinfer")
    spark.stop()
  }
}
