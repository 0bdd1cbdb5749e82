package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway wall-breakdown probe for q_tf_dot_pairs adjudication
  * (r11 demand #4): times each planning job and the final action
  * separately, twice, so the drift's location is measured rather than
  * guessed. Test-scope only — never part of the shipping surface. */
object TfDotProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe] $name%-24s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    (1 to 3).foreach { round =>
      println(s"[probe] --- round $round ---")
      spark.catalog.clearCache()
      val df = SparkEntry.rd(spark, sfDir, "documents")
      val tf = df
        .filter(col("text").isNotNull && col("text") =!= "")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy(col("doc_id"), xxhash64(col("tok")).as("t"))
        .agg(count(lit(1)).as("tf"))
      val dfAgg = t("dfAgg_checkpoint") {
        tf.groupBy("t").agg(count(lit(1)).as("d")).localCheckpoint(true)
      }
      val headToks = t("headToks_collect") {
        dfAgg.filter(col("d") > 256).select("t").collect().map(_.getLong(0)).sorted
      }
      t("tailVol_agg") {
        dfAgg.filter(col("d") <= 256)
          .agg(coalesce(sum(col("d") * col("d")), lit(0L))).head().getLong(0)
      }
      val nDocs = t("docIds_count") { tf.select("doc_id").distinct().count() }
      println(s"[probe] nDocs=$nDocs headToks=${headToks.length}")
      // sub-blocks of the final action
      val headRank = broadcast(
        headToks.zipWithIndex.map { case (tk, i) => (tk, i.toLong) }
          .toSeq.toDF("t", "idx"))
      val h = headToks.length
      val dense = tf.join(headRank, "t")
        .groupBy("doc_id")
        .agg(map_from_entries(collect_list(struct(col("idx"), col("tf")))).as("m"))
        .select(col("doc_id"), transform(sequence(lit(0L), lit(h - 1L)),
          i => coalesce(element_at(col("m"), i), lit(0L))).as("vec"))
      val docs2 = tf.select("doc_id").distinct().join(dense, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("vec"), array_repeat(lit(0L), h)).as("vec"))
        .localCheckpoint(true)
      t("dense_build_ckpt") { docs2.count() }
      val aa = docs2.select(col("doc_id").as("id1"), col("vec").as("v1"))
      val bb = docs2.select(col("doc_id").as("id2"), col("vec").as("v2"))
      t("nlj_dot_filter") {
        aa.join(broadcast(bb), col("id1") < col("id2"))
          .select(graft.functions.VectorFunctions.vecDotLong(col("v1"), col("v2")).as("hdot"))
          .filter(col("hdot") >= 300L).count()
      }
      val full = t("full_entry") {
        graft.pipeline.Retrieval.tfDotPairs(df, "doc_id", "text", minDot = 300L)
          .orderBy("id1", "id2").count()
      }
      println(s"[probe] rows=$full")
    }
    spark.stop()
  }
}
