package graft

import graft.model._
import graft.streaming.{ManualClock, QueryRunner}
import org.apache.spark.sql.SparkSession

/** Scratch probe: time the 100-query shared pass repeatedly to separate
  * plan cost from run-to-run variance. Test scope only — not driver surface. */
object B7Probe {
  private val nQueries: Int =
    sys.env.getOrElse("SPARK_GRAFT_PROBE_N", "100").toInt

  private def hundredQueries: Seq[QuerySpec] = (0 until nQueries).map { i =>
    val filter = Some(Binary(
      Binary(Field("user_id"), Lit(7L), BinOp.MOD), Lit(i.toLong % 7), BinOp.EQUALS))
    val agg: Aggregation = i % 6 match {
      case 0 => GroupAll(Seq(
        GroupOp(GroupOpType.COUNT, None, "cnt"),
        GroupOp(GroupOpType.SUM, Some("value"), "sv")))
      case 1 => CountDistinct(Seq("user_id"), lgK = 14)
      case 2 => TopK(Seq("event_type" -> "et"), k = 3, countName = "cnt", maxMapSize = 64)
      case 3 => Distribution("value", DistributionType.QUANTILE, Seq(0.1, 0.5, 0.9), k = 1024)
      case 4 => Raw(100)
      case _ => GroupBy(Seq("event_type" -> "et"), Seq(
        GroupOp(GroupOpType.COUNT, None, "cnt"),
        GroupOp(GroupOpType.SUM, Some("value"), "sv")), entries = 32)
    }
    QuerySpec(s"bench_q$i", filter = filter, aggregation = agg, durationMs = 3600000L)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val batch = spark.read.parquet(s"$sfDir/events.parquet")
    for (r <- 1 to 5) {
      val t0 = System.nanoTime()
      val runner = new QueryRunner(spark, new ManualClock(0))
      hundredQueries.foreach(q => runner.register(q))
      val tReg = System.nanoTime()
      runner.processBatch(batch)
      val tBatch = System.nanoTime()
      runner.finishAll()
      val done = runner.results.count(_.signal.contains("COMPLETE"))
      val tFin = System.nanoTime()
      println(f"B7PROBE n=$nQueries%d round=$r done=$done reg=${(tReg - t0) / 1e9}%.2f batch=${(tBatch - tReg) / 1e9}%.2f finish=${(tFin - tBatch) / 1e9}%.2f total=${(tFin - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
