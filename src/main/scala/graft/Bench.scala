package graft

import graft.model._
import graft.streaming.{ManualClock, QueryRunner}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/**
 * Benchmark main. Emits ONE JSON line:
 *   {"metric":"total","value":N,"unit":"sec","queries":{...},"errors":{...},"sf":...}
 *
 * A full warmup pass runs first (JVM/codegen/parquet-footer warm, results
 * discarded) so per-query numbers measure the plan, not cold-start.
 * Failures are reported in "errors" — a broken query contributes its time
 * but is never silently folded into a fast-looking number.
 *
 * `b7_runner_100q` is BASELINE.md B7: 100 concurrent queries over the
 * events table in ONE shared pass through the streaming runner.
 */
object Bench {

  /** 100 mixed queries exercising every aggregation type in one pass. */
  private def hundredQueries: Seq[QuerySpec] = (0 until 100).map { i =>
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
      // same (filter, fields, projection) signatures fuse into shared
      // grouped jobs — ~16 GROUP BY queries over 7 filters → 7 jobs
      case _ => GroupBy(Seq("event_type" -> "et"), Seq(
        GroupOp(GroupOpType.COUNT, None, "cnt"),
        GroupOp(GroupOpType.SUM, Some("value"), "sv")), entries = 32)
    }
    QuerySpec(s"bench_q$i", filter = filter, aggregation = agg, durationMs = 3600000L)
  }

  private def runnerPass(spark: SparkSession, sfDir: String, n: Int): Long = {
    val runner = new QueryRunner(spark, new ManualClock(0))
    hundredQueries.take(n).foreach(q => runner.register(q))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    runner.processBatch(spark.read.parquet(s"$sfDir/events.parquet"))
    runner.finishAll().size
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val errors = mutable.LinkedHashMap.empty[String, String]

    // warmup pass (discarded)
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
    }
    try runnerPass(spark, sfDir, 5) catch { case _: Throwable => () }

    def timed(name: String)(body: => Unit): (String, Double) = {
      val t0 = System.nanoTime()
      try body catch {
        case e: Throwable =>
          errors(name) = s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}"
      }
      name -> (System.nanoTime() - t0) / 1e9
    }

    val results = SparkEntry.queries.toSeq.map { case (name, fn) =>
      timed(name)(fn(spark, sfDir).count())
    } :+ timed("b7_runner_100q") {
      val finished = runnerPass(spark, sfDir, 100)
      require(finished == 100, s"runner finished $finished of 100 queries")
    }

    def jstr(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val qs = results.map { case (k, v) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
