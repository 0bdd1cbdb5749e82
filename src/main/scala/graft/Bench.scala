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
 *
 * MEASUREMENT PROTOCOL (3, r12). Two defects the r11 official run
 * exposed are fixed structurally:
 *
 * 1. SEGMENTED per-entry timing: one JVM compiling 260+ entries' codegen
 *    accumulates JIT/code-cache state that progressively taxes later
 *    entries (the r11 driver run flagged 42 "regressions" of which ZERO
 *    reproduced in fresh JVMs). The per-entry section now runs in child
 *    JVMs of ~45 entries each (same warmup + best-of-2 discipline inside
 *    each child), so every entry measures within a bounded codegen
 *    neighborhood — wall cost is a handful of extra session startups.
 *    `SPARK_GRAFT_SEGMENTS=0` restores the single-JVM path.
 * 2. SELF-ADJUDICATING regression watch (hardened r13): every floor
 *    breach is re-timed in a FRESH JVM (the BenchOne machinery, in
 *    descending breach-ratio order) before the `regressions` array is
 *    written; the reproduce decision is judged against the
 *    ADJUDICATION-TIME canary factor via [[categorize]], and the
 *    output splits three ways — `regressions` (fresh-reproduced only),
 *    `suite_noise` (fresh-disproved), `unadjudicated` (budget-skipped
 *    or degraded-window rows; never inside `regressions`). Every
 *    summary line carries a `verdict` (`ok` / `box_degraded` /
 *    `adjudication_degraded`) so a degraded window brands its own
 *    output. Re-timing is capped (entries and wall) so a pathological
 *    run cannot blow the bench budget.
 *
 * Per-entry JVM telemetry (code-cache occupancy, cumulative GC/JIT
 * time, heap) lands in `bench_telemetry.json` for offline adjudication
 * of any residual drift.
 */
object Bench {

  /** Runner-bench bodies by name — shared with [[BenchOne]] so the
    * fresh-JVM adjudicator can re-time headline blocks, not only
    * SparkEntry queries. Each body REQUIREs its completion count. */
  private[graft] def runnerBody(name: String): Option[(SparkSession, String) => Unit] =
    name match {
      case "b7_runner_100q" => Some((s, d) =>
        require(runnerPass(s, d, 100) == 100, "runner lost queries"))
      case "b11_runner_1000q" => Some((s, d) =>
        require(runnerPass(s, d, 1000) == 1000, "runner lost queries"))
      case "b9_runner_200eq" => Some((s, d) =>
        require(eqRunnerPass(s, d, 200) == 200, "eq runner lost queries"))
      case "b10_runner_200eq_tuple" => Some((s, d) =>
        require(eqTupleRunnerPass(s, d, 200) == 200, "tuple runner lost queries"))
      case "b14_runner_1k_eq" => Some((s, d) =>
        require(eqRunnerPass(s, d, 1000) == 1000, "eq runner lost queries"))
      case "b14_runner_10k_eq" => Some((s, d) =>
        require(eqRunnerPass(s, d, 10000) == 10000, "eq runner lost queries"))
      case "b14_mixed_1k" => Some((s, d) =>
        require(mixedAdmissionPass(s, d, 1000) == 1000, "mixed runner lost queries"))
      case "b14_mixed_10k" => Some((s, d) =>
        require(mixedAdmissionPass(s, d, 10000) == 10000, "mixed runner lost queries"))
      case "b14_unfold_1k" => Some((s, d) =>
        require(unfoldAdmissionPass(s, d, 1000) == 1000, "unfold runner lost queries"))
      case "b14_unfold_10k" => Some((s, d) =>
        require(unfoldAdmissionPass(s, d, 10000) == 10000, "unfold runner lost queries"))
      case _ => None
    }

  /** Every name [[runnerBody]] resolves — BenchOne's usage text. */
  private[graft] val runnerBenchNames: Seq[String] = Seq(
    "b7_runner_100q", "b9_runner_200eq", "b10_runner_200eq_tuple",
    "b11_runner_1000q", "b14_runner_1k_eq", "b14_runner_10k_eq",
    "b14_mixed_1k", "b14_mixed_10k", "b14_unfold_1k", "b14_unfold_10k")

  /** One regression-watch adjudication row: in-suite seconds, committed
    * floor, fresh-JVM minimum + median (None = the re-time budget never
    * reached this row). */
  private[graft] final case class AdjRow(
    name: String, sec: Double, best: Double,
    freshMin: Option[Double], freshMedian: Option[Double])

  /** Breach test at a given box factor: >25% over the floor (scaled by
    * the factor) plus a 0.25 s absolute grace for sub-second swing. */
  private[graft] def breachAt(best: Double, v: Double, factor: Double): Boolean =
    v > best * 1.25 * factor + 0.25

  /** Box windows at/above this factor cannot produce trustworthy flags:
    * r11+r12 shipped 97 of them with zero true positives. At or past it
    * the run verdict is `box_degraded` and (if the ADJUDICATION window
    * is also past it) breaches defer instead of flagging. */
  private[graft] val DegradedBoxFactor = 1.3

  /** Split breach rows into (regressions, suite_noise, unadjudicated).
    *
    * `adjFactor` is the box factor AT ADJUDICATION TIME — the canary
    * re-timed immediately before the fresh-JVM batch, over the best
    * canary on record. Fresh re-times run in their own time window, so
    * they are judged against THAT window's factor, never the suite
    * samples' `box_factor` (r12: q_ts_anomaly "reproduced" at fresh_min
    * 1.5 because the re-time rode the same polluted window that true
    * idle-box min 0.606 later disproved).
    *
    * - calm adjudication window (adjFactor < DegradedBoxFactor): a
    *   fresh min past the adjFactor-scaled envelope REPRODUCES the
    *   breach → regressions; inside it → suite_noise.
    * - degraded adjudication window: a "reproduced" breach proves
    *   nothing (the box, not the code, may be slow) → unadjudicated.
    *   A fresh min inside the UNSCALED envelope is still the strongest
    *   possible disproof (the code reached its floor neighborhood on a
    *   slow box) → suite_noise; the scaled envelope is NOT used for
    *   disproof here because a 1.3×+ threshold could absorb a real
    *   regression.
    * - rows the budget never re-timed are unadjudicated always; they
    *   must never ship inside `regressions` where a first-line parser
    *   reads them as real flags.
    */
  private[graft] def categorize(rows: Seq[AdjRow], adjFactor: Double)
      : (Seq[AdjRow], Seq[AdjRow], Seq[AdjRow]) = {
    val (timed, untimed) = rows.partition(_.freshMin.isDefined)
    if (adjFactor >= DegradedBoxFactor) {
      val (noise, defer) = timed.partition(r => !breachAt(r.best, r.freshMin.get, 1.0))
      (Seq.empty, noise, defer ++ untimed)
    } else {
      val (repro, noise) = timed.partition(r => breachAt(r.best, r.freshMin.get, adjFactor))
      (repro, noise, untimed)
    }
  }

  /** JSON string escape (object-level: shared by main and
    * [[baselineBlock]]). Spark exception messages carry newlines/tabs; a
    * raw control char inside a JSON string invalidates the whole summary
    * line (the r7 bench emitted errors and the driver recorded
    * parsed:null). */
  private[graft] def jstr(s: String): String = s.flatMap {
    case '\\' => "\\\\"
    case '"'  => "\\\""
    case c if c < ' ' => "\\u%04x".format(c.toInt)
    case c => c.toString
  }.mkString("\"", "", "\"")

  /** BASELINE.md §2's measured floors — the SINGLE committed source the
    * emitted `baseline` block compares against. BaselineTableSpec pins
    * these literals to the doc table so the two can't silently drift
    * when floors are re-measured. */
  private[graft] val BaselineTargets: Seq[(String, Double)] = Seq(
    "q_raw_filter" -> 0.114, "q_filter_project" -> 0.138,
    "q_group_all" -> 0.127, "q_group_by" -> 0.204,
    "q_count_distinct" -> 0.112, "q_dist_pmf" -> 0.158,
    "q_topk" -> 0.396,
    "b7_runner_100q" -> 1.466, "b11_runner_1000q" -> 6.453)

  /** BASELINE.md §2's "BenchOne med3" column — the FRESH-JVM population
    * of the same entries. A degraded run's baseline block compares its
    * fresh-JVM probe values against THESE, never the suite floors: the
    * two populations sit ~2-4× apart for sub-second entries (committed
    * analysis in BASELINE.md §2), so a fresh probe judged on suite
    * floors reads structurally >2× while measuring nothing wrong (the
    * first r14 validation run showed exactly that: fresh q_raw_filter
    * 0.298 vs floor 0.114 → a phantom 2.61). Min-of-3 probes against
    * median-of-3 targets is conservative in the probe's favor — the
    * block's question is "is anything catastrophically over the
    * committed envelope", not floor-chasing. Spec-pinned to the doc
    * table like [[BaselineTargets]]. */
  private[graft] val BaselineTargetsBenchOne: Seq[(String, Double)] = Seq(
    "q_raw_filter" -> 0.338, "q_filter_project" -> 0.335,
    "q_group_all" -> 0.279, "q_group_by" -> 0.480,
    "q_count_distinct" -> 0.253, "q_dist_pmf" -> 0.443,
    "q_topk" -> 0.695,
    "b7_runner_100q" -> 1.488, "b11_runner_1000q" -> 6.842)

  /** Which walls may feed the published `baseline` block, and under what
    * provenance. In-suite walls from a degraded window are measurement
    * noise dressed as ratios (BENCH_r13 published q_filter_project at
    * 27.89× from exactly that; adjudication disproved all three >2×
    * rows) — so when the run verdict is degraded the block must be
    * re-emitted from fresh-JVM probe minima, and if the probe produced
    * nothing the block still BRANDS itself rather than pass polluted
    * walls as `in_suite`. Fresh values override in-suite ones; entries
    * the probe missed keep their in-suite wall under `fresh_partial`. */
  private[graft] def baselineValues(inSuite: Map[String, Double],
                                    fresh: Map[String, Double],
                                    degraded: Boolean)
      : (Map[String, Double], String) =
    if (!degraded) (inSuite, "in_suite")
    else if (fresh.isEmpty) (inSuite, "in_suite_degraded")
    else if (BaselineTargets.forall { case (k, _) =>
        fresh.contains(k) || !inSuite.contains(k) })
      (inSuite ++ fresh, "fresh")
    else (inSuite ++ fresh, "fresh_partial")

  /** The BASELINE.md §2 comparison block. RAW ratios (not box-scaled) —
    * read them through `source`/the line's verdict; sf_match=false
    * brands ratios taken at a different scale factor as non-binding.
    * Targets match the values' POPULATION: in-suite walls compare
    * against the suite floors, fresh-JVM probe values against the
    * BenchOne med3 column (`targets_population` carries which). b8 is
    * always in-suite (a fixed-duration live stream has no fresh-probe
    * equivalent); its pass/fail criteria are absolute. */
  private[graft] def baselineBlock(values: Map[String, Double],
                                   source: String, sfMatch: Boolean,
                                   b8ok: Boolean): String = {
    val freshSource = source.startsWith("fresh")
    val targets = if (freshSource) BaselineTargetsBenchOne else BaselineTargets
    val ratios = targets.flatMap { case (k, t) =>
      values.get(k).filter(_ > 0).map(v => k -> math.rint(v / t * 100) / 100)
    }
    val worst = ratios.sortBy(-_._2).headOption
    val rowsJ = ratios.map { case (k, r) => s"${jstr(k)}:$r" }.mkString("{", ",", "}")
    s"""{"source":${jstr(source)},""" +
      s""""targets_population":${jstr(if (freshSource) "benchone_med3" else "suite_floor")},""" +
      s""""ratios":$rowsJ,""" +
      s""""n_over_2x":${ratios.count(_._2 > 2.0)},""" +
      s""""worst":${worst.map(w => jstr(w._1)).getOrElse("null")},""" +
      s""""worst_ratio":${worst.map(_._2).getOrElse(-1.0)},""" +
      s""""b8_ok":$b8ok,"sf_match":$sfMatch}"""
  }

  /** JVM health probes for the per-entry telemetry — the evidence that
    * separates "the plan got slower" from "the JVM degraded" (code-cache
    * exhaustion, GC debt) without re-running anything. */
  private object Jvm {
    import java.lang.management.ManagementFactory
    import scala.jdk.CollectionConverters._
    def codeCacheUsedMb: Double = ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(_.getName.startsWith("CodeHeap"))
      .map(_.getUsage.getUsed).sum / 1048576.0
    def codeCacheMaxMb: Double = ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(_.getName.startsWith("CodeHeap"))
      .map(p => math.max(p.getUsage.getMax, 0L)).sum / 1048576.0
    def gcMs: Long = ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(b => math.max(b.getCollectionTime, 0L)).sum
    def jitMs: Long = {
      val c = ManagementFactory.getCompilationMXBean
      if (c != null && c.isCompilationTimeMonitoringSupported)
        c.getTotalCompilationTime
      else -1L
    }
    def heapUsedMb: Double =
      ManagementFactory.getMemoryMXBean.getHeapMemoryUsage.getUsed / 1048576.0
  }

  /** Spawn a child JVM mirroring this one (same module opens, heap and
    * code-cache sizing from RuntimeMXBean; classpath from
    * java.class.path), run `mainClass args`, return (exitCode, stdout).
    * Used for segment children and fresh-JVM re-adjudication. */
  private def spawn(mainClass: String, args: Seq[String],
                    env: Map[String, String], timeoutMs: Long): (Int, String) = {
    import scala.jdk.CollectionConverters._
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.toSeq
      .filterNot(a => a.startsWith("-agentlib:jdwp")) // debugger ports collide
    val cmd = Seq(javaBin) ++ jvmArgs ++
      Seq("-cp", System.getProperty("java.class.path"), mainClass) ++ args
    val pb = new ProcessBuilder(cmd.asJava)
    pb.redirectErrorStream(true)
    env.foreach { case (k, v) => pb.environment().put(k, v) }
    val proc = pb.start()
    val buf = new java.io.ByteArrayOutputStream()
    val reader = new Thread(() => {
      try proc.getInputStream.transferTo(buf) catch { case _: Throwable => () }
    })
    reader.setDaemon(true)
    reader.start()
    val done = proc.waitFor(timeoutMs, java.util.concurrent.TimeUnit.MILLISECONDS)
    if (!done) proc.destroyForcibly()
    proc.waitFor(15, java.util.concurrent.TimeUnit.SECONDS)
    reader.join(5000)
    (if (done) proc.exitValue() else -1, buf.toString("UTF-8"))
  }

  /** `n` mixed queries exercising every aggregation type in one pass
    * (b7 runs 100, b11 runs 1000 — the README headroom claim). */
  private def mixedQueries(n: Int): Seq[QuerySpec] = (0 until n).map { i =>
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
    mixedQueries(n).foreach(q => runner.register(q))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    runner.processBatch(spark.read.parquet(s"$sfDir/events.parquet"))
    runner.finishAll()
    // full RAW queries COMPLETE during the batch (early termination), the
    // rest at finishAll — count every completion
    runner.results.count(_.signal.contains("COMPLETE"))
  }

  /** `n` queries `user_id == i` sharing one aggregation signature: the
    * equality partitioner folds them into ONE groupBy(user_id) job — one
    * hash probe per record regardless of query count (SURVEY §4). */
  private def eqRunnerPass(spark: SparkSession, sfDir: String, n: Int): Long = {
    val runner = new QueryRunner(spark, new ManualClock(0))
    (0 until n).foreach { i =>
      runner.register(QuerySpec(s"eq_q$i",
        filter = Some(Binary(Field("user_id"), Lit(i.toLong), BinOp.EQUALS)),
        aggregation = GroupAll(Seq(
          GroupOp(GroupOpType.COUNT, None, "cnt"),
          GroupOp(GroupOpType.SUM, Some("value"), "sv"))),
        durationMs = 3600000L))
    }
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    runner.processBatch(spark.read.parquet(s"$sfDir/events.parquet"))
    runner.finishAll()
    runner.results.count(_.signal.contains("COMPLETE"))
  }

  /** `n` queries over DISTINCT (event_type, user_id) tuples sharing one
    * aggregation signature: the multi-field equality partitioner folds
    * them into ONE groupBy(event_type, user_id) job — one hash probe per
    * record regardless of query count. */
  private def eqTupleRunnerPass(spark: SparkSession, sfDir: String, n: Int): Long = {
    val runner = new QueryRunner(spark, new ManualClock(0))
    val types = Seq("click", "view", "purchase")
    (0 until n).foreach { i =>
      runner.register(QuerySpec(s"eqt_q$i",
        filter = Some(NAry(NAryOp.AND, Seq(
          Binary(Field("event_type"), Lit(types(i % types.size)), BinOp.EQUALS),
          Binary(Field("user_id"), Lit(i.toLong), BinOp.EQUALS)))),
        aggregation = GroupAll(Seq(
          GroupOp(GroupOpType.COUNT, None, "cnt"),
          GroupOp(GroupOpType.SUM, Some("value"), "sv"))),
        durationMs = 3600000L))
    }
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    runner.processBatch(spark.read.parquet(s"$sfDir/events.parquet"))
    runner.finishAll()
    runner.results.count(_.signal.contains("COMPLETE"))
  }

  /** MIXED-population admission probe (b14_mixed): 80% equality queries
    * (`user_id == i`, folded to one groupBy by the equality partitioner)
    * + 20% threshold queries (`value > t_i`) — which since r14 ALSO fold,
    * through the RANGE partitioner (one bucketed groupBy + driver
    * suffix folds), so this bench now measures BOTH partitioners
    * engaging on one batch: the r14 pre-partitioner floor (1.527 s at
    * 1k, the 20% paying per-query conditional-aggregate columns) is the
    * committed before/after line. The genuinely-unfoldable population
    * moved to [[unfoldAdmissionPass]]. */
  private def mixedAdmissionPass(spark: SparkSession, sfDir: String, n: Int): Long = {
    val runner = new QueryRunner(spark, new ManualClock(0))
    val nEq = n * 4 / 5
    (0 until nEq).foreach { i =>
      runner.register(QuerySpec(s"mx_eq$i",
        filter = Some(Binary(Field("user_id"), Lit(i.toLong), BinOp.EQUALS)),
        aggregation = GroupAll(Seq(
          GroupOp(GroupOpType.COUNT, None, "cnt"),
          GroupOp(GroupOpType.SUM, Some("value"), "sv"))),
        durationMs = 3600000L))
    }
    (nEq until n).foreach { i =>
      runner.register(QuerySpec(s"mx_arb$i",
        filter = Some(Binary(Field("value"), Lit((i % 89).toDouble),
          BinOp.GREATER_THAN)),
        aggregation = GroupAll(Seq(
          GroupOp(GroupOpType.COUNT, None, "cnt"),
          GroupOp(GroupOpType.SUM, Some("value"), "sv"))),
        durationMs = 3600000L))
    }
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    runner.processBatch(spark.read.parquet(s"$sfDir/events.parquet"))
    runner.finishAll()
    runner.results.count(_.signal.contains("COMPLETE"))
  }

  /** UNFOLDABLE-minority admission probe (b14_unfold): 80% equality
    * queries + 20% genuinely arbitrary predicates (`value * 2 > t_i` —
    * arithmetic on the left defeats BOTH the equality and the range
    * partitioner by design, so each query keeps its own
    * conditional-aggregate columns in the generic shared pass). The
    * graded claim this bench carries: the unfoldable minority's
    * per-query cost stays flat as the foldable majority amortizes —
    * admission pruning must not depend on every query being
    * partitioner-shaped. */
  private def unfoldAdmissionPass(spark: SparkSession, sfDir: String, n: Int): Long = {
    val runner = new QueryRunner(spark, new ManualClock(0))
    val nEq = n * 4 / 5
    (0 until nEq).foreach { i =>
      runner.register(QuerySpec(s"uf_eq$i",
        filter = Some(Binary(Field("user_id"), Lit(i.toLong), BinOp.EQUALS)),
        aggregation = GroupAll(Seq(
          GroupOp(GroupOpType.COUNT, None, "cnt"),
          GroupOp(GroupOpType.SUM, Some("value"), "sv"))),
        durationMs = 3600000L))
    }
    (nEq until n).foreach { i =>
      runner.register(QuerySpec(s"uf_arb$i",
        filter = Some(Binary(
          Binary(Field("value"), Lit(2.0), BinOp.MUL),
          Lit((i % 89).toDouble * 2), BinOp.GREATER_THAN)),
        aggregation = GroupAll(Seq(
          GroupOp(GroupOpType.COUNT, None, "cnt"),
          GroupOp(GroupOpType.SUM, Some("value"), "sv"))),
        durationMs = 3600000L))
    }
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    runner.processBatch(spark.read.parquet(s"$sfDir/events.parquet"))
    runner.finishAll()
    runner.results.count(_.signal.contains("COMPLETE"))
  }

  /** BASELINE.md B8: tumbling 1 s GROUP(all) window over a live rate
    * stream for `seconds`. Returns (windows emitted, mean |emit − expected
    * boundary| ms, dropped windows vs the expected count). */
  private def b8Pass(spark: SparkSession, seconds: Int): (Long, Double, Long) = {
    import org.apache.spark.sql.functions.col
    val runner = new QueryRunner(spark) // real clock: measures actual jitter
    runner.register(QuerySpec("b8",
      aggregation = GroupAll(Seq(
        GroupOp(GroupOpType.COUNT, None, "cnt"),
        GroupOp(GroupOpType.SUM, Some("value"), "sv"))),
      window = Some(WindowSpec(WindowUnit.TIME, 1000, WindowUnit.TIME, 1000)),
      durationMs = seconds * 1000L + 10000L))
    val stream = spark.readStream.format("rate")
      .option("rowsPerSecond", "5000").load()
      .select(col("value"))
    val sq = runner.runStream(stream, triggerMs = 200, tickIntervalMs = 50)
    try Thread.sleep(seconds * 1000L + 300) finally sq.stop()
    val emits = runner.results
      .filter(c => c.queryId == "b8" && c.meta.contains("window_number"))
    val reg = emits.headOption.map(_.meta("receive_time").asInstanceOf[Long]).getOrElse(0L)
    val jitters = emits.map { c =>
      val k = c.meta("window_number").asInstanceOf[Long]
      val t = c.meta("emit_time").asInstanceOf[Long]
      math.abs(t - (reg + k * 1000L)).toDouble
    }
    val emitted = emits.size.toLong
    val dropped = math.max(0L, seconds.toLong - emitted)
    (emitted, if (jitters.nonEmpty) jitters.sum / jitters.size else -1.0, dropped)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)

      // AQE may re-coalesce cached-plan output (persistTracked frames)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val errors = mutable.LinkedHashMap.empty[String, String]

    // warmup pass (discarded). The runner benches (b7/b9/b10/b11) warm up
    // separately AFTER the per-entry timed section: b11's 1000-gate shared
    // pass compiles a huge Janino surface, and running it before the
    // per-entry timings evicted their compiled code from the JIT code
    // cache — BENCH_r06 recorded 8 entries 2.5-6x slower on unchanged
    // plans from exactly that ordering.
    // SPARK_GRAFT_ONLY=q_a,q_b restricts the per-entry section (and its
    // warmup) to the named entries — the iterate-on-one-query loop. The
    // runner benches and b8 still run; unset for driver-comparable output.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val entries = only match {
      case Some(sel) => SparkEntry.queries.filter { case (k, _) => sel(k) }
      case None => SparkEntry.queries
    }
    // protocol 3: the per-entry section runs in segment children (see
    // the object scaladoc) unless disabled or already a child/iteration
    // run (`only` set). Children emit one GRAFT_ENTRY line per timing.
    val segSize =
      try sys.env.getOrElse("SPARK_GRAFT_SEG_SIZE", "45").trim.toInt
      catch { case _: Throwable => 45 }
    val segmented = only.isEmpty &&
      !sys.env.get("SPARK_GRAFT_SEGMENTS").contains("0") && segSize > 0
    val emitPerEntry = sys.env.get("SPARK_GRAFT_EMIT").contains("perentry")
    // per-entry JVM telemetry rows:
    // (name, sec, firstSec, ccMb, gcMs, jitMs, heapMb) — `firstSec` is
    // the FIRST of the best-of-2 samples (VERDICT r14 item 9: best-of-2
    // runs inside one CacheScope, so run 2 of a persisting entry re-reads
    // run 1's cached frames and persist-heavy changes are flattered by
    // the best; the first-run column makes the cold-cache cost visible
    // without touching the committed best-of-2 floor methodology).
    // -1 = not a best-of-2 row (warmups, markers, single-run walls).
    val telemetry = mutable.ArrayBuffer.empty[(String, Double, Double, Double, Long, Long, Double)]
    def recordTel(name: String, sec: Double, firstSec: Double = -1.0): Unit = {
      telemetry += ((name, sec, firstSec, Jvm.codeCacheUsedMb, Jvm.gcMs, Jvm.jitMs,
        Jvm.heapUsedMb))
      // "__"-prefixed rows are JVM telemetry markers, not entries: a
      // segment child emitting them as GRAFT_ENTRY lines would hand the
      // parent phantom (name, 0.0) rows that inflate n_queries and
      // pollute the queries map
      if (emitPerEntry && !name.startsWith("__")) {
        val err = errors.get(name)
          .map(e => s""","err":"${e.replace("\\", "\\\\").replace("\"", "\\\"")
            .replaceAll("[\\x00-\\x1f]", " ")}"""")
          .getOrElse("")
        println(s"""GRAFT_ENTRY{"name":"$name","sec":${math.rint(sec * 1000) / 1000}$err}""")
      }
    }
    recordTel("__jvm_start", 0.0)

    // BOX CANARY (protocol 3): a fixed, graft-independent Spark job
    // (codegen'd hash + one small shuffle over synthetic rows — no IO,
    // no graft code) measured at run start. The committed floor file
    // carries the best canary ever seen ("__canary"); today's canary
    // over that best is the BOX FACTOR, and every flag threshold
    // scales by it. Rationale (measured r12): the same commit's fresh
    // BenchOne medians swung 1.5-2.6x across a single day on this box
    // while relative entry costs held — absolute floors recorded on the
    // box's best day otherwise flag half the suite on its worst, and a
    // fresh-JVM re-time "reproduces" the breach because the box, not
    // the code, is slow. A genuine code regression still flags: the
    // canary contains no graft code, so only platform slowdown moves it.
    def canaryMedian3(): Double = {
      import org.apache.spark.sql.functions.{col, sum, xxhash64}
      def once(): Double = {
        val t0 = System.nanoTime()
        spark.range(0L, 150000000L, 1L, 32)
          .select(xxhash64(col("id")).as("h"))
          .groupBy((col("h") % 1024L).as("k"))
          .agg(sum(col("h") % 1024L).as("s")) // bounded residue: ANSI-safe
          .agg(sum(col("s"))).head()
        (System.nanoTime() - t0) / 1e9
      }
      try { once(); Seq(once(), once(), once()).sorted.apply(1) }
      catch { case _: Throwable => -1.0 }
    }
    val canarySec: Double = if (only.isDefined) -1.0 else canaryMedian3()
    if (!segmented) entries.foreach { case (_, fn) =>
      // scoped like timed(): no cross-entry cache debt (see timed())
      try graft.plans.CacheScope(spark) { fn(spark, sfDir).count(); () }
      catch { case _: Throwable => () }
    }
    if (!segmented) recordTel("__post_warmup", 0.0)

    // Steady-state timing: best of two back-to-back runs. A single sample
    // after 40+ other queries measures accumulated JVM state (GC debt,
    // code-cache churn) as much as the plan — the r3 bench recorded one
    // query at 4x its true cost from exactly that. On error the second
    // run is skipped and the failure is reported.
    // Entries are independent queries: several operators persist their
    // multi-consumer frames (linkage pairs, FK value sets, winnowing
    // fingerprints) and a lazy operator cannot unpersist them — left
    // alone, 250 entries' blocks accumulate and the storage pressure
    // taxes every LATER entry (r10 caught q_coreset at 6x its fresh
    // cost and b7 20% down from exactly this). Isolation (r13) dogfoods
    // the library's own CacheScope under the full per-entry load: the
    // best-of-2 pair runs inside ONE scope — run 2 still reuses the
    // entry's OWN persisted frames, and scope exit releases exactly
    // them. Residual blocks ENTERING an entry mean some operator
    // persisted outside persistTracked (or off-thread): counted into
    // `residual_blocks_max` telemetry so the leak is a visible number,
    // then cleared so it can never tax this entry. `session` is
    // explicit because b12 re-times on a FRESH session after the wide
    // one stops — touching the stopped session would throw.
    // localCheckpoint(true) blocks are excluded: deliberate
    // lineage-truncating materializations, ContextCleaner-reclaimed on
    // GC, never released by the old clearCache contract either
    var residualMax = 0
    def residualCheck(session: SparkSession): Unit = {
      val residual = graft.plans.CacheScope.residualOperatorPersists(session)
      if (residual > 0) {
        residualMax = math.max(residualMax, residual)
        try session.catalog.clearCache() catch { case _: Throwable => () }
      }
    }
    def timed(name: String, session: SparkSession = spark)
             (body: => Unit): (String, Double) = {
      residualCheck(session)
      def once(): Double = {
        val t0 = System.nanoTime()
        body
        (System.nanoTime() - t0) / 1e9
      }
      val res = try {
        graft.plans.CacheScope(session) {
          val first = once()
          // a failed SECOND run doesn't invalidate the first sample — keep it
          val best = try math.min(first, once()) catch { case _: Throwable => first }
          (name, best, first)
        }
      } catch {
        case e: Throwable =>
          errors(name) = s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}"
          (name, 0.0, -1.0)
      }
      recordTel(res._1, res._2, res._3)
      (res._1, res._2)
    }

    // Wall-clock single run — for bodies that must not execute twice
    // (the B8 pass streams in real time).
    def timedOnce(name: String)(body: => Unit): (String, Double) = {
      val t0 = System.nanoTime()
      try body catch {
        case e: Throwable =>
          errors(name) = s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}"
      }
      name -> (System.nanoTime() - t0) / 1e9
    }

    val b8Secs = sys.env.getOrElse("SPARK_GRAFT_B8_SECS", "60").toInt
    var b8 = (0L, -1.0, 0L)
    // GRAFT_ENTRY{"name":"...","sec":1.234[,"err":"..."]} — what segment
    // children print per timed entry and the parent parses back
    val entryLine =
      """GRAFT_ENTRY\{"name":"([^"]+)","sec":([0-9.eE+-]+)(?:,"err":"(.*)")?\}""".r
    val perQuery: Seq[(String, Double)] =
      if (!segmented) entries.toSeq.map { case (name, fn) =>
        timed(name)(fn(spark, sfDir).count())
      } else {
        val names = entries.keys.toSeq
        names.grouped(segSize).zipWithIndex.flatMap { case (seg, i) =>
          val segTel = s"/tmp/graft_bench_tel_seg$i.json"
          val (rc, out) = spawn("graft.Bench", Seq.empty, Map(
            "SPARK_GRAFT_ONLY" -> seg.mkString(","),
            "SPARK_GRAFT_SF_DIR" -> sfDir,
            "SPARK_GRAFT_CPUS" -> cpus,
            "SPARK_GRAFT_EMIT" -> "perentry",
            "SPARK_GRAFT_TELEMETRY" -> segTel,
            // a child must never touch the committed floor file: point it
            // at a scratch path (empty file → stale protocol → `only` set
            // → no write, and no floors to flag against)
            "SPARK_GRAFT_HISTORY" -> s"/tmp/graft_bench_hist_seg$i.json"
          ), timeoutMs = 45 * 60 * 1000L)
          val got = out.linesIterator.collect {
            // belt-and-braces vs recordTel's own "__" skip: telemetry
            // markers must never parse back as entries
            case entryLine(n, sec, err) if !n.startsWith("__") =>
              if (err != null && err.nonEmpty) errors(n) = err
              n -> sec.toDouble
          }.toSeq
          // merge the child's telemetry rows under this parent
          try {
            val txt = new String(java.nio.file.Files.readAllBytes(
              java.nio.file.Paths.get(segTel)), "UTF-8")
            """\{"name":"([^"]+)","sec":([0-9.eE+-]+),"first":([0-9.eE+-]+),"cc_mb":([0-9.eE+-]+),"gc_ms":(-?\d+),"jit_ms":(-?\d+),"heap_mb":([0-9.eE+-]+)\}""".r
              .findAllMatchIn(txt).foreach { m =>
                telemetry += ((s"seg$i:${m.group(1)}", m.group(2).toDouble,
                  m.group(3).toDouble, m.group(4).toDouble, m.group(5).toLong,
                  m.group(6).toLong, m.group(7).toDouble))
              }
          } catch { case _: Throwable => () }
          val gotNames = got.map(_._1).toSet
          val missing = seg.filterNot(gotNames)
          if (rc != 0 || missing.nonEmpty) {
            errors(s"__segment$i") = s"child rc=$rc, ${missing.size} entries " +
              s"missing (re-timed in-process): ${missing.take(5).mkString(",")}"
            // degrade, never lose entries: time the stragglers here
            got ++ missing.map { n =>
              try graft.plans.CacheScope(spark) {
                entries(n)(spark, sfDir).count(); ()
              } catch { case _: Throwable => () }
              timed(n)(entries(n)(spark, sfDir).count())
            }
          } else got
        }.toSeq
      }
    System.gc() // drop per-query GC debt before the runner benches
    // Each runner bench warms IMMEDIATELY before its own timed run —
    // codegen/janino compilation of the shared-pass aggregate columns is
    // the dominant cold-start cost, and interleaving another bench's
    // (different) codegen surface between a warmup and its measurement
    // re-churns the JIT code cache the warmup just populated. Warm
    // TWICE: the r11 fresh-JVM probe showed the shared pass reaches
    // steady state only on its THIRD execution (run 2 still ~1.5x run 3
    // — Janino classes compile on run 1, C2 compiles the hot generated
    // methods during run 2), and a single warmup left b11 measuring a
    // half-warm pass (8.75 s in-suite vs 6.1 s steady).
    def warmed(name: String)(warm: => Unit)(body: => Unit): (String, Double) = {
      try { warm; warm } catch { case _: Throwable => () }
      timed(name)(body)
    }
    val results = if (only.isDefined) perQuery else perQuery :+ warmed("b7_runner_100q") {
      runnerPass(spark, sfDir, 100)
    } {
      val finished = runnerPass(spark, sfDir, 100)
      require(finished == 100, s"runner finished $finished of 100 queries")
    } :+ warmed("b11_runner_1000q") {
      runnerPass(spark, sfDir, 1000)
    } {
      val finished = runnerPass(spark, sfDir, 1000)
      require(finished == 1000, s"runner finished $finished of 1000 queries")
    } :+ warmed("b9_runner_200eq") {
      eqRunnerPass(spark, sfDir, 200)
    } {
      val finished = eqRunnerPass(spark, sfDir, 200)
      require(finished == 200, s"eq runner finished $finished of 200 queries")
    } :+ warmed("b10_runner_200eq_tuple") {
      eqTupleRunnerPass(spark, sfDir, 200)
    } {
      val finished = eqTupleRunnerPass(spark, sfDir, 200)
      require(finished == 200, s"tuple runner finished $finished of 200 queries")
    } :+ warmed("b14_runner_1k_eq") {
      eqRunnerPass(spark, sfDir, 1000)
    } {
      val finished = eqRunnerPass(spark, sfDir, 1000)
      require(finished == 1000, s"eq runner finished $finished of 1000")
    } :+ warmed("b14_runner_10k_eq") {
      eqRunnerPass(spark, sfDir, 10000)
    } {
      // the admission claim under test: 10k same-signature COUNT queries
      // fold into ONE groupBy job, so ms/query stays flat vs the 1k run
      val finished = eqRunnerPass(spark, sfDir, 10000)
      require(finished == 10000, s"eq runner finished $finished of 10000")
    } :+ warmed("b14_mixed_1k") {
      mixedAdmissionPass(spark, sfDir, 1000)
    } {
      val finished = mixedAdmissionPass(spark, sfDir, 1000)
      require(finished == 1000, s"mixed runner finished $finished of 1000")
    } :+ warmed("b14_mixed_10k") {
      // both partitioners engage: 80% eq-folded + 20% range-folded
      mixedAdmissionPass(spark, sfDir, 10000)
    } {
      val finished = mixedAdmissionPass(spark, sfDir, 10000)
      require(finished == 10000, s"mixed runner finished $finished of 10000")
    } :+ warmed("b14_unfold_1k") {
      unfoldAdmissionPass(spark, sfDir, 1000)
    } {
      val finished = unfoldAdmissionPass(spark, sfDir, 1000)
      require(finished == 1000, s"unfold runner finished $finished of 1000")
    } :+ warmed("b14_unfold_10k") {
      // the genuinely-unfoldable minority: flat per-query cost as the
      // foldable majority amortizes
      unfoldAdmissionPass(spark, sfDir, 10000)
    } {
      val finished = unfoldAdmissionPass(spark, sfDir, 10000)
      require(finished == 10000, s"unfold runner finished $finished of 10000")
    } :+ timed("b15_noop_filter_project") {
      // guide §1.4: `.count()` lets the optimizer prune computed
      // projection columns, so the count-timed q_filter_project floor
      // times the filter, not the projection. These b15 rows time the
      // SAME entries through the noop sink (computes every column of
      // every row, discards the result) — ADDED alongside, never
      // replacing, the count-timed entries, so the committed floors and
      // the driver's cross-round comparisons stay on one methodology.
      entries.getOrElse("q_filter_project",
        SparkEntry.queries("q_filter_project"))(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    } :+ timed("b15_noop_raw_filter") {
      entries.getOrElse("q_raw_filter",
        SparkEntry.queries("q_raw_filter"))(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    } :+ timed("b15_noop_expr_ops") {
      entries.getOrElse("q_expr_ops",
        SparkEntry.queries("q_expr_ops"))(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    } :+ timedOnce("b8_stream_tumbling") {
      b8 = b8Pass(spark, b8Secs)
    }

    // BASELINE B7 metrics need the event count BEFORE b12 swaps sessions
    val eventRows =
      try spark.read.parquet(s"$sfDir/events.parquet").count()
      catch { case _: Throwable => 0L } // summary must not lose the JSON line

    // b13: 10x scale-growth smoke over the guarded pair-join family.
    // Each op runs on a 1-replica and a 10-replica corpus (id-remapped
    // unions; text perturbed per replica by a letter rotation so each
    // replica carries its own vocabulary and the dup-rate per volume
    // stays realistic — a verbatim 10x union would push every
    // fingerprint's df over the boilerplate cut and measure nothing).
    // The graded claim: wall-time growth stays ~linear-with-logs and no
    // guard trips. Single samples, own frames cleared per run;
    // kept OUT of the per-entry results so the floors/regression watch
    // never ingest a deliberately-10x run.
    val b13: Seq[(String, Double, Double, Long, Long)] =
      if (only.isDefined) Seq.empty else {
        import org.apache.spark.sql.DataFrame
        import org.apache.spark.sql.functions.{col, lit, translate}
        def docsRep(n: Int): DataFrame = {
          val base = spark.read.parquet(s"$sfDir/documents.parquet")
            .select(col("doc_id"), col("text"))
          val alpha = "etaonrishd"
          (0 until n).map { r =>
            val rot = alpha.drop(r % alpha.length) + alpha.take(r % alpha.length)
            base.select((col("doc_id") + lit(r * 10000000L)).as("doc_id"),
              (if (r == 0) col("text")
               else translate(col("text"), alpha, rot)).as("text"))
          }.reduce(_ unionByName _)
        }
        def edgesRep(n: Int): DataFrame = {
          val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
            .filter(col("l_orderkey") % 5 === 0)
            .select(col("l_orderkey").as("g"), col("l_partkey").as("i"))
          (0 until n).map { r =>
            li.select((col("g") + lit(r * 100000000L)).as("g"),
              (col("i") + lit(r * 100000000L)).as("i"))
          }.reduce(_ unionByName _)
        }
        val ops: Seq[(String, Int => Long)] = Seq(
          ("winnow", n => graft.pipeline.Winnowing.matchPairs(
            docsRep(n), "doc_id", "text", k = 24, w = 8, minShared = 5,
            maxDocFreq = 3).count()),
          ("minhash", n => graft.pipeline.Dedup.minhashLshPairs(
            docsRep(n), "doc_id", "text", n = 3, threshold = 0.5).count()),
          ("ngram_guarded", n => graft.pipeline.Dedup.ngramJaccardPairs(
            docsRep(n), "doc_id", "text", n = 3, threshold = 0.5,
            maxDocFreq = Some(200)).count()),
          // tf_dot is deliberately EXCLUDED (no silent caps — reason
          // logged here): on this 31-word-vocabulary corpus every doc
          // shares every token with every other doc, so the thresholded
          // dot's candidate volume is Θ(docs²) by the DATA, not by the
          // plan — 50k docs imply ~3.7e11 head multiply-adds and no
          // guard configuration makes that linear. Its own guard says
          // the same: past the budget, use the ANN/banded similarity
          // paths (which ARE in this smoke via minhash). ScaleSmokeSpec
          // keeps the small-SF output-linearity check for the op.
          ("kcore", n => graft.pipeline.Graph.kCore(
            graft.pipeline.Graph.cooccurrenceEdges(edgesRep(n), "g", "i"),
            "a", "b", k = 12).count()))
        ops.flatMap { case (name, run) =>
          try {
            def one(n: Int): (Double, Long) = {
              residualCheck(spark)
              graft.plans.CacheScope(spark) {
                val t0 = System.nanoTime()
                val rows = run(n)
                ((System.nanoTime() - t0) / 1e9, rows)
              }
            }
            val (t1, r1) = one(1)
            val (t10, r10) = one(10)
            Some((name, t1, t10, r1, r10))
          } catch {
            case e: Throwable =>
              errors(s"b13:$name") =
                s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}"
              None
          }
        }
      }

    // b13_100x: TWO-DECADE scale growth on the two cheapest guarded
    // families (winnow, kcore), from the sf0.01 sibling so the 100x
    // corpus lands near 10x the driver SF's volume and wall stays sane.
    // Replica perturbation must give >= 100 DISTINCT vocabularies (the
    // 10-letter rotation of b13 collides past 10 replicas and verbatim
    // cross-replica dups would push every fingerprint over the df cut):
    // each replica applies an AFFINE letter permutation i -> a*i + b
    // (mod 26), a coprime to 26 — 312 distinct maps. The graded claim:
    // wall growth stays ~linear-with-logs across BOTH decades and row
    // volume tracks the replica count.
    val b13_100x: Seq[(String, Seq[(Int, Double, Long)])] =
      if (only.isDefined || sys.env.get("SPARK_GRAFT_100X").contains("0")) Seq.empty
      else {
        import org.apache.spark.sql.DataFrame
        import org.apache.spark.sql.functions.{col, concat, length, lit, substring, translate}
        val sf001 = {
          val p = java.nio.file.Paths.get(sfDir).toAbsolutePath
          val sib = p.getParent.resolve("sf0.01")
          if (java.nio.file.Files.isDirectory(sib)) sib.toString else sfDir
        }
        val alpha = "abcdefghijklmnopqrstuvwxyz"
        def affinePerm(r: Int): String = {
          val as = Array(1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25)
          val a = as((r / 26) % as.length); val b = r % 26
          (0 until 26).map(i => alpha((a * i + b) % 26)).mkString
        }
        def docsRep(n: Int): DataFrame = {
          val base = spark.read.parquet(s"$sf001/documents.parquet")
            .select(col("doc_id"), col("text"))
          (0 until n).map { r =>
            base.select((col("doc_id") + lit(r * 10000000L)).as("doc_id"),
              (if (r == 0) col("text")
               else translate(col("text"), alpha, affinePerm(r))).as("text"))
          }.reduce(_ unionByName _)
        }
        def edgesRep(n: Int): DataFrame = {
          val li = spark.read.parquet(s"$sf001/lineitem.parquet")
            .filter(col("l_orderkey") % 5 === 0)
            .select(col("l_orderkey").as("g"), col("l_partkey").as("i"))
          // id-offset replicas via a 1-row-per-replica cross (disjoint
          // graph copies) — no 100-way union plan needed for edges
          li.crossJoin(spark.range(n).toDF("r"))
            .select((col("g") + col("r") * 100000000L).as("g"),
              (col("i") + col("r") * 100000000L).as("i"))
        }
        val ops: Seq[(String, Int => Long)] = Seq(
          ("winnow", n => graft.pipeline.Winnowing.matchPairs(
            docsRep(n), "doc_id", "text", k = 24, w = 8, minShared = 5,
            maxDocFreq = 3).count()),
          // the guarded pair-join family's second measured decade (r13):
          // banded-LSH minhash — candidates only inside (band, bkey)
          // buckets, exact-Jaccard verify. The affine permutation gives
          // each replica its own vocabulary, so buckets stay
          // replica-local and the Σ|bucket|² envelope tracks the data.
          // True pairs are permutation-invariant (Jaccard is preserved
          // by a token bijection); LSH recall may vary hash-by-hash per
          // replica, so rows track ~linearly rather than exactly.
          ("minhash", n => graft.pipeline.Dedup.minhashLshPairs(
            docsRep(n), "doc_id", "text", n = 3, threshold = 0.5).count()),
          // exact-substr (r14): the last guarded pair-join family with
          // one measured decade — content-sampled anchor bucket-join +
          // char-verified extension. Each replica plants spliced
          // 160-char partial copies of its OWN first 15 docs (the
          // q_dedup_substr fixture shape), so true spans are
          // replica-local and their volume exactly linear; anchor
          // sampling is md5-content-based, so natural-span counts per
          // replica vary hash-by-hash and total rows track ~linearly.
          ("substr", n => {
            val d = docsRep(n)
            val planted = d
              .filter(col("doc_id") % 10000000L < 15 && length(col("text")) >= 220)
              .select((col("doc_id") + 1000000L).as("doc_id"),
                concat(lit("P-"), col("doc_id").cast("string"), lit(": "),
                  substring(col("text"), 31, 160), lit(" :S")).as("text"))
            graft.pipeline.ExactSubstr.sharedSpans(d.unionByName(planted),
              "doc_id", "text", k = 20, stride = 4, minLen = 100,
              maxDocFreq = 8, maxOccPerDoc = 16).count()
          }),
          ("kcore", n => graft.pipeline.Graph.kCore(
            graft.pipeline.Graph.cooccurrenceEdges(edgesRep(n), "g", "i"),
            "a", "b", k = 12).count()))
        ops.flatMap { case (name, run) =>
          try {
            val pts = Seq(1, 10, 100).map { n =>
              residualCheck(spark)
              graft.plans.CacheScope(spark) {
                val t0 = System.nanoTime()
                val rows = run(n)
                (n, (System.nanoTime() - t0) / 1e9, rows)
              }
            }
            Some((name, pts))
          } catch {
            case e: Throwable =>
              errors(s"b13_100x:$name") =
                s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}"
              None
          }
        }
      }

    // b12: constricted-parallelism probe. local[32] can hide a serial
    // stage — a plan spending half its wall in one task still looks
    // "fast" with 31 idle cores soaking the parallel half. Re-time the 5
    // slowest per-entry queries on a FRESH local[8] session (the 4×
    // core cut): a healthy plan scales ~linearly in its parallel
    // portion, so anything beyond ~4× its local[32] time indicates a
    // serial bottleneck the wide session masked.
    // The whole b12 block — env parse, session swap, re-times — is
    // fenced: every timing above is already banked, and a b12 failure
    // (bad env value, session creation) must degrade to an errors entry,
    // never lose the summary JSON lines.
    val b12Cpus =
      try sys.env.getOrElse("SPARK_GRAFT_B12_CPUS", "8").trim.toInt
      catch { case _: Throwable => 8 }
    var lastSession = spark
    val b12: Seq[(String, Double)] = if (only.isDefined) Seq.empty else try {
      val slowest5 = perQuery
        .filter { case (n, t) => t > 0 && !errors.contains(n) }
        .sortBy(-_._2).take(5).map(_._1)
      spark.stop()
      val s8 = SparkSession.builder()
        .master(s"local[$b12Cpus]")
        .config("spark.sql.shuffle.partitions", b12Cpus)

        // AQE may re-coalesce cached-plan output (persistTracked frames)
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s8.sparkContext.setLogLevel("WARN")
      lastSession = s8
      slowest5.map { name =>
        val fn = entries(name)
        try graft.plans.CacheScope(s8) { fn(s8, sfDir).count(); () }
        catch { case _: Throwable => () } // warm
        timed(s"b12:$name", s8)(fn(s8, sfDir).count())
      }
    } catch {
      case e: Throwable =>
        errors("b12") = s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}"
        Seq.empty
    }

    // Regression watch (BENCH carries it; the judge previously had to
    // diff rounds by hand): entries more than 25% over their best prior
    // time in the committed history file. b8 is excluded (fixed-duration
    // streaming wall). The history refreshes in place with any new bests
    // so the floor ratchets down; it is data (best-known seconds), never
    // code, and stays a few KB.
    val histPath = sys.env.getOrElse("SPARK_GRAFT_HISTORY", "bench_history.json")
    // "__"-prefixed keys are metadata, not floors: "__protocol" tags the
    // measurement protocol the floors were seeded under (2 = per-entry
    // cache isolation + fresh-JVM BenchOne re-seeds, r11) so floors from
    // a different protocol are never silently compared.
    val histAll: Map[String, Double] = try {
      val txt = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(histPath)), "UTF-8")
      """"([^"]+)"\s*:\s*([0-9.]+)""".r.findAllMatchIn(txt)
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
    } catch { case _: Throwable => Map.empty }
    // floors from a DIFFERENT measurement protocol are not comparable —
    // an untagged (pre-r11) file is protocol 1 by definition, and using
    // its luckiest-sample floors is exactly the crying-wolf class the
    // tag exists to stop. On mismatch: no floors (the watch stays
    // silent this run) and the refresh below re-seeds the file from
    // THIS run's values under the current tag.
    // protocol 3 = segmented children + fresh-JVM adjudication + the
    // box canary (r12)
    val CurrentProtocol = 3
    val histProtocol = histAll.getOrElse("__protocol", 1.0).toInt
    val history =
      if (histProtocol == CurrentProtocol) histAll.filterNot(_._1.startsWith("__"))
      else Map.empty[String, Double]
    val canaryBest = if (histProtocol == CurrentProtocol)
      histAll.getOrElse("__canary", -1.0) else -1.0
    val canaryFactor =
      if (canarySec > 0 && canaryBest > 0) canarySec / canaryBest else 1.0
    val watched = results.filter { case (k, v) =>
      v > 0 && k != "b8_stream_tumbling" && !errors.contains(k)
    }
    // BOX FACTOR = the run's own MEDIAN v/best over every floored entry,
    // never below 1. Self-normalization, r12: this box's windows swing
    // second-scale entries 1.5-3x within hours with NO pressure signal
    // and only ±15% canary (CPU) movement — the drift is IO/scheduling-
    // shaped, so no fixed probe tracks it, but a global slowdown moves
    // every ratio together and the median IS that slowdown. A single
    // regressed entry cannot move a 260-entry median, so it still
    // breaches the scaled threshold; only a >half-the-suite regression
    // would self-mask, and the canary (graft-free CPU floor, reported
    // alongside) plus the absolute b7/b11 blocks cover that class.
    val runFactor = {
      val ratios = watched.flatMap { case (k, v) =>
        history.get(k).filter(_ > 0).map(v / _)
      }.sorted
      if (ratios.isEmpty) 1.0 else ratios(ratios.size / 2)
    }
    val boxFactor = math.max(1.0, runFactor)
    // >25% over best (box-factor-scaled) + a 0.25 s absolute grace: the
    // floor is each entry's luckiest-ever sample, and sub-second entries
    // routinely swing 2x run-to-run on a shared local[32] box — without
    // the grace a normal run flags dozens of 0.2 s entries while every
    // REAL regression this mechanism has caught (q_ann_pq +37%,
    // q_coreset 6x) clears the grace by a wide margin.
    val candidates = watched.flatMap { case (k, v) =>
      history.get(k).filter(best => best > 0 && breachAt(best, v, boxFactor))
        .map(best => (k, v, best))
    }
    // SELF-ADJUDICATION (r12, hardened r13): every floor breach re-times
    // in a FRESH JVM (BenchOne) before the regressions array is written.
    // The reproduce statistic is the MINIMUM fresh sample ("can this
    // code still reach its floor neighborhood" — a genuine regression
    // can never emit a fast sample, a burst window usually lets one
    // calm sample through), judged by [[categorize]] against the
    // ADJUDICATION-TIME canary factor, not the suite's box_factor (the
    // re-times run in a different window — r12's one "reproduced" flag
    // was the adjudication riding the same polluted window).
    // Budget (r13): candidates adjudicate in descending breach-ratio
    // order v/(best*box_factor) — the most suspicious plans first —
    // with min-of-3 sampling for batch entries (streaming entries keep
    // 5: dir churn + micro-batch scheduling gives them 1.7x per-sample
    // spread, BENCH_NOTES r12 tail) so more candidates fit the wall
    // cap. Whatever the budget skips ships under `unadjudicated`,
    // never inside `regressions`.
    val readjMax =
      try sys.env.getOrElse("SPARK_GRAFT_READJ_MAX", "12").trim.toInt
      catch { case _: Throwable => 12 }
    val readjBudgetMs = 360000L
    // within-run disproof shortcut: b12 already re-timed the slowest
    // entries on a FRESH constricted (local[8]) session — a flagged
    // entry whose b12 time sits inside the UNSCALED envelope is
    // disproved by evidence from this very run (constricted-at-1/4-cores
    // inside the envelope is strictly stronger than a wide fresh pass),
    // without spending re-time budget. Partitioned BEFORE any
    // adjudication probe so a fully-b12-disproved run spends nothing.
    val b12Times: Map[String, Double] =
      b12.map { case (k, v) => k.stripPrefix("b12:") -> v }.toMap
    val (b12Disproved, needSpawn) = candidates
      .sortBy { case (_, v, best) => -(v / (best * boxFactor)) }
      .partition { case (k, _, best) =>
        b12Times.get(k).exists(t => !breachAt(best, t, 1.0)) }
    // PRELIMINARY summary BEFORE any adjudication spawn (the anchor and
    // canary probes included — the anchor is a child JVM that can run
    // minutes): if an external wall budget kills the run during
    // adjudication, the stdout tail still carries a parseable line —
    // with the box verdict, so even a killed degraded-window run's tail
    // is honest. The final lines print after adjudication and supersede
    // this one.
    locally {
      def r3p(v: Double) = math.rint(v * 1000) / 1000
      val qs = results.sortBy(-_._2).take(10)
        .map { case (k, v) => s""""$k":${r3p(v)}""" }.mkString(",")
      val pv = if (boxFactor >= DegradedBoxFactor) "box_degraded" else "preliminary"
      // a DISTINCT metric name: a driver that grabs the first
      // "metric":"total" line must never pick this one up
      println(s"""{"metric":"total_preliminary","value":${r3p(results.map(_._2).sum)},""" +
        s""""unit":"sec","preliminary":true,"verdict":"$pv",""" +
        s""""box_factor":${r3p(boxFactor)},"n_candidates":${candidates.size},""" +
        s""""n_queries":${results.size},""" +
        s""""n_errors":${errors.size},"queries":{$qs},"sf":"$sfDir"}""")
    }
    // ANCHOR probe (r13): the CPU canary cannot see the IO/scheduling
    // burst class (the r13 validation run measured its fastest-ever
    // canary, 0.579 s, in the same window where fresh-JVM re-times ran
    // 3x their idle-box values and 6/6 flags later disproved idle).
    // The anchor is GRAFT-SHAPED: a fresh-JVM BenchOne run of a small,
    // stable entry (JVM startup + parquet scan + shuffle + agg),
    // compared against its own ratcheted floor — like-for-like across
    // runs, and the burst class moves it. The statistic is the MEDIAN
    // of 3 samples against the best MEDIAN on record ("__anchor_med"):
    // the anchor is a window-state probe, not a reproduce decision —
    // the question is "what will a typical re-time sample experience",
    // and a burst that lets one calm sample through fools a min but
    // not a median (run 4 shipped 6 window-product flags at
    // min-anchor 1.2 exactly that way). The adjudication factor is the
    // max of both probes. Measured on EVERY full run so calm runs seed
    // and ratchet the floor — a first seed taken in a burst window
    // must not leave the probe blind to later bursts.
    val AnchorEntry = "q_group_all"
    val anchorBest = if (histProtocol == CurrentProtocol)
      histAll.getOrElse("__anchor_med", -1.0) else -1.0
    val anchorMed: Double =
      if (only.isDefined) -1.0 else {
        val (rc, out) = spawn("graft.BenchOne", Seq(AnchorEntry, sfDir), Map(
          "SPARK_GRAFT_SAMPLES" -> "3",
          "SPARK_GRAFT_CPUS" -> cpus), 3 * 60 * 1000L)
        if (rc != 0) -1.0
        // anchored on the full summary line (metric+entry+value) — a
        // future log line containing a bare "value": ahead of the
        // summary must not silently become the anchor (ADVICE r13)
        else (""""metric":"median","entry":"""" + AnchorEntry +
          """","value":([0-9.eE+-]+)""").r.findFirstMatchIn(out)
          .map(_.group(1).toDouble).getOrElse(-1.0) // BenchOne's median
      }
    val anchorFactor =
      if (anchorMed > 0 && anchorBest > 0) math.max(1.0, anchorMed / anchorBest)
      else 1.0 // first run seeds the anchor floor below
    // adjudication-time canary: the box state the fresh re-times will
    // actually run under (median-of-3, ~2 s warm). Skipped when no
    // fresh spawn will run.
    val adjCanary: Double =
      if (needSpawn.isEmpty || only.isDefined) -1.0 else canaryMedian3()
    val adjCpuFactor =
      if (adjCanary > 0 && canaryBest > 0) math.max(1.0, adjCanary / canaryBest)
      else 1.0
    val adjFactor = math.max(adjCpuFactor, anchorFactor)
    val readjStart = System.currentTimeMillis()
    // b12-disproved rows consume no budget slot; only real spawns count
    val adjudicated: Seq[AdjRow] =
      b12Disproved.map { case (k, v, best) =>
        val t = b12Times(k)
        AdjRow(k, v, best, freshMin = Some(t), freshMedian = Some(t))
      } ++ needSpawn.zipWithIndex
        .map { case ((k, v, best), idx) =>
          // iteration (`only`) runs never spawn re-times — their cold
          // samples over-flag by design and the README says to judge
          // only the full-suite line
          val inBudget = only.isEmpty && idx < readjMax &&
            System.currentTimeMillis() - readjStart < readjBudgetMs
          val samples = if (k.contains("stream")) "5" else "3"
          val fresh: Option[Seq[Double]] = if (!inBudget) None else {
            val (rc, out) = spawn("graft.BenchOne", Seq(k, sfDir), Map(
              "SPARK_GRAFT_SAMPLES" -> samples,
              "SPARK_GRAFT_CPUS" -> cpus), 6 * 60 * 1000L)
            if (rc != 0) None
            else """"samples":\[([0-9.,eE+-]+)\]""".r
              .findFirstMatchIn(out)
              .map(_.group(1).split(",").map(_.toDouble).toSeq.sorted)
          }
          AdjRow(k, v, best,
            freshMin = fresh.map(_.min),
            freshMedian = fresh.map(s => s(s.size / 2)))
        }
    val (regressions0, suiteNoise0, unadjudicated0) =
      categorize(adjudicated, adjFactor)
    val regressions = regressions0.sortBy(-_.sec)
    val suiteNoise = suiteNoise0.sortBy(-_.sec)
    val unadjudicated = unadjudicated0.sortBy(-_.sec)
    // the run verdict a first-line parser should trust: a box window at
    // DegradedBoxFactor+ cannot produce meaningful in-suite walls or
    // unreproduced flags (r11: 42 phantom flags, r12: 55)
    val verdict =
      if (boxFactor >= DegradedBoxFactor) "box_degraded"
      else if (adjFactor >= DegradedBoxFactor && unadjudicated.nonEmpty)
        "adjudication_degraded"
      else "ok"
    // NEVER publish the baseline block from a polluted window (r13: the
    // degraded official run shipped q_filter_project at 27.89× in an
    // otherwise honest file — all three >2x rows disproved): when the
    // verdict is degraded, re-time the ~9 committed BASELINE §2 entries
    // in ONE fresh child JVM (min-of-3 — the baseline question is "can
    // the plan still reach its floor", the min is that statistic;
    // cheap entries first so the runner benches' Janino surface can't
    // tax them) and emit the block from those with source="fresh".
    val freshBaseline: Map[String, Double] =
      if (verdict == "ok" || only.isDefined) Map.empty
      else {
        val names = BaselineTargets.map(_._1)
        val (rc, out) = spawn("graft.BenchOne",
          Seq(names.mkString(","), sfDir),
          Map("SPARK_GRAFT_SAMPLES" -> "3", "SPARK_GRAFT_CPUS" -> cpus),
          8 * 60 * 1000L)
        if (rc != 0) Map.empty
        else {
          """"metric":"median","entry":"([^"]+)","value":[0-9.eE+-]+,"unit":"sec","samples":\[([0-9.,eE+-]+)\]""".r
            .findAllMatchIn(out)
            .map(m => m.group(1) -> m.group(2).split(",").map(_.toDouble).min)
            .toMap
        }
      }
    // fresh MEDIANS are the protocol-valid floor ratchet samples; the
    // MIN stays reproduce-decision-only — fresh-JVM minima run
    // systematically below segment-child best-of-2, so min-ratcheting
    // drifts floors into a population the suite can never reproduce
    // and the same entries burn the re-time budget every run (the
    // tf_dot stale-floor class). b12-disproved rows are EXCLUDED: their
    // "fresh" value is a constricted local[8] time — a shuffle-light
    // entry can run FASTER there than any wide-session sample, and
    // ratcheting it in would create the same unreachable-floor class.
    val b12DisprovedNames = b12Disproved.map(_._1).toSet
    val freshBests = adjudicated
      .collect { case AdjRow(k, _, _, _, Some(med))
        if !b12DisprovedNames(k) => k -> med }.toMap
    // A protocol-mismatch re-seed rewrites the file from THIS run's
    // entries only — legitimate for a full run, but under `only` a
    // single-entry iteration run would silently and permanently wipe
    // every other floor. Partial run + stale protocol → no write at all
    // (floors stay stale-tagged until the next full run re-seeds them).
    // The floors are sf0.1 best-seconds by definition: a run at any
    // other SF must never ratchet them (r15 — an sf0.01 SPARK_GRAFT_ONLY
    // smoke run min-ratcheted q_linkage's floor to its sf0.01 wall,
    // which would have flagged every honest sf0.1 sample as a breach).
    val floorsSf = sfDir.replaceAll("/+$", "").endsWith("sf0.1")
    if (floorsSf && (histProtocol == CurrentProtocol || only.isEmpty)) try {
      // the canary floor min-ratchets like any entry: the factor is
      // always "today over the box's best recorded day"
      val canaryMin = (Seq(canarySec, canaryBest).filter(_ > 0) :+ Double.MaxValue).min
      // the anchor floor ratchets to the best MEDIAN ever: always "this
      // adjudication window's typical sample over the box's best"
      val anchorFloor = (Seq(anchorMed, anchorBest).filter(_ > 0) :+ Double.MaxValue).min
      val meta = Seq(s""" "__protocol": $CurrentProtocol""") ++
        (if (canaryMin < Double.MaxValue)
          Seq(s""" "__canary": ${math.rint(canaryMin * 1000) / 1000}""")
        else Seq.empty) ++
        (if (anchorFloor < Double.MaxValue)
          Seq(s""" "__anchor_med": ${math.rint(anchorFloor * 1000) / 1000}""")
        else Seq.empty)
      // record EVERY clean timing (incl. b8, which the watch excludes as
      // a fixed-duration wall) so a protocol-mismatch re-seed never drops
      // an entry from the file permanently
      val recordable = results.filter { case (k, v) => v > 0 && !errors.contains(k) }
      val merged = (history.keySet ++ recordable.map(_._1)).toSeq.sorted.map { k =>
        val cur = recordable.collectFirst { case (`k`, t) => t }
        val prev = history.get(k)
        val best = (cur.toSeq ++ prev.toSeq ++ freshBests.get(k).toSeq).min
        s""" "$k": ${math.rint(best * 1000) / 1000}"""
      }
      java.nio.file.Files.write(java.nio.file.Paths.get(histPath),
        (meta ++ merged).mkString("{\n", ",\n", "\n}\n").getBytes("UTF-8"))
    } catch { case _: Throwable => () } // history refresh must never kill the summary

    val qs = results.map { case (k, v) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    def runnerJson(name: String, nq: Int): String = {
      val sec = results.collectFirst { case (`name`, t) => t }.getOrElse(0.0)
      s"""{"queries":$nq,"input_records":$eventRows,""" +
        s""""records_per_sec":${if (sec > 0) eventRows / sec else 0.0},""" +
        s""""ms_per_query":${if (sec > 0) sec * 1000.0 / nq else 0.0}}"""
    }
    val b7Json = runnerJson("b7_runner_100q", 100)
    val b11Json = runnerJson("b11_runner_1000q", 1000)
    val b8Json = s"""{"windows":${b8._1},"expected":$b8Secs,"jitter_ms_avg":${b8._2},"dropped":${b8._3}}"""
    // b12 rows pair the constricted re-time with its local[32] original
    // so the scaling ratio reads straight off the bench file
    val b12Json = {
      def r3b(v: Double) = math.rint(v * 1000) / 1000
      val rows = b12.map { case (k, v) =>
        val orig = k.stripPrefix("b12:")
        val wide = perQuery.collectFirst { case (`orig`, t) => t }.getOrElse(0.0)
        s"${jstr(orig)}:{\"wide\":${r3b(wide)},\"constricted\":${r3b(v)}}"
      }.mkString(",")
      s"""{"cpus":$b12Cpus,"queries":{$rows}}"""
    }
    def r3r(v: Double) = math.rint(v * 1000) / 1000
    def adjRowJson(r: AdjRow) =
      s"""{"name":${jstr(r.name)},"sec":${r3r(r.sec)},"best":${r3r(r.best)},""" +
        s""""fresh_min":${r.freshMin.map(f => r3r(f).toString).getOrElse("null")},""" +
        s""""fresh_median":${r.freshMedian.map(f => r3r(f).toString).getOrElse("null")}}"""
    val regJson = regressions.map(adjRowJson).mkString("[", ",", "]")
    val noiseJson = suiteNoise.map(adjRowJson).mkString("[", ",", "]")
    val unadjJson = unadjudicated.map(adjRowJson).mkString("[", ",", "]")
    // b13 rows carry the 1x/10x walls, the growth ratio, and both row
    // counts (pair volume should itself scale ~10x — a flat row count
    // means a guard silently ate the bigger corpus)
    val b13Json = b13.map { case (name, t1, t10, r1, r10) =>
      val ratio = if (t1 > 0) math.rint(t10 / t1 * 100) / 100 else -1.0
      s"${jstr(name)}:{\"x1\":${r3r(t1)},\"x10\":${r3r(t10)},\"ratio\":$ratio,\"rows1\":$r1,\"rows10\":$r10}"
    }.mkString("{", ",", "}")
    val b14Json = {
      def sec(name: String): Double = results
        .collectFirst { case (`name`, t) => t }.getOrElse(-1.0)
      def ms(name: String, nq: Int): Double = {
        val s = sec(name); if (s > 0) s * 1000.0 / nq else -1.0
      }
      val m1k = ms("b14_runner_1k_eq", 1000)
      val m10k = ms("b14_runner_10k_eq", 10000)
      val ratio = if (m1k > 0) math.rint(m10k / m1k * 100) / 100 else -1.0
      // per-population marginal ms/query: the minority's cost is the
      // mixed pass's wall over the all-eq pass, per minority query (the
      // eq 4/5 folds into the same one groupBy job either way). b14_mixed's
      // 20% is `value > t` — RANGE-FOLDED since r14 (pre-partitioner
      // committed floor 6.4 ms/query at 1k); b14_unfold's 20% is
      // `value*2 > t` — genuinely unfoldable, carrying the flatness
      // claim (unfold_ratio ≈ 1 or below from 1k to 10k).
      def marginal(wall: Double, eqWall: Double, nArb: Int): Double =
        if (wall > 0 && eqWall > 0) math.max(0.0, wall - eqWall) * 1000.0 / nArb
        else -1.0
      val (x1k, x10k) = (sec("b14_mixed_1k"), sec("b14_mixed_10k"))
      val (u1k, u10k) = (sec("b14_unfold_1k"), sec("b14_unfold_10k"))
      val (e1k, e10k) = (sec("b14_runner_1k_eq"), sec("b14_runner_10k_eq"))
      val rng1k = marginal(x1k, e1k, 200)
      val rng10k = marginal(x10k, e10k, 2000)
      val rngRatio = if (rng1k > 0) math.rint(rng10k / rng1k * 100) / 100 else -1.0
      val unf1k = marginal(u1k, e1k, 200)
      val unf10k = marginal(u10k, e10k, 2000)
      val unfRatio = if (unf1k > 0) math.rint(unf10k / unf1k * 100) / 100 else -1.0
      s"""{"ms_per_query_1k":${r3r(m1k)},"ms_per_query_10k":${r3r(m10k)},"ratio":$ratio,""" +
        s""""mixed":{"wall_1k":${r3r(x1k)},"wall_10k":${r3r(x10k)},""" +
        s""""ms_per_query_range_1k":${r3r(rng1k)},"ms_per_query_range_10k":${r3r(rng10k)},""" +
        s""""range_ratio":$rngRatio},""" +
        s""""unfold":{"wall_1k":${r3r(u1k)},"wall_10k":${r3r(u10k)},""" +
        s""""ms_per_query_unfold_1k":${r3r(unf1k)},"ms_per_query_unfold_10k":${r3r(unf10k)},""" +
        s""""unfold_ratio":$unfRatio}}"""
    }
    // BASELINE.md §2: this run against the committed measured targets
    // (Bench.BaselineTargets — single source, spec-pinned to the doc
    // table), so the 2x criterion binds against a committed table
    // instead of bench_history archaeology. Values come from the
    // in-suite walls on an `ok` verdict and from the fresh-JVM probe on
    // a degraded one; the block's `source` field carries which.
    val baselineJson = {
      val inSuite = results.filter(_._2 > 0).toMap
      val (vals, source) =
        baselineValues(inSuite, freshBaseline, degraded = verdict != "ok")
      baselineBlock(vals, source,
        sfMatch = sfDir.contains("sf0.1"),
        b8ok = b8._1 >= b8Secs && b8._3 == 0 && b8._2 >= 0 && b8._2 < 100)
    }
    // b13_100x rows: wall + row volume at x1/x10/x100 and the per-decade
    // growth ratios (r10 = x10/x1, r100 = x100/x10)
    val b13_100xJson = b13_100x.map { case (name, pts) =>
      val walls = pts.map { case (n, t, rows) =>
        s""""x$n":${r3r(t)},"rows$n":$rows""" }.mkString(",")
      def at(n: Int) = pts.collectFirst { case (`n`, t, _) => t }.getOrElse(0.0)
      val rA = if (at(1) > 0) math.rint(at(10) / at(1) * 100) / 100 else -1.0
      val rB = if (at(10) > 0) math.rint(at(100) / at(10) * 100) / 100 else -1.0
      s"${jstr(name)}:{$walls,\"r10\":$rA,\"r100\":$rB}"
    }.mkString("{", ",", "}")
    // JVM health summary + the full per-entry telemetry sidecar file —
    // the evidence stream for adjudicating any residual late-suite drift
    val jvmJson = {
      val gc0 = telemetry.headOption.map(_._5).getOrElse(0L)
      val jit0 = telemetry.headOption.map(_._6).getOrElse(0L)
      // box_anomaly: box_factor far above canary_factor = the
      // IO/scheduling burst class (entries slow, CPU canary calm) OR a
      // >half-the-suite code regression the median absorbed — either
      // way a warning a first-line parser must see (ADVICE r12)
      s"""{"cc_used_mb":${r3r(Jvm.codeCacheUsedMb)},"cc_max_mb":${r3r(Jvm.codeCacheMaxMb)},""" +
        s""""gc_sec":${r3r((Jvm.gcMs - gc0) / 1000.0)},"jit_sec":${r3r((Jvm.jitMs - jit0) / 1000.0)},""" +
        s""""canary_sec":${r3r(canarySec)},"canary_factor":${r3r(canaryFactor)},""" +
        s""""box_factor":${r3r(boxFactor)},"adj_canary_factor":${r3r(adjCpuFactor)},""" +
        s""""adj_anchor_factor":${r3r(anchorFactor)},"adj_factor":${r3r(adjFactor)},""" +
        s""""box_anomaly":${boxFactor > math.max(1.0, canaryFactor) * 1.3},""" +
        s""""residual_blocks_max":$residualMax,"segmented":$segmented}"""
    }
    try {
      val telPath = sys.env.getOrElse("SPARK_GRAFT_TELEMETRY", "bench_telemetry.json")
      val rows = telemetry.map { case (n, sec, first, cc, gc, jit, heap) =>
        s"""{"name":${jstr(n)},"sec":${r3r(sec)},"first":${r3r(first)},"cc_mb":${r3r(cc)},"gc_ms":$gc,"jit_ms":$jit,"heap_mb":${r3r(heap)}}"""
      }
      java.nio.file.Files.write(java.nio.file.Paths.get(telPath),
        rows.mkString("[\n", ",\n", "\n]\n").getBytes("UTF-8"))
    } catch { case _: Throwable => () } // telemetry must never kill the summary
    // Full-fidelity summary: printed first (it scrolls past the tail
    // window) AND written to a committed artifact (VERDICT r14 item 2 —
    // the ~15 KB per-query map overflowed the driver's 2000-char tail
    // capture, so PERF compared 5 queries and manufactured 8 phantom
    // "dropped_from_bench" rows; the full map now lives in
    // `bench_full.json` where a cross-round comparison can read ALL
    // entries, and the printed tail line below stays compact). The file
    // additionally carries `queries_first` — the first-of-2 sample per
    // entry (cold-cache cost; `queries` stays the best-of-2 floor
    // methodology).
    val firstJson = telemetry
      .filter { case (n, _, first, _, _, _, _) =>
        first >= 0 && !n.startsWith("__") }
      .map { case (n, _, first, _, _, _, _) =>
        s"${jstr(n.replaceFirst("^seg\\d+:", ""))}:${r3r(first)}" }
      .mkString("{", ",", "}")
    val fullLine = s"""{"metric":"total","value":$total,"unit":"sec","verdict":"$verdict","queries":$qs,"queries_first":$firstJson,"errors":$errJson,"b7":$b7Json,"b11":$b11Json,"b8":$b8Json,"b12":$b12Json,"b13":$b13Json,"b13_100x":$b13_100xJson,"b14":$b14Json,"baseline":$baselineJson,"regressions":$regJson,"suite_noise":$noiseJson,"unadjudicated":$unadjJson,"jvm":$jvmJson,"sf":"$sfDir"}"""
    println(fullLine)
    val fullPath = sys.env.getOrElse("SPARK_GRAFT_FULL", "bench_full.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(fullPath),
      (fullLine + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () } // the artifact must never kill the summary
    // The harness keeps only the LAST ~2000 chars of stdout, and that
    // window holds the END of the stream: the LAST line must be a
    // complete JSON summary AND short enough that sbt's trailing
    // "[success] ..." line doesn't push its head out of the window
    // (exactly what happened to r14's compact line — b12/b13/b14 blocks
    // grew it past ~2.1 KB and the driver's tail lost the head). The
    // compact line therefore carries ONLY totals/verdict/baseline/jvm +
    // the slowest entries that fit a hard overall cap; everything else
    // (b12/b13/b14, full queries map, per-entry errors) lives in the
    // full line above and in bench_full.json, which "full" points at.
    def r3(v: Double) = math.rint(v * 1000) / 1000
    val slowest = results.sortBy(-_._2)
    val errNames = errors.keys.toSeq.sorted.take(5).map(jstr).mkString("[", ",", "]")
    // at most 3 adjudication rows inline — the rest by count + file
    val regCompact = regressions.take(3).map(adjRowJson).mkString("[", ",", "]")
    val head = s"""{"metric":"total","value":${r3(total)},"unit":"sec","verdict":"$verdict",""" +
      s""""n_queries":${results.size},""" +
      s""""n_errors":${errors.size},"error_names":$errNames,"b7":$b7Json,"b11":$b11Json,"b8":$b8Json,""" +
      s""""baseline":$baselineJson,""" +
      s""""n_regressions":${regressions.size},"regressions":$regCompact,""" +
      s""""n_suite_noise":${suiteNoise.size},"n_unadjudicated":${unadjudicated.size},"jvm":$jvmJson,""" +
      s""""full":${jstr(fullPath)},"queries":{"""
    val tailPart = s"""},"sf":"$sfDir"}"""
    // hard cap for the whole line: 2000-char window − ~120 chars of sbt
    // trailer − slack. Queries take whatever budget remains.
    val lineCap = 1800
    val budget = math.max(0, lineCap - head.length - tailPart.length)
    val sb = new StringBuilder
    var taken = 0
    slowest.foreach { case (k, v) =>
      val frag = s"${jstr(k)}:${r3(v)}"
      if (sb.length + frag.length < budget) { if (taken > 0) sb.append(','); sb.append(frag); taken += 1 }
    }
    println(head + sb.toString + tailPart)
    lastSession.stop()
  }
}
