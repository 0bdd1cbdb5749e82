package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Kaplan–Meier survival estimation (Kaplan & Meier 1958) — THE standard
 * right-censored time-to-event curve (churn, retention-to-event,
 * hardware lifetime): at each event time t with d_t events out of n_t
 * subjects still at risk, S(t) = Π_{t_i ≤ t} (1 − d_i / n_i). Censored
 * subjects (observation ended before any event) leave the risk set
 * without contributing an event — dropping them (what a naive retention
 * query does) biases survival DOWN; treating them as survivors biases it
 * UP. KM is the unbiased middle.
 *
 * Scale shape: the corpus collapses FIRST to per-duration (events,
 * censored) counts — one map-side-combined shuffle, after which
 * everything runs on the collapsed duration domain (days/weeks —
 * thousands of rows), where the ordered windows are the same documented
 * bounded single-partition sort as [[TimeSeries.cumulativeUniques]].
 * The cumulative product runs in log space (exp ∘ sum ∘ ln) over the
 * ORDERED window, so the float accumulates in duration order on every
 * engine — replayable, rounded to 4.
 */
object Survival {

  /** Default ceiling on the collapsed duration domain: the cumulative
    * windows below sort all distinct durations on ONE task (the same
    * single-partition regime as [[ExactQuantiles]]), which is safe for
    * day/week/bucket durations but not for raw-nanosecond inputs. */
  val DefaultMaxTimePoints: Long = 4000000L

  private def requireTimeBound(op: String, distinctT: Long,
                               maxTimePoints: Long): Unit = {
    require(maxTimePoints >= 1, s"$op: maxTimePoints must be >= 1")
    require(distinctT <= maxTimePoints,
      s"$op: $distinctT distinct duration values exceed maxTimePoints=" +
        s"$maxTimePoints; the cumulative risk-set windows would sort them " +
        "on a single task. Bucket durations to a bounded domain first " +
        "(e.g. days: duration div 86400) — survival curves over raw " +
        "timestamps are step functions per subject, not per time unit.")
  }

  /**
   * KM curve from one row per subject: `durationCol` (integer time
   * units) and `eventCol` (1 = event observed at duration, 0 = censored
   * at duration). Emits one row per distinct duration with ≥ 1 event
   * (the curve's step points): n_risk, n_events, n_censored (censored
   * AT that duration), survival (rounded 4).
   *
   * Censoring convention: subjects censored at duration t are still at
   * risk for events at t (right-continuous KM; ties censored-after-
   * events — the standard convention).
   */
  def kaplanMeier(df: DataFrame, durationCol: String, eventCol: String,
                  maxTimePoints: Long = DefaultMaxTimePoints): DataFrame = {
    val grp = df
      .filter(col(durationCol).isNotNull && col(eventCol).isNotNull)
      .groupBy(col(durationCol).cast("long").as("t"))
      .agg(sum(col(eventCol).cast("long")).as("n_events"),
        sum(lit(1L) - col(eventCol).cast("long")).as("n_censored"))
      .localCheckpoint(true) // probe job + window pass share one corpus scan
    // risk set at t = everyone with duration >= t: total minus all
    // subjects leaving strictly before t — a cumulative over the
    // COLLAPSED duration domain
    val wPrev = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    val wCum = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // total + domain guard fused into the ONE existing driver job over
    // the collapsed frame — no extra Spark job for the bound
    val probe = grp.select(
      coalesce(sum(col("n_events") + col("n_censored")), lit(0L)),
      count(lit(1))).first()
    val total = probe.getLong(0)
    requireTimeBound("kaplanMeier", probe.getLong(1), maxTimePoints)
    grp
      .withColumn("n_risk",
        lit(total) - coalesce(sum(col("n_events") + col("n_censored")).over(wPrev), lit(0L)))
      // log-space cumulative product in duration order. A duration where
      // EVERYONE at risk dies must pin survival to exactly 0 from there
      // on — Spark's log(0) is NULL (not -inf) and window sums skip
      // nulls, so the zero factor is tracked explicitly via the running
      // minimum of the step terms.
      .withColumn("__term", lit(1.0) - col("n_events").cast("double") / col("n_risk"))
      .withColumn("survival",
        when(min(col("__term")).over(wCum) <= 0.0, lit(0.0))
          .otherwise(round(exp(sum(log(col("__term"))).over(wCum)), 4)))
      .filter(col("n_events") >= 1)
      .select(col("t"), col("n_risk"), col("n_events"), col("n_censored"),
        col("survival"))
  }

  /**
   * Per-cohort KM curves: [[kaplanMeier]] with every window partitioned
   * by `groupCol` — cohort comparison (plan tier vs churn, hardware
   * batch vs lifetime) in one pass. No driver collect: per-group totals
   * ride a group-partitioned window over the collapsed duration domain.
   */
  def kaplanMeierBy(df: DataFrame, groupCol: String, durationCol: String,
                    eventCol: String,
                    maxTimePoints: Long = DefaultMaxTimePoints): DataFrame = {
    val grp = df
      .filter(col(durationCol).isNotNull && col(eventCol).isNotNull &&
        col(groupCol).isNotNull)
      .groupBy(col(groupCol).as("grp"), col(durationCol).cast("long").as("t"))
      .agg(sum(col(eventCol).cast("long")).as("n_events"),
        sum(lit(1L) - col(eventCol).cast("long")).as("n_censored"))
      .localCheckpoint(true) // guard job + window pass share one corpus scan
    // windows below are PER-GROUP single-task sorts — bound the widest
    // group's collapsed time domain before running any of them
    val maxPts = grp.groupBy("grp").agg(count(lit(1)).as("c"))
      .agg(coalesce(max(col("c")), lit(0L))).first().getLong(0)
    requireTimeBound("kaplanMeierBy", maxPts, maxTimePoints)
    val wAll = Window.partitionBy("grp")
    val wPrev = Window.partitionBy("grp").orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    val wCum = Window.partitionBy("grp").orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grp
      .withColumn("n_risk",
        sum(col("n_events") + col("n_censored")).over(wAll) -
          coalesce(sum(col("n_events") + col("n_censored")).over(wPrev), lit(0L)))
      .withColumn("__term", lit(1.0) - col("n_events").cast("double") / col("n_risk"))
      .withColumn("survival",
        when(min(col("__term")).over(wCum) <= 0.0, lit(0.0))
          .otherwise(round(exp(sum(log(col("__term"))).over(wCum)), 4)))
      .filter(col("n_events") >= 1)
      .select(col("grp"), col("t"), col("n_risk"), col("n_events"),
        col("n_censored"), col("survival"))
  }

  /**
   * Two-sample log-rank test (Mantel 1966): do two cohorts share a
   * survival curve? At each pooled event time, group A's expected
   * events are d·n_A/n under the null; the statistic is
   * (Σ(d_A − E_A))² / ΣVar, χ²(1) under the null. The float sums run
   * as CUMULATIVE ordered windows over the collapsed time domain —
   * both engines add in ascending-t order, so the double is
   * bit-replayable before the final round (the engine-wide discipline
   * for unavoidable float accumulation).
   *
   * `groupCol` must hold exactly two values; "group A" is the smaller.
   * Output (one row): group_a, n_a, n_b, observed_a, expected_a, chi2.
   */
  def logRank(df: DataFrame, groupCol: String, durationCol: String,
              eventCol: String,
              maxTimePoints: Long = DefaultMaxTimePoints): DataFrame = {
    val d = df.filter(col(durationCol).isNotNull && col(eventCol).isNotNull &&
      col(groupCol).isNotNull)
    // group A = the lexically smaller label, resolved by a one-row
    // broadcast that also carries the two-groups precondition
    val ga = d.agg(min(col(groupCol).cast("string")).as("__ga"),
      countDistinct(col(groupCol)).as("__ng"))
    val grp = d.crossJoin(broadcast(ga))
      .withColumn("__isa",
        (col(groupCol).cast("string") === col("__ga")).cast("long"))
      .groupBy(col(durationCol).cast("long").as("t"))
      .agg(
        sum(col(eventCol).cast("long")).as("d_all"),
        count(lit(1)).as("l_all"),
        sum(col(eventCol).cast("long") * col("__isa")).as("d_a"),
        sum(col("__isa")).as("l_a"))
      // materialized ONCE: the guard's count and the window pass below
      // both read the (tiny, collapsed) frame without re-scanning the
      // corpus
      .localCheckpoint(true)
    requireTimeBound("logRank", grp.count(), maxTimePoints)
    val wPrev = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    val wCum = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val terms = grp
      .withColumn("n_all", sum(col("l_all")).over(Window.partitionBy()) -
        coalesce(sum(col("l_all")).over(wPrev), lit(0L)))
      .withColumn("n_a", sum(col("l_a")).over(Window.partitionBy()) -
        coalesce(sum(col("l_a")).over(wPrev), lit(0L)))
      .filter(col("d_all") >= 1)
      .withColumn("e_a", col("d_all") * col("n_a").cast("double") / col("n_all"))
      .withColumn("v_a",
        when(col("n_all") <= 1, lit(0.0)).otherwise(
          col("d_all") * (col("n_a").cast("double") / col("n_all")) *
            (lit(1.0) - col("n_a").cast("double") / col("n_all")) *
            (col("n_all") - col("d_all")).cast("double") / (col("n_all") - 1)))
      .withColumn("cum_o", sum(col("d_a")).over(wCum))
      .withColumn("cum_e", sum(col("e_a")).over(wCum))
      .withColumn("cum_v", sum(col("v_a")).over(wCum))
      .withColumn("rn_desc", row_number().over(Window.orderBy(col("t").desc)))
      .filter(col("rn_desc") === 1)
    val totals = d.groupBy(col(groupCol).cast("string").as("grp"))
      .agg(count(lit(1)).as("n"))
      .agg(min(col("grp")).as("group_a"),
        min_by(col("n"), col("grp")).as("n_a_subj"),
        max_by(col("n"), col("grp")).as("n_b_subj"),
        count(lit(1)).as("n_groups"))
    terms.crossJoin(broadcast(totals))
      .filter(assert_true(col("n_groups") === 2,
        lit("logRank needs exactly two groups")).isNull)
      .select(
        col("group_a"), col("n_a_subj").as("n_a"), col("n_b_subj").as("n_b"),
        col("cum_o").as("observed_a"),
        round(col("cum_e"), 4).as("expected_a"),
        // a degenerate risk profile (one subject at risk at every event
        // time) has zero null-variance — chi2 is undefined, emit null
        // rather than the division's NaN/Infinity
        when(col("cum_v") > 0.0,
          round((col("cum_o") - col("cum_e")) * (col("cum_o") - col("cum_e")) /
            col("cum_v"), 4)).as("chi2"))
  }

  /**
   * Churn-study framing over an event log: per key, duration = days
   * from first to last activity; the event fires (churned = 1) when the
   * key's last activity precedes the observation horizon (corpus max
   * ts) by more than `graceDays` — otherwise the subject is censored
   * (still alive at the horizon). One corpus shuffle on the key; the
   * horizon is a scalar aggregate re-entering the plan as a literal.
   */
  def churnDurations(df: DataFrame, keyCol: String, tsCol: String,
                     dayNanos: Long, graceDays: Int): DataFrame = {
    val d = df.filter(col(tsCol).isNotNull && col(keyCol).isNotNull)
      .select(col(keyCol).as("key"),
        expr(s"CAST($tsCol AS BIGINT) div ${dayNanos}L").as("day"))
    val horizon = d.select(max(col("day"))).first().getLong(0)
    d.groupBy("key")
      .agg(min(col("day")).as("first_day"), max(col("day")).as("last_day"))
      .select(col("key"),
        (col("last_day") - col("first_day")).as("duration"),
        (col("last_day") < lit(horizon - graceDays)).cast("int").as("churned"))
  }
}
