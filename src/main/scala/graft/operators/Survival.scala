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
  def kaplanMeier(df: DataFrame, durationCol: String, eventCol: String): DataFrame = {
    val grp = df
      .filter(col(durationCol).isNotNull && col(eventCol).isNotNull)
      .groupBy(col(durationCol).cast("long").as("t"))
      .agg(sum(col(eventCol).cast("long")).as("n_events"),
        sum(lit(1L) - col(eventCol).cast("long")).as("n_censored"))
    // risk set at t = everyone with duration >= t: total minus all
    // subjects leaving strictly before t — a cumulative over the
    // COLLAPSED duration domain
    val wPrev = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    val wCum = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val total = grp.select(sum(col("n_events") + col("n_censored"))).first().getLong(0)
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
