package graft

import graft.operators.Survival
import org.apache.spark.sql.functions._

/** Hand-computed conformance for the Kaplan–Meier estimator. */
class SurvivalSpec extends SparkTestBase {
  private val s = spark
  import s.implicits._

  private def r4(x: Double) =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("textbook example: censoring keeps subjects at risk until they leave") {
    // durations (event=1 death, 0 censored):
    // t=1: death of A (n=6) -> S = 5/6
    // t=2: censor B        -> no curve point, leaves risk set
    // t=3: deaths C,D (n=4)-> S = 5/6 * 2/4
    // t=4: censor E
    // t=5: death F (n=1)   -> S -> 0
    val df = Seq((1L, 1), (2L, 0), (3L, 1), (3L, 1), (4L, 0), (5L, 1))
      .toDF("duration", "event")
    val out = Survival.kaplanMeier(df, "duration", "event")
      .orderBy("t").as[(Long, Long, Long, Long, Double)].collect()
    assert(out === Array(
      (1L, 6L, 1L, 0L, r4(5.0 / 6)),
      (3L, 4L, 2L, 0L, r4(5.0 / 6 * 0.5)),
      (5L, 1L, 1L, 0L, 0.0)))
  }

  test("same-duration censor stays at risk for that duration's events") {
    // t=2: 1 death + 1 censored at 2; n_risk at 2 must be 3 (both count)
    val df = Seq((1L, 0), (2L, 1), (2L, 0), (4L, 1)).toDF("duration", "event")
    val out = Survival.kaplanMeier(df, "duration", "event")
      .orderBy("t").as[(Long, Long, Long, Long, Double)].collect()
    assert(out(0) === ((2L, 3L, 1L, 1L, r4(2.0 / 3))))
    assert(out(1) === ((4L, 1L, 1L, 0L, 0.0)))
  }

  test("no censoring degenerates to the empirical survival function") {
    val df = Seq(1L, 2L, 2L, 3L, 5L).map((_, 1)).toDF("duration", "event")
    val out = Survival.kaplanMeier(df, "duration", "event")
      .orderBy("t").select("survival").as[Double].collect()
    assert(out === Array(0.8, 0.4, 0.2, 0.0))
  }

  test("survival is non-increasing on random censored data") {
    val rnd = new scala.util.Random(11)
    val df = Seq.fill(300)((rnd.nextInt(40).toLong + 1, rnd.nextInt(2)))
      .toDF("duration", "event")
    val out = Survival.kaplanMeier(df, "duration", "event")
      .orderBy("t").select("survival").as[Double].collect()
    assert(out.zip(out.tail).forall { case (a, b) => b <= a + 1e-12 })
    assert(out.forall(v => v >= 0.0 && v <= 1.0))
  }

  test("kaplanMeierBy matches per-group kaplanMeier run separately") {
    val rnd = new scala.util.Random(5)
    val df = Seq.fill(200)((if (rnd.nextBoolean()) "a" else "b",
        rnd.nextInt(20).toLong + 1, rnd.nextInt(2)))
      .toDF("grp", "duration", "event")
    val by = Survival.kaplanMeierBy(df, "grp", "duration", "event")
      .select("grp", "t", "n_risk", "n_events", "n_censored", "survival")
      .as[(String, Long, Long, Long, Long, Double)].collect().toSet
    val sep = Seq("a", "b").flatMap { g =>
      Survival.kaplanMeier(df.filter(col("grp") === g), "duration", "event")
        .as[(Long, Long, Long, Long, Double)].collect()
        .map { case (t, nr, ne, nc, sv) => (g, t, nr, ne, nc, sv) }
    }.toSet
    assert(by === sep)
  }

  test("logRank: hand-computed two-cohort statistic") {
    // A: events at 1 and 3; B: event at 2, censored at 4.
    // E_A = .5 + 1/3 + .5 = 4/3 ; V = .25 + 2/9 + .25 = 13/18
    // chi2 = (2 - 4/3)^2 / (13/18) = 8/13
    val df = Seq(("a", 1L, 1), ("a", 3L, 1), ("b", 2L, 1), ("b", 4L, 0))
      .toDF("grp", "duration", "event")
    val out = Survival.logRank(df, "grp", "duration", "event")
      .as[(String, Long, Long, Long, Double, Double)].collect()
    assert(out.length === 1)
    val (ga, na, nb, oa, ea, chi2) = out.head
    assert((ga, na, nb, oa) === (("a", 2L, 2L, 2L)))
    assert(ea === r4(4.0 / 3))
    assert(chi2 === r4(8.0 / 13))
  }

  test("logRank: identical cohorts score chi2 = 0") {
    val base = (1 to 50).map(i => ((i % 10).toLong + 1, i % 2))
    val df = (base.map { case (d, e) => ("a", d, e) } ++
      base.map { case (d, e) => ("b", d, e) }).toDF("grp", "duration", "event")
    val chi2 = Survival.logRank(df, "grp", "duration", "event")
      .select("chi2").as[Double].head()
    assert(chi2 === 0.0)
  }

  test("logRank refuses three groups, loudly") {
    val df = Seq(("a", 1L, 1), ("b", 2L, 1), ("c", 3L, 1))
      .toDF("grp", "duration", "event")
    val e = intercept[Exception] {
      Survival.logRank(df, "grp", "duration", "event").collect()
    }
    assert(e.getMessage.contains("two groups"))
  }

  test("churnDurations: grace window splits churned from censored") {
    // horizon = max day = 10
    val day = 10L
    val df = Seq(
      (1L, 0L), (1L, 3L),   // last=3 < 10-5  -> churned, duration 3
      (2L, 2L), (2L, 9L),   // last=9 >= 5    -> censored, duration 7
      (3L, 10L)             // last=horizon   -> censored, duration 0
    ).map { case (k, d) => (k, d * day) }.toDF("user_id", "ts")
    val out = Survival.churnDurations(df, "user_id", "ts", dayNanos = day,
        graceDays = 5)
      .orderBy("key").as[(Long, Long, Int)].collect()
    assert(out === Array((1L, 3L, 1), (2L, 7L, 0), (3L, 0L, 0)))
  }
}
