package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.FeatureFunctions

/**
 * k-anonymity governance for a release candidate: rows whose
 * quasi-identifier combination is shared by fewer than k records are
 * re-identifiable by linkage, and a training-data export has to either
 * suppress them or generalize the quasi columns until every equivalence
 * class reaches k. This operator family is the AUDIT (measure the
 * classes) and the baseline ENFORCEMENT (suppress small classes).
 *
 * Scale shape: the audit is one map-side-combined groupBy on the quasi
 * tuple (reduce side bounded by the quasi domain, not the corpus);
 * suppression is a window count over the same key — one shuffle, no
 * join, no second scan. NULL quasi values form their own class (NULL is
 * linkable too — a groupBy treats it as one value, matching how an
 * attacker would).
 */
object Privacy {

  /** Per-equivalence-class audit: the quasi columns + (n, at_risk). */
  def kAnonymityClasses(df: DataFrame, quasi: Seq[String], k: Int): DataFrame = {
    require(quasi.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 2, s"k must be >= 2 for a meaningful audit, got $k")
    df.groupBy(quasi.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("at_risk", col("n") < k)
  }

  /** One summary row: (n_rows, n_classes, n_small_classes, rows_at_risk,
    * min_class_size, rows_after_suppress). `min_class_size` IS the
    * dataset's actual k — the audit's headline number. */
  def kAnonymitySummary(df: DataFrame, quasi: Seq[String], k: Int): DataFrame =
    kAnonymityClasses(df, quasi, k).agg(
      sum(col("n")).as("n_rows"),
      count(lit(1)).as("n_classes"),
      sum(when(col("at_risk"), 1L).otherwise(0L)).as("n_small_classes"),
      sum(when(col("at_risk"), col("n")).otherwise(0L)).as("rows_at_risk"),
      min(col("n")).as("min_class_size"),
      sum(when(col("at_risk"), 0L).otherwise(col("n")))
        .as("rows_after_suppress"))

  /** Baseline enforcement: drop every row whose class is below k. One
    * window count on the quasi tuple — no join, no second scan. The
    * generalization ladder (coarsen quasi columns until min class ≥ k)
    * composes on top: coarsen, re-audit, suppress the remainder. */
  def suppress(df: DataFrame, quasi: Seq[String], k: Int): DataFrame = {
    require(quasi.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 2, s"k must be >= 2, got $k")
    val w = Window.partitionBy(quasi.map(col): _*)
    df.withColumn("__n", count(lit(1)).over(w))
      .filter(col("__n") >= k)
      .drop("__n")
  }

  /** Distinct-l-diversity audit (Machanavajjhala et al., ICDE 2006):
    * k-anonymity alone doesn't stop the homogeneity attack — a class
    * of k rows that all share ONE sensitive value still leaks the
    * attribute. Per equivalence class over the quasi columns, count
    * rows and DISTINCT sensitive values; a class below l distinct is
    * at risk. Same scale shape as the k audit: one map-side-combined
    * groupBy, reduce side bounded by the quasi domain (count_distinct
    * partial-aggregates per class). NULL sensitive values are ignored
    * by the distinct count (both Spark and SQL engines agree). */
  def lDiversityClasses(df: DataFrame, quasi: Seq[String], sensitive: String,
                        l: Int): DataFrame = {
    require(quasi.nonEmpty, "need at least one quasi-identifier column")
    require(!quasi.contains(sensitive), "sensitive column cannot be a quasi-identifier")
    require(l >= 2, s"l must be >= 2 for a meaningful audit, got $l")
    df.groupBy(quasi.map(col): _*)
      .agg(count(lit(1)).as("n"),
        count_distinct(col(sensitive)).as("l_distinct"))
      .withColumn("at_risk", col("l_distinct") < l)
  }

  /** One summary row for the l-diversity audit: `min_l` IS the
    * dataset's actual distinct-l — the headline number. */
  def lDiversitySummary(df: DataFrame, quasi: Seq[String], sensitive: String,
                        l: Int): DataFrame =
    lDiversityClasses(df, quasi, sensitive, l).agg(
      count(lit(1)).as("n_classes"),
      sum(when(col("at_risk"), 1L).otherwise(0L)).as("n_low_diversity"),
      sum(when(col("at_risk"), col("n")).otherwise(0L)).as("rows_at_risk"),
      min(col("l_distinct")).as("min_l"))

  /**
   * Inverse-CDF thresholds for the truncated geometric mechanism
   * (Ghosh–Roughgarden–Sundararajan, STOC 2009): noise m ∈ [-b, b] with
   * P(m) ∝ p^|m| for p = pNum/pDen. Weights are kept EXACT as integers
   * (w_m = pNum^|m| · pDen^(b−|m|)), so a uniform draw u ∈ [0, total)
   * maps to its noise value by a pure-integer cumulative walk — the
   * entire mechanism is replayable bit-for-bit by any SQL engine.
   * Returns ((m, cumulativeUpperBound)*, total).
   */
  def geometricThresholds(b: Int, pNum: Long, pDen: Long): (Seq[(Int, Long)], Long) = {
    require(b >= 1 && b <= 32, s"truncation bound b must be in [1, 32], got $b")
    require(pNum >= 1 && pDen > pNum,
      s"need 0 < p = pNum/pDen < 1, got $pNum/$pDen")
    val weights = (-b to b).map { m =>
      val w = BigInt(pNum).pow(math.abs(m)) * BigInt(pDen).pow(b - math.abs(m))
      require(w.isValidLong, s"weight overflow at m=$m for b=$b, p=$pNum/$pDen")
      w.toLong
    }
    require(weights.map(BigInt(_)).sum.isValidLong,
      s"threshold total overflows Long for b=$b, p=$pNum/$pDen")
    var cum = 0L
    ((-b to b).zip(weights).map { case (m, w) => cum += w; (m, cum) }, cum)
  }

  /**
   * ε-differentially-private group counts via the truncated geometric
   * mechanism: count per key tuple, add two-sided-geometric noise with
   * P(m) ∝ p^|m| (ε = ln(pDen/pNum) for sensitivity-1 counts; the
   * truncation at ±b adds a δ of the tail mass ≈ 2·p^b/(1+p)), clamp at
   * zero, and release ONLY the noisy count.
   *
   * The noise draw is pseudo-random: u = poly_hash16(seed|key) mod
   * total — [[graft.functions.FeatureFunctions]]'s oracle-replayable
   * polynomial hash — so every run (and the DuckDB oracle) reproduces
   * the same release. A production release would swap the public seed
   * for a secret one drawn per release; the mechanism, thresholds, and
   * post-processing are unchanged. Seed goes FIRST in the hash input so
   * short keys stay inside poly_hash16's 16-char window.
   *
   * Scale shape: one map-side-combined groupBy (reduce side bounded by
   * the key domain); the noise map is a narrow codegen'd CASE chain of
   * 2b+1 integer compares. No joins, no second scan, no floats.
   */
  def dpCounts(df: DataFrame, keys: Seq[String], seed: String,
               b: Int = 8, pNum: Long = 1L, pDen: Long = 2L): DataFrame = {
    require(keys.nonEmpty, "need at least one key column")
    val (thresholds, total) = geometricThresholds(b, pNum, pDen)
    val counts = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__n"))
    val keyStr = concat_ws("|", lit(seed) +: keys.map(c => col(c).cast("string")): _*)
    val u = pmod(FeatureFunctions.polyHash16(keyStr), lit(total))
    val noise: Column = thresholds.init.foldRight(lit(thresholds.last._1.toLong)) {
      case ((m, upper), rest) => when(u < upper, lit(m.toLong)).otherwise(rest)
    }
    counts.select(keys.map(col) :+
      greatest(col("__n") + noise, lit(0L)).as("noisy_n"): _*)
  }
}
