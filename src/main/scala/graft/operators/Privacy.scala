package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
}
