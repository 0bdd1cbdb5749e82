package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Two-proportion A/B analysis from exact integer tallies: per variant
 * pair, conversion counts, rates, absolute lift, and the pooled
 * two-proportion z² statistic — the "did the treatment move the
 * metric" readout an experimentation pipeline serves.
 *
 * The statistic follows this repo's integer-exact discipline (the
 * spike detector's): z² = (pa − pb)² / (p(1−p)(1/na + 1/nb)) is
 * algebraically rearranged so every product is an exact BIGINT/DECIMAL
 * of raw counts — z²·D·N = (ca·nb − cb·na)²·n... — and only the FINAL
 * division runs in floating point, once, on one row per pair. No
 * per-row floats, no accumulation order, hash-stable across engines:
 *   num = (ca·nb − cb·na)² · (na + nb)
 *   den = c·(n − c)·na·nb   with n = na+nb, c = ca+cb
 *   z²  = num / den   (NULL when den = 0: a 0% or 100% pooled rate
 *         carries no variance — the test is undefined, not infinite).
 * One groupBy on the variant key, then a driver-light pair join of the
 * two requested variants' single summary rows.
 */
object AbTest {

  /** One row comparing `variantA` vs `variantB`: (variant_a, variant_b,
    * n_a, conv_a, n_b, conv_b, rate_a, rate_b, lift, z2). */
  def twoProportion(df: DataFrame, variantCol: String, convCol: String,
                    variantA: String, variantB: String): DataFrame = {
    require(variantA != variantB, "compare two DIFFERENT variants")
    val tallies = df
      .filter(col(variantCol).isin(variantA, variantB))
      .groupBy(col(variantCol).cast("string").as("variant"))
      .agg(count(lit(1)).as("n"),
        sum(when(col(convCol), 1L).otherwise(0L)).as("conv"))
    val a = tallies.filter(col("variant") === variantA)
      .select(col("n").as("n_a"), col("conv").as("conv_a"))
    val b = tallies.filter(col("variant") === variantB)
      .select(col("n").as("n_b"), col("conv").as("conv_b"))
    // both sides are ONE summary row; the cross join is 1×1
    val d = (x: org.apache.spark.sql.Column) => x.cast("decimal(38,0)")
    a.crossJoin(b)
      .withColumn("__diff",
        d(col("conv_a")) * d(col("n_b")) - d(col("conv_b")) * d(col("n_a")))
      .withColumn("__num",
        col("__diff") * col("__diff") * d(col("n_a") + col("n_b")))
      .withColumn("__den",
        d(col("conv_a") + col("conv_b")) *
          d(col("n_a") + col("n_b") - col("conv_a") - col("conv_b")) *
          d(col("n_a")) * d(col("n_b")))
      .select(lit(variantA).as("variant_a"), lit(variantB).as("variant_b"),
        col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
        (col("conv_a").cast("double") / col("n_a")).as("rate_a"),
        (col("conv_b").cast("double") / col("n_b")).as("rate_b"),
        (col("conv_a").cast("double") / col("n_a") -
          col("conv_b").cast("double") / col("n_b")).as("lift"),
        when(col("__den") === 0, lit(null).cast("double"))
          .otherwise(col("__num").cast("double") / col("__den").cast("double"))
          .as("z2"))
  }
}
