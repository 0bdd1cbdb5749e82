package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Two-proportion A/B analysis from exact integer tallies: per variant
 * pair, conversion counts, rates, absolute lift, and the pooled
 * two-proportion z² statistic — the "did the treatment move the
 * metric" readout an experimentation pipeline serves.
 *
 * Determinism discipline: every INPUT is an exact BIGINT tally (one
 * groupBy on the variant key — counts, never per-row floats), and the
 * statistic is computed from those four integers in ONE fixed sequence
 * of IEEE double operations that the SQL oracle restates verbatim —
 * identical inputs + identical op order = identical bits on any
 * engine, partitioning, or row order. A fully cross-multiplied integer
 * form was rejected deliberately: diff²·n products overflow
 * DECIMAL(38,0) near 10¹⁰-row variants, exactly the scale this exists
 * for; the double form is overflow-free to 2^63 tallies.
 *   pa = ca/na,  pb = cb/nb,  p = (ca+cb)/(na+nb)
 *   z² = (pa − pb)² / (p·(1−p)·(1/na + 1/nb))
 * NULL when the pooled rate is 0 or 1 (no variance — the test is
 * undefined, not infinite). The pair join is of two single summary
 * rows.
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
    val ra = col("conv_a").cast("double") / col("n_a")
    val rb = col("conv_b").cast("double") / col("n_b")
    val pooled = (col("conv_a") + col("conv_b")).cast("double") /
      (col("n_a") + col("n_b")).cast("double")
    a.crossJoin(b)
      .withColumn("__p", pooled)
      .select(lit(variantA).as("variant_a"), lit(variantB).as("variant_b"),
        col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
        ra.as("rate_a"), rb.as("rate_b"), (ra - rb).as("lift"),
        when(col("__p") === 0.0 || col("__p") === 1.0,
          lit(null).cast("double"))
          .otherwise((ra - rb) * (ra - rb) /
            (col("__p") * (lit(1.0) - col("__p")) *
              (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))))
          .as("z2"))
  }

  /**
   * Segmented readout: the same statistic PER SEGMENT (per language,
   * per platform, per cohort) — where experiment effects actually
   * hide; a flat winner that loses a key segment is the classic
   * Simpson's-trap, and this is the table that exposes it. One
   * (segment, variant) groupBy, then the two variants meet through a
   * segment equi-join of summary rows (one row per segment per side —
   * never the event data). Segments missing either variant are absent
   * (no comparison exists), and the z² algebra is [[twoProportion]]'s
   * verbatim.
   */
  def twoProportionBySegment(df: DataFrame, segCol: String,
                             variantCol: String, convCol: String,
                             variantA: String, variantB: String): DataFrame = {
    require(variantA != variantB, "compare two DIFFERENT variants")
    val tallies = df
      .filter(col(variantCol).isin(variantA, variantB))
      .groupBy(col(segCol).cast("string").as("seg"),
        col(variantCol).cast("string").as("variant"))
      .agg(count(lit(1)).as("n"),
        sum(when(col(convCol), 1L).otherwise(0L)).as("conv"))
    val a = tallies.filter(col("variant") === variantA)
      .select(col("seg"), col("n").as("n_a"), col("conv").as("conv_a"))
    val b = tallies.filter(col("variant") === variantB)
      .select(col("seg"), col("n").as("n_b"), col("conv").as("conv_b"))
    val ra = col("conv_a").cast("double") / col("n_a")
    val rb = col("conv_b").cast("double") / col("n_b")
    val pooled = (col("conv_a") + col("conv_b")).cast("double") /
      (col("n_a") + col("n_b")).cast("double")
    a.join(b, Seq("seg"))
      .withColumn("__p", pooled)
      .select(col("seg"), col("n_a"), col("conv_a"), col("n_b"),
        col("conv_b"), ra.as("rate_a"), rb.as("rate_b"),
        (ra - rb).as("lift"),
        when(col("__p") === 0.0 || col("__p") === 1.0,
          lit(null).cast("double"))
          .otherwise((ra - rb) * (ra - rb) /
            (col("__p") * (lit(1.0) - col("__p")) *
              (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))))
          .as("z2"))
  }
}
