package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Benford (leading-digit) audit: the distribution of first significant
 * digits of a naturally-occurring positive measure follows
 * P(d) = log10(1 + 1/d); fabricated, truncated, or unit-mixed data
 * doesn't — which makes the digit histogram a cheap fraud / data-
 * quality tripwire over amounts, populations, and counts.
 *
 * Determinism discipline: the leading digit comes from the DECIMAL
 * STRING of an integer measure (`substr(cast(v as string), 1, 1)`),
 * never from `log10`-and-floor — at exact powers of ten the libm
 * log10 lands a hair under the integer and floor misassigns the digit
 * (and libm ulps differ across engines). Integer-to-string is
 * bit-identical everywhere. Per-digit ratio is one exact-integer
 * division. The chi² distance ([[chiSquare]]) sums 9 driver-side
 * doubles in fixed digit order — a scalar for gates and specs, kept
 * out of hash-compared frames.
 */
object Benford {

  /** Per-digit rows over a POSITIVE INTEGRAL measure: (digit, obs, n,
    * ratio). Non-positive / null measures are excluded (they have no
    * leading significant digit); digits with zero observations still
    * appear — an absent digit is the loudest Benford signal there is. */
  def leadingDigitAudit(df: DataFrame, valueCol: String): DataFrame = {
    require(Set("long", "integer", "short", "byte")
        .contains(df.schema(valueCol).dataType.typeName),
      s"Benford needs an INTEGRAL measure (got " +
        s"${df.schema(valueCol).dataType.typeName}) — rescale floats " +
        "with round(x * unit).cast('long') so digit extraction is exact")
    val spark = df.sparkSession
    import spark.implicits._
    val obs = df.filter(col(valueCol) > 0)
      .select(substring(col(valueCol).cast("string"), 1, 1)
        .cast("long").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("obs"))
    val digits = (1L to 9L).toDF("digit")
    digits.join(obs, Seq("digit"), "left")
      .select(col("digit"), coalesce(col("obs"), lit(0L)).as("obs"))
      .withColumn("n", sum(col("obs")).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .withColumn("ratio", col("obs").cast("double") / col("n"))
  }

  /** Benford's expected probability for digit d. */
  def expected(d: Int): Double = {
    require(d >= 1 && d <= 9, s"leading digit must be 1..9, got $d")
    math.log10(1.0 + 1.0 / d)
  }

  /** χ² distance of the audit from Benford, summed driver-side in
    * fixed digit order (1..9) from the exact per-digit counts — the
    * scalar a DQ gate thresholds on. */
  def chiSquare(audit: DataFrame): Double = {
    val rows = audit.select(col("digit"), col("obs"), col("n"))
      .collect() // bounded: exactly 9 rows
      .map(r => r.getLong(0).toInt -> (r.getLong(1), r.getLong(2)))
      .toMap
    (1 to 9).map { d =>
      val (obs, n) = rows(d)
      val e = n * expected(d)
      if (e == 0.0) 0.0 else (obs - e) * (obs - e) / e
    }.sum
  }
}
