package graft.plans

import org.apache.spark.sql.DataFrame

/**
 * Pre-execution cost gate: refuse to LAUNCH a job whose optimizer-
 * estimated output size exceeds a budget, instead of discovering the
 * accidental cartesian (or the fat join the optimizer couldn't prune)
 * three hours and a few thousand executor-hours in. The estimate is
 * Catalyst's own (`optimizedPlan.stats.sizeInBytes` — file sizes
 * propagated through filters and joins), so the gate costs one plan
 * walk on the driver and runs nothing.
 *
 * This is an ADMISSION check, not an accounting one: estimates are
 * order-of-magnitude (a missed join key inflates multiplicatively —
 * which is exactly the failure it exists to catch). Pair with
 * [[graft.operators.JoinAdvisor]] when the decision needs measured
 * key statistics rather than the planner's propagation.
 */
object CostGate {

  /** Catalyst's size estimate for the frame's optimized plan, bytes. */
  def estimatedBytes(df: DataFrame): BigInt =
    df.queryExecution.optimizedPlan.stats.sizeInBytes

  /** Throw (before anything runs) when the estimate exceeds
    * `maxBytes`; return the frame untouched otherwise, so the gate
    * drops into any pipeline as a pass-through stage. */
  def requireUnder(df: DataFrame, maxBytes: BigInt): DataFrame = {
    require(maxBytes > 0, "maxBytes must be positive")
    val est = estimatedBytes(df)
    if (est > maxBytes)
      throw new IllegalStateException(
        s"cost gate: plan estimates $est bytes > budget $maxBytes — " +
          "likely an unkeyed/exploding join; inspect .explain and the " +
          "JoinAdvisor before forcing this through with a larger budget")
    df
  }
}
