package graft.plans

import org.apache.spark.sql.DataFrame

/**
 * Stable fingerprint of a frame's COMPUTATION: md5 over the
 * canonicalized optimized plan, with alias names and expression ids
 * normalized away and literals/paths kept. Two frames with equal
 * fingerprints run the same work on the same inputs — the key that
 * lets a scheduler dedupe identical registered queries (the runner's
 * shared-pass CSE at the whole-plan level), a cache key results by
 * computation rather than by query text, and a deployment diff say
 * "this release changed what q17 computes" without reading code.
 *
 * Scope: fingerprints are comparable within a Spark version — plan
 * canonicalization is not a cross-version stability contract, so
 * persist the Spark version next to any stored fingerprint.
 */
object PlanFingerprint {

  /** Hex md5 of the canonicalized optimized plan. Driver-side plan
    * walk; nothing runs. */
  def of(df: DataFrame): String = {
    val canonical = df.queryExecution.optimizedPlan.canonicalized.toString
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(canonical.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString
  }

  /** True when the two frames compute the same thing (same canonical
    * plan), regardless of how they were phrased. */
  def sameComputation(a: DataFrame, b: DataFrame): Boolean = of(a) == of(b)
}
