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

  /** Hex md5 of the canonicalized optimized plan PLUS the sorted leaf
    * input identities. The second part is not optional: Catalyst's
    * canonicalization normalizes a file relation down to its schema —
    * the scan PATH disappears — so two identical queries over different
    * directories would canonicalize identically and a path-blind
    * fingerprint would call them the same computation (caught by the
    * q_result_cache entry serving one scale factor's cached answer to
    * another). File leaves contribute their root paths; local
    * (in-memory) leaves contribute a content hash of their rows.
    * Driver-side plan walk; nothing runs. */
  def of(df: DataFrame): String = {
    val plan = df.queryExecution.optimizedPlan
    val leaves = plan.collectLeaves().flatMap {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.map(p => s"file:$p")
          case other => Seq(s"relation:$other")
        }
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation =>
        Seq(s"local:${l.output.map(_.dataType.sql).mkString(",")}:" +
          s"${l.data.length}:${l.data.map(_.hashCode().toLong).sum}")
      case other => Seq(s"leaf:${other.nodeName}:${other.output.map(_.dataType.sql).mkString(",")}")
    }.sorted
    val canonical =
      plan.canonicalized.toString + "\n" + leaves.mkString("|")
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(canonical.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString
  }

  /** True when the two frames compute the same thing (same canonical
    * plan), regardless of how they were phrased. */
  def sameComputation(a: DataFrame, b: DataFrame): Boolean = of(a) == of(b)
}
