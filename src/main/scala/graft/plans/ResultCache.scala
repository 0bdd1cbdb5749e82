package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

/**
 * Computation-keyed result cache: materialize a frame under its
 * [[PlanFingerprint]] and serve every later identical computation from
 * the parquet copy — the cross-job sibling of the runner's shared-pass
 * CSE (that one dedupes WITHIN a pass; this dedupes ACROSS jobs and
 * days). A nightly report re-submitted unchanged costs one read.
 *
 * SCOPE — read this before using: the fingerprint keys the PLAN, and a
 * plan names its input paths, not their contents. Caching is therefore
 * sound ONLY over immutable inputs — exactly what [[graft.operators
 * .PublishGate]] versions provide (a reader pins `dir/v7`, and `v7`
 * never changes). Pointing a cached computation at a mutable directory
 * trades correctness for speed; don't. Entries are eternal by design
 * (immutable input + same plan = same answer, forever) — retention is
 * a disk-space policy, not an invalidation problem, so `evict` exists
 * and TTL logic does not.
 */
object ResultCache {

  /** Serve `df`'s result from the cache, computing and filling it on
    * miss. Returns (frame, hit?). A partially-written slot (no
    * _SUCCESS marker — a crashed fill) is recomputed and overwritten,
    * never served. */
  def getOrCompute(df: DataFrame, cacheRoot: String): (DataFrame, Boolean) = {
    val spark = df.sparkSession
    val slot = new Path(cacheRoot, PlanFingerprint.of(df))
    val fs = slot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new Path(slot, "_SUCCESS")))
      (spark.read.parquet(slot.toString), true)
    else {
      df.write.mode("overwrite").parquet(slot.toString)
      (spark.read.parquet(slot.toString), false)
    }
  }

  /** Drop one computation's slot (disk-space retention, not
    * invalidation — see the scope note). Returns whether it existed. */
  def evict(df: DataFrame, cacheRoot: String): Boolean = {
    val spark = df.sparkSession
    val slot = new Path(cacheRoot, PlanFingerprint.of(df))
    val fs = slot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(slot, true)
  }
}
