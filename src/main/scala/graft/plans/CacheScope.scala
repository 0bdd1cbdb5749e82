package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.collection.mutable

/**
 * Scoped cache lifecycle for the persisting operators (winnowing
 * match/index, exact-substr spans/index, LSH band index, linkage
 * pairs, FK value sets): they persist multi-consumer frames
 * MEMORY_AND_DISK and, being lazy, cannot unpersist their own inputs —
 * so the library documents a caller-side `clearCache` contract, and
 * `SessionSoakSpec` proves that contract survivable even when ignored.
 * This is the offered MECHANISM for callers who want deterministic
 * cleanup without nuking the whole session cache
 * (`spark.catalog.clearCache()` also evicts frames OTHER pipelines
 * still want):
 *
 * {{{
 *   val pairs = CacheScope(spark) {
 *     Winnowing.matchPairs(docs, "doc_id", "text", 24, 8, 5).collect()
 *   } // every frame a graft operator persisted in the block is released
 * }}}
 *
 * Mechanics: the persisting operators route through [[persistTracked]],
 * which registers the frame with the INNERMOST active scope on the
 * current thread (no-op when none — operators behave identically
 * outside scopes). Scope exit (success OR failure) unpersists exactly
 * its own registrations via Dataset.unpersist — the full release, SQL
 * cache entry included. A raw RDD-level unpersist would NOT be enough:
 * `Dataset.persist` also registers the plan in the session's SQL
 * CacheManager, and a stale entry there makes every LATER equivalent
 * plan scan the dead in-memory relation — recomputing through the
 * columnar serializer on every action, worse than never caching
 * (SessionSoakSpec grew out of measuring exactly that).
 *
 * Scopes nest (each releases only its own registrations) and compose
 * with long-lived session caches (frames persisted outside any scope
 * are untouched). Registration is thread-local: a scope tracks the
 * operators COMPOSED on its thread — hand the block's work to another
 * thread and those persists fall back to the plain clearCache
 * contract.
 *
 * CONSUME INSIDE THE SCOPE: results must reach their terminal action
 * (collect/count/write) before the block returns. A DataFrame returned
 * lazily out of the scope stays CORRECT — unpersist never breaks
 * lineage, Spark silently recomputes — but it loses the shared-frame
 * reuse the operator's persist existed for, which re-opens the
 * double-execution cost class on every later action.
 */
object CacheScope {

  private val active = new ThreadLocal[List[mutable.ArrayBuffer[DataFrame]]] {
    override def initialValue(): List[mutable.ArrayBuffer[DataFrame]] = Nil
  }

  /** Persist `df` MEMORY_AND_DISK and register it with the innermost
    * active scope on this thread (no-op registration when none) — the
    * one call every persisting operator routes through. */
  private[graft] def persistTracked(df: DataFrame): DataFrame = {
    df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    active.get() match {
      case head :: _ => head += df
      case Nil => ()
    }
    df
  }

  /** Count of persisted RDDs currently HOLDING blocks that are not
    * checkpoint materializations — the residual an operator leaked past
    * [[persistTracked]]. localCheckpoint frames are excluded twice over
    * (eager via isCheckpointed, lazy via the creation site, since a lazy
    * mark's doCheckpoint may not have run when we look): they are
    * deliberate lineage-truncating materializations, reclaimed by the
    * ContextCleaner on GC, and unpersisting them would lose the only
    * copy of their data mid-plan. Shared by Bench and Verify's
    * per-entry isolation telemetry — one heuristic, one place. */
  def residualOperatorPersists(spark: SparkSession): Int =
    try {
      val withBlocks = spark.sparkContext.getRDDStorageInfo
        .filter(_.numCachedPartitions > 0).map(_.id).toSet
      spark.sparkContext.getPersistentRDDs.values
        .count(r => withBlocks.contains(r.id) && !r.isCheckpointed &&
          !r.toString.contains("at localCheckpoint at"))
    } catch { case _: Throwable => 0 }

  def apply[A](spark: SparkSession)(body: => A): A = {
    val own = mutable.ArrayBuffer.empty[DataFrame]
    active.set(own :: active.get())
    try body
    finally {
      active.set(active.get().tail)
      own.foreach { df =>
        // cleanup must never mask the body's result/exception
        try { df.unpersist(blocking = false); () }
        catch { case _: Throwable => () }
      }
    }
  }
}
