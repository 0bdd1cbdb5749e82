package graft.plans

import org.apache.spark.sql.SparkSession

/**
 * Scoped cache lifecycle for the persisting operators (winnowing
 * match/index, exact-substr spans/index, linkage pairs, FK value sets):
 * they persist multi-consumer frames MEMORY_AND_DISK and, being lazy,
 * cannot unpersist their own inputs — so the library documents a
 * caller-side `clearCache` contract, and `SessionSoakSpec` proves that
 * contract survivable even when ignored. This utility is the offered
 * MECHANISM for callers who want deterministic cleanup without nuking
 * the whole session cache (`spark.catalog.clearCache()` also evicts
 * frames OTHER pipelines still want):
 *
 * {{{
 *   val pairs = CacheScope(spark) {
 *     Winnowing.matchPairs(docs, "doc_id", "text", 24, 8, 5).collect()
 *   } // every RDD persisted inside the block is unpersisted here
 * }}}
 *
 * Semantics: a snapshot of `sparkContext.getPersistentRDDs` is taken
 * on entry; on exit (success OR failure) every persisted RDD that was
 * NOT in the snapshot is unpersisted (non-blocking). Frames persisted
 * before the scope are untouched, so scopes compose with long-lived
 * session caches and with each other (nesting: the inner scope
 * releases only its own additions).
 *
 * CONSUME INSIDE THE SCOPE: results must reach their terminal action
 * (collect/count/write) before the block returns. A DataFrame returned
 * lazily out of the scope stays CORRECT — unpersist never breaks
 * lineage, Spark silently recomputes — but it loses the shared-frame
 * reuse the operator's persist existed for, which re-opens the
 * double-execution cost class on every later action.
 */
object CacheScope {

  def apply[A](spark: SparkSession)(body: => A): A = {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    try body
    finally {
      spark.sparkContext.getPersistentRDDs
        .foreach { case (id, rdd) =>
          if (!before.contains(id)) {
            try { rdd.unpersist(blocking = false); () }
            catch { case _: Throwable => () } // cleanup must never mask body's result
          }
        }
    }
  }
}
