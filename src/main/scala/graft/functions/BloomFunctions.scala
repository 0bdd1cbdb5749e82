package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graft.ColumnBridge.{column => nativeCol, expression => exprOf}
import org.apache.spark.sql.types.BinaryType

/**
 * Column wrappers over Spark's native Bloom-filter expressions — the same
 * codegen'd machinery Catalyst's `InjectRuntimeFilter` uses for runtime
 * row-level filtering, exposed here for explicit set-membership
 * prefiltering (benchmark decontamination, anti-join pruning).
 *
 * Both sides hash with `xxhash64`, so the caller passes the VALUE column
 * and hashing stays an internal convention that build and probe cannot
 * drift apart on. The aggregate is a proper partial/final Catalyst
 * aggregate: each task ORs its local filter, the final merge happens at
 * the (1-row) exchange — O(numBits) state per task, never O(rows).
 *
 * Sizing: `numBits = -n·ln(p) / ln(2)²` for target false-positive rate
 * `p` at `n` items; with k optimally derived the classic 10 bits/item
 * gives p ≈ 1%. A Bloom prefilter is only ever used here in front of an
 * EXACT verify join, so p affects candidate volume (cost), never the
 * answer.
 */
object BloomFunctions {

  /** `bloom_filter_agg(xxhash64(value), n, bits)` — aggregates to one
    * BINARY cell holding the serialized filter over all `value` rows. */
  def bloomFilterAgg(value: Column, estimatedItems: Long, numBits: Long): Column =
    nativeCol(new BloomFilterAggregate(
      exprOf(org.apache.spark.sql.functions.xxhash64(value)),
      Literal(estimatedItems), Literal(numBits)).toAggregateExpression())

  /** `might_contain(bloom, xxhash64(value))` against a driver-held
    * serialized filter (a Literal, so every executor deserializes once
    * and the probe is codegen'd). False positives possible, false
    * negatives not. */
  def mightContain(bloom: Array[Byte], value: Column): Column =
    nativeCol(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      exprOf(org.apache.spark.sql.functions.xxhash64(value))))
}
