package graft.operators

import graft.functions.BloomFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Bloom-pruned shuffle join — the hand-rolled runtime filter for the
 * case AQE's own bloom injection can't see: the build side is selective
 * (a filtered dimension) but still too large to broadcast-join, and the
 * probe side is the 100 TB fact table. Shipping a Bloom filter of the
 * build keys to the fact scan drops non-matching fact rows BEFORE the
 * join exchange, so the shuffle moves only (approximately) the rows
 * that will survive anyway.
 *
 * The filter is collected to the driver as one binary cell (bounded by
 * `numBits/8`, e.g. 1.25 MB at 10 bits × 1M keys) and re-enters the
 * plan as a Literal, so executors deserialize it once and the probe is
 * a codegen'd `might_contain(xxhash64(key))` riding the scan — column-
 * pruned, pushdown-friendly, no extra pass over the fact table. False
 * positives only cost shuffled bytes; the exact join behind the
 * prefilter keeps the answer bit-exact.
 */
object BloomJoin {

  /** Inner equi-join of `fact` to `dim` on `factKey = dimKey`, with the
    * fact side Bloom-prefiltered by the dim keys before the exchange. */
  def bloomPrunedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
                      dimKey: String, estimatedItems: Long,
                      numBits: Long): DataFrame = {
    val bloom = dim.agg(
      BloomFunctions.bloomFilterAgg(col(dimKey), estimatedItems, numBits))
      .head.getAs[Array[Byte]](0)
    fact.filter(BloomFunctions.mightContain(bloom, col(factKey)))
      .join(dim, fact(factKey) === dim(dimKey))
  }
}
