package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Sketch-guided EXACT heavy hitters — the two-pass pattern for "give me
 * the true counts of everything above x% of the stream" on data too
 * wide for a full groupBy to be cheap:
 *
 *  pass 1: an approximate frequency sketch (here Spark's own
 *          `freqItems`, a Misra–Gries/space-saving variant with the
 *          same guarantee as the reference's FrequentItems: every item
 *          with true count ≥ N/support IS in the candidate set —
 *          false POSITIVES possible, false negatives not),
 *  pass 2: one exact count restricted to the candidates (a broadcast
 *          isin/semi filter — the fact table never shuffles on the
 *          full key domain, only candidate rows reach the aggregate),
 *          then the exact threshold cut drops pass-1's false positives.
 *
 * The result is bit-exact (it IS a filtered exact groupBy) while the
 * heavy shuffle is bounded by the candidate count, not the key
 * cardinality. On 100 TB with a billion-key domain, pass 1 is a narrow
 * scan with O(1/support) state per task and pass 2 shuffles only rows
 * whose key is in the (tiny, broadcast) candidate list.
 */
object HeavyHitters {

  /**
   * Exact (key, n) for every key with true count > thresholdNum/
   * thresholdDen of all rows (a relative threshold — scale-factor
   * invariant, cross-multiplied so no float compare). `support` for the
   * candidate sketch must be ≤ thresholdNum/thresholdDen or the
   * no-false-negative guarantee does not cover the cut.
   */
  def exactHeavyHitters(df: DataFrame, keyCol: String, support: Double,
                        thresholdNum: Long, thresholdDen: Long): DataFrame = {
    require(support > 0 && support <= thresholdNum.toDouble / thresholdDen,
      s"sketch support $support must be <= threshold " +
        s"$thresholdNum/$thresholdDen for the candidate set to be complete")
    val candidates = df.stat.freqItems(Array(keyCol), support)
      .head.getSeq[Any](0)
    val total = df.count()
    df.filter(col(keyCol).isin(candidates: _*))
      .groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
      // exact relative cut, cross-multiplied: n/total > num/den
      .filter(col("n") * thresholdDen > lit(total) * thresholdNum)
  }
}
