package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Noisy-label aggregation for human/model annotation pipelines (RLHF
 * preference labels, quality ratings, eval judgments): per-item majority
 * vote with deterministic tie-breaks, and a corpus-level chance-corrected
 * agreement coefficient — the "can we trust this label set at all" gate
 * that runs before any label-dependent training step.
 *
 * Scale shape: one vote-dedup + one (item, label) count shuffle; the
 * per-item argmax is a WindowGroupLimit rank (pre-shuffle heap), and the
 * agreement statistic folds to ONE row of integer tallies before any
 * division — no per-item floating-point averaging, so the result is
 * bit-identical across engines and partitionings.
 */
object Annotations {

  /** One vote per distinct (item, annotator, label) triple — an
    * annotator re-submitting the same label is idempotent; submitting
    * different labels contributes each once (generalized raters). */
  private def votes(df: DataFrame, itemCol: String, annotatorCol: String,
                    labelCol: String): DataFrame =
    df.select(col(itemCol).as("item"), col(annotatorCol).as("annotator"),
      col(labelCol).as("label")).distinct()

  /**
   * Majority-vote winner per item: (item, label, n_votes, n_total,
   * agreement) where `label` is the modal label (ties broken
   * lexicographically — deterministic), `n_votes` its count, `n_total`
   * all votes on the item, and `agreement = n_votes / n_total` (one
   * integer division per row — engine-exact).
   */
  def majorityVote(df: DataFrame, itemCol: String, annotatorCol: String,
                   labelCol: String): DataFrame = {
    val counts = votes(df, itemCol, annotatorCol, labelCol)
      .groupBy("item", "label").agg(count(lit(1)).as("n_votes"))
    val byItem = Window.partitionBy("item")
    val ranked = counts
      .withColumn("n_total", sum(col("n_votes")).over(byItem))
      .withColumn("__rn", row_number().over(
        byItem.orderBy(col("n_votes").desc, col("label").asc)))
    ranked.filter(col("__rn") === 1)
      .select(col("item"), col("label"), col("n_votes"), col("n_total"),
        (col("n_votes").cast("double") / col("n_total")).as("agreement"))
  }

  /**
   * Corpus-level chance-corrected agreement (Fleiss-family, pairwise
   * form): observed agreement `po` = fraction of AGREEING annotator
   * pairs across all items, expected agreement `pe` = Σ_l (N_l / N)²,
   * kappa = (po − pe) / (1 − pe). The pairwise-count form keeps every
   * tally an exact BIGINT — `agree_pairs = Σ_item Σ_label C(n_il, 2)`,
   * `total_pairs = Σ_item C(n_i, 2)` — so the only floating-point ops
   * are three final divisions on one row: deterministic regardless of
   * partitioning, and restated verbatim by the SQL oracle. Items with a
   * single vote contribute no pairs (they carry no agreement signal).
   * Output: one row (n_items, n_votes, agree_pairs, total_pairs, po,
   * pe, kappa); kappa is NULL when pe = 1 (a single label corpus-wide —
   * chance agreement is total and the coefficient is undefined).
   */
  def pairwiseKappa(df: DataFrame, itemCol: String, annotatorCol: String,
                    labelCol: String): DataFrame = {
    val v = votes(df, itemCol, annotatorCol, labelCol)
    val il = v.groupBy("item", "label").agg(count(lit(1)).as("nil"))
    val perItem = il.groupBy("item").agg(
      sum(col("nil")).as("ni"),
      sum(col("nil") * (col("nil") - 1)).as("agree2"))
    // `div`, not Column./ — double division would round pair counts
    // past 2^53; the sums are always even so integer halving is exact
    val tallies = perItem.agg(
        count(lit(1)).as("n_items"),
        sum(col("ni")).as("n_votes"),
        sum(col("agree2")).as("__ag2"),
        sum(col("ni") * (col("ni") - 1)).as("__tp2"))
      .select(col("n_items"), col("n_votes"),
        expr("__ag2 div 2").as("agree_pairs"),
        expr("__tp2 div 2").as("total_pairs"))
    val marg = il.groupBy("label").agg(sum(col("nil")).as("nl"))
      .agg(sum(col("nl") * col("nl")).as("sq_sum"))
    val joined = tallies.crossJoin(marg)
    val po = col("agree_pairs").cast("double") / col("total_pairs")
    val pe = col("sq_sum").cast("double") /
      (col("n_votes").cast("double") * col("n_votes").cast("double"))
    joined.select(col("n_items"), col("n_votes"),
        col("agree_pairs").cast("long").as("agree_pairs"),
        col("total_pairs").cast("long").as("total_pairs"),
        po.as("po"), pe.as("pe"),
        when(pe === 1.0, lit(null).cast("double"))
          .otherwise((po - pe) / (lit(1.0) - pe)).as("kappa"))
  }
}
