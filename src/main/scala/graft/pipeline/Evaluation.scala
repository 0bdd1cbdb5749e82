package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Offline evaluation metrics a data/retrieval pipeline needs next to its
 * ANN and classifier stages: ranked-retrieval quality (precision/recall@k,
 * MRR, AP, NDCG) and classification quality (per-class confusion counts,
 * precision/recall/F1).
 *
 * Both are pure declarative aggregations — the scale shape is one
 * (query)- or (gold, pred)-keyed shuffle regardless of corpus size:
 * ranked metrics join system output (≤ k rows per query) to the truth
 * set on (query, item) and aggregate per query; classifier metrics
 * collapse the corpus to its confusion matrix FIRST (map-side-combined
 * groupBy — the matrix is |classes|² rows no matter how many billions of
 * predictions) and derive every per-class ratio from that tiny frame.
 *
 * Float discipline: every emitted ratio is rounded to 4 decimals so the
 * DuckDB oracle's independently-ordered float sums hash-match (same
 * convention as the log-likelihood entries).
 */
object Evaluation {

  /**
   * Per-query ranked-retrieval metrics at cutoff `k`.
   *
   * `results`: system output — (queryCol, itemCol, rankCol), rank 1-based
   * within query (rows with rank > k are ignored). `truth`: the relevant
   * (queryCol, itemCol) pairs. Queries with an EMPTY truth set are
   * dropped (their recall/AP/NDCG are undefined); a query whose truth is
   * non-empty but whose top-k holds no relevant item scores 0 across the
   * board — it does not vanish (the epsilonRecallPerQuery lesson).
   *
   * Emitted per query: n_rel, hits (relevant in top-k), precision_k,
   * recall_k, rr (1/rank of first relevant, 0 if none), ap (average
   * precision normalized by min(n_rel, k)), ndcg (binary relevance,
   * log2 discount).
   */
  def rankedEval(results: DataFrame, truth: DataFrame, queryCol: String,
                 itemCol: String, rankCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val q = col(queryCol)
    val nRel = truth.groupBy(queryCol)
      .agg(count(lit(1)).as("n_rel"))
    val marked = results.filter(col(rankCol) <= k && col(rankCol) >= 1)
      .join(truth.withColumn("__rel", lit(1)),
        Seq(queryCol, itemCol), "left")
      .withColumn("__rel", coalesce(col("__rel"), lit(0)))
    val w = Window.partitionBy(q).orderBy(col(rankCol))
    val cum = marked.withColumn("__cum", sum(col("__rel")).over(w))
    // nRel drives the query universe: a truth-bearing query missing from
    // `results` still emits a row of zeros (LEFT join from nRel).
    val perQuery = cum.groupBy(queryCol).agg(
      sum(col("__rel")).as("hits"),
      max(when(col("__rel") === 1, lit(1.0) / col(rankCol))).as("__rr"),
      sum(when(col("__rel") === 1, col("__cum").cast("double") / col(rankCol)))
        .as("__apnum"),
      sum(when(col("__rel") === 1, lit(1.0) / log2(col(rankCol) + 1)))
        .as("__dcg"))
    val idcg = expr(s"aggregate(sequence(1L, least(n_rel, ${k}L)), " +
      "CAST(0.0 AS DOUBLE), (acc, i) -> acc + 1.0 / log2(i + 1))")
    nRel.join(perQuery, Seq(queryCol), "left")
      .select(q, col("n_rel"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        round(coalesce(col("hits"), lit(0L)) / lit(k.toDouble), 4)
          .as("precision_k"),
        round(coalesce(col("hits"), lit(0L)) / col("n_rel"), 4).as("recall_k"),
        round(coalesce(col("__rr"), lit(0.0)), 4).as("rr"),
        round(coalesce(col("__apnum"), lit(0.0)) /
          least(col("n_rel"), lit(k.toLong)), 4).as("ap"),
        round(coalesce(col("__dcg"), lit(0.0)) / idcg, 4).as("ndcg"))
  }

  /**
   * Reliability diagram + expected calibration error (ECE) for a
   * probabilistic classifier, on INTEGER confidences: `confCol` holds
   * conf·`scale` (0 ≤ conf·scale < scale — fixed-point, so bin
   * assignment and per-bin sums are exact integers; a double
   * confidence column would make binning engine-dependent at bin
   * edges). One map-side pass to per-bin (n, Σconf, positives); the
   * per-bin mean confidence and empirical accuracy are single exact
   * divisions; ECE = Σ (n_b/N)·|acc_b − conf_b| accumulates over the
   * ≤ nBins rows through an ordered cumulative window (deterministic
   * addition order), emitted on every row.
   */
  def calibrationBins(df: DataFrame, confCol: String, labelCol: String,
                      nBins: Int, scale: Long): DataFrame = {
    require(nBins >= 1 && scale >= 1, "nBins/scale must be >= 1")
    val g = df
      .filter(col(confCol).isNotNull && col(labelCol).isNotNull)
      .filter(col(confCol) >= 0 && col(confCol) < scale)
      .groupBy(expr(s"(`$confCol` * $nBins) div ${scale}L").as("bin"))
      .agg(count(lit(1)).as("n"), sum(col(confCol)).as("s_conf"),
        sum(col(labelCol).cast("long")).as("positives"))
    val wAll = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wCum = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val conf = col("s_conf").cast("double") / (col("n") * scale)
    val acc = col("positives").cast("double") / col("n")
    val term = abs(acc - conf) * col("n") / sum(col("n")).over(wAll)
    g.withColumn("__t", term)
      .withColumn("ece", round(last(sum(col("__t")).over(wCum)).over(wAll), 4))
      .select(col("bin"), col("n"), col("positives"),
        round(conf, 4).as("mean_conf"), round(acc, 4).as("frac_pos"),
        round(abs(acc - conf), 4).as("gap"), col("ece"))
  }

  /**
   * Per-class classification metrics from (gold, pred) columns.
   *
   * One corpus pass builds the confusion matrix (map-side-combined
   * groupBy over |classes|² cells); tp/fp/fn and precision/recall/F1
   * derive from the matrix alone. The class universe is the union of
   * gold and predicted labels, so a class the model never predicts (or
   * invents) still gets a row — its precision (resp. recall) is 0.0 by
   * the zero-denominator convention, never a dropped row or a null.
   */
  def classifierEval(df: DataFrame, goldCol: String, predCol: String): DataFrame = {
    val m = df.filter(col(goldCol).isNotNull && col(predCol).isNotNull)
      .groupBy(col(goldCol).as("g"), col(predCol).as("p"))
      .agg(count(lit(1)).as("n"))
    val classes = m.select(col("g").as("class"))
      .union(m.select(col("p").as("class"))).distinct()
    val tp = m.filter(col("g") === col("p"))
      .select(col("g").as("class"), col("n").as("tp"))
    val gold = m.groupBy(col("g").as("class")).agg(sum(col("n")).as("n_gold"))
    val pred = m.groupBy(col("p").as("class")).agg(sum(col("n")).as("n_pred"))
    val z = lit(0L)
    val base = classes
      .join(tp, Seq("class"), "left")
      .join(gold, Seq("class"), "left")
      .join(pred, Seq("class"), "left")
      .select(col("class"),
        coalesce(col("tp"), z).as("tp"),
        (coalesce(col("n_pred"), z) - coalesce(col("tp"), z)).as("fp"),
        (coalesce(col("n_gold"), z) - coalesce(col("tp"), z)).as("fn"),
        coalesce(col("n_gold"), z).as("n_gold"))
    def ratio(num: org.apache.spark.sql.Column, den: org.apache.spark.sql.Column) =
      when(den === 0, lit(0.0)).otherwise(num.cast("double") / den)
    base.select(col("class"), col("tp"), col("fp"), col("fn"), col("n_gold"),
      round(ratio(col("tp"), col("tp") + col("fp")), 4).as("precision"),
      round(ratio(col("tp"), col("tp") + col("fn")), 4).as("recall"),
      round(ratio(lit(2.0) * col("tp"),
        lit(2.0) * col("tp") + col("fp") + col("fn")), 4).as("f1"))
  }
}
