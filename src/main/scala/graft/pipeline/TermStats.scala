package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Corpus term statistics beyond tf-idf: chi-squared feature selection
 * (the classic text-classification feature ranker) and Dunning's
 * log-likelihood-ratio collocation mining (Dunning, CL 1993 — the G²
 * statistic behind phrase extraction in Mahout/NLTK-style pipelines).
 *
 * Both collapse the corpus to integer contingency counts FIRST (one
 * distinct-explode shuffle), then evaluate the statistic as a fixed-
 * order scalar expression over those integers — no float aggregation
 * anywhere, so the doubles are engine-replayable and only the final
 * statistic is rounded.
 */
object TermStats {

  /**
   * χ² term-class association over distinct document-term incidence:
   * for each (class, token) with ≥ 1 in-class document, the 2×2 table
   * a (in-class docs with token), b (other docs with token), c
   * (in-class without), d (others without), and
   * χ² = N(ad − bc)² / ((a+b)(c+d)(a+c)(b+d)). Top `topK` tokens per
   * class by χ² (ties by token). The statistic is products and one
   * division over exact counts, evaluated in double in a fixed order —
   * no accumulation, so rank order is deterministic across engines.
   */
  def chiSquaredTerms(docs: DataFrame, idCol: String, textCol: String,
                      classCol: String, topK: Int): DataFrame = {
    require(topK >= 1, "topK must be >= 1")
    val base = docs.filter(col(textCol).isNotNull && col(classCol).isNotNull)
    // distinct AFTER the explode too: array_distinct dedups only within a
    // row, so a duplicated doc id would double-count incidence `a` and
    // diverge from the oracle's global DISTINCT (doc, class, token)
    val dt = base.select(col(idCol), col(classCol).as("class"),
        explode(array_distinct(filter(split(col(textCol), " "),
          w => length(w) > 0))).as("token"))
      .distinct()
    val a = dt.groupBy("class", "token").agg(count(lit(1)).as("a"))
    val tok = dt.groupBy("token").agg(count(lit(1)).as("t_all"))
    val cls = base.groupBy(col(classCol).as("class")).agg(count(lit(1)).as("n_class"))
    val n = base.count()
    val cell = a
      .join(tok, "token")
      .join(broadcast(cls), "class")
      .select(col("class"), col("token"), col("a"),
        (col("t_all") - col("a")).as("b"),
        (col("n_class") - col("a")).as("c"),
        (lit(n) - col("n_class") - col("t_all") + col("a")).as("d"))
    val ad = col("a").cast("double") * col("d") - col("b").cast("double") * col("c")
    val den = (col("a") + col("b")).cast("double") * (col("c") + col("d")) *
      (col("a") + col("c")) * (col("b") + col("d"))
    // a zero margin (token in every doc, or a class covering the whole
    // corpus) makes the table degenerate — no association, chi2 = 0
    val chi2 = when(den > 0, lit(n.toDouble) * ad * ad / den).otherwise(lit(0.0))
    val w = Window.partitionBy("class").orderBy(chi2.desc, col("token"))
    cell.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("class"), col("rank"), col("token"), col("a"), col("b"),
        round(chi2, 4).as("chi2"))
  }

  /** x·ln(x) with the 0·ln(0) = 0 convention. */
  private def xlogx(c: Column): Column =
    when(c > 0, c.cast("double") * log(c.cast("double"))).otherwise(lit(0.0))

  /**
   * Top-`topK` adjacent-bigram collocations by Dunning's G²
   * log-likelihood ratio. The corpus collapses to bigram counts and
   * marginal word counts (two shuffles over the pair key); G² is the
   * closed entropy form 2(Σ xlogx(cells) − Σ xlogx(margins) + xlogx(N)),
   * evaluated in fixed term order. Candidates below `minCount` pair
   * occurrences are dropped before the ranking heap (`orderBy.limit` —
   * TakeOrdered, not a global sort).
   */
  def collocations(docs: DataFrame, textCol: String, minCount: Long,
                   topK: Int): DataFrame = {
    require(minCount >= 1 && topK >= 1, "minCount/topK must be >= 1")
    val toks = filter(split(col(textCol), " "), w => length(w) > 0)
    val n1 = greatest(size(col("__t")) - 1, lit(0))
    val pairsRaw = docs.filter(col(textCol).isNotNull)
      .select(toks.as("__t"))
      .select(explode(arrays_zip(slice(col("__t"), lit(1), n1),
        slice(col("__t"), lit(2), n1))).as("p"))
      .select(col("p").getField("0").as("w1"), col("p").getField("1").as("w2"))
    val pc = pairsRaw.groupBy("w1", "w2").agg(count(lit(1)).as("k11"))
    val m1 = pc.groupBy("w1").agg(sum("k11").as("n_w1"))
    val m2 = pc.groupBy("w2").agg(sum("k11").as("n_w2"))
    val nTot = pc.agg(sum("k11").as("n_pairs"))
    val cells = pc.join(m1, "w1").join(m2, "w2").crossJoin(broadcast(nTot))
      .filter(col("k11") >= minCount)
      .withColumn("k12", col("n_w1") - col("k11"))
      .withColumn("k21", col("n_w2") - col("k11"))
      .withColumn("k22", col("n_pairs") - col("n_w1") - col("n_w2") + col("k11"))
    val g2 = lit(2.0) * (xlogx(col("k11")) + xlogx(col("k12")) +
      xlogx(col("k21")) + xlogx(col("k22")) -
      xlogx(col("k11") + col("k12")) - xlogx(col("k21") + col("k22")) -
      xlogx(col("k11") + col("k21")) - xlogx(col("k12") + col("k22")) +
      xlogx(col("n_pairs")))
    cells.withColumn("__g2", g2)
      .orderBy(col("__g2").desc, col("w1"), col("w2"))
      .limit(topK)
      .select(col("w1"), col("w2"), col("k11").as("n_pair"),
        col("n_w1"), col("n_w2"), round(col("__g2"), 4).as("g2"))
  }
}
