package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Probabilistic record linkage (Fellegi & Sunter 1969; the model behind
 * Splink and most production entity-resolution systems): candidate pairs
 * come from BLOCKING (an equi-join on a coarse key — never a cross
 * product), each pair carries a per-field agreement vector, and every
 * field contributes a log2 likelihood-ratio weight — `log2(m/u)` when it
 * agrees, `log2((1-m)/(1-u))` when it disagrees — where `m = P(agree |
 * match)` and `u = P(agree | non-match)` are estimated FROM THE DATA on a
 * labeled pair sample (a clerical-review sample in practice; the planted
 * truth in the fixture). The pair score is the sum of its field weights.
 *
 * Scale shape: the blocking join is one hash shuffle on the block key
 * (pair volume = Σ block²  — pick blocks like production linkage does);
 * the m/u estimation is a map-side-combined aggregate collapsing the
 * pair set to ONE row of counts; that row re-enters the plan as a
 * broadcast cross-join, so the scoring pass is narrow over the pairs.
 * Nothing is collected to the driver.
 *
 * Laplace smoothing ((cnt + 0.5) / (n + 1)) keeps every weight finite on
 * degenerate fields (a unique field never agrees among non-matches).
 * Scores are summed in fixed expression order (field list order), not by
 * an aggregate — the float result is order-deterministic and replayable.
 */
object Linkage {

  /** Blocked candidate pairs with per-field agreement flags.
    * `left`/`right` must expose `idCol` + `blockCols` + each field in
    * `agreeExprs` (name -> boolean Column over left/right field pairs is
    * built by the caller via [[fieldEq]] or custom logic). Columns from
    * the right side must be pre-renamed to avoid collisions. */
  def blockedPairs(left: DataFrame, right: DataFrame, blockCols: Seq[String],
                   agree: Seq[(String, Column)]): DataFrame = {
    require(blockCols.nonEmpty, "blocking columns required — never cross-join")
    val joined = left.join(right, blockCols)
    agree.foldLeft(joined) { case (d, (n, c)) =>
      d.withColumn(s"agree_$n", c.cast("int"))
    }
  }

  /**
   * Fellegi–Sunter scores for blocked pairs. `pairs` carries
   * `agree_<field>` int flags and `isMatchCol` (the labeled sample —
   * here every pair is labeled; production estimates m on the clerical
   * sample and scores the rest identically). Output: pairs + per-field
   * weights applied + `score`, rounded to 4.
   */
  def score(pairs: DataFrame, fields: Seq[String], isMatchCol: String): DataFrame = {
    require(fields.nonEmpty, "at least one comparison field")
    val isM = col(isMatchCol).cast("int")
    // The pair frame feeds BOTH the m/u estimation aggregate and the
    // scoring pass. Left as two references, the blocking join executes
    // twice — column pruning gives the two subplans different scans, so
    // Spark's exchange reuse cannot dedupe them (measured 2x the entry
    // cost). Persist spillably: Σblock² pair rows are far cheaper to
    // hold once than to re-join; evictable, so a pathological block
    // degrades to recompute rather than OOM.
    val p = graft.plans.CacheScope.persistTracked(pairs)
    // one map-side-combined pass: per-field agreement counts among
    // matches and non-matches + the two denominators
    val aggs = Seq(sum(isM).cast("double").as("n_m"),
      sum(lit(1) - isM).cast("double").as("n_u")) ++ fields.flatMap { f =>
      Seq(sum(col(s"agree_$f") * isM).cast("double").as(s"am_$f"),
        sum(col(s"agree_$f") * (lit(1) - isM)).cast("double").as(s"au_$f"))
    }
    val counts = p.agg(aggs.head, aggs.tail: _*)
    val withW = p.crossJoin(broadcast(counts))
    // smoothed m/u and the per-pair weight, in FIXED field order
    val weightCols = fields.map { f =>
      val m = (col(s"am_$f") + lit(0.5)) / (col("n_m") + lit(1.0))
      val u = (col(s"au_$f") + lit(0.5)) / (col("n_u") + lit(1.0))
      when(col(s"agree_$f") === 1, log2(m / u))
        .otherwise(log2((lit(1.0) - m) / (lit(1.0) - u))).as(s"w_$f")
    }
    val scored = withW.select(
      (pairs.columns.map(col).toSeq ++ weightCols): _*)
    scored.withColumn("score",
      round(fields.map(f => col(s"w_$f")).reduce(_ + _), 4))
      .drop(fields.map(f => s"w_$f"): _*)
  }

  /** Equality agreement on a (left, right) column pair, null-safe:
    * both-null counts as agreement only if `nullAgrees`. */
  def fieldEq(l: String, r: String, nullAgrees: Boolean = false): Column =
    if (nullAgrees) col(l) <=> col(r)
    else col(l).isNotNull && col(r).isNotNull && col(l) === col(r)
}
