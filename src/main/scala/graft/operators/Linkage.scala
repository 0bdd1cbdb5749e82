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

  /**
   * Fellegi–Sunter scoring with m/u estimated from VALUE FREQUENCIES —
   * the pair set is enumerated exactly ONCE (r14, guide §8: decide with
   * small rows, move/emit big rows once). [[score]] materializes the
   * Σblock² pair frame and scans it twice (count aggregate + scoring
   * pass); but every count the estimator needs is computable WITHOUT
   * enumerating pairs, the way production linkage (Splink's
   * term-frequency path) does it:
   *
   *   agree_total(f) = Σ_block Σ_key  cnt_left(block, key) · cnt_right(block, key)
   *   total_pairs    = Σ_block        cnt_left(block) · cnt_right(block)
   *   n_m, am(f)     = one |ids|-sized equi-join on (block, id) — the
   *                    labeled-match sample, NOT the pair space
   *   n_u = total_pairs − n_m;  au(f) = agree_total(f) − am(f)
   *
   * All of these are exact integer counts — bit-identical to what the
   * pair-enumerating aggregate produces (both are < 2^53, so the final
   * cast to double is exact) — so the per-field weights and pair scores
   * are bit-for-bit the same as [[score]]'s. The blocking join then runs
   * once, un-persisted, straight into the weight projection.
   *
   * Each comparison field must be expressible as left-key = right-key
   * agreement (`kl`/`kr` non-null and equal — [[fieldEq]] generalized to
   * derived keys, e.g. `floor(bal/1000)`); that is what makes the
   * frequency factorization valid. Scale shape: the heavy Σblock² frame
   * is touched once; everything else is value-frequency-sized (≤ input
   * rows), and the count row re-enters as a broadcast, exactly like
   * [[score]]'s.
   *
   * All per-field (block, key) frequencies are computed in ONE pass per
   * side (r15): the derived keys posexplode into (block, field-ordinal,
   * key) rows — plus a constant pseudo-key at ordinal |fields| whose
   * frequencies are the block sizes, so `total_pairs` rides the same
   * aggregate — and a single (block, ordinal, key) count per side feeds
   * one frequency join and ONE single-row multi-aggregate. The r14 form
   * ran one groupBy+groupBy+join+agg chain PER FIELD plus crossJoins
   * (~39 sub-100 ms jobs at bench SF — fixed job/shuffle overhead
   * swamped the saved pair persist, VERDICT r14 item 1); the fused form
   * is 3 aggregate shapes total regardless of field count.
   *
   * Key-type contract: the posexploded frequency pass compares keys by
   * their STRING cast (the array must be homogeneous), so derived keys
   * must come from types whose string form is equality-injective —
   * strings, integral types, booleans, dates, timestamps, decimals of
   * one scale. Float/double keys are NOT supported (Spark's comparison
   * normalizes -0.0 == 0.0 but their strings differ); bucket them to
   * integers first (e.g. `floor(bal/1000)`, which is LONG). Id columns
   * (`lId`/`rId`) must be NON-NULL and distinctly named: `n_u` is
   * derived as `n_all − n_m`, so a null-id pair would count as a
   * non-match here whereas [[score]] drops null-labeled rows from both
   * sides — the bit-parity contract holds for non-null ids only.
   */
  def scoreBlockedByFrequency(left: DataFrame, right: DataFrame,
                              blockCols: Seq[String],
                              fields: Seq[(String, Column, Column)],
                              lId: String, rId: String): DataFrame = {
    require(blockCols.nonEmpty, "blocking columns required — never cross-join")
    require(fields.nonEmpty, "at least one comparison field")
    val bc = blockCols.map(col)
    val fieldNames = fields.map(_._1)
    // ONE narrow projection per side — (block, id, derived keys) —
    // persisted spillably and feeding every pass below (the naive form
    // re-scanned each input once per frequency aggregate: 24 scans / 26
    // jobs measured vs 8). Persisting N input-sized rows is strictly
    // cheaper than [[score]]'s Σblock² pair-frame persist.
    // ... and pre-partitioned by the block key (r15, guide §2.4): every
    // consumer below — the frequency aggregate (grouping keys ⊇ block),
    // the (block, id) match join, and the blocking pair join — needs
    // only ClusteredDistribution on a superset of the block columns, so
    // one input-sized shuffle here makes all of them exchange-free over
    // the cached partitioning. The partition count is EXPLICIT (scale-
    // adaptive: the cluster's default parallelism) because AQE sizes
    // coalescing on the shuffle's input bytes, and the blocking join's
    // OUTPUT is Σblock² — coalescing the tiny input to one partition
    // serializes the quadratic pair-scoring stage onto one task
    // (measured r15: 1-task pair stage, wall +15%). Parallelism remains
    // bounded by block count — the blocking join must co-locate each
    // block wherever it runs — which is the inherent shape of blocked
    // linkage; pick blocks accordingly.
    val shufN = math.max(left.sparkSession.sparkContext.defaultParallelism, 1)
    val lp = graft.plans.CacheScope.persistTracked(left.select(
      (bc :+ col(lId)) ++ fields.map { case (f, kl, _) => kl.as(s"lk_$f") }: _*)
      .repartition(shufN, bc: _*))
    val rp = graft.plans.CacheScope.persistTracked(right.select(
      (bc :+ col(rId)) ++ fields.map { case (f, _, kr) => kr.as(s"rk_$f") }: _*)
      .repartition(shufN, bc: _*))
    // ONE frequency pass per side (r15): posexplode the string-cast
    // derived keys — ordinal i = field i, ordinal nF = the constant
    // pseudo-key counting block size — then a single count by
    // (block, ordinal, key). Null keys drop here, matching fieldEq's
    // both-non-null rule (the pseudo-key is never null).
    val nF = fields.length
    def freq(side: DataFrame, pfx: String, cnt: String): DataFrame = {
      val keys = fields.map { case (f, _, _) =>
        col(s"${pfx}_$f").cast("string") } :+ lit("")
      side.select((bc :+ posexplode(array(keys: _*)).as(Seq("pos", "k"))): _*)
        .filter(col("k").isNotNull)
        .groupBy((bc ++ Seq(col("pos"), col("k"))): _*)
        .agg(count(lit(1)).as(cnt))
    }
    // the frequency join keys equal the aggregate grouping keys, so both
    // exchanges are reused — then ONE single-row multi-aggregate derives
    // n_all and every per-field agreement total together
    val fjoined = freq(lp, "lk", "cl")
      .join(freq(rp, "rk", "cr"), blockCols ++ Seq("pos", "k"))
    val totAggs =
      coalesce(sum(when(col("pos") === nF, col("cl") * col("cr"))), lit(0L))
        .as("n_all") +:
      fields.zipWithIndex.map { case ((f, _, _), i) =>
        coalesce(sum(when(col("pos") === i, col("cl") * col("cr"))), lit(0L))
          .as(s"at_$f")
      }
    val total = fjoined.agg(totAggs.head, totAggs.tail: _*)
    def agreeCol(f: String): Column =
      col(s"lk_$f").isNotNull && col(s"rk_$f").isNotNull &&
        col(s"lk_$f") === col(s"rk_$f")
    // labeled-match sample: the (block, id) equi-join — |ids|-sized,
    // never pair-space-sized
    val matchAggs = count(lit(1)).cast("long").as("n_m") +:
      fieldNames.map { f =>
        coalesce(sum(agreeCol(f).cast("long")), lit(0L)).as(s"am_$f")
      }
    val idJoin = lp.join(rp, blockCols).filter(col(lId) === col(rId))
    val mAgg = idJoin.agg(matchAggs.head, matchAggs.tail: _*)
    // one-row count frame: frequency totals ⨯ match counts
    val countsRaw = total.crossJoin(mAgg)
    // derive the [[score]]-shaped count columns (exact integers, cast
    // to double exactly as score()'s sums are)
    val counts = countsRaw.select(
      (Seq(col("n_m").cast("double").as("n_m"),
        (col("n_all") - col("n_m")).cast("double").as("n_u")) ++
        fieldNames.flatMap(f => Seq(
          col(s"am_$f").cast("double").as(s"am_$f"),
          (col(s"at_$f") - col(s"am_$f")).cast("double").as(s"au_$f")))): _*)
    // single pair enumeration with agree flags + is_match
    val pairs = fieldNames.foldLeft(lp.join(rp, blockCols)) { (d, f) =>
      d.withColumn(s"agree_$f", agreeCol(f).cast("int"))
    }.withColumn("is_match", col(lId) === col(rId))
      .select((Seq(lId, rId) ++ fieldNames.map(f => s"agree_$f") :+
        "is_match").map(col): _*)
    val withW = pairs.crossJoin(broadcast(counts))
    val weightCols = fieldNames.map { f =>
      val m = (col(s"am_$f") + lit(0.5)) / (col("n_m") + lit(1.0))
      val u = (col(s"au_$f") + lit(0.5)) / (col("n_u") + lit(1.0))
      when(col(s"agree_$f") === 1, log2(m / u))
        .otherwise(log2((lit(1.0) - m) / (lit(1.0) - u))).as(s"w_$f")
    }
    val scoredDf = withW.select(
      (pairs.columns.map(col).toSeq ++ weightCols): _*)
    scoredDf.withColumn("score",
      round(fieldNames.map(f => col(s"w_$f")).reduce(_ + _), 4))
      .drop(fieldNames.map(f => s"w_$f"): _*)
  }
}
