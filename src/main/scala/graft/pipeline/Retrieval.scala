package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Hybrid retrieval: reciprocal-rank fusion (RRF) of a lexical BM25
 * ranking and a semantic embedding-cosine ranking — the standard
 * two-tower serving pattern (Cormack et al.'s RRF, the fusion used by
 * every hybrid search stack). Each modality contributes
 * `1 / (k₀ + rank)` for the documents in its top-`n` list; documents
 * missing from a list contribute 0 from it.
 *
 * Scale shape: each modality reduces the corpus to an n-row ranked
 * list BEFORE fusion — BM25 via [[TextAnalysis.bm25TopK]] (per-partition
 * heaps, broadcast globals) and cosine via [[Similarity.bruteForceTopK]]
 * (broadcast query, WindowGroupLimit heaps; swap in [[Similarity.lshTopK]]
 * for a bucketed corpus at scale). The fusion itself then touches only
 * 2·n rows: the rank windows and the full-outer join run on frames that
 * fit in a single task no matter the corpus size.
 *
 * Determinism: ranks are integers; the fused score is
 * `1/(k₀+r_lex) + 1/(k₀+r_sem)` — two correctly-rounded double
 * divisions of small integers added in a fixed order, bit-identical on
 * any IEEE-754 engine, so the fused score itself is safely emittable
 * and hashable cross-engine. Ties order by document id.
 */
object Retrieval {

  /** Rank an (already top-n) scored frame 1..n by (score desc, id asc).
    * The frame is at most n rows — the unpartitioned window is a
    * deliberate single-task pass over a bounded list, not a corpus sort. */
  private def ranked(list: DataFrame, idCol: String, scoreCol: String,
                     rankName: String): DataFrame =
    list.select(col(idCol).as("id"),
        row_number().over(Window.orderBy(col(scoreCol).desc, col(idCol).asc))
          .cast("long").as(rankName))

  /**
   * Fuse the top-`n` BM25 list for `terms` with the top-`n` cosine list
   * for the embedding of `queryVecId`, returning the top `k` documents
   * by RRF score: (doc_id, r_lex, r_sem, fused) — null rank = absent
   * from that modality's list. Documents are matched on
   * `docs.idCol = embeddings.vecIdCol`.
   */
  def rrfHybrid(docs: DataFrame, idCol: String, textCol: String,
                terms: Seq[String], embeddings: DataFrame,
                vecIdCol: String, vecCol: String, queryVecId: Long,
                n: Int, k: Int, k0: Int = 60)
               (implicit spark: SparkSession): DataFrame = {
    val lex = ranked(
      TextAnalysis.bm25TopK(docs, idCol, textCol, terms, n),
      "doc_id", "score", "r_lex")
    val sem = ranked(
      Similarity.bruteForceTopK(
        embeddings.filter(col(vecIdCol) === queryVecId), embeddings,
        vecIdCol, vecCol, n),
      "neighbor_id", "sim", "r_sem")
    val contrib = (r: org.apache.spark.sql.Column) =>
      coalesce(lit(1.0) / (lit(k0.toLong) + r), lit(0.0))
    lex.join(sem, Seq("id"), "full_outer")
      .select(col("id").as("doc_id"), col("r_lex"), col("r_sem"),
        (contrib(col("r_lex")) + contrib(col("r_sem"))).as("fused"))
      .orderBy(col("fused").desc, col("doc_id"))
      .limit(k)
  }

  /** DuckDB SQL mirroring [[rrfHybrid]] stage for stage: the BM25 CTEs
    * come from [[TextAnalysis.bm25OracleSql]]'s formulation, the cosine
    * CTE from the `list_dot_product` form the ANN oracles pin, and the
    * fusion arithmetic keeps the identical fixed-order double ops. */
  def rrfOracleSql(docTable: String, idCol: String, textCol: String,
                   terms: Seq[String], embTable: String,
                   vecIdCol: String, vecCol: String, queryVecId: Long,
                   n: Int, k: Int, k0: Int = 60,
                   k1: Double = 1.2, b: Double = 0.75): String = {
    val tfs = terms.zipWithIndex.map { case (term, i) =>
      val esc = term.replace("'", "''")
      s"CAST(len(ws) - len(list_filter(ws, x -> x != '$esc')) AS BIGINT) AS tf$i"
    }.mkString(", ")
    val dfs = terms.indices.map(i =>
      s"sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS df$i").mkString(", ")
    val score = terms.indices.map { i =>
      s"ln((n_docs - df$i + 0.5) / (df$i + 0.5) + 1.0) * " +
        s"(CAST(tf$i AS DOUBLE) * ${k1 + 1}) / " +
        s"(CAST(tf$i AS DOUBLE) + $k1 * (${1 - b} + $b * dl / " +
        s"(CAST(sum_dl AS DOUBLE) / n_docs)))"
    }.mkString(" + ")
    s"""WITH base AS (
       |  SELECT $idCol AS doc_id, CAST(len(ws) AS BIGINT) AS dl, $tfs
       |  FROM (SELECT $idCol, string_split($textCol, ' ') AS ws FROM $docTable)
       |), g AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl, $dfs FROM base
       |), lex AS (
       |  SELECT doc_id AS id, CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS r_lex
       |  FROM (SELECT base.doc_id, $score AS score FROM base, g ORDER BY score DESC, doc_id LIMIT $n)
       |), qv AS (
       |  SELECT CAST($vecCol AS DOUBLE[]) AS q FROM $embTable WHERE $vecIdCol = $queryVecId
       |), sems AS (
       |  SELECT c.$vecIdCol AS id,
       |    list_dot_product(qv.q, c.v) / (sqrt(list_dot_product(qv.q, qv.q)) * sqrt(list_dot_product(c.v, c.v))) AS sim
       |  FROM (SELECT $vecIdCol, CAST($vecCol AS DOUBLE[]) AS v FROM $embTable) c, qv
       |  WHERE c.$vecIdCol <> $queryVecId
       |), sem AS (
       |  SELECT id, CAST(row_number() OVER (ORDER BY sim DESC, id) AS BIGINT) AS r_sem
       |  FROM (SELECT * FROM sems ORDER BY sim DESC, id LIMIT $n)
       |)
       |SELECT doc_id, r_lex, r_sem, fused FROM (
       |  SELECT coalesce(lex.id, sem.id) AS doc_id, r_lex, r_sem,
       |    coalesce(CAST(1 AS DOUBLE) / ($k0 + r_lex), 0) + coalesce(CAST(1 AS DOUBLE) / ($k0 + r_sem), 0) AS fused
       |  FROM lex FULL OUTER JOIN sem ON lex.id = sem.id
       |) ORDER BY fused DESC, doc_id LIMIT $k""".stripMargin.replace("\n", " ")
  }

  /**
   * Sparse similarity self-join on raw term-frequency vectors: the
   * INTEGER dot product `Σ tf₁(t)·tf₂(t)` over shared tokens, for every
   * document pair above `minDot`. The integer formulation is the point:
   * a tf-idf float dot accumulates in engine-specific order and can't
   * be oracle-hashed, while raw-tf dots are exact BIGINTs — use this
   * as the first-stage candidate scorer and rescale survivors.
   *
   * Plan shape — exact HEAD/TAIL decomposition. A pure inverted-index
   * self-join materializes Σ_t df(t)² joined rows, and real vocabularies
   * are Zipf: a handful of ubiquitous tokens (df ≈ corpus) contribute
   * ~all of that volume (measured on the sf0.1 fixture: 30 stop-tokens →
   * 224M of 224.2M join rows, 80 s; every OTHER token combined → 31k).
   * So the dot is split exactly:
   *
   *  - TAIL (df ≤ `denseDf`): classic inverted index — one shuffle per
   *    side on the 8-byte token hash, two-phase pair aggregation. Only
   *    docs sharing a rare token meet; volume is the measured 31k-class
   *    term, never the stop-word square.
   *  - HEAD (df > `denseDf`): those few tokens are laid out as a DENSE
   *    `array<bigint>` per document (rank-indexed, broadcast rank map)
   *    and every pair's head contribution is a codegen'd
   *    [[graft.functions.VecDotLong]] over a broadcast nested-loop
   *    enumeration — O(n²·H) multiply-adds with ZERO shuffle, instead of
   *    O(Σ df²) shuffled rows. H is guarded (≤ `maxHeadTokens`) and the
   *    quadratic block is guarded on the WORK it implies, not just the
   *    row count: `n·(n−1)/2 · H` multiply-adds must stay under
   *    `maxHeadMadds` (default 10⁹ — seconds of vectorized compute; a
   *    doc-count-only bound admitted 2×10¹⁰-madd plans). Past that,
   *    exact all-token thresholded dot is the wrong primitive — reach
   *    for [[graft.pipeline.Similarity]]'s ANN/banded paths or drop the
   *    head tokens explicitly and state the semantics.
   *
   * The tail pair-dot table normally broadcasts onto the dense
   * enumeration, but its size is Σ_{df(t)≤denseDf} df(t)² — bounded by
   * NEITHER head guard — so it is measured from the same doc-frequency
   * aggregate that picks the head tokens: past
   * `maxTailBroadcastPairs` the tail merge degrades to a shuffled
   * equi-join on (id1, id2) instead of blowing the broadcast limit.
   *
   * total = head + tail exactly, so results are IDENTICAL to the naive
   * formulation (same oracle), at ~18× less intermediate volume on the
   * measured fixture. `minDot ≥ 1` is REQUIRED (the docstring contract:
   * a thresholded scorer): at minDot ≤ 0 the dense block would emit
   * every doc pair — n²/2 rows sharing no token — while the headless
   * path emits only co-occurring pairs, a path-dependent answer.
   */
  def tfDotPairs(df: DataFrame, idCol: String, textCol: String,
                 minDot: Long, denseDf: Int = 256,
                 maxHeadTokens: Int = 64,
                 maxHeadMadds: Long = 1000000000L,
                 maxTailBroadcastPairs: Long = 20000000L): DataFrame = {
    require(minDot >= 1,
      s"tfDotPairs is a THRESHOLDED candidate scorer: minDot=$minDot must " +
        "be >= 1 — minDot <= 0 asks for every doc pair (n²/2 rows sharing " +
        "no token), which is not a candidate-scorer plan at any scale")
    // tf feeds FOUR consumers (df-aggregate, doc-id universe, dense head
    // assembly, tail pair join) — left unpersisted, the corpus-text
    // explode + per-doc aggregate re-executed once per consumer (the
    // verify-skill double-execution class, r14). Spillable + evictable:
    // tf is Σ per-doc distinct tokens, far smaller than the text it
    // derives from, and a pathological corpus degrades to recompute.
    val tf = graft.plans.CacheScope.persistTracked(df
      .filter(col(textCol).isNotNull && col(textCol) =!= "")
      .select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("doc_id"), xxhash64(col("tok")).as("t"))
      .agg(count(lit(1)).as("tf")))

    def pairDots(side: DataFrame): DataFrame = side.as("a")
      .join(side.as("b"),
        col("a.t") === col("b.t") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .agg(sum(col("a.tf") * col("b.tf")).as("dot"))

    // A guard trip below must not leak the persisted tf into the session
    // when the caller runs outside a CacheScope (ADVICE r14): any
    // exception past this point unpersists tf before propagating. The
    // normal (lazy) return keeps the persist — the returned plan reads it.
    try {

    // ONE doc-frequency aggregate (materialized: vocab-sized,
    // distributed) feeds both planning decisions — the head-token list
    // and the tail join volume. Head tokens to the driver are bounded by
    // construction (df > denseDf can hold at most corpus/denseDf tokens)
    // and guarded besides.
    val dfAgg = tf.groupBy("t").agg(count(lit(1)).as("d")).localCheckpoint(true)
    val headToks = dfAgg.filter(col("d") > denseDf).select("t")
      .collect().map(_.getLong(0)).sorted
    if (headToks.isEmpty) return pairDots(tf).filter(col("dot") >= minDot)
    // guards BEFORE any further planning jobs — a corpus about to trip
    // them must not pay the tail-volume aggregate first
    require(headToks.length <= maxHeadTokens,
      s"tfDotPairs: ${headToks.length} tokens exceed denseDf=$denseDf doc-" +
        s"frequency (max $maxHeadTokens dense dims) — raise denseDf (more " +
        "inverted-index volume) or maxHeadTokens (wider dense vectors)")
    val h = headToks.length
    val rankRows = headToks.zipWithIndex.map { case (t, i) => (t, i.toLong) }
    val spark = df.sparkSession
    import spark.implicits._
    val headRank = broadcast(rankRows.toSeq.toDF("t", "idx"))

    val docIds = tf.select("doc_id").distinct()
    val nDocs = docIds.count()
    val headMadds = BigInt(nDocs) * (nDocs - 1) / 2 * h
    require(headMadds <= maxHeadMadds,
      s"tfDotPairs: the dense head block implies $headMadds multiply-adds " +
        s"($nDocs docs × ${nDocs - 1}/2 pairs × $h head dims) > " +
        s"maxHeadMadds=$maxHeadMadds — use the ANN/banded similarity " +
        "paths at this scale, or drop head tokens explicitly")
    // Σ df² over tail tokens = the inverted-index join volume AND an
    // upper bound on the tail pair-dot table the head path broadcasts
    // (only the head path broadcasts the tail, so only it pays this job)
    val tailVol = dfAgg.filter(col("d") <= denseDf)
      .agg(coalesce(sum(col("d") * col("d")), lit(0L))).head().getLong(0)

    val dense = tf.join(headRank, "t")
      .groupBy("doc_id")
      .agg(map_from_entries(collect_list(struct(col("idx"), col("tf")))).as("m"))
      .select(col("doc_id"), transform(sequence(lit(0L), lit(h - 1L)),
        i => coalesce(element_at(col("m"), i), lit(0L))).as("vec"))
    val docs = docIds.join(dense, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("vec"), array_repeat(lit(0L), h)).as("vec"))

    // Tail pair dots are usually sparse and tiny relative to the pair
    // universe — broadcast them onto the dense enumeration. But their
    // volume is bounded only by Σ df² (measured above): past the
    // broadcast budget, merge through a shuffled equi-join instead of
    // failing at the broadcast limit / driver heap.
    val tail = pairDots(tf.join(headRank, Seq("t"), "left_anti"))
      .withColumnRenamed("dot", "tdot")
    val tailMerge = if (tailVol <= maxTailBroadcastPairs) broadcast(tail) else tail

    val a = docs.select(col("doc_id").as("id1"), col("vec").as("v1"))
    val b = docs.select(col("doc_id").as("id2"), col("vec").as("v2"))
    a.join(broadcast(b), col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        graft.functions.VectorFunctions.vecDotLong(col("v1"), col("v2")).as("hdot"))
      .join(tailMerge, Seq("id1", "id2"), "left")
      .select(col("id1"), col("id2"),
        (col("hdot") + coalesce(col("tdot"), lit(0L))).as("dot"))
      .filter(col("dot") >= minDot)

    } catch { case t: Throwable =>
      try { tf.unpersist(blocking = false); () } catch { case _: Throwable => () }
      throw t
    }
  }

  /**
   * Positional phrase search over the inverted index: every occurrence
   * of the exact word sequence `phrase` as (doc_id, pos) with `pos` the
   * 0-based word index of the phrase start. The postings frame is
   * FILTERED to the phrase's words before anything joins — the scan
   * volume is the phrase words' document frequency, never the corpus's
   * token count — and each chained join is an equi-join on
   * (doc, anchor-adjusted position), whose keys are unique per
   * document position: no skew, no pair explosion, |phrase|−1 shuffles
   * of filtered postings. Repeated words in the phrase ("batch batch
   * batch") and overlapping occurrences both fall out of the position
   * arithmetic naturally.
   */
  def phraseSearch(df: DataFrame, idCol: String, textCol: String,
                   phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one word")
    require(phrase.forall(w => w.nonEmpty && !w.contains(" ")),
      "phrase words must be non-empty single tokens")
    val toks = df
      .select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), " ")).as(Seq("pos", "w")))
      .filter(col("w").isin(phrase: _*))
    val base = toks.filter(col("w") === phrase.head)
      .select(col("doc_id"), col("pos"))
    phrase.zipWithIndex.drop(1).foldLeft(base) { case (acc, (w, i)) =>
      val t = toks.filter(col("w") === w)
        .select(col("doc_id").as("__d"), (col("pos") - i).as("__p"))
      acc.join(t, col("doc_id") === col("__d") && col("pos") === col("__p"))
        .select(col("doc_id"), col("pos"))
    }
  }
}
