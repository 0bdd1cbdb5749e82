package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic hash-based sampling for training-data pipelines.
 *
 * Unlike `df.sample(...)` (seeded per-partition RNG: the kept set changes
 * with partitioning, engine, and row order), these operators key the
 * decision on a STABLE ID hash, so a sample is:
 *  - reproducible across runs, engines, and cluster sizes,
 *  - join-stable (the same entity is in or out everywhere it appears),
 *  - incrementally consistent (new data doesn't reshuffle old decisions) —
 * the properties an ML dataset split actually needs.
 *
 * Mechanics: bucket = first `hexDigits` hex chars of md5(key-as-string) —
 * lexicographic comparison on fixed-width lowercase hex equals numeric
 * comparison, and md5 hex is bit-identical across Spark, DuckDB, and
 * every other engine (portable oracle). 4 digits = 65,536 buckets →
 * fraction granularity ~0.0015%. Per-row narrow work, zero shuffle,
 * whole-stage codegen.
 */
object Sampling {

  /** Stable bucket of `key`: first `hexDigits` hex chars of its md5. */
  def hashBucket(key: Column, hexDigits: Int = 4): Column =
    substring(md5(key.cast("string").cast("binary")), 1, hexDigits)

  /** Upper (exclusive) hex threshold keeping ≈ `fraction` of buckets.
    * fraction 1.0 (keep everything) must NOT format as a wider hex string —
    * "10000" loses to "3fa2" lexicographically — so it returns "g", which
    * sorts above every hex digit at the first character. */
  def thresholdHex(fraction: Double, hexDigits: Int = 4): String = {
    require(fraction >= 0.0 && fraction <= 1.0, "fraction must be in [0, 1]")
    val buckets = 1L << (4 * hexDigits)
    val keep = math.min(buckets, math.round(fraction * buckets))
    if (keep >= buckets) "g" else ("%0" + hexDigits + "x").format(keep)
  }

  /** Keep ≈ `fraction` of rows, decided by the stable hash of `keyCol`. */
  def hashSample(df: DataFrame, keyCol: String, fraction: Double,
                 hexDigits: Int = 4): DataFrame =
    df.filter(hashBucket(col(keyCol), hexDigits) < lit(thresholdHex(fraction, hexDigits)))

  /**
   * Stratified sampling: per-stratum keep fractions (e.g. per-language
   * rates when rebalancing a pretraining mix), falling back to
   * `defaultFraction` for unlisted strata. One codegen'd when-chain —
   * no shuffle, no per-stratum jobs.
   */
  def stratifiedHashSample(df: DataFrame, keyCol: String, strataCol: String,
                           fractions: Map[String, Double], defaultFraction: Double,
                           hexDigits: Int = 4): DataFrame = {
    val threshold = fractions.foldLeft(lit(thresholdHex(defaultFraction, hexDigits))) {
      case (els, (stratum, f)) =>
        when(col(strataCol) === stratum, lit(thresholdHex(f, hexDigits))).otherwise(els)
    }
    df.filter(hashBucket(col(keyCol), hexDigits) < threshold)
  }

  /**
   * Temperature-scaled source-mixing fractions: the per-source keep rate
   * p_s ∝ w_s^(1/T), normalized over the listed sources, then scaled by
   * `scale` and clamped to 1.0 — the standard way a pretraining mix
   * flattens (T > 1) or sharpens (T < 1) raw source weights. T = 1
   * reproduces the weights; T → ∞ approaches uniform. Computed
   * driver-side so the SAME doubles parameterize the Spark filter and any
   * generated oracle SQL.
   */
  def temperatureFractions(weights: Map[String, Double], temperature: Double,
                           scale: Double = 1.0): Map[String, Double] = {
    require(temperature > 0, "temperature must be positive")
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be positive")
    val pow = weights.map { case (s, w) => s -> math.pow(w, 1.0 / temperature) }
    val z = pow.values.sum
    pow.map { case (s, p) => s -> math.min(1.0, scale * p / z) }
  }

  /** Deterministic mixture sample: keep each source at its temperature-
    * scaled rate (sources not in `weights` are dropped — an explicit mix
    * is a whitelist). Same zero-shuffle when-chain as
    * [[stratifiedHashSample]]. */
  def temperatureMixture(df: DataFrame, keyCol: String, srcCol: String,
                         weights: Map[String, Double], temperature: Double,
                         scale: Double = 1.0, hexDigits: Int = 4): DataFrame =
    stratifiedHashSample(df, keyCol, srcCol,
      temperatureFractions(weights, temperature, scale),
      defaultFraction = 0.0, hexDigits)

  /** Deterministic uniform in (0,1) from the stable md5 of `key`: the
    * first 8 hex chars as a 32-bit integer, mid-bucketed (+0.5) so the
    * value is never exactly 0 or 1 — safe under `ln`/`pow`. Portable:
    * `ln((CAST(concat('0x', substr(md5(k),1,8)) AS BIGINT) + 0.5) /
    * 4294967296.0)` reproduces it bit-for-bit in DuckDB. */
  def hashUniform(key: Column): Column =
    (conv(substring(md5(key.cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("double") + lit(0.5)) / lit(4294967296.0)

  /**
   * Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES):
   * every row draws the deterministic uniform u = [[hashUniform]](key)
   * and scores `ln(u) / w`; the k largest scores are exactly a weighted
   * sample without replacement with per-row inclusion ∝ weight (the
   * exponential-keys construction, keys Exp(w) via −ln(u)/w, smallest k
   * arrival times ≡ largest k of ln(u)/w). Deterministic in the key, so
   * reproducible across runs/engines and join-stable like every sampler
   * here.
   *
   * Scale shape: the score is a per-row narrow expression riding the
   * scan; `orderBy(score).limit(k)` compiles to TakeOrderedAndProject —
   * a size-k heap per partition, only k rows per partition reach the
   * driver merge. No full sort, no shuffle of the data. Rows with
   * non-positive or null weight are never sampled.
   *
   * The score is ROUNDED to 9 decimals with the key as tie-break before
   * the top-k cut: `ln` and the division are libm calls whose last ulp
   * differs across engines, and an unrounded k-th-place boundary can
   * flip on that ulp (the repo-wide float-parity convention). 1e-9
   * resolution is far below any meaningful weight ratio, so the sample
   * distribution is unchanged.
   */
  def weightedSample(df: DataFrame, keyCol: String, weight: Column,
                     k: Int): DataFrame = {
    require(k > 0, "sample size k must be positive")
    df.filter(weight > 0)
      .withColumn("__es_score", round(log(hashUniform(col(keyCol))) / weight, 9))
      .orderBy(desc("__es_score"), col(keyCol)).limit(k)
      .drop("__es_score")
  }

  /** Disjoint train/validation/test split by stable hash: returns the
    * split label per row (fractions must sum to ≤ 1; remainder → "train").
    * The same key always lands in the same split, on any engine. */
  def splitLabel(key: Column, valFraction: Double, testFraction: Double,
                 hexDigits: Int = 4): Column = {
    val b = hashBucket(key, hexDigits)
    when(b < lit(thresholdHex(valFraction, hexDigits)), lit("val"))
      .when(b < lit(thresholdHex(valFraction + testFraction, hexDigits)), lit("test"))
      .otherwise(lit("train"))
  }

  /**
   * Deterministic epoch replication for a weighted pretraining mix where
   * weights may EXCEED 1 (up-sampling): a source with weight `w` sees each
   * of its docs `floor(w)` times, plus one more epoch for the stable
   * hash-selected `w - floor(w)` fraction of its docs — the standard
   * "repeat high-quality sources for ~w epochs" recipe, made exactly
   * reproducible (the same doc gets the same epoch count on any engine or
   * cluster size). Sources not in `epochs` are dropped (a mix is a
   * whitelist). Output: the input row repeated once per epoch with an
   * `epoch` index column (0-based).
   *
   * Per-row narrow work (when-chain + sequence explode) — zero shuffles;
   * output size is sum(w_s × |source_s|) rows, exactly the token budget
   * the mix asked for.
   */
  def epochMixture(df: DataFrame, keyCol: String, srcCol: String,
                   epochs: Map[String, Double], hexDigits: Int = 4): DataFrame = {
    require(epochs.values.forall(w => w >= 0.0), "epoch weights must be >= 0")
    val nCopies = epochs.foldLeft(lit(0)) { case (els, (src, w)) =>
      val whole = math.floor(w).toInt
      val extra = when(
        hashBucket(col(keyCol), hexDigits) < lit(thresholdHex(w - whole, hexDigits)),
        1).otherwise(0)
      when(col(srcCol) === src, lit(whole) + extra).otherwise(els)
    }
    df.withColumn("__n_epochs", nCopies)
      .filter(col("__n_epochs") > 0)
      .withColumn("epoch", explode(sequence(lit(0), col("__n_epochs") - 1)))
      .drop("__n_epochs")
  }

  /** Seeded per-row shuffle key: md5 of "<key>|<seed>". Content-
    * independent, engine-portable (md5 hex is bit-identical in Spark and
    * DuckDB), and a new seed is a fresh permutation. */
  private def shuffleKey(key: Column, seed: Long): Column =
    md5(concat_ws("|", key.cast("string"), lit(seed.toString)))

  /**
   * Deterministic corpus shuffle — the once-per-epoch "randomize training
   * order" step: every row gets `shuffle_rank`, its position in the
   * seeded-hash global order (ties on the hash broken by the key, so the
   * permutation is total and reproducible). Changing `seed` yields an
   * independent permutation; the same seed yields the same order on any
   * cluster size or engine.
   *
   * Scale shape: a naive `row_number() over (order by hash)` collapses to
   * ONE partition (unpartitioned window) — useless at 100 TB. This is the
   * two-phase form instead: (1) rank within 256 hash-PREFIX buckets (the
   * first hex byte of the same key — prefix order equals full-key order),
   * windows partitioned by bucket so they parallelize and spill; (2) a
   * 256-row bucket-offset table (cumulative counts) broadcasts back and
   * shifts local ranks to global ones. One shuffle by bucket + one
   * broadcast join; no global sort, no single-partition stage. The
   * offsets job re-reads the input, but column pruning cuts its scan to
   * `keyCol` alone (counts need only key → bucket), so the second pass
   * reads one column, not the corpus.
   */
  def deterministicShuffle(df: DataFrame, keyCol: String, seed: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val bucketed = df.withColumn("__sk", shuffleKey(col(keyCol), seed))
      .withColumn("__b", substring(col("__sk"), 1, 2))
    val ranked = bucketed.withColumn("__lr", row_number().over(
      w.partitionBy("__b").orderBy(col("__sk"), col(keyCol))))
    // 256 rows: the unpartitioned running-sum window is driver-trivial
    val offsets = bucketed.groupBy("__b").agg(count(lit(1)).as("__c"))
      .withColumn("__off", coalesce(sum(col("__c")).over(
        w.orderBy(col("__b")).rowsBetween(Long.MinValue, -1)), lit(0L)))
      .select(col("__b"), col("__off"))
    ranked.join(broadcast(offsets), "__b")
      .withColumn("shuffle_rank", (col("__off") + col("__lr")).cast("long"))
      .drop("__sk", "__b", "__lr", "__off")
  }

  /**
   * Exactly-K-per-group deterministic sample (distributed reservoir by
   * seeded hash rank): keep the `k` rows of each group with the smallest
   * shuffle keys — "at most K documents per source/domain", the standard
   * per-domain cap of a crawl-curation pipeline. Reproducible and
   * join-stable like every operator here.
   *
   * Scale shape: one shuffle by the group keys; the rank-≤-k filter
   * compiles to WindowGroupLimit (Spark ≥3.5), so each partition keeps a
   * k-row heap per group instead of sorting whole groups — a giant
   * domain never materializes or sorts fully.
   */
  def sampleKPerGroup(df: DataFrame, groupCols: Seq[String], keyCol: String,
                      k: Int, seed: Long): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val rk = row_number().over(org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(shuffleKey(col(keyCol), seed), col(keyCol)))
    df.withColumn("__rk", rk).filter(col("__rk") <= k).drop("__rk")
  }

  /** Best-K-per-group selection ("keep the K highest-quality documents per
    * domain" — the score-ranked sibling of [[sampleKPerGroup]]'s random
    * cap). Rows rank within their group by `scoreCol` DESCENDING with
    * `tieCol` ascending as the deterministic tie-break (rank order must be
    * total or the kept set is nondeterministic across runs/engines); rows
    * ranked ≤ k survive, with the 1-based rank exposed as `rank`.
    *
    * Scale shape: the `row_number <= k` filter becomes a WindowGroupLimit
    * (asserted in PlanSpec) — every input partition keeps only a K-heap
    * per group BEFORE the window shuffle, so the exchange moves O(groups·k)
    * rows, not the corpus, and no group is ever fully sorted. */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], scoreCol: String,
                   tieCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val rk = row_number().over(org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(col(scoreCol).desc, col(tieCol)))
    df.withColumn("rank", rk.cast("long")).filter(col("rank") <= k)
  }

  /**
   * Deterministic negative sampling for contrastive training: each
   * anchor document draws `k` partner documents by a fixed affine probe
   * over the dense corpus ranking — `neg_rank = (r·A + j·B) mod N`,
   * self-hits bumped one slot (the bump can never re-hit the anchor:
   * `(r−1·B... )`, i.e. `nr0+1 ≡ r` requires `nr0 = r−1 ≠ r`).
   * Reproducible across runs AND engines — pure integer arithmetic, no
   * RNG state — so train/eval pipelines can re-derive the exact pair
   * set. The affine walk is NOT cryptographic mixing; runs needing
   * better dispersion swap the probe for a salted hash and keep the
   * plumbing.
   *
   * Scale shape: the dense ranking is the two-phase
   * [[graft.operators.PrefixSum.withGlobalRank]] (range exchange +
   * per-partition window — never a one-task global sort), N arrives as
   * a 1-row broadcast, probes are a narrow k-fold expansion, and one
   * shuffle join resolves rank → partner id. O(k·corpus) output rows by
   * construction.
   *
   * The probe arithmetic runs in DECIMAL(38,0): `r·A` overflows BIGINT
   * once the corpus passes ~3.5×10⁹ documents, and Java's wrap-negative
   * `%` would then yield a rank that matches no row — anchors silently
   * losing negatives (while a SQL oracle errors instead of wrapping).
   * Decimal keeps the product exact (max ~10²⁸ ≪ 10³⁸) and `pmod` keeps
   * the residue in [0, N) for any corpus a BIGINT can rank.
   */
  def negativePairs(df: DataFrame, idCol: String, k: Int,
                    strideA: Long = 2654435761L,
                    strideB: Long = 40503L): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val ids = df.select(col(idCol).as("doc_id")).distinct()
    val ranked = graft.operators.PrefixSum
      .withGlobalRank(ids, Seq(col("doc_id")), "r")
      .withColumn("r", col("r") - 1)
    val probes = ranked
      .crossJoin(broadcast(ranked.agg((max(col("r")) + 1).as("n"))))
      .filter(assert_true(col("n") > 1,
        lit("negativePairs needs >= 2 documents")).isNull)
      .select(col("doc_id"), col("r"), col("n"),
        explode(sequence(lit(1), lit(k))).as("j"))
      .withColumn("nr0", negProbeRank(col("r"), col("j"), col("n"),
        strideA, strideB))
      .withColumn("nr",
        when(col("nr0") === col("r"), (col("nr0") + 1) % col("n"))
          .otherwise(col("nr0")))
    probes.join(
        ranked.select(col("r").as("nr"), col("doc_id").as("neg_id")), "nr")
      .select(col("doc_id"), col("j").cast("long").as("j"), col("neg_id"))
  }

  /** `(r·A + j·B) pmod n` computed in DECIMAL(38,0) so the product never
    * wraps a BIGINT (corpora past ~3.5e9 ranks would otherwise probe a
    * NEGATIVE residue that matches no rank). Exposed for the overflow
    * spec; result always fits a long (< n). */
  private[graft] def negProbeRank(r: Column, j: Column, n: Column,
                                  strideA: Long, strideB: Long): Column =
    pmod(r.cast("decimal(38,0)") * strideA + j.cast("decimal(38,0)") * strideB,
      n.cast("decimal(38,0)")).cast("long")

  /**
   * Fixed-size deterministic uniform sample per segment — KMV/bottom-k:
   * the `k` rows whose md5(key) sorts smallest within each segment
   * (ties broken by key). Two properties make this the SAMPLING member
   * of the persistable-sketch family:
   *  - deterministic and engine-portable (md5 order — same convention
   *    as [[hashSample]]), so the sample is reproducible anywhere;
   *  - MERGEABLE: the bottom-k of a union is the bottom-k of the
   *    per-snapshot bottom-k's, so each snapshot persists only its own
   *    k rows per segment and the read path re-ranks the stored
   *    union — history is never re-scanned, O(k · segments) rows per
   *    snapshot.
   * Unlike [[hashSample]] (a FRACTION whose yield varies with corpus
   * size) this holds the sample size exactly — the per-segment
   * eyeball / debugging sample at 100 TB. CONTRACT: `keyCol` must be
   * unique per row (an id). Rows sharing a key tie on the entire sort
   * key, and which physical row crosses the k boundary then depends on
   * partition order — both the determinism and the merge property
   * hold only over unique keys. The rank filter compiles to
   * WindowGroupLimit (Spark ≥ 3.5): a per-partition bottom-k heap runs
   * before the per-segment exchange, so shuffled volume is
   * O(k · partitions) per segment, never the corpus.
   */
  def bottomKSample(df: DataFrame, segCol: String, keyCol: String,
                    k: Int): DataFrame = {
    require(k >= 1, s"bottomKSample k must be >= 1, got $k")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(segCol))
      .orderBy(md5(col(keyCol).cast("string").cast("binary")), col(keyCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }
}
