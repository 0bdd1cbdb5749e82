package graft

import graft.operators.{ExactQuantiles, GroupedDistribution, ZOrder}
import graft.pipeline.{Dedup, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Adversarial fixtures that TRIP every scale guard — each guard is
 * asserted at sf0.1 cardinalities by the oracle entries, but a guard
 * that has never fired is a guard you only believe in. Fixtures here
 * are 10×-degenerate by construction (one stop-shingle across the
 * whole corpus, one k-means cell holding everything, one short-doc
 * pool, a fully-continuous value domain, an out-of-range z-dimension,
 * a group past the KLL exact regime) and every message-bearing guard
 * must surface ITS message, not a generic crash.
 */
class GuardTripSpec extends SparkTestBase {

  /** All messages down a (possibly wrapped) failure chain. */
  private def messages(e: Throwable): Seq[String] =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).toSeq

  test("semanticDedup: one degenerate cell at 10x fails with the maxCellSize message") {
    val s = spark
    import s.implicits._
    // 5,000 identical vectors + one centroid: every row lands in ONE cell
    val vecs = (1L to 5000L).map(i => (i, Array(1.0f, 0.0f))).toDF("doc_id", "vec")
    val e = intercept[Exception] {
      Similarity.semanticDedup(vecs, "doc_id", "vec", threshold = 0.99,
        centroids = Array(Array(1.0, 0.0)), maxCellSize = 1000).collect()
    }
    assert(messages(e).exists(m => m.contains("maxCellSize=1000") &&
      m.contains("raise nlist")), messages(e).mkString("; "))
  }

  test("editDistancePairs: a 3k short-doc pool fails with the maxShortDocs message") {
    val s = spark
    import s.implicits._
    // every doc far shorter than the 24-char prefix — the all-empty-tail
    // pool that would otherwise build one quadratic candidate bucket
    val shorts = (1L to 3000L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val e = intercept[Exception] {
      Dedup.editDistancePairs(shorts, "doc_id", "text",
        prefixLen = 24, maxDist = 2, maxShortDocs = 500L).collect()
    }
    assert(messages(e).exists(m => m.contains("maxShortDocs=500") &&
      m.contains("pre-filter short texts")), messages(e).mkString("; "))
    // under the bound the same corpus verifies exactly (the pool is
    // quadratic but answer-preserving): d1..d9 prefixes are within
    // edit distance 2 of each other
    val ok = Dedup.editDistancePairs(shorts.filter(col("doc_id") < 10),
      "doc_id", "text", prefixLen = 24, maxDist = 2, maxShortDocs = 500L)
    assert(ok.count() === 36L) // all C(9,2) single-digit pairs at dist 1
  }

  test("ExactQuantiles: a continuous 10k-distinct domain fails naming the KLL fallback") {
    val s = spark
    import s.implicits._
    val continuous = (1 to 10000).map(i => i * 1.0000001).toDF("v")
    val e = intercept[IllegalArgumentException] {
      ExactQuantiles.quantiles(continuous, "v", Seq(0.5), maxDomain = 1000L)
    }
    assert(e.getMessage.contains("maxDomain=1000") &&
      e.getMessage.contains("GroupedDistribution"), e.getMessage)
  }

  test("ZOrder.cluster: an out-of-range dimension fails with the overflow message") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 5L), (2L, 1L << 16)).toDF("a", "b") // 2^16 needs 17 bits
    val e = intercept[Exception] {
      ZOrder.cluster(df, Seq("a", "b"), numFiles = 2, bits = 16).collect()
    }
    assert(messages(e).exists(_.contains("z-order dimension out of")),
      messages(e).mkString("; "))
  }

  test("GroupedDistribution requireExact: a group past the KLL regime fails loudly") {
    val s = spark
    import s.implicits._
    // one group with 5,000 rows against k=1024: level-0 exactness is gone
    val df = (1 to 5000).map(i => ("g", i.toDouble)).toDF("key", "v")
    val e = intercept[Exception] {
      GroupedDistribution.quantiles(df, Seq("key"), "v", Seq(0.5),
        k = 1024, requireExact = true).collect()
    }
    assert(messages(e).exists(_.contains("no longer exact")),
      messages(e).mkString("; "))
  }

  test("ngram maxDocFreq: a corpus-wide stop-shingle is dropped, not joined") {
    val s = spark
    implicit val sp: SparkSession = s
    import s.implicits._
    // 2,000 docs whose ONLY shared 3-gram is the boilerplate footer: the
    // unguarded index would build one 2,000-doc bucket (~2M pairs); the
    // guard must drop it BEFORE any bucket materializes, leaving only the
    // 10 planted true near-dup pairs (which share non-hot shingles).
    val boiler = "all rights reserved"
    val docs = (1L to 2000L).map { i =>
      // planted body long enough that dropping the hot footer shingle
      // plus the 3 copy$i-bearing shingles still leaves Jaccard ≥ 0.5
      val body =
        if (i <= 10) "planted duplicate body text number shared alpha bravo " +
          s"charlie delta echo foxtrot golf hotel india juliet kilo lima mike copy$i"
        else s"unique body u$i v$i w$i x$i y$i z$i"
      (i, s"$body $boiler")
    }.toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3,
      threshold = 0.5, maxDocFreq = Some(100)).collect()
    // the planted family pairs survive; nothing else does
    assert(pairs.nonEmpty && pairs.forall(r => r.getLong(0) <= 10 && r.getLong(1) <= 10),
      s"got ${pairs.length} pairs incl ${pairs.take(3).mkString(",")}")
    assert(pairs.length === 45, s"C(10,2) planted pairs expected, got ${pairs.length}")
  }

  test("simhash maxBucket: 2,000 colliding fingerprints drop their bucket, keep the rest") {
    val s = spark
    implicit val sp: SparkSession = s
    import s.implicits._
    // 2,000 byte-identical texts (identical simhash ⇒ one degenerate
    // bucket per band) plus 2 distinct near-identical docs elsewhere
    val docs = ((1L to 2000L).map(i => (i, "the exact same degenerate text everywhere")) ++
      Seq((9001L, "completely different planted pair body alpha"),
          (9002L, "completely different planted pair body alphaz"))).toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text",
      n = 2, maxHamming = 3, maxBucket = Some(100)).collect()
    assert(pairs.forall(r => r.getLong(0) >= 9000L),
      s"degenerate bucket leaked: ${pairs.take(3).mkString(",")}")
  }

  test("cooccurrenceEdges: a group over maxGroupSize fails with the quadratic message") {
    val s = spark
    import s.implicits._
    val m = (1L to 500L).map(i => (7L, i)).toDF("g", "i")
    val e = intercept[Exception] {
      graft.pipeline.Graph.cooccurrenceEdges(m, "g", "i", maxGroupSize = 100L).collect()
    }
    assert(messages(e).exists(m => m.contains("maxGroupSize=100") &&
      m.contains("quadratic")), messages(e).mkString("; "))
  }

  test("Associations.rules: a basket over maxGroupSize fails loudly") {
    val s = spark
    import s.implicits._
    val m = (1L to 500L).map(i => (7L, i)).toDF("g", "i")
    val e = intercept[Exception] {
      graft.pipeline.Associations.rules(m, "g", "i", 0L, 1L, maxGroupSize = 100L).collect()
    }
    assert(messages(e).exists(_.contains("maxGroupSize=100")), messages(e).mkString("; "))
  }

  test("round-8 operator preconditions reject bad arguments eagerly") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 2L)).toDF("id", "c")
    intercept[IllegalArgumentException] {
      graft.operators.Sharding.assignShards(df, "id", "c", capacity = 0L)
    }
    intercept[IllegalArgumentException] {
      graft.operators.Curriculum.interleave(df, "id", "c", k = 0)
    }
    intercept[IllegalArgumentException] {
      graft.operators.Hierarchy.ancestors(df, "id", "c", maxLevels = 0)
    }
    intercept[IllegalArgumentException] {
      graft.operators.Retention.retentionMatrix(df, "id", "c", periodNanos = 0L)
    }
    intercept[IllegalArgumentException] {
      graft.operators.TimeSeries.trailingRange(df, "id", "c", "c", width = 0L)
    }
    intercept[IllegalArgumentException] {
      graft.operators.Paths.topPaths(df, "id", "c", "c", "c", 10L, k = 0)
    }
    intercept[IllegalArgumentException] {
      graft.pipeline.Dedup.prefixFilterJaccardPairs(
        Seq((1L, "a")).toDF("doc_id", "text"), "doc_id", "text", 3, 2L, 1L)
    }
    intercept[IllegalArgumentException] {
      graft.operators.SnapshotDiff.diff(df, df, "id", Seq.empty)
    }
    val docs = Seq((1L, "abcdefghijkl")).toDF("doc_id", "text")
    // minLen below the anchor gram: no span could ever hold an anchor
    intercept[IllegalArgumentException] {
      graft.pipeline.ExactSubstr.sharedSpans(docs, "doc_id", "text",
        k = 8, stride = 2, minLen = 4)
    }
    // maxDocFreq < 2 would silently drop every joinable anchor
    intercept[IllegalArgumentException] {
      graft.pipeline.ExactSubstr.sharedSpans(docs, "doc_id", "text",
        k = 4, stride = 2, minLen = 8, maxDocFreq = 1)
    }
    intercept[IllegalArgumentException] {
      graft.pipeline.ExactSubstr.spansAgainstStored(docs, "doc_id", "text",
        docs, docs.select(col("text").as("g"), col("doc_id"),
          lit(1L).as("pos")), k = 4, stride = 2, minLen = 8, maxDocFreq = 0)
    }
    intercept[IllegalArgumentException] {
      graft.pipeline.Winnowing.pairsAgainstStored(docs, "doc_id", "text",
        docs.select(lit(1L).as("fp"), col("doc_id")), k = 4, w = 2,
        minShared = 0)
    }
    intercept[IllegalArgumentException] {
      graft.pipeline.Graph.coreness(
        Seq((1L, 2L)).toDF("a", "b"), "a", "b", maxK = 0)
    }
  }

  test("Lloyd training bounds: an oversized training frame fails naming hashSample") {
    val s = spark
    import s.implicits._
    val vecs = (1L to 50L).map(i =>
      (i, Array(i.toFloat, (i % 7).toFloat))).toDF("vec_id", "embedding")
    val eK = intercept[IllegalArgumentException] {
      Similarity.kmeansCentroids(vecs, "vec_id", "embedding",
        nlist = 2, maxTrainRows = 10L)
    }
    assert(eK.getMessage.contains("maxTrainRows=10") &&
      eK.getMessage.contains("Sampling.hashSample"), eK.getMessage)
    val eE = intercept[IllegalArgumentException] {
      Similarity.euclideanCentroids(vecs, "vec_id", "embedding",
        k = 2, maxTrainRows = 10L)
    }
    assert(eE.getMessage.contains("maxTrainRows=10") &&
      eE.getMessage.contains("Sampling.hashSample"), eE.getMessage)
    val eP = intercept[IllegalArgumentException] {
      Similarity.pqCodebooks(vecs, "vec_id", "embedding",
        dim = 2, m = 2, ksub = 2, maxTrainRows = 10L)
    }
    assert(eP.getMessage.contains("maxTrainRows=10") &&
      eP.getMessage.contains("Sampling.hashSample"), eP.getMessage)
    // under the bound the same frames train fine
    assert(Similarity.kmeansCentroids(vecs, "vec_id", "embedding",
      nlist = 2, maxTrainRows = 50L).length === 2)
  }

  test("tfDotPairs head budget: work-based guard trips where a doc-count bound would not") {
    val s = spark
    import s.implicits._
    // 40 docs all sharing one stop token: tiny doc count, but the dense
    // block still implies 40·39/2·1 = 780 madds > the 500 budget
    val docs = (1L to 40L).map(i => (i, s"the w$i")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      graft.pipeline.Retrieval.tfDotPairs(docs, "doc_id", "text",
        minDot = 1L, denseDf = 20, maxHeadMadds = 500L)
    }
    assert(e.getMessage.contains("maxHeadMadds=500") &&
      e.getMessage.contains("multiply-adds"), e.getMessage)
  }

  test("tfDotPairs guard trip outside any CacheScope leaves no persisted residue") {
    // ADVICE r14: the tf persist precedes the head guards, so a trip
    // used to leak a cached frame into the session whenever the caller
    // ran outside a CacheScope. The guard path now unpersists on throw.
    val s = spark
    import s.implicits._
    val docs = (1L to 40L).map(i => (i, s"the w$i")).toDF("doc_id", "text")
    val baseline = s.sparkContext.getPersistentRDDs.keySet.toSet
    intercept[IllegalArgumentException] {
      graft.pipeline.Retrieval.tfDotPairs(docs, "doc_id", "text",
        minDot = 1L, denseDf = 20, maxHeadMadds = 500L)
    }
    val leaked = s.sparkContext.getPersistentRDDs.keySet.toSet.diff(baseline)
      .filter { id =>
        s.sparkContext.getPersistentRDDs.get(id)
          .exists(r => !r.isCheckpointed && !r.toString.contains("at localCheckpoint at"))
      }
    assert(leaked.isEmpty,
      s"tfDotPairs guard trip leaked ${leaked.size} persisted RDDs")
  }

  test("Survival time-domain bound: raw-ns durations fail naming the bucketing remedy") {
    val s = spark
    import s.implicits._
    // 2,000 distinct raw durations — a day-bucketed study has dozens; the
    // cumulative risk-set windows sort the collapsed domain on ONE task
    val subj = (1L to 2000L).map(i => (i * 1000003L, i % 2, if (i % 3 == 0) "a" else "b"))
      .toDF("dur", "event", "grp")
    val eKm = intercept[IllegalArgumentException] {
      graft.operators.Survival.kaplanMeier(subj, "dur", "event",
        maxTimePoints = 100L).collect()
    }
    assert(eKm.getMessage.contains("maxTimePoints=100") &&
      eKm.getMessage.contains("Bucket durations"), eKm.getMessage)
    val eBy = intercept[IllegalArgumentException] {
      graft.operators.Survival.kaplanMeierBy(subj, "grp", "dur", "event",
        maxTimePoints = 100L).collect()
    }
    assert(eBy.getMessage.contains("maxTimePoints=100"), eBy.getMessage)
    val eLr = intercept[IllegalArgumentException] {
      graft.operators.Survival.logRank(subj, "grp", "dur", "event",
        maxTimePoints = 100L).collect()
    }
    assert(eLr.getMessage.contains("maxTimePoints=100") &&
      eLr.getMessage.contains("single task"), eLr.getMessage)
    // bucketed to days, the same study passes under the bound
    val bucketed = subj.withColumn("dur", col("dur") / lit(86400000L))
    assert(graft.operators.Survival.kaplanMeier(bucketed, "dur", "event",
      maxTimePoints = 100L).count() > 0)
  }

  test("kCore: a deep peel hierarchy past maxIters fails naming the remedy") {
    val s = spark
    import s.implicits._
    // a 12-node chain under k=2 peels only its two endpoints per round
    // (each removal exposes the next) — 5+ rounds to empty
    val chain = (1L to 11L).map(i => (i, i + 1)).toDF("a", "b")
    val e = intercept[IllegalArgumentException] {
      graft.pipeline.Graph.kCore(chain, "a", "b", k = 2, maxIters = 2)
    }
    assert(e.getMessage.contains("maxIters") &&
      e.getMessage.contains("peel rounds"), e.getMessage)
    // with headroom the same chain converges (to the empty 2-core)
    assert(graft.pipeline.Graph.kCore(chain, "a", "b", k = 2).count() === 0)
  }

  test("exactSubstr maxOccPerDoc: a doc of repeated boilerplate fails with the quadratic message") {
    val s = spark
    import s.implicits._
    // 200 repeated chars: every sampled 8-gram recurs ~190x within one
    // doc (stride 1 samples all positions) — the o² pair explosion the
    // guard exists for
    val docs = Seq((1L, "x" * 200), (2L, "x" * 200 + "tail"))
      .toDF("doc_id", "text")
    val e = intercept[Exception] {
      graft.pipeline.ExactSubstr.sharedSpans(docs, "doc_id", "text",
        k = 8, stride = 1, minLen = 20, maxDocFreq = 10, maxOccPerDoc = 16)
        .count()
    }
    assert(e.getMessage.contains("maxOccPerDoc") &&
      e.getMessage.contains("quadratic"), e.getMessage)
    // with headroom the identical corpus runs and reports the 200-char run
    val ok = graft.pipeline.ExactSubstr.sharedSpans(docs, "doc_id", "text",
      k = 8, stride = 1, minLen = 20, maxDocFreq = 10, maxOccPerDoc = 1000)
    assert(ok.count() >= 1)
  }

  test("pairsAgainstStored: a boilerplate fingerprint across the delta is cut before the stored join") {
    val s = spark
    import s.implicits._
    // 30 delta docs carrying IDENTICAL text: every winnowing fingerprint
    // has delta-df 30, so against a stored index each hot fingerprint
    // would fan out 30 × posting-list rows — the delta-side volume the
    // index-side build cut cannot bound. With the delta cut at 5 the
    // probe emits NOTHING (the whole delta is boilerplate); with
    // headroom the same probe matches every corpus twin.
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val corpus = (1L to 4L).map(i => (i, text)).toDF("doc_id", "text")
    val idx = graft.pipeline.Winnowing.fingerprintIndex(
      corpus, "doc_id", "text", k = 8, w = 4, maxDocFreq = 100)
      .localCheckpoint(true)
    val delta = (100L to 129L).map(i => (i, text)).toDF("doc_id", "text")
    val cut = graft.pipeline.Winnowing.pairsAgainstStored(
      delta, "doc_id", "text", idx, k = 8, w = 4, minShared = 1,
      maxDocFreq = 5)
    assert(cut.count() === 0, "boilerplate delta must be cut before the join")
    val open = graft.pipeline.Winnowing.pairsAgainstStored(
      delta, "doc_id", "text", idx, k = 8, w = 4, minShared = 1)
    assert(open.count() === 30L * 4L, "with headroom every twin pair surfaces")
    spark.catalog.clearCache()
  }

  test("coreness maxK: a clique denser than the level budget fails naming the remedy") {
    val s = spark
    import s.implicits._
    // K8 clique -> coreness 7 everywhere; maxK = 3 must trip at level 4
    val clique = (for (i <- 1L to 8L; j <- (i + 1) to 8L) yield (i, j))
      .toDF("a", "b")
    val e = intercept[IllegalArgumentException] {
      graft.pipeline.Graph.coreness(clique, "a", "b", maxK = 3)
    }
    assert(e.getMessage.contains("maxK") && e.getMessage.contains("clique"),
      e.getMessage)
    // with headroom: everyone lands at coreness 7
    val c = graft.pipeline.Graph.coreness(clique, "a", "b")
      .collect().map(_.getLong(1)).toSet
    assert(c === Set(7L))
  }

  test("corenessHIndex maxIters: a long path propagates one hop per round and trips a tight budget") {
    val s = spark
    import s.implicits._
    val path = (1L to 30L).map(i => (i, i + 1)).toDF("a", "b")
    val e = intercept[IllegalArgumentException] {
      graft.pipeline.Graph.corenessHIndex(path, "a", "b", maxIters = 3)
    }
    assert(e.getMessage.contains("maxIters") &&
      e.getMessage.contains("propagation"), e.getMessage)
    // with headroom: a path is coreness 1 everywhere
    val c = graft.pipeline.Graph.corenessHIndex(path, "a", "b")
      .collect().map(_.getLong(1)).toSet
    assert(c === Set(1L))
  }

  test("logRank: zero null-variance emits null chi2, not NaN/Infinity") {
    val s = spark
    import s.implicits._
    // the only event time has a risk set of ONE subject (a censored
    // earlier), so every variance term is 0 (n_all <= 1) and cum_v = 0
    val subj = Seq((1L, 0, "a"), (2L, 1, "b")).toDF("dur", "event", "grp")
    val row = graft.operators.Survival.logRank(subj, "grp", "dur", "event")
      .select("chi2").collect()(0)
    assert(row.isNullAt(0), s"expected null chi2, got ${row.get(0)}")
  }
}
