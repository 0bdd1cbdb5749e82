package graft

import graft.pipeline.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkTestBase {

  /** Planted corpus: 3 tight clusters around orthogonal axes + one
    * near-duplicate pair (ids 1 and 101). dim=8. */
  private lazy val vecs = {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    def around(axis: Int, jitter: Double): Seq[Float] =
      (0 until 8).map(i => ((if (i == axis) 1.0 else 0.0) + jitter * rnd.nextGaussian()).toFloat)
    val base = around(0, 0.0)
    val rows =
      Seq((1L, base)) ++
      Seq((101L, base.map(x => x + 0.001f))) ++ // near-dup of 1
      (2L to 20L).map(i => (i, around((i % 3).toInt, 0.05))) :+
      (200L, around(7, 0.05))
    rows.toDF("vec_id", "embedding")
  }

  test("bruteForceTopK: the near-duplicate is every query's top neighbor") {
    val out = Similarity.bruteForceTopK(
      vecs.filter(col("vec_id") === 1L), vecs, "vec_id", "embedding", k = 3)
      .orderBy(desc("sim")).collect()
    assert(out.head.getLong(1) === 101L)
    assert(out.head.getDouble(2) > 0.999)
    assert(out.length === 3)
  }

  test("bruteForceTopK returns exactly k rows per query, self excluded") {
    val out = Similarity.bruteForceTopK(
      vecs.filter(col("vec_id") <= 3L), vecs, "vec_id", "embedding", k = 5)
      .collect()
    assert(out.length === 15)
    assert(!out.exists(r => r.getLong(0) == r.getLong(1)))
  }

  test("lshTopK finds the planted near-duplicate as top-1") {
    val out = Similarity.lshTopK(
      vecs.filter(col("vec_id") === 1L), vecs, "vec_id", "embedding",
      k = 3, dim = 8)
      .orderBy(desc("sim")).collect()
    assert(out.nonEmpty)
    assert(out.head.getLong(1) === 101L)
  }

  test("lshTopK top-1 agrees with brute force on clustered queries") {
    val queries = vecs.filter(col("vec_id").isin(1L, 2L, 3L, 4L))
    def top1(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(desc("sim"), col("neighbor_id"))))
      .filter(col("rn") === 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bf = top1(Similarity.bruteForceTopK(queries, vecs, "vec_id", "embedding", 3))
    val lsh = top1(Similarity.lshTopK(queries, vecs, "vec_id", "embedding", 3, dim = 8))
    // clustered vectors share buckets with their nearest neighbor
    assert(lsh === bf)
  }

  test("cosineNearDupPairs matches all-pairs ground truth at 0.999") {
    val pairs = Similarity.cosineNearDupPairs(
      vecs, "vec_id", "embedding", threshold = 0.999, dim = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // ground truth: exact all-pairs cosine on the tiny fixture
    val rows = vecs.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble))
    def cos(a: Seq[Double], b: Seq[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val truth = (for {
      (i, vi) <- rows; (j, vj) <- rows
      if i < j && cos(vi, vj) >= 0.999
    } yield (i, j)).toSet
    assert(pairs === truth)
    assert(pairs.contains((1L, 101L)))
  }

  test("ivfTopK finds the planted near-duplicate and agrees with brute force top-1") {
    val queries = vecs.filter(col("vec_id").isin(1L, 2L, 3L))
    def top1(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(desc("sim"), col("neighbor_id"))))
      .filter(col("rn") === 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bf = top1(Similarity.bruteForceTopK(queries, vecs, "vec_id", "embedding", 3))
    val ivf = top1(Similarity.ivfTopK(queries, vecs, "vec_id", "embedding", 3,
      dim = 8, nlist = 4, nprobe = 2))
    assert(ivf === bf)
    assert(ivf(1L) === 101L) // the planted near-dup shares its query's cell
  }

  test("ivfAssign is deterministic and covers all cells within range") {
    val cents = Similarity.ivfCentroids(8, 4)
    val cells = vecs.select(Similarity.ivfAssign(
      col("embedding").cast("array<double>"), cents).as("c"))
      .collect().map(_.getInt(0)).toSeq
    assert(cells.forall(c => c >= 0 && c < 4))
    val again = vecs.select(Similarity.ivfAssign(
      col("embedding").cast("array<double>"), cents).as("c"))
      .collect().map(_.getInt(0)).toSeq
    assert(cells === again)
  }

  test("kmeansCentroids: trained cells co-locate clusters and keep IVF exact on the fixture") {
    val cents = Similarity.kmeansCentroids(vecs, "vec_id", "embedding", nlist = 4, iters = 3)
    assert(cents.length === 4)
    // spherical variant: every non-degenerate centroid is unit-norm
    cents.foreach { c =>
      val n = math.sqrt(c.map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-9)
    }
    // same-cluster vectors land in the same trained cell
    val cells = vecs.select(col("vec_id"), Similarity.ivfAssign(
      col("embedding").cast("array<double>"), cents).as("c"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(cells(1L) === cells(101L)) // planted near-dup shares the cell
    // axis-1 cluster members agree with each other (axis 0 may split:
    // two of the four lowest-id init seeds are axis-0 vectors)
    val axis1 = Seq(4L, 7L, 10L, 13L).map(cells)
    assert(axis1.distinct.size === 1)
    // trained IVF agrees with brute force top-1 on clustered queries
    val queries = vecs.filter(col("vec_id").isin(1L, 2L, 3L))
    def top1(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(desc("sim"), col("neighbor_id"))))
      .filter(col("rn") === 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bf = top1(Similarity.bruteForceTopK(queries, vecs, "vec_id", "embedding", 3))
    val ivf = top1(Similarity.ivfTopK(queries, vecs, "vec_id", "embedding", 3,
      dim = 8, nlist = 4, nprobe = 2, centroids = Some(cents)))
    assert(ivf === bf)
    // deterministic across invocations
    val again = Similarity.kmeansCentroids(vecs, "vec_id", "embedding", nlist = 4, iters = 3)
    assert(cents.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }

  test("semanticDedup matches brute-force pairs + components on the planted corpus") {
    // one centroid per planted axis so cells == true clusters (k-means from
    // this corpus's lowest-id seeds would start 3 of 4 centroids inside the
    // axis-0 clique and split it — the known bad-init failure mode the
    // q_semdedup entry fixture avoids by seeding one vector per cluster)
    def axis(a: Int) = Array.tabulate(8)(i => if (i == a) 1.0 else 0.0)
    val cents = Array(axis(0), axis(1), axis(2), axis(7))
    val sem = Similarity.semanticDedup(vecs, "vec_id", "embedding",
      threshold = 0.99, centroids = cents)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    val exactPairs = Similarity.bruteForcePairs(vecs, "vec_id", "embedding", 0.99)
      .select(col("id1"), col("id2"))
    val exact = graft.pipeline.Dedup.dupClusters(
      vecs.select(col("vec_id")), "vec_id", exactPairs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(sem === exact)
    // the planted near-dup pair collapsed: 101 lost to survivor 1
    assert(sem(101L) === (1L, false))
    assert(sem(1L) === (1L, true))
  }

  test("semanticDedup FAILS on a degenerate cell instead of going quadratic") {
    // one centroid = every vector lands in one cell; with maxCellSize
    // below the corpus size the job must raise (assert_true in the
    // assignment plan), not silently run the quadratic within-cell join
    def axis(a: Int) = Array.tabulate(8)(i => if (i == a) 1.0 else 0.0)
    val oneCell = Array(axis(0))
    val e = intercept[Exception] {
      Similarity.semanticDedup(vecs, "vec_id", "embedding",
        threshold = 0.99, centroids = oneCell, maxCellSize = 10).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("maxCellSize")), e.toString)
    // and the same corpus passes untouched when the bound is adequate
    val ok = Similarity.semanticDedup(vecs, "vec_id", "embedding",
      threshold = 0.99, centroids = oneCell, maxCellSize = 1 << 16)
    assert(ok.count() === vecs.count())
  }

  test("lshSignature is deterministic across invocations") {
    val planes = Similarity.hyperplanes(8, 12)
    val s1 = vecs.select(Similarity.lshSignature(
      col("embedding").cast("array<double>"), planes)).collect().map(_.getInt(0)).toSeq
    val s2 = vecs.select(Similarity.lshSignature(
      col("embedding").cast("array<double>"), planes)).collect().map(_.getInt(0)).toSeq
    assert(s1 === s2)
  }

  test("quantizeInt8: hand-computed codes, truncation toward zero, zero-vector guard") {
    val s = spark
    import s.implicits._
    val vecs = Seq(
      (1L, Array(2.0f, -1.0f, 0.5f)), // scale 63.5 -> codes 127, -63, 31
      (2L, Array(0.0f, 0.0f, 0.0f)),  // zero vector: scale 0, codes 0
      (3L, Array(-4.0f))              // scale 31.75 -> code -127
    ).toDF("vec_id", "embedding")
    val got = Similarity.quantizeInt8(vecs, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got(1L) === ((63.5, 127L - 63L + 31L, -63L, 127L)))
    assert(got(2L) === ((0.0, 0L, 0L, 0L)))
    assert(got(3L) === ((31.75, -127L, -127L, -127L)))
  }

  // 3 well-separated axis clusters in 8 dims, 20 vectors each; queries are
  // one member per cluster. With separated clusters rank-recall IS
  // well-posed and PQ must hit it exactly.
  private def separated = {
    val s = spark
    import s.implicits._
    (0 until 60).map { i =>
      val c = i % 3
      val base = Array.fill(8)(0.05 * ((i * 7 + 3) % 5))
      base(c * 2) += 10.0; base(c * 2 + 1) += 5.0 + 0.01 * i
      (i.toLong, base)
    }.toDF("vec_id", "embedding")
  }

  test("pqEncode: codes in [0, ksub), deterministic across runs") {
    val books = Similarity.pqCodebooks(separated, "vec_id", "embedding",
      dim = 8, m = 4, ksub = 4, iters = 2)
    def codes() = Similarity.pqEncode(separated, "vec_id", "embedding", 8, books)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val c1 = codes()
    assert(c1.values.forall(_.forall(c => c >= 0 && c < 4)))
    assert(c1 === codes())
  }

  test("pqTopK: exact rank-recall 1.0 on well-separated clusters") {
    val queries = separated.filter(org.apache.spark.sql.functions.col("vec_id") < 3)
    val exact = Similarity.bruteForceTopK(queries, separated, "vec_id", "embedding", k = 5)
    val approx = Similarity.pqTopK(queries, separated, "vec_id", "embedding",
      k = 5, dim = 8, m = 4, ksub = 8, iters = 3, rerank = 20)
    val rec = Similarity.recallPerQuery(approx, exact)
      .collect().map(_.getDouble(1))
    assert(rec.length === 3 && rec.forall(_ === 1.0), rec.toSeq)
  }

  test("ivfPqTopK: rank-recall 1.0 on separated clusters (cells + codes + rerank)") {
    val queries = separated.filter(org.apache.spark.sql.functions.col("vec_id") < 3)
    val exact = Similarity.bruteForceTopK(queries, separated, "vec_id", "embedding", k = 5)
    val approx = Similarity.ivfPqTopK(queries, separated, "vec_id", "embedding",
      k = 5, dim = 8, nlist = 3, nprobe = 2, m = 4, ksub = 8, iters = 3,
      rerank = 20)
    val rec = Similarity.recallPerQuery(approx, exact)
      .collect().map(_.getDouble(1))
    assert(rec.length === 3 && rec.forall(_ === 1.0), rec.toSeq)
  }

  test("epsilonRecallPerQuery: neighbors as-good-as count, worse ones don't") {
    val s = spark
    import s.implicits._
    val exact = Seq((1L, 10L, 0.99), (1L, 11L, 0.98)).toDF("query_id", "neighbor_id", "sim")
    // approx returns a different row at 0.9795 (within eps of 0.98) and a
    // genuinely worse one at 0.90
    val approx = Seq((1L, 12L, 0.9795), (1L, 13L, 0.90)).toDF("query_id", "neighbor_id", "sim")
    val r = Similarity.epsilonRecallPerQuery(approx, exact, eps = 1e-3)
      .collect()(0).getDouble(1)
    assert(r === 0.5)
  }

  test("epsilonRecallPerQuery: a query with NO approximate rows scores 0.0, not absent") {
    val s = spark
    import s.implicits._
    val exact = Seq((1L, 10L, 0.99), (2L, 20L, 0.95))
      .toDF("query_id", "neighbor_id", "sim")
    // query 2 returned nothing approximate — an inner join would drop it
    // and overstate any recall average over the returned rows
    val approx = Seq((1L, 10L, 0.99)).toDF("query_id", "neighbor_id", "sim")
    val r = Similarity.epsilonRecallPerQuery(approx, exact, eps = 1e-3)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r === Map(1L -> 1.0, 2L -> 0.0))
  }

  test("euclideanCentroids pinned: identical to pqCodebooks' joint loop at m=1") {
    val s = spark
    import s.implicits._
    // same init (first-k by id), same assignment arithmetic, same
    // deterministic partial fold — the m=1 joint loop IS the
    // single-space euclidean Lloyd loop, so the outputs must match
    // exactly (this pins the otherwise standalone euclideanCentroids)
    val vecs = (1L to 60L).map { i =>
      val c = (i % 3).toDouble
      (i, Array((10 * c + i % 5).toFloat, (i % 7).toFloat))
    }.toDF("vec_id", "embedding")
    val eu = Similarity.euclideanCentroids(vecs, "vec_id", "embedding", k = 3, iters = 4)
    val pq = Similarity.pqCodebooks(vecs, "vec_id", "embedding",
      dim = 2, m = 1, ksub = 3, iters = 4)(0)
    assert(eu.length === 3)
    assert(eu.map(_.toSeq).toSeq === pq.map(_.toSeq).toSeq)
    // and the centroids separate the three planted value bands
    assert(eu.map(_.head).distinct.length === 3)
  }

  test("dimMinMax + minMaxScale: corpus scaled to [0,1], constant dim to 0.0") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Seq(0.0f, 5.0f, 7.0f)),
      (2L, Seq(10.0f, 5.0f, 3.0f)),
      (3L, Seq(5.0f, 5.0f, 11.0f))).toDF("vec_id", "embedding")
    val fit = Similarity.dimMinMax(df, "embedding")
    val f = fit.collect().map(r => r.getInt(0) ->
      (r.getDouble(1), r.getDouble(2), r.getLong(3))).toMap
    assert(f(0) === ((0.0, 10.0, 3L)))
    assert(f(1) === ((5.0, 5.0, 3L))) // constant dimension
    assert(f(2) === ((3.0, 11.0, 3L)))
    val got = Similarity.minMaxScale(df, "vec_id", "embedding", fit)
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Double](1).toSeq).toMap
    assert(got(1L) === Seq(0.0, 0.0, 0.5))
    assert(got(2L) === Seq(1.0, 0.0, 0.0))
    assert(got(3L) === Seq(0.5, 0.0, 1.0))
  }

  test("minMaxScale: a ragged coordinate beyond the fit maps to NULL, not 0") {
    val s = spark
    import s.implicits._
    val fitDf = Seq((1L, Seq(0.0f, 2.0f))).toDF("vec_id", "embedding")
    val fit = Similarity.dimMinMax(
      Seq((1L, Seq(0.0f, 0.0f)), (2L, Seq(4.0f, 2.0f)))
        .toDF("vec_id", "embedding"), "embedding")
    val ragged = Seq((9L, Seq(2.0f, 1.0f, 99.0f))).toDF("vec_id", "embedding")
    val row = Similarity.minMaxScale(ragged, "vec_id", "embedding", fit)
      .collect()(0)
    val xs = row.getSeq[Any](1)
    assert(xs(0) === 0.5 && xs(1) === 0.5)
    assert(xs(2) === null, "coordinate beyond fitted dims must be NULL")
  }

  test("minMaxScale: an EMPTY fit is rejected loudly, not a silent no-op") {
    val s = spark
    import s.implicits._
    val emptyFit = Similarity.dimMinMax(
      Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding"), "embedding")
    val df = Seq((1L, Seq(0.0f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.minMaxScale(df, "vec_id", "embedding", emptyFit)
    }
    assert(e.getMessage.contains("EMPTY"))
  }

  test("minMaxScale: a fit wider than maxDim is rejected loudly") {
    val s = spark
    import s.implicits._
    val wide = (0 until 10).map(i => (i, 0.0, 1.0)).toDF("pos", "vmin", "vmax")
    val df = Seq((1L, Seq(0.0f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.minMaxScale(df, "vec_id", "embedding", wide, maxDim = 4)
    }
    assert(e.getMessage.contains("maxDim"))
  }

  test("annIndexBuild/Probe: the stored-artifact probe equals the monolithic ivfPqTopK exactly") {
    val dir = java.nio.file.Files.createTempDirectory("ann_idx_spec").toString
    val corpus = separated
    val queries = corpus.filter(col("vec_id") < 3)
    val (cdf, bdf, adf) = Similarity.annIndexBuild(corpus, "vec_id", "embedding",
      dim = 8, nlist = 3, m = 4, ksub = 8, iters = 3)
    cdf.write.mode("overwrite").parquet(s"$dir/centroids")
    bdf.write.mode("overwrite").parquet(s"$dir/codebooks")
    adf.write.mode("overwrite").parquet(s"$dir/assignments")
    val centsDf = spark.read.parquet(s"$dir/centroids")
    val booksDf = spark.read.parquet(s"$dir/codebooks")
    val fromArtifacts = Similarity.annIndexProbe(queries, "vec_id", "embedding",
      centsDf, booksDf, spark.read.parquet(s"$dir/assignments"),
      rerankVecs = corpus, k = 5, dim = 8, nprobe = 2, rerank = 20)
    val mono = Similarity.ivfPqTopK(queries, corpus, "vec_id", "embedding",
      k = 5, dim = 8, nlist = 3, nprobe = 2, m = 4, ksub = 8, rerank = 20,
      centroids = Some(Similarity.loadCentroids(centsDf)),
      codebooks = Some(Similarity.loadCodebooks(booksDf)))
    // bit-exact both ways: doubles round-trip parquet exactly, both paths
    // share the one ADC body
    assert(fromArtifacts.exceptAll(mono).isEmpty && mono.exceptAll(fromArtifacts).isEmpty)
    assert(fromArtifacts.count() === 15)
  }

  test("annIndexAppend + annApplyTombstones: maintained index probes identically to a one-shot re-encode") {
    val dir = java.nio.file.Files.createTempDirectory("ann_maint_spec").toString
    val corpus = separated
    val corpus0 = corpus.filter(col("vec_id") % 4 =!= 1)
    val delta = corpus.filter(col("vec_id") % 4 === 1)
    val tomb = corpus.filter(col("vec_id") % 5 === 2)
      .select(col("vec_id").as("neighbor_id"))
    val (cdf, bdf, adf) = Similarity.annIndexBuild(corpus0, "vec_id",
      "embedding", dim = 8, nlist = 3, m = 4, ksub = 8, iters = 3)
    cdf.write.mode("overwrite").parquet(s"$dir/centroids")
    bdf.write.mode("overwrite").parquet(s"$dir/codebooks")
    adf.write.mode("overwrite").partitionBy("cell").parquet(s"$dir/assignments")
    val centsDf = spark.read.parquet(s"$dir/centroids")
    val booksDf = spark.read.parquet(s"$dir/codebooks")
    Similarity.annIndexAppend(delta, "vec_id", "embedding",
        centsDf, booksDf, dim = 8)
      .write.mode("append").partitionBy("cell").parquet(s"$dir/assignments")
    val maintained = Similarity.annApplyTombstones(
      spark.read.parquet(s"$dir/assignments"), tomb)
    val live = corpus.join(tomb.select(col("neighbor_id").as("vec_id")),
      Seq("vec_id"), "left_anti")
    val queries = corpus.filter(col("vec_id") < 3)
      .select((col("vec_id") + 1000L).as("vec_id"), col("embedding"))
    val viaMaint = Similarity.annIndexProbe(queries, "vec_id", "embedding",
      centsDf, booksDf, maintained, rerankVecs = live,
      k = 5, dim = 8, nprobe = 2, rerank = 20)
    // the gate: maintenance (append files + tombstone anti-join) must be
    // invisible to the math — identical rows to a one-shot re-encode of
    // the whole live corpus with the same stored parameters
    val reenc = Similarity.annIndexAppend(live, "vec_id", "embedding",
      centsDf, booksDf, dim = 8)
    val viaReenc = Similarity.annIndexProbe(queries, "vec_id", "embedding",
      centsDf, booksDf, reenc, rerankVecs = live,
      k = 5, dim = 8, nprobe = 2, rerank = 20)
    assert(viaMaint.exceptAll(viaReenc).isEmpty &&
      viaReenc.exceptAll(viaMaint).isEmpty)
    assert(viaMaint.count() === 15)
    // tombstoned ids are truly gone from the candidate set
    val tombIds = tomb.collect().map(_.getLong(0)).toSet
    assert(viaMaint.collect().forall(r => !tombIds.contains(r.getLong(1))))
    // COMPACTION: physically rewriting the artifact with the tombstones
    // folded in (maintained frame -> new partitioned path, tombstone
    // frame resets) probes identically — compaction is a storage event,
    // never a semantic one
    maintained.select(col("neighbor_id"), col("cell"), col("codes"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$dir/assignments_compacted")
    val viaCompacted = Similarity.annIndexProbe(queries, "vec_id", "embedding",
      centsDf, booksDf, spark.read.parquet(s"$dir/assignments_compacted"),
      rerankVecs = live, k = 5, dim = 8, nprobe = 2, rerank = 20)
    assert(viaCompacted.exceptAll(viaMaint).isEmpty &&
      viaMaint.exceptAll(viaCompacted).isEmpty)
  }

  test("loadCentroids/loadCodebooks: empty, holey, and oversized artifacts fail loudly") {
    val s = spark
    import s.implicits._
    val empty = Seq.empty[(Int, Seq[Double])].toDF("cell", "centroid")
    assert(intercept[IllegalArgumentException] {
      Similarity.loadCentroids(empty)
    }.getMessage.contains("empty"))
    val holey = Seq((0, Seq(1.0)), (2, Seq(2.0))).toDF("cell", "centroid")
    assert(intercept[IllegalArgumentException] {
      Similarity.loadCentroids(holey)
    }.getMessage.contains("missing"))
    val big = (0 until 10).map(i => (i, Seq(1.0))).toDF("cell", "centroid")
    assert(intercept[IllegalArgumentException] {
      Similarity.loadCentroids(big, maxCells = 4)
    }.getMessage.contains("maxCells"))
    val holeyBooks = Seq((0, 0, Seq(1.0)), (1, 1, Seq(2.0))).toDF("s", "code", "centroid")
    assert(intercept[IllegalArgumentException] {
      Similarity.loadCodebooks(holeyBooks)
    }.getMessage.contains("missing"))
    // a corrupted id must fail BEFORE sizing the driver array — one row
    // with cell = 10^9 would otherwise allocate gigabytes
    val corrupt = Seq((0, Seq(1.0)), (1000000000, Seq(2.0))).toDF("cell", "centroid")
    assert(intercept[IllegalArgumentException] {
      Similarity.loadCentroids(corrupt)
    }.getMessage.contains("out-of-range"))
  }

  test("annIndexProbe rejects a dim that does not match the artifacts (silent-truncation guard)") {
    val corpus = separated
    val (cdf, bdf, adf) = Similarity.annIndexBuild(corpus, "vec_id", "embedding",
      dim = 8, nlist = 3, m = 4, ksub = 8, iters = 1)
    // 16 % 4 == 0 passes the divisibility check alone — the dimension
    // match is what catches it
    val e = intercept[IllegalArgumentException] {
      Similarity.annIndexProbe(corpus.limit(1), "vec_id", "embedding",
        cdf, bdf, adf, rerankVecs = corpus, k = 2, dim = 16, nprobe = 2, rerank = 5)
    }
    assert(e.getMessage.contains("8-dimensional"), e.getMessage)
  }

  test("nearDupAgainstStored recovers exactly the cross pairs; batch-split-invariant") {
    val corpus = vecs.filter(col("vec_id") <= 20L) // includes id 1 (base)
    val delta = vecs.filter(col("vec_id") > 20L)   // 101 (near-dup of 1) + 200
    val idx = Similarity.embedBandIndex(corpus, "vec_id", "embedding",
      dim = 8, numPlanes = 16, bands = 8)
    def rows(nd: org.apache.spark.sql.DataFrame) =
      Similarity.nearDupAgainstStored(nd, "vec_id", "embedding", corpus, idx,
        threshold = 0.999, dim = 8, numPlanes = 16, bands = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val whole = rows(delta)
    // exact baseline: every cross pair at the threshold (computed, not
    // hardcoded — the jittered cluster can legitimately put a second
    // corpus vector inside 0.999 of the near-dup)
    val exact = delta.as("n").crossJoin(corpus.as("c"))
      .select(col("n.vec_id").as("nid"), col("c.vec_id").as("cid"),
        (Similarity.dotd(col("n.embedding").cast("array<double>"),
          col("c.embedding").cast("array<double>")) /
          (sqrt(Similarity.dotd(col("n.embedding").cast("array<double>"),
            col("n.embedding").cast("array<double>"))) *
           sqrt(Similarity.dotd(col("c.embedding").cast("array<double>"),
             col("c.embedding").cast("array<double>"))))).as("sim"))
      .filter(col("sim") >= 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(whole === exact, s"probe $whole != exact cross pairs $exact")
    assert(whole.contains((101L, 1L)), "the planted near-dup must be caught")
    // identical-vector recall is structural: same vector -> same signature
    val unioned = rows(delta.filter(col("vec_id") % 2 === 0)) ++
      rows(delta.filter(col("vec_id") % 2 === 1))
    assert(whole === unioned, "batch split changed the stored-index probe")
  }

  test("embedBandIndex build-time bucket guard trips on a degenerate pile-up") {
    val s = spark
    import s.implicits._
    val same = (1L to 50L).map(i => (i, Seq.fill(8)(1.0f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Similarity.embedBandIndex(same, "vec_id", "embedding",
        dim = 8, numPlanes = 16, bands = 8, maxBucket = 10).count()
    }
    assert(e.getMessage != null && e.getMessage.contains("maxBucket"),
      s"expected the bucket guard message, got: ${e.getMessage}")
  }

  test("oracle-parity guard: the embed-stream fixture's max bucket sits far under the default cuts") {
    // q_embed_neardup_stream's oracle does not model the maxBucket /
    // maxNewBucket cuts — parity rests on the fixture's bucket sizes
    // staying far under the 65536 defaults. Executable on every
    // available SF, 10x margin (same discipline as WinnowingSpec's df
    // guard).
    val dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
      .filter(d => java.nio.file.Files.isDirectory(java.nio.file.Paths.get(d)))
    assert(dirs.nonEmpty, "no testdata fixture present")
    dirs.foreach { d =>
      val e = spark.read.parquet(s"$d/embeddings.parquet")
        .filter(col("vec_id") < 200)
        .select(col("vec_id"), col("embedding").cast("array<double>"))
      val maxBucket = Similarity.embedBandIndex(e, "vec_id", "embedding",
          dim = 64, numPlanes = 16, bands = 8)
        .groupBy("band", "bkey").agg(count(lit(1)).as("n"))
        .agg(max(col("n"))).head().getLong(0)
      assert(maxBucket < 6554,
        s"$d: max band bucket $maxBucket is within 10x of the 65536 cut — " +
          "the stream entry's oracle no longer models the probe")
    }
  }
}
