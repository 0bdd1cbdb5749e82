package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** Conformance for the sketch-guided / runtime-filter two-pass
  * operators: exact heavy hitters and the Bloom-pruned join. */
class TwoPassOpsSpec extends SparkTestBase {
  private val s = spark
  import s.implicits._

  test("heavy hitters: exact counts, relative cut, no false negatives") {
    // key 1: 500 rows (50%), key 2: 300 (30%), keys 3..102: 2 each
    val df = (Seq.fill(500)(1L) ++ Seq.fill(300)(2L) ++
      (3L to 102L).flatMap(k => Seq(k, k))).toDF("k")
    val out = HeavyHitters.exactHeavyHitters(df, "k",
        support = 0.05, thresholdNum = 1L, thresholdDen = 10L)
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[Long]("n")).toMap
    assert(out === Map(1L -> 500L, 2L -> 300L))
  }

  test("heavy hitters: support wider than threshold is rejected") {
    val df = Seq(1L, 1L, 2L).toDF("k")
    intercept[IllegalArgumentException] {
      HeavyHitters.exactHeavyHitters(df, "k", 0.5, 1L, 10L)
    }
  }

  test("bloom join matches the plain join exactly") {
    val fact = (1L to 1000L).map(i => (i, i % 50)).toDF("fid", "fk")
    val dim = (0L to 49L).filter(_ % 7 == 0).map(k => (k, s"d$k")).toDF("dk", "name")
    val got = BloomJoin.bloomPrunedJoin(fact, dim, "fk", "dk", 64L, 1024L)
      .select("fid", "name").as[(Long, String)].collect().toSet
    val want = fact.join(dim, fact("fk") === dim("dk"))
      .select("fid", "name").as[(Long, String)].collect().toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("bloom prefilter drops non-candidate rows before the join") {
    val fact = (1L to 1000L).map(i => (i, i % 50)).toDF("fid", "fk")
    val dim = Seq((7L, "d7")).toDF("dk", "name")
    // with one dim key the prefiltered fact side must be ~20 rows, not
    // 1000 — count the filter's survivors directly
    val bloom = dim.agg(graft.functions.BloomFunctions
      .bloomFilterAgg(col("dk"), 64L, 1024L)).head.getAs[Array[Byte]](0)
    val survivors = fact.filter(
      graft.functions.BloomFunctions.mightContain(bloom, col("fk"))).count()
    assert(survivors >= 20L && survivors < 100L) // exact 20 + rare FPs
  }

  test("joinDelta: 3-term algebra equals full-join-minus-old on random multisets") {
    val s = spark
    import s.implicits._
    import graft.operators.IncrementalAgg
    val rnd = new scala.util.Random(31)
    def mk(n: Int, tag: String, vcol: String) = (1 to n)
      .map(i => (rnd.nextInt(12).toLong, s"$tag$i")).toDF("k", vcol)
    val (aOld, aDelta) = (mk(40, "ao", "va"), mk(15, "ad", "va"))
    val (bOld, bDelta) = (mk(35, "bo", "vb"), mk(10, "bd", "vb"))
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sorted.toSeq
    val incremental = rows(
      aOld.join(bOld, Seq("k")).unionByName(
        IncrementalAgg.joinDelta(aOld, aDelta, bOld, bDelta, Seq("k"))))
    val recompute = rows(
      aOld.unionByName(aDelta).join(bOld.unionByName(bDelta), Seq("k")))
    // MULTISET equality (sorted seqs): a dropped or double-counted
    // delta term changes multiplicities even when the set survives
    assert(incremental === recompute)
    assert(incremental.nonEmpty)
    intercept[IllegalArgumentException](
      IncrementalAgg.joinDelta(aOld, aDelta, bOld, bDelta, Nil))
  }

  test("Observed: in-flight metrics match, pre-filter vantage, loud failures") {
    val s = spark
    import s.implicits._
    import graft.operators.Observed
    val df = Seq((1L, 10L), (2L, 30L), (3L, 50L)).toDF("id", "v")
    val (observed, obs) = Observed.audit(df, "t1",
      count(lit(1)).as("n"), sum(when(col("v") > 20, 1L).otherwise(0L)).as("big"))
    // the observation sees rows BEFORE the downstream filter
    assert(observed.filter(col("v") > 20).count() === 2L)
    val row = Observed.metricsRow(s, obs, Seq("n", "big")).collect()(0)
    assert(row.getLong(0) === 3L && row.getLong(1) === 2L)
    // a metric name that was never attached fails loudly
    val (o2, obs2) = Observed.audit(df, "t2", count(lit(1)).as("n"))
    o2.count()
    val e = intercept[IllegalStateException] {
      Observed.metricsRow(s, obs2, Seq("nope"))
    }
    assert(e.getMessage.contains("missing"))
    // a non-integral metric is rejected rather than silently coerced
    val (o3, obs3) = Observed.audit(df, "t3", avg(col("v")).as("m"))
    o3.count()
    val e2 = intercept[IllegalStateException] {
      Observed.metricsRow(s, obs3, Seq("m"))
    }
    assert(e2.getMessage.contains("integral"))
  }
}
