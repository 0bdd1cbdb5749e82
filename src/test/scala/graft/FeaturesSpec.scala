package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.functions.{FeatureFunctionHelpers, FeatureFunctions}
import graft.pipeline.Features

class FeaturesSpec extends SparkTestBase {

  test("polyHash16 matches the spec arithmetic, truncates at 16 chars, null-safe") {
    val s = spark
    import s.implicits._
    def ref(s: String): Long =
      s.take(16).zipWithIndex.map { case (c, i) =>
        c.toLong * FeatureFunctionHelpers.Weights(i)
      }.sum
    val samples = Seq("", "a", "ab", "spark", "0123456789abcdef",
      "0123456789abcdefEXTRA-IGNORED", "with space|3")
    val got = samples.toDF("s")
      .select(FeatureFunctions.polyHash16(col("s")).as("h"))
      .as[Long].collect()
    assert(got.toSeq == samples.map(ref))
    // 17th+ char must not matter
    assert(ref("0123456789abcdef") == ref("0123456789abcdefZZZ"))
    val withNull = Seq(Some("x"), None).toDF("s")
      .select(FeatureFunctions.polyHash16(col("s")).as("h"))
      .collect()
    assert(withNull(1).isNullAt(0))
    // SQL-name access via ensure()
    FeatureFunctions.ensure(spark)
    assert(spark.sql("SELECT poly_hash16('spark') AS h").as[Long].head() == ref("spark"))
  }

  test("quantileBin: equal frequency, order-respecting, exact sizes") {
    val s = spark
    import s.implicits._
    val df = (1 to 103).map(i => ((i * 37) % 103, i.toLong)).toDF("v", "id")
    val binned = Features.quantileBin(df, col("v"), col("id"), 4)
    val sizes = binned.groupBy("bin").count().orderBy("bin")
      .as[(Int, Long)].collect()
    assert(sizes.map(_._1).toSeq == Seq(0, 1, 2, 3))
    assert(sizes.map(_._2).sum == 103)
    assert(sizes.map(_._2).max - sizes.map(_._2).min <= 1)
    // bins respect the value order: max of bin b <= min of bin b+1
    val bounds = binned.groupBy("bin")
      .agg(min("v").as("lo"), max("v").as("hi")).orderBy("bin")
      .as[(Int, Int, Int)].collect()
    bounds.sliding(2).foreach {
      case Array((_, _, hi), (_, lo, _)) => assert(hi <= lo)
      case _ =>
    }
  }

  test("standardize: integer-exact grouped z-scores; zero-variance group -> 0") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L),
      ("b", 7L), ("b", 7L), ("b", 7L)).toDF("g", "x")
    val z = Features.standardize(df, Seq("g"), "x").orderBy("g", "x")
      .select("g", "x", "zscore").as[(String, Long, Double)].collect()
    // group a: n=4 S1=10 S2=30; z = (4x-10)/sqrt(4*30-100) = (4x-10)/sqrt(20)
    val exp = Seq(1L, 2L, 3L, 4L).map(x => (4.0 * x - 10.0) / math.sqrt(20.0))
    val gotA = z.filter(_._1 == "a").map(_._3).toSeq
    assert(gotA == exp) // bit-exact, not approx
    assert(z.filter(_._1 == "b").forall(_._3 == 0.0))
    // ungrouped path
    val all = Features.standardize(df.select("x"), Nil, "x")
    assert(all.count() == 7)
    assert(math.abs(all.agg(sum("zscore")).as[Double].head()) < 1e-9)
  }

  test("targetEncode: smoothing pulls toward the global mean") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("hot", 1), ("hot", 1), ("hot", 1), ("hot", 0),
      ("cold", 0), ("cold", 0), ("cold", 1),
      ("rare", 1)).toDF("cat", "y")
    val enc = Features.targetEncode(df, "cat", col("y") === 1, 2L)
      .orderBy("cat").as[(String, Long, Long, Double)].collect()
    val n = 8.0; val tot = 5.0; val gm = tot / n
    def expected(ng: Long, sg: Long) = (sg + 2 * gm) / (ng + 2.0)
    val m = enc.map(r => r._1 -> r).toMap
    assert(math.abs(m("hot")._4 - expected(4, 3)) < 1e-12)
    assert(math.abs(m("cold")._4 - expected(3, 1)) < 1e-12)
    // the rare single-positive category is pulled well below its raw
    // mean 1.0, toward (but still above) the global mean
    assert(math.abs(m("rare")._4 - expected(1, 1)) < 1e-12)
    assert(m("rare")._4 < 0.8 && m("rare")._4 > gm)
  }

  test("hashedFeatures: signed bucket sums match a driver-side replay") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "alpha beta alpha  gamma"),
      (2L, ""), (3L, "delta")).toDF("id", "text")
    val got = Features.hashedFeatures(docs, "id", "text", 8)
      .orderBy("id", "bucket").as[(Long, Long, Long, Long)].collect()
    def h(t: String): Long =
      t.take(16).zipWithIndex.map { case (c, i) =>
        c.toLong * FeatureFunctionHelpers.Weights(i)
      }.sum
    val ref = Seq(1L -> "alpha beta alpha  gamma", 3L -> "delta")
      .flatMap { case (id, text) =>
        text.split(" ").filter(_.nonEmpty).map { t =>
          val hv = h(t); (id, hv % 8, if (hv % 2 == 0) 1L else -1L)
        }
      }
      .groupBy(x => (x._1, x._2)).toSeq
      .map { case ((id, b), xs) => (id, b, xs.map(_._3).sum, xs.size.toLong) }
      .sortBy(x => (x._1, x._2))
    assert(got.toSeq == ref)
    // empty doc contributes no rows
    assert(!got.exists(_._1 == 2L))
  }

  test("indexEncode: frequency rank with deterministic ties and rare collapse") {
    val s = spark
    import s.implicits._
    val df = (Seq.fill(5)("x") ++ Seq.fill(3)("b") ++ Seq.fill(3)("a") ++
      Seq("rare1", "rare2")).toDF("cat")
    val m = Features.indexEncode(df, "cat", 2L)
      .orderBy("idx", "cat").as[(String, Long, Long)].collect()
    // ties (a, b both 3) break by value: a before b
    assert(m.toSeq == Seq(("rare1", 1L, 0L), ("rare2", 1L, 0L),
      ("x", 5L, 1L), ("a", 3L, 2L), ("b", 3L, 3L)))
  }

  test("crossBucket is deterministic and within range") {
    val s = spark
    import s.implicits._
    val df = Seq((1, "A"), (2, "B"), (1, "A")).toDF("k", "s")
    val b = df.select(Features.crossBucket(Seq(col("k"), col("s")), 16).as("b"))
      .as[Long].collect()
    assert(b.forall(x => x >= 0 && x < 16))
    assert(b(0) == b(2))
  }
}
