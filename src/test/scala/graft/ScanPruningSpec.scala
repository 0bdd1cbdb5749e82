package graft

import graft.operators.ScanPruning
import graft.pipeline.Dedup
import org.apache.spark.sql.functions._

class ScanPruningSpec extends SparkTestBase {

  test("skipReport marks exactly the buckets whose range misses [lo, hi]") {
    val s = spark
    import s.implicits._
    // bucket 0: values 1..3, bucket 1: 10..12, bucket 2: 20..22
    val df = Seq(
      (0, 1L), (0, 2L), (0, 3L),
      (1, 10L), (1, 11L), (1, 12L),
      (2, 20L), (2, 21L), (2, 22L)).toDF("b", "v")
    val out = ScanPruning.skipReport(df, col("b"), col("v"), lit(11L), lit(15L))
      .collect().map(r => (r.getInt(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4), r.getLong(5)))).toMap
    assert(out(0) === ((3L, 1L, 3L, true, 0L)))   // 1..3 < 11 → skip
    assert(out(1) === ((3L, 10L, 12L, false, 3L))) // overlaps
    assert(out(2) === ((3L, 20L, 22L, true, 0L)))  // 20..22 > 15 → skip
  }

  test("skipReport boundary touch is NOT skippable (conservative, like footer stats)") {
    val s = spark
    import s.implicits._
    val df = Seq((0, 5L), (1, 6L)).toDF("b", "v")
    val out = ScanPruning.skipReport(df, col("b"), col("v"), lit(5L), lit(5L))
      .collect().map(r => r.getInt(0) -> r.getBoolean(4)).toMap
    assert(out === Map(0 -> false, 1 -> true)) // v_max=5 == lo → must scan
  }

  test("lshPlan factorizations multiply back and hit known layouts") {
    for (n <- Seq(16, 32, 64, 100); t <- Seq(0.2, 0.5, 0.8, 0.95)) {
      val (b, r) = Dedup.lshPlan(n, t)
      assert(b * r === n, s"n=$n t=$t gave b=$b r=$r")
    }
    // 32 hashes, J* targets: s*(b,r) = (1/b)^(1/r):
    //   (32,1)=.031 (16,2)=.25 (8,4)=.59 (4,8)=.84 (2,16)=.96 (1,32)=1
    assert(Dedup.lshPlan(32, 0.5) === ((8, 4)))
    assert(Dedup.lshPlan(32, 0.9) === ((2, 16)))
    assert(Dedup.lshPlan(32, 0.25) === ((16, 2)))
  }

  test("lshPlan crossover threshold is monotone in the requested threshold") {
    def sStar(br: (Int, Int)): Double = math.pow(1.0 / br._1, 1.0 / br._2)
    val stars = Seq(0.1, 0.3, 0.5, 0.7, 0.9).map(t => sStar(Dedup.lshPlan(64, t)))
    assert(stars === stars.sorted)
  }
}
