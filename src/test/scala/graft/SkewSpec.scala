package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkTestBase {

  test("salted two-stage aggregation equals the plain groupBy on skewed data") {
    val s = spark
    import s.implicits._
    // 90% of rows share one hot key
    val df = ((1 to 900).map(i => ("hot", i.toLong)) ++
      (1 to 100).map(i => (s"k${i % 10}", i.toLong))).toDF("k", "v")
    val salted = Skew.saltedCountSum(df, Seq("k"), "v", buckets = 8)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val plain = df.groupBy("k").agg(count(lit(1)), sum("v"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(salted === plain)
    assert(salted("hot")._1 === 900L)
  }

  test("stage-1 spreads the hot key across salt buckets") {
    val s = spark
    import s.implicits._
    val df = (1 to 1000).map(i => ("hot", i.toLong)).toDF("k", "v")
    val buckets = df.withColumn("__salt", Skew.salt(8))
      .groupBy("__salt").count().collect()
    assert(buckets.length > 1) // the hot key no longer lands on one reducer
    assert(buckets.map(_.getLong(1)).sum === 1000L)
  }

  test("skewReport: exact shares, ceil salt factor, only hot keys flagged") {
    val s = spark
    import s.implicits._
    val df = ((1 to 250).map(_ => "hot") ++ (1 to 100).map(_ => "warm") ++
      Seq("cold")).toDF("k")
    val rows = Skew.skewReport(df, Seq("k"), targetRowsPerBucket = 100L, topK = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))))
    assert(rows.length === 2, "topK honored")
    assert(rows(0) === ("hot" -> ((250L, 351L, 3L, true))))  // ceil(250/100)=3
    assert(rows(1) === ("warm" -> ((100L, 351L, 1L, false)))) // exactly fits
  }
}
