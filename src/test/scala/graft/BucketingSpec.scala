package graft

import graft.operators.Bucketing
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkTestBase {

  test("co-bucketed join runs with ZERO exchanges; result matches plain join") {
    val s = spark
    import s.implicits._
    val facts = (1 to 2000).map(i => (i.toLong % 97, s"f$i", i * 1.5)).toDF("key", "tag", "v")
    val dims = (0 to 96).flatMap(k => Seq((k.toLong, s"d$k"), (k.toLong, s"e$k")))
      .toDF("dkey", "dval")
    Bucketing.writeBucketed(facts, "bspec_facts", "key", numBuckets = 8)
    Bucketing.writeBucketed(dims, "bspec_dims", "dkey", numBuckets = 8)
    // disable broadcast so the test proves bucketing, not broadcast, kills
    // the shuffle; restore after
    val prior = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.cooperativeJoin(s, "bspec_facts", "key", "bspec_dims", "dkey")
      val p = joined.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"), s"bucketed join still shuffles:\n${p.take(1500)}")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p.take(400))
      // bucket-sorted data: SMJ needs no explicit Sort on the scan side
      assert(joined.count() === 2000L * 2)
      val expect = facts.join(dims, col("key") === col("dkey")).count()
      assert(joined.count() === expect)
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
      s.sql("DROP TABLE IF EXISTS bspec_facts")
      s.sql("DROP TABLE IF EXISTS bspec_dims")
    }
  }

  test("cooperativeJoin fails loudly on bucket-spec mismatches instead of silently shuffling") {
    val s = spark
    import s.implicits._
    val df = (1 to 100).map(i => (i.toLong, s"v$i")).toDF("key", "v")
    Bucketing.writeBucketed(df, "bspec_m8", "key", numBuckets = 8)
    Bucketing.writeBucketed(df.toDF("key2", "v2"), "bspec_m4", "key2", numBuckets = 4)
    df.write.mode("overwrite").format("parquet").saveAsTable("bspec_plain")
    try {
      val diff = intercept[IllegalArgumentException] {
        Bucketing.cooperativeJoin(s, "bspec_m8", "key", "bspec_m4", "key2")
      }
      assert(diff.getMessage.contains("bucket counts differ"), diff.getMessage)
      val unb = intercept[IllegalArgumentException] {
        Bucketing.cooperativeJoin(s, "bspec_m8", "key", "bspec_plain", "key")
      }
      assert(unb.getMessage.contains("not bucketed"), unb.getMessage)
      val wrongKey = intercept[IllegalArgumentException] {
        Bucketing.cooperativeJoin(s, "bspec_m8", "v", "bspec_m4", "key2")
      }
      assert(wrongKey.getMessage.contains("not on the join key"), wrongKey.getMessage)
    } finally {
      Seq("bspec_m8", "bspec_m4", "bspec_plain")
        .foreach(t => s.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("one file per bucket with coalesceToBuckets (read cost stays one seek)") {
    val s = spark
    import s.implicits._
    val df = (1 to 500).map(i => (i.toLong, s"r$i")).toDF("key", "v")
    Bucketing.writeBucketed(df, "bspec_files", "key", numBuckets = 4)
    try {
      val loc = s.sql("DESCRIBE TABLE EXTENDED bspec_files")
        .filter(col("col_name") === "Location").select("data_type")
        .collect()(0).getString(0)
      val dir = new java.io.File(new java.net.URI(loc))
      val dataFiles = dir.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(dataFiles.length === 4, dataFiles.map(_.getName).mkString(", "))
      assert(s.table("bspec_files").count() === 500)
    } finally {
      s.sql("DROP TABLE IF EXISTS bspec_files")
    }
  }
}
