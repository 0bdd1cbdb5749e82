package graft

import graft.operators.Compaction
import org.apache.spark.sql.functions._

class CompactionSpec extends SparkTestBase {

  test("planFileCount: ceil with floor 1") {
    assert(Compaction.planFileCount(0L, 100L) === 1)
    assert(Compaction.planFileCount(1L, 100L) === 1)
    assert(Compaction.planFileCount(100L, 100L) === 1)
    assert(Compaction.planFileCount(101L, 100L) === 2)
    assert(Compaction.planFileCount(1000L, 100L) === 10)
    intercept[IllegalArgumentException](Compaction.planFileCount(10L, 0L))
  }

  test("layoutStats measures the scatter; compact hits the plan and keeps every row") {
    val s = spark
    import s.implicits._
    val in = java.nio.file.Files.createTempDirectory("graft_cmp_in").toString
    val out = java.nio.file.Files.createTempDirectory("graft_cmp_out").toString
    val df = (1 to 5000).map(i => (i.toLong, s"payload_$i")).toDF("id", "v")
    df.repartition(32).write.mode("overwrite").parquet(in)
    val (nIn, totalIn, minIn, maxIn, _) = Compaction.layoutStats(s, in, 1L)
    assert(nIn === 32L)
    assert(minIn > 0 && maxIn >= minIn && totalIn >= 32 * minIn)

    // target sized to force a multi-file but < 32-file plan
    val target = totalIn / 4
    val planned = Compaction.compact(s, in, out, "id", target)
    assert(planned === Compaction.planFileCount(totalIn, target))
    assert(planned > 1 && planned < 32)
    val (nOut, _, _, _, _) = Compaction.layoutStats(s, out, 1L)
    assert(nOut === planned.toLong)

    // every row survives, exactly once
    val back = s.read.parquet(out)
    assert(back.count() === 5000L)
    assert(back.agg(sum(col("id"))).head.getLong(0) === 5000L * 5001 / 2)

    // range clustering: per-file id intervals are disjoint (zone-map friendly)
    val ranges = back
      .select(col("id"), input_file_name().as("f"))
      .groupBy("f").agg(min("id").as("lo"), max("id").as("hi"))
      .orderBy("lo").collect()
    ranges.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("hi") < b.getAs[Long]("lo"),
          "compacted files must cover disjoint key ranges")
      case _ =>
    }
  }

  test("layoutStats refuses an empty directory loudly") {
    val s = spark
    val empty = java.nio.file.Files.createTempDirectory("graft_cmp_e").toString
    val e = intercept[IllegalArgumentException](Compaction.layoutStats(s, empty, 1L))
    assert(e.getMessage.contains("no parquet files"))
  }
}
