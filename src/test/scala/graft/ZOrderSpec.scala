package graft

import graft.operators.ZOrder
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkTestBase {

  test("zValue interleaves bits of both dimensions") {
    val s = spark
    import s.implicits._
    // x=0b101 (5), y=0b011 (3) → z bit layout y2 x2 y1 x1 y0 x0 = 0 1 1 0 1 1 = 27
    val z = Seq((5L, 3L)).toDF("x", "y")
      .select(ZOrder.zValue(Seq(col("x"), col("y")), bits = 3))
      .head.getLong(0)
    assert(z === 27L)
    // SQL twin computes the identical value
    val zSql = spark.sql(
      s"SELECT ${ZOrder.zValueSql(Seq("5", "3"), 3)}").head.getLong(0)
    assert(zSql === 27L)
  }

  test("cluster localizes every dimension: point predicates prune most ranges") {
    val s = spark
    import s.implicits._
    val grid = (for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val parts = ZOrder.cluster(grid, Seq("x", "y"), numFiles = 16, bits = 6)
      .select(spark_partition_id().as("p"), col("x"), col("y"))
      .groupBy("p").agg(min("x").as("x0"), max("x").as("x1"),
        min("y").as("y0"), max("y").as("y1"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(parts.length === 16)
    // a file "matches" a point predicate when its min-max straddles the
    // value — the parquet pruning model. A 1-D sort would match ALL 16
    // files for the unsorted dimension; z-order must keep both under half.
    def matching(v: Long, lo: Int, hi: Int) =
      parts.count(b => Seq(b.productElement(lo), b.productElement(hi))
        .map(_.asInstanceOf[Long]) match { case Seq(a, z) => a <= v && v <= z })
    assert(matching(10L, 0, 1) <= 8, "x=10 should prune over half the files")
    assert(matching(10L, 2, 3) <= 8, "y=10 should prune over half the files")
  }

  test("cluster raises on a dimension outside [0, 2^bits)") {
    val s = spark
    import s.implicits._
    val bad = Seq((70L, 1L)).toDF("x", "y")
    val e = intercept[Exception] {
      ZOrder.cluster(bad, Seq("x", "y"), numFiles = 2, bits = 6).collect()
    }
    assert(e.getMessage.contains("z-order dimension out of") ||
      e.getCause != null && e.getCause.getMessage.contains("z-order dimension out of"))
  }
}
