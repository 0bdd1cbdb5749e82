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

  test("hilbertIndex is a bijection on the 8x8 grid AND consecutive cells are adjacent") {
    val s = spark
    import s.implicits._
    val cells = for (x <- 0L until 8L; y <- 0L until 8L) yield (x, y)
    val got = cells.toDF("x", "y")
      .select($"x", $"y",
        graft.functions.SpatialFunctions.hilbertIndex($"x", $"y", 3).as("h"))
      .collect().map(r => (r.getLong(2), (r.getLong(0), r.getLong(1))))
      .sortBy(_._1)
    assert(got.map(_._1).toSeq === (0L until 64L), "bijection onto 0..63")
    // the defining Hilbert property — Z-order fails this at every Z-jump
    got.sliding(2).foreach { case Array((_, (x1, y1)), (_, (x2, y2))) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1,
        s"cells ($x1,$y1)->($x2,$y2) not grid-adjacent")
    }
  }

  test("hilbertIndex interpreted eval matches the codegen'd path") {
    val expr = graft.functions.HilbertIndex(
      org.apache.spark.sql.catalyst.expressions.Literal(5L),
      org.apache.spark.sql.catalyst.expressions.Literal(9L), 4)
    val s = spark
    import s.implicits._
    val viaDf = Seq((5L, 9L)).toDF("x", "y")
      .select(graft.functions.SpatialFunctions.hilbertIndex($"x", $"y", 4))
      .collect()(0).getLong(0)
    assert(expr.eval(null) === viaDf)
  }

  test("hilbert files bound tighter rectangles than Morton at non-power-of-4 file counts") {
    val s = spark
    import s.implicits._
    // On a 32x32 grid with a power-of-4 file count, both curves cut at
    // quad boundaries and tie. At 10/12 files the range boundaries fall
    // INSIDE quads: Morton ranges straddle Z-jumps (measured avg
    // bounding-box area 179/163), Hilbert ranges stay grid-adjacent
    // (134/123). That area ratio is exactly the zone-map scan-skip
    // advantage clusterHilbert claims.
    val pts = (for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y)).toDF("x", "y")
    def avgArea(parts: Array[Array[org.apache.spark.sql.Row]]): Double = {
      val as = parts.filter(_.nonEmpty).map { rows =>
        val xs = rows.map(_.getLong(0)); val ys = rows.map(_.getLong(1))
        ((xs.max - xs.min + 1) * (ys.max - ys.min + 1)).toDouble
      }
      as.sum / as.length
    }
    for (n <- Seq(10, 12)) {
      val z = avgArea(ZOrder.cluster(pts, Seq("x", "y"), n, bits = 5).rdd.glom().collect())
      val h = avgArea(ZOrder.clusterHilbert(pts, "x", "y", n, bits = 5).rdd.glom().collect())
      assert(h < z, s"nFiles=$n: hilbert avg box $h must beat morton $z")
    }
  }

  test("clusterHilbert range-partitions on the index and guards the domain") {
    val s = spark
    import s.implicits._
    val pts = (for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)).toDF("x", "y")
    val parts = ZOrder.clusterHilbert(pts, "x", "y", numFiles = 4, bits = 4)
      .rdd.glom().collect()
    assert(parts.map(_.length).sum === 256)
    val e = intercept[Exception] {
      ZOrder.clusterHilbert(Seq((70L, 1L)).toDF("x", "y"), "x", "y",
        numFiles = 2, bits = 6).collect()
    }
    assert(e.getMessage.contains("hilbert dimension out of") ||
      e.getCause != null && e.getCause.getMessage.contains("hilbert dimension out of"))
  }
}
