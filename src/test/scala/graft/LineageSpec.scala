package graft

import graft.plans.Lineage
import org.apache.spark.sql.functions._

class LineageSpec extends SparkTestBase {

  // a REAL scan leaf (toDF over a local Seq leaves _1/_2 leaf names
  // behind a rename Project — correct lineage, useless test names)
  private lazy val baseDir = {
    val s = spark
    import s.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_lineage").toString
    Seq((1L, "a", 10.0, "x@y.z")).toDF("id", "cat", "amount", "email")
      .write.mode("overwrite").parquet(d)
    d
  }
  private def base = spark.read.parquet(baseDir)

  test("project/aggregate/join lineage resolves to leaf columns") {
    val s = spark
    import s.implicits._
    val dimDir = java.nio.file.Files.createTempDirectory("graft_lin_dim").toString
    Seq(("a", "alpha")).toDF("cat", "cat_name")
      .write.mode("overwrite").parquet(dimDir)
    val dim = s.read.parquet(dimDir)
    val df = base
      .withColumn("double_amount", col("amount") * 2)
      .join(dim, Seq("cat"))
      .groupBy("cat_name")
      .agg(sum(col("double_amount") + col("id")).as("score"),
        count(lit(1)).as("n"))
    val lin = Lineage.columnLineage(df)
    assert(lin("cat_name") === Set("cat_name"))
    assert(lin("score") === Set("amount", "id"))
    assert(lin("n") === Set.empty[String], "count(1) reads no column")
    assert(Lineage.inputColumns(df) === Set("cat_name", "amount", "id"))
  }

  test("filter columns do not enter value lineage; explode and union do") {
    val s = spark
    import s.implicits._
    val df = base.filter(col("email").contains("@"))
      .select(col("id"), explode(split(col("cat"), ",")).as("tag"))
    val lin = Lineage.columnLineage(df)
    assert(lin("tag") === Set("cat"))
    assert(lin("id") === Set("id"))
    assert(!Lineage.inputColumns(df).contains("email"),
      "predicate-only columns are not value lineage")

    val u = base.select(col("id").as("k"))
      .unionByName(base.select(col("amount").cast("long").as("k")))
    assert(Lineage.columnLineage(u)("k") === Set("id", "amount"))
  }

  test("scalar subquery lineage flows through; derivesFrom gates PII") {
    val s = spark
    import s.implicits._
    val stats = base.agg(max("amount").as("mx"))
    val df = base.select(col("id"),
      (col("amount") / stats.collect()(0).getDouble(0)).as("norm"))
    assert(Lineage.columnLineage(df)("norm") === Set("amount"))

    val export = base.select(col("id"),
      sha2(col("email"), 256).as("contact_hash"))
    assert(Lineage.derivesFrom(export, Set("email")),
      "a hashed PII column still DERIVES from PII")
    assert(!Lineage.derivesFrom(export.select("id"), Set("email")))
  }

  test("CostGate: admission passes the sane plan, blocks the cartesian, runs nothing") {
    val s = spark
    import s.implicits._
    import graft.plans.CostGate
    val a = base
    val sane = a.select(col("id"), col("amount"))
    assert(CostGate.requireUnder(sane, BigInt(10) * 1024 * 1024) eq sane)
    // a cartesian's estimate multiplies — gate it without running it
    val boom = a.crossJoin(a.select(col("id").as("id2")))
      .crossJoin(a.select(col("id").as("id3")))
    val e = intercept[IllegalStateException] {
      CostGate.requireUnder(boom, BigInt(1024))
    }
    assert(e.getMessage.contains("cost gate"))
    assert(CostGate.estimatedBytes(boom) > CostGate.estimatedBytes(sane))
    intercept[IllegalArgumentException](CostGate.requireUnder(sane, 0))
  }

  test("PlanFingerprint: phrasing-invariant, literal-sensitive") {
    val s = spark
    import s.implicits._
    import graft.plans.PlanFingerprint
    val a = base.filter(col("amount") > 5.0)
      .select(col("id").as("x"), (col("amount") * 2).as("y"))
    val b = base.where(col("amount") > 5.0)
      .select(col("id").as("renamed"), (col("amount") * 2).as("also"))
    // same computation, different alias names / phrasing
    assert(PlanFingerprint.sameComputation(a, b))
    // a different literal is a different computation
    val c = base.filter(col("amount") > 6.0)
      .select(col("id").as("x"), (col("amount") * 2).as("y"))
    assert(!PlanFingerprint.sameComputation(a, c))
    // and a different projection is too
    val d = base.filter(col("amount") > 5.0).select(col("id").as("x"))
    assert(!PlanFingerprint.sameComputation(a, d))
    assert(PlanFingerprint.of(a).matches("[0-9a-f]{32}"))
    // the same query over a DIFFERENT input directory is a different
    // computation — canonicalization alone drops the scan path; the
    // fingerprint must not (this once served one scale factor's cached
    // answer to another)
    val otherDir = java.nio.file.Files.createTempDirectory("graft_lineage2").toString
    base.write.mode("overwrite").parquet(otherDir)
    val sameQueryOtherData = s.read.parquet(otherDir)
      .filter(col("amount") > 5.0)
      .select(col("id").as("x"), (col("amount") * 2).as("y"))
    assert(!PlanFingerprint.sameComputation(a, sameQueryOtherData))
    // local (in-memory) leaves key on their CONTENT, not just schema
    val l1 = Seq((1L, "a")).toDF("k", "v").filter(col("k") > 0)
    val l2 = Seq((2L, "b")).toDF("k", "v").filter(col("k") > 0)
    assert(!PlanFingerprint.sameComputation(l1, l2))
  }

  test("ResultCache: miss fills, identical computation hits, different plan misses") {
    val s = spark
    import s.implicits._
    import graft.plans.ResultCache
    val root = java.nio.file.Files.createTempDirectory("graft_rc").toString
    val q1 = base.filter(col("amount") > 5.0).select(col("id"), col("amount"))
    val (r1, hit1) = ResultCache.getOrCompute(q1, root)
    assert(!hit1 && r1.count() === 1L)
    // the SAME computation, re-phrased, is served from the cache
    val q1b = base.where(col("amount") > 5.0)
      .select(col("id").as("id"), col("amount").as("amount"))
    val (r2, hit2) = ResultCache.getOrCompute(q1b, root)
    assert(hit2 && r2.count() === 1L)
    // a different literal is a different slot
    val (_, hit3) = ResultCache.getOrCompute(
      base.filter(col("amount") > 999.0).select(col("id"), col("amount")), root)
    assert(!hit3)
    // eviction frees the slot; next call recomputes
    assert(ResultCache.evict(q1, root))
    assert(!ResultCache.getOrCompute(q1, root)._2)
  }
}
