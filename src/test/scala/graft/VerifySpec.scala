package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The round-7 failure mode — a throwing entry silently VANISHING from the
  * correctness dump — must be structurally impossible: every failure
  * leaves an `_ERROR.json` artifact (so the driver's parquet read fails
  * and records `err`) and `Verify.run` reports the name. */
class VerifySpec extends SparkTestBase {

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-verify-spec").toString

  test("a failing entry writes _ERROR.json and is reported, a passing one dumps parquet") {
    val out = tmpDir()
    val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
      "ok_entry" -> ((s, _) => {
        import s.implicits._
        Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      }),
      // fails at ACTION time (analysis passes), like the r7 TIMESTAMP_NTZ
      // cluster — the harder case for the catch to surface
      "broken_entry" -> ((s, _) => {
        import s.implicits._
        Seq(1L).toDF("id").filter(
          org.apache.spark.sql.functions.assert_true(
            org.apache.spark.sql.functions.lit(false),
            org.apache.spark.sql.functions.lit("deliberately broken")).isNull)
      }))
    val failed = Verify.run(spark, "/unused", out, entries)
    assert(failed === Seq("broken_entry"))
    // the passing entry is a readable parquet result
    assert(spark.read.parquet(s"$out/ok_entry").count() === 2)
    // the failing entry left an explicit artifact, not an absence
    val err = new java.io.File(s"$out/broken_entry/_ERROR.json")
    assert(err.exists(), "failure must leave an _ERROR.json artifact")
    val body = new String(java.nio.file.Files.readAllBytes(err.toPath), "UTF-8")
    assert(body.contains("\"entry\":\"broken_entry\""))
    assert(body.contains("error_class"))
    // the artifact dir is NOT a readable parquet dir — the driver's read
    // fails and the entry lands in CORRECTNESS with err populated
    intercept[Throwable](spark.read.parquet(s"$out/broken_entry").collect())
  }

  test("a failure replaces a stale prior parquet dump (no half-results survive)") {
    val out = tmpDir()
    val good: Map[String, (SparkSession, String) => DataFrame] = Map(
      "flip" -> ((s, _) => { import s.implicits._; Seq(1L).toDF("id") }))
    assert(Verify.run(spark, "/unused", out, good).isEmpty)
    assert(spark.read.parquet(s"$out/flip").count() === 1)
    // plant a NESTED leftover (the shape an interrupted Spark write
    // leaves: _temporary/0/part-...) — the wipe must be recursive, a
    // flat File.delete silently no-ops on non-empty directories
    val tmpTree = java.nio.file.Paths.get(out, "flip", "_temporary", "0")
    java.nio.file.Files.createDirectories(tmpTree)
    java.nio.file.Files.writeString(tmpTree.resolve("part-stale.parquet"), "junk")
    val bad: Map[String, (SparkSession, String) => DataFrame] = Map(
      "flip" -> ((_, _) => throw new IllegalStateException("now broken")))
    assert(Verify.run(spark, "/unused", out, bad) === Seq("flip"))
    // stale success AND the nested tree are gone; only the artifact remains
    assert(new java.io.File(s"$out/flip/_ERROR.json").exists())
    assert(!java.nio.file.Files.exists(tmpTree.getParent), "_temporary tree must be wiped")
    assert(new java.io.File(s"$out/flip").listFiles().map(_.getName).toSeq === Seq("_ERROR.json"))
    intercept[Throwable](spark.read.parquet(s"$out/flip").collect())
  }
}
