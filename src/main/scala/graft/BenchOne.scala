package graft

import org.apache.spark.sql.SparkSession

/** Single-entry isolation bench: `runMain graft.BenchOne <entry> [sfDir]`.
  *
  * The full [[Bench]] measures every entry in one JVM, which is the
  * driver-comparable number but couples a query's sample to the JIT/GC
  * state the preceding entries left behind (the r6 regression cluster;
  * the r11 driver run's 42 phantom flags). BenchOne is the clean-room
  * counterpart: sbt (or [[Bench]]'s self-adjudication spawn) forks a
  * FRESH JVM per invocation, only the named entry's plan compiles, and
  * the reported number is the MEDIAN of `SPARK_GRAFT_SAMPLES` (default
  * 5) post-warmup runs — the stable statistic for "did my change make
  * this one query faster".
  *
  * Besides `SparkEntry.queries` names, the runner benches
  * (b7_runner_100q, b11_runner_1000q, b9/b10/b14) resolve through
  * [[Bench.runnerBody]] so the headline blocks can be adjudicated
  * fresh too; those warm TWICE (the shared pass reaches steady state
  * on its third execution — Janino on run 1, C2 on run 2).
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: BenchOne <entry-name> [sfDir]")
    val name = args(0)
    val sfDir = if (args.length > 1) args(1)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nSamples =
      try math.max(1, sys.env.getOrElse("SPARK_GRAFT_SAMPLES", "5").trim.toInt)
      catch { case _: Throwable => 5 }
    val (body, warmups): ((SparkSession, String) => Unit, Int) =
      SparkEntry.queries.get(name) match {
        case Some(fn) => (((s: SparkSession, d: String) => { fn(s, d).count(); () }), 1)
        case None => Bench.runnerBody(name) match {
          case Some(b) => (b, 2)
          case None => sys.error(s"unknown entry '$name'; known: " +
            SparkEntry.queries.keys.toSeq.sorted.mkString(", ") +
            ", b7_runner_100q, b9_runner_200eq, b10_runner_200eq_tuple, " +
            "b11_runner_1000q, b14_runner_1k_eq, b14_runner_10k_eq")
        }
      }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def once(): Double = {
      val t0 = System.nanoTime()
      body(spark, sfDir)
      (System.nanoTime() - t0) / 1e9
    }
    (1 to warmups).foreach(_ => once()) // codegen + parquet footers, discarded
    val samples = Vector.fill(nSamples)(once()).sorted
    val median = samples(samples.size / 2)
    val r3 = (v: Double) => math.rint(v * 1000) / 1000
    println(s"""{"metric":"median","entry":"$name","value":${r3(median)},"unit":"sec",""" +
      s""""samples":[${samples.map(r3).mkString(",")}],"sf":"$sfDir"}""")
    spark.stop()
  }
}
