package graft

import org.apache.spark.sql.SparkSession

/** Single-entry isolation bench: `runMain graft.BenchOne <entry> [sfDir]`.
  *
  * The full [[Bench]] measures every entry in one JVM, which is the
  * driver-comparable number but couples a query's sample to the JIT/GC
  * state the 180 preceding entries left behind (the r6 regression
  * cluster). BenchOne is the clean-room counterpart: sbt forks a FRESH
  * JVM per invocation, only the named entry's plan compiles, and the
  * reported number is the MEDIAN of 5 post-warmup runs — the stable
  * statistic for "did my change make this one query faster".
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: BenchOne <entry-name> [sfDir]")
    val name = args(0)
    val sfDir = if (args.length > 1) args(1)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown entry '$name'; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def once(): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    once() // warmup: codegen + parquet footers, discarded
    val samples = Vector.fill(5)(once()).sorted
    val median = samples(2)
    val r3 = (v: Double) => math.rint(v * 1000) / 1000
    println(s"""{"metric":"median","entry":"$name","value":${r3(median)},"unit":"sec",""" +
      s""""samples":[${samples.map(r3).mkString(",")}],"sf":"$sfDir"}""")
    spark.stop()
  }
}
