package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/**
 * Result sinks — the reference publishes every result Clip to a PubSub
 * (ResultBolt.java:38-43); here a sink is any `Clip => Unit` registered via
 * [[QueryRunner.onResult]]. [[JsonLinesSink]] is the durable default:
 * one JSON line per Clip through the Hadoop FileSystem API, so results
 * land wherever the deployment stores them (hdfs://, s3a://, local), one
 * file per runner instance (no small-file explosion, no cross-writer
 * append contention).
 */
final class JsonLinesSink(spark: SparkSession, dir: String)
    extends (Clip => Unit) with AutoCloseable {

  private val dirPath = new Path(dir)
  private val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
  fs.mkdirs(dirPath)
  private val path = new Path(dirPath, s"results-${java.util.UUID.randomUUID()}.jsonl")
  private val out = fs.create(path, true)

  /** Where this sink's lines are written. */
  def file: String = path.toString

  override def apply(c: Clip): Unit = synchronized {
    out.write((c.asJson + "\n").getBytes("UTF-8"))
    out.hflush() // each Clip is durable as soon as it is emitted
  }

  override def close(): Unit = synchronized(out.close())
}
