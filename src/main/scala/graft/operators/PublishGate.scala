package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Write-Audit-Publish: the discipline that makes pipeline writes safe
 * at 100 TB. A job never writes into the serving path — it writes a
 * STAGING directory, audits what was actually persisted (read back
 * from disk, not the in-memory plan: the audit must cover the bytes a
 * consumer will read, including anything a lossy write could have
 * done), and only then promotes the staging directory to a new
 * immutable version and flips the `_CURRENT` pointer. A failed audit
 * throws and leaves the previous version serving, with the staging
 * directory kept for debugging ([[staleStaging]] lists them,
 * [[gcStaging]] reclaims them).
 *
 * Versions are append-only (`v1`, `v2`, …) — readers pin a version for
 * job lifetime (read the pointer once), writers never mutate a
 * published directory, so there is no read-under-write anomaly and old
 * versions double as time travel. Directory rename is atomic on HDFS
 * and local filesystems; object stores without atomic rename need a
 * metastore-backed pointer instead — the pointer-file flip here is the
 * single point to swap out.
 */
object PublishGate {

  private val Pointer = "_CURRENT"

  private def fsOf(spark: SparkSession, dir: String): (FileSystem, Path) = {
    val p = new Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def versionNum(name: String): Option[Int] = {
    val core = if (name.startsWith("_staging_v")) name.drop("_staging_v".length)
               else if (name.startsWith("v")) name.drop(1)
               else return None
    core.toIntOption
  }

  private def nextVersion(fs: FileSystem, root: Path): Int = {
    if (!fs.exists(root)) return 1
    val used = fs.listStatus(root).flatMap(s => versionNum(s.getPath.getName))
    if (used.isEmpty) 1 else used.max + 1
  }

  /** Stage → audit (on the persisted bytes) → promote → flip pointer.
    * Returns the published version name (`"v3"`). Throws on the first
    * failing audit, leaving the previous version serving and the
    * staging directory in place for debugging. */
  def publish(spark: SparkSession, df: DataFrame, dir: String,
              audits: Seq[(String, DataFrame => Boolean)]): String = {
    val (fs, root) = fsOf(spark, dir)
    fs.mkdirs(root)
    val n = nextVersion(fs, root)
    val stage = new Path(root, s"_staging_v$n")
    df.write.mode("overwrite").parquet(stage.toString)
    val staged = spark.read.parquet(stage.toString)
    audits.foreach { case (name, check) =>
      if (!check(staged))
        throw new IllegalStateException(
          s"publish audit '$name' failed — staging kept at $stage, " +
            s"current version unchanged")
    }
    val finalPath = new Path(root, s"v$n")
    if (!fs.rename(stage, finalPath))
      throw new IllegalStateException(s"rename $stage -> $finalPath failed")
    val out = fs.create(new Path(root, Pointer), true)
    try out.write(s"v$n".getBytes("UTF-8")) finally out.close()
    s"v$n"
  }

  /** The currently-published version name, if any. */
  def currentVersion(spark: SparkSession, dir: String): Option[String] = {
    val (fs, root) = fsOf(spark, dir)
    val ptr = new Path(root, Pointer)
    if (!fs.exists(ptr)) None
    else {
      val in = fs.open(ptr)
      try {
        val buf = new Array[Byte](64)
        val k = in.read(buf)
        Some(new String(buf, 0, k, "UTF-8").trim)
      } finally in.close()
    }
  }

  /** Read the currently-published version. Throws if nothing has ever
    * been published — an unpublished table is an error, not an empty
    * frame. */
  def current(spark: SparkSession, dir: String): DataFrame = {
    val v = currentVersion(spark, dir).getOrElse(
      throw new IllegalStateException(s"no published version under $dir"))
    spark.read.parquet(new Path(new Path(dir), v).toString)
  }

  /** Leftover staging directories (failed or abandoned publishes),
    * oldest first. Metadata-only listing. */
  def staleStaging(spark: SparkSession, dir: String): Seq[String] = {
    val (fs, root) = fsOf(spark, dir)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).map(_.getPath.getName)
      .filter(_.startsWith("_staging_")).sorted.toSeq
  }

  /** Delete leftover staging directories; returns what was reclaimed.
    * Published versions are never touched — they are the time-travel
    * history and a separate retention policy owns them. */
  def gcStaging(spark: SparkSession, dir: String): Seq[String] = {
    val (fs, root) = fsOf(spark, dir)
    val stale = staleStaging(spark, dir)
    stale.foreach(name => fs.delete(new Path(root, name), true))
    stale
  }

  private val BatchMarker = "_LAST_BATCH"

  /** The last streaming batch id published into `dir`, if any. */
  def lastPublishedBatch(spark: SparkSession, dir: String): Option[Long] = {
    val (fs, root) = fsOf(spark, dir)
    val p = new Path(root, BatchMarker)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val buf = new Array[Byte](32)
        val k = in.read(buf)
        Some(new String(buf, 0, k, "UTF-8").trim.toLong)
      } finally in.close()
    }
  }

  /**
   * Exactly-once streaming materialization: the `foreachBatch` body
   * that turns any streaming frame into an atomically-versioned table.
   * Structured Streaming guarantees a replayed micro-batch carries the
   * SAME batchId with the SAME data — so idempotence IS exactly-once
   * here: a batch id at or below the last published one is skipped
   * (returns None), otherwise the batch publishes through the full
   * write-audit-promote path and the batch marker advances only AFTER
   * the pointer flip (a crash between the two re-publishes a new
   * version with identical content — duplicate VERSION, never
   * duplicate DATA in any version a reader sees).
   *
   * Wire as: `ds.writeStream.foreachBatch { (b, id) =>
   *   PublishGate.publishBatch(spark, b, dir, id, audits); () }`.
   */
  def publishBatch(spark: SparkSession, batch: DataFrame, dir: String,
                   batchId: Long,
                   audits: Seq[(String, DataFrame => Boolean)] = Nil)
    : Option[String] = {
    if (lastPublishedBatch(spark, dir).exists(batchId <= _)) None
    else {
      val v = publish(spark, batch, dir, audits)
      val (fs, root) = fsOf(spark, dir)
      val out = fs.create(new Path(root, BatchMarker), true)
      try out.write(batchId.toString.getBytes("UTF-8")) finally out.close()
      Some(v)
    }
  }
}
