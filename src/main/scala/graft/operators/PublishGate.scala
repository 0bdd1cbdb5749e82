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
    writeMarker(fs, root, Pointer, s"v$n")
    s"v$n"
  }

  /** Pointer/marker writes go through a temp file + rename so a reader
    * can never observe a truncated marker (create-with-overwrite
    * truncates before the new bytes land). The rename leaves at most a
    * brief marker-absent window, which reads as "nothing published
    * yet" — a clean state, never a torn one. */
  private def writeMarker(fs: FileSystem, root: Path, name: String,
                          value: String): Unit = {
    val tmp = new Path(root, s"_tmp_$name")
    val out = fs.create(tmp, true)
    try out.write(value.getBytes("UTF-8")) finally out.close()
    val dst = new Path(root, name)
    fs.delete(dst, false)
    if (!fs.rename(tmp, dst))
      throw new IllegalStateException(s"marker rename $tmp -> $dst failed")
  }

  private def readMarker(fs: FileSystem, root: Path,
                         name: String): Option[String] = {
    val p = new Path(root, name)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val buf = new Array[Byte](64)
        val k = in.read(buf)
        if (k <= 0) throw new IllegalStateException(
          s"marker $p is empty — torn write? markers are written via " +
            "temp+rename, so this indicates outside interference")
        Some(new String(buf, 0, k, "UTF-8").trim)
      } finally in.close()
    }
  }

  /** The currently-published version name, if any. */
  def currentVersion(spark: SparkSession, dir: String): Option[String] = {
    val (fs, root) = fsOf(spark, dir)
    readMarker(fs, root, Pointer)
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
    readMarker(fs, root, BatchMarker).map(_.toLong)
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
      writeMarker(fs, root, BatchMarker, batchId.toString)
      Some(v)
    }
  }
}
