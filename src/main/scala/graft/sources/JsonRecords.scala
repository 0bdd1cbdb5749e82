package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * DSL-converter analog (reference DSLSpout/DSLBolt deserialize+convert,
 * DSLSpout.java:78-108): turn a raw JSON-string column into a typed struct
 * by a declared schema. Unparseable rows yield a null struct — the
 * reference converter's fail-soft behavior — so bad records filter out
 * instead of failing the stream. Kafka ingestion is this plus
 * `readStream.format("kafka")` upstream.
 */
object JsonRecords {
  /** Adds `<jsonCol>_rec` struct parsed per `ddl` (e.g. "k INT, name STRING"). */
  def convert(df: DataFrame, jsonCol: String, ddl: String): DataFrame =
    df.withColumn(s"${jsonCol}_rec",
      from_json(col(jsonCol), StructType.fromDDL(ddl)))

  /** Kafka-shaped ingest: frames from `readStream.format("kafka")` carry
    * (key binary, value binary, topic, partition, offset, timestamp, …) —
    * decode the value payload into a typed `record` struct, keeping the
    * source metadata columns. Works identically on a batch frame with the
    * same shape (how this is tested without a broker). */
  def fromKafka(df: DataFrame, ddl: String): DataFrame =
    df.withColumn("record",
      from_json(col("value").cast("string"), StructType.fromDDL(ddl)))
}
