package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * Delimited-text converter — the other ubiquitous wire format the
 * reference's pluggable converter layer handles (DSL BulletRecordConverter
 * family, DSLSpout.java:45-55): turn a raw CSV/TSV line column into a
 * typed struct by a declared schema. Spark's `from_csv` is a codegen'd
 * native expression, so conversion stays inside whole-stage codegen —
 * no UDF, no per-row driver work, identical on batch and streaming frames.
 *
 * Malformed lines yield a struct of nulls (PERMISSIVE mode) — fail-soft
 * like the JSON converter; use [[wellFormed]] to filter them out when the
 * pipeline wants only clean records.
 */
object DelimitedRecords {

  /** Adds `<lineCol>_rec` struct parsed per `ddl` (e.g. "k INT, name
    * STRING") with the given separator (default comma; pass "\t" for TSV). */
  def convert(df: DataFrame, lineCol: String, ddl: String,
              sep: String = ","): DataFrame =
    df.withColumn(s"${lineCol}_rec",
      from_csv(col(lineCol), StructType.fromDDL(ddl),
        Map("sep" -> sep, "mode" -> "PERMISSIVE")))

  /** True when the parsed struct has at least one non-null field — the
    * cheap well-formedness gate for PERMISSIVE parsing (a malformed line
    * parses to all-null fields). */
  def wellFormed(rec: Column, ddl: String): Column = {
    val fields = StructType.fromDDL(ddl).fieldNames
    fields.map(f => rec.getField(f).isNotNull).reduce(_ || _)
  }

  /** Round-trip encoder for tests/sinks: the typed columns back to one
    * delimited line (native `to_csv`). */
  def encode(cols: Column, sep: String = ","): Column = {
    import scala.jdk.CollectionConverters._
    to_csv(cols, Map("sep" -> sep).asJava)
  }
}
