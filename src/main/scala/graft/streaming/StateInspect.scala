package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Offline inspection of a Structured Streaming checkpoint's STATE via
 * the `statestore` reader (Spark ≥ 4): the operations story that makes
 * stateful pipelines debuggable at scale. "Which keys are held? what
 * does the CDC winner for key 17 look like? how big is the session
 * state really?" are answered by reading the checkpoint as a DataFrame
 * — no replay, no instrumented re-run, no stopping the production
 * stream (the reader works on a live checkpoint's last committed
 * batch and on a stopped one alike).
 *
 * The frame comes back as (key struct, value struct [, partition_id]);
 * [[flatKeyValue]] flattens one-field keys/values to plain columns for
 * ad-hoc queries. State is partition-files under the checkpoint — the
 * read is distributed like any other scan.
 */
object StateInspect {

  /** The raw state rows of `operatorId`'s default store at the last
    * committed batch. For `transformWithState` state variables pass
    * the variable name as `stateVarName` (each typed variable is its
    * own store). */
  def stateRows(spark: SparkSession, checkpointDir: String,
                operatorId: Int = 0,
                stateVarName: Option[String] = None): DataFrame = {
    val r = spark.read.format("statestore")
      .option("path", checkpointDir)
      .option("operatorId", operatorId)
    stateVarName.fold(r)(v => r.option("stateVarName", v)).load()
  }

  /** As [[stateRows]], with single-field key/value structs flattened to
    * `key` / `value` columns (the common groupByKey(primitive) shape).
    * Multi-field structs are left intact under their struct column. */
  def flatKeyValue(spark: SparkSession, checkpointDir: String,
                   operatorId: Int = 0,
                   stateVarName: Option[String] = None): DataFrame = {
    val df = stateRows(spark, checkpointDir, operatorId, stateVarName)
    def flat(col: String, as: String): DataFrame => DataFrame = d =>
      d.schema(col).dataType match {
        case s: org.apache.spark.sql.types.StructType if s.fields.length == 1 =>
          d.withColumn(as, org.apache.spark.sql.functions
            .col(s"$col.${s.fields.head.name}")).drop(col)
        case _ => d.withColumnRenamed(col, as)
      }
    flat("value", "state_value")(flat("key", "state_key")(df))
  }
}
