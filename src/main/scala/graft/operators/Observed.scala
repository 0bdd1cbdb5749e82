package graft.operators

import org.apache.spark.sql.{DataFrame, Observation, Row, SparkSession}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/**
 * In-flight pipeline metrics via Spark's Observation API
 * (`df.observe`): named aggregates computed INSIDE the consuming job —
 * row counts, null tallies, checksums at any pipeline stage — with ZERO
 * extra scans. At 100 TB this is the difference between "audited" and
 * "audited for the price of running everything twice": a `.count()`
 * sanity check re-reads the corpus; an observation rides the job that
 * was running anyway and is collected from task metrics at completion.
 *
 * The observed point sees rows AS THEY PASS THAT STAGE — metrics
 * attached before a filter count pre-filter rows, which is exactly what
 * an ingest audit wants (what arrived vs what survived).
 */
object Observed {

  /** Attach named metric columns at this point of `df`. Returns the
    * pass-through frame and the handle; call [[metricsRow]] (or
    * `obs.get`) AFTER an action has consumed the frame. */
  def audit(df: DataFrame, name: String,
            metrics: org.apache.spark.sql.Column*): (DataFrame, Observation) = {
    require(metrics.nonEmpty, "observe needs at least one metric column")
    val obs = Observation(name)
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }

  /** The collected metrics as a ONE-ROW DataFrame of BIGINT columns, in
    * `names` order — the shape a metrics sink or an oracle-checked
    * entry wants. Blocks until the observed job has completed; fails
    * loudly if a metric is missing or non-integral rather than writing
    * a null audit row. */
  def metricsRow(spark: SparkSession, obs: Observation,
                 names: Seq[String]): DataFrame = {
    val got = obs.get
    val vals = names.map { n =>
      got.getOrElse(n, throw new IllegalStateException(
        s"observation '${n}' missing — observed job not run or metric " +
          s"not attached (have: ${got.keys.mkString(", ")})")) match {
        case l: java.lang.Long => l.longValue()
        case i: java.lang.Integer => i.longValue()
        case null => throw new IllegalStateException(
          s"observation '$n' collected NULL — an aggregate over zero " +
            "observed rows; wrap the metric in coalesce(..., 0) if an " +
            "empty stage is a legal state")
        case other => throw new IllegalStateException(
          s"observation '$n' is ${other.getClass.getSimpleName}, expected " +
            "an integral metric (cast the aggregate to BIGINT)")
      }
    }
    spark.createDataFrame(
      java.util.Collections.singletonList(Row(vals: _*)),
      StructType(names.map(StructField(_, LongType, nullable = false))))
  }
}
