package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Slowly-changing-dimension (type 2) history reconstruction: turn a
 * change log of (key, time, attribute) observations into validity
 * intervals — each key's history as rows
 * `[valid_from, valid_to)` with `valid_to` null on the open (current)
 * row, and consecutive observations with an UNCHANGED attribute
 * collapsed into one interval (a re-observed identical value is not a
 * change). The dimension-table maintenance pass every warehouse runs;
 * rebuilt from the log it is idempotent and self-healing, unlike
 * incremental open-row splicing.
 *
 * Scale shape: two window passes over the log, both partitioned by the
 * key (one exchange total): lag to drop no-op observations, lead to
 * close intervals. State per key is O(changes), the log never
 * re-shuffles between the passes, and `tieCol` makes the within-key
 * order total so the rebuilt history is a pure function of the log.
 */
object Scd2 {

  /** Rebuild SCD2 intervals from a change log:
    * (key, attr, valid_from, valid_to, is_current). `tsCol` must be
    * integral (days, epoch-nanos — any totally ordered long). */
  def fromChangeLog(log: DataFrame, keyCol: String, tsCol: String,
                    attrCol: String, tieCol: String): DataFrame = {
    val byKey = Window.partitionBy("key").orderBy(col("t"), col("tie"))
    val base = log.select(col(keyCol).as("key"), col(tsCol).cast("long").as("t"),
      col(attrCol).as("attr"), col(tieCol).as("tie"))
    base
      .withColumn("__prev", lag(col("attr"), 1).over(byKey))
      .filter(col("__prev").isNull || col("attr") =!= col("__prev"))
      .withColumn("valid_to", lead(col("t"), 1).over(byKey))
      .select(col("key"), col("attr"), col("t").as("valid_from"),
        col("valid_to"), col("valid_to").isNull.as("is_current"))
  }
}
