package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Inclusion-dependency (foreign-key) discovery: for every ordered pair
 * of candidate columns, how much of column A's value set lives inside
 * column B's — `containment = |A ∩ B| / |A|`. A containment of 1.0
 * with |A| < |B| is the classic FK signature; this is how a catalog
 * profiles an undocumented warehouse into an ER diagram.
 *
 * Plan shape: every candidate column reduces to its DISTINCT value set
 * tagged with the column id (one union of per-column distincts — each
 * a map-side-combined aggregate), then ONE self-equi-join on the value
 * computes every pairwise intersection simultaneously — n² pair
 * cardinalities out of a single shuffle by value, never n² scans or
 * joins. Distinct counts ride the same pass. At 100 TB, swap the exact
 * distinct sets for theta sketches per column ([[SketchSetOps]]) and
 * intersect sketch-side — identical report shape with bounded state;
 * the exact form here is the oracle-checkable reference.
 *
 * NULLs carry no referential signal and are excluded from both sides
 * (SQL FK semantics: NULL references nothing).
 */
object KeyDiscovery {

  /** `cols`: (label, frame, column) candidates. Output one row per
    * ORDERED pair (a, b): (col_a, col_b, n_a, n_b, n_common,
    * containment = n_common/n_a) — only pairs that share ≥ 1 value
    * appear (a zero-overlap pair is noise, not a candidate). */
  def containmentReport(cols: Seq[(String, DataFrame, String)]): DataFrame = {
    require(cols.size >= 2, "need at least two candidate columns")
    require(cols.map(_._1).distinct.size == cols.size,
      "candidate labels must be unique")
    val valueSets = cols.map { case (label, df, c) =>
      df.filter(col(c).isNotNull)
        .select(lit(label).as("cid"), col(c).cast("string").as("v"))
        .distinct()
    }.reduce(_ unionByName _)
    val sizes = valueSets.groupBy("cid").agg(count(lit(1)).as("n"))
    val pairs = valueSets.as("a")
      .join(valueSets.as("b"),
        col("a.v") === col("b.v") && col("a.cid") =!= col("b.cid"))
      .groupBy(col("a.cid").as("col_a"), col("b.cid").as("col_b"))
      .agg(count(lit(1)).as("n_common"))
    pairs
      .join(sizes.select(col("cid").as("col_a"), col("n").as("n_a")), "col_a")
      .join(sizes.select(col("cid").as("col_b"), col("n").as("n_b")), "col_b")
      .select(col("col_a"), col("col_b"), col("n_a"), col("n_b"),
        col("n_common"),
        (col("n_common").cast("double") / col("n_a")).as("containment"))
  }
}
