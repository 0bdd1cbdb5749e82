package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Bounded transitive closure over a parent hierarchy — "all ancestors
 * within `maxLevels` of every node", the join that turns a
 * parent-pointer dimension (category tree, org chart, domain
 * hierarchy) into the flattened lookup OLAP rollups want.
 *
 * Iterative frontier expansion: level L+1 rows come from joining the
 * LEVEL-L FRONTIER (not the whole closure) back to the edge table, so
 * each iteration's join input is one level's rows, the closure only
 * accumulates via union, and a node's chain stops contributing the
 * moment it tops out. Lineage is `localCheckpoint`-truncated every
 * `checkpointEvery` levels — the same discipline as
 * [[graft.pipeline.Graph.pageRank]]; without it the plan doubles per
 * level and a 20-level hierarchy re-executes the whole cascade on any
 * task retry. Cycles are the caller's contract to avoid (it is a
 * hierarchy); `maxLevels` bounds the damage if one sneaks in.
 */
object Hierarchy {

  /** (node, ancestor, level): every ancestor reachable in 1..maxLevels
    * parent steps. `edges` is (childCol, parentCol), at most one parent
    * per child. */
  def ancestors(edges: DataFrame, childCol: String, parentCol: String,
                maxLevels: Int, checkpointEvery: Int = 5): DataFrame = {
    require(maxLevels >= 1, "maxLevels must be >= 1")
    val base = edges.select(col(childCol).as("node"),
      col(parentCol).as("ancestor"))
    val up = edges.select(col(childCol).as("__c"), col(parentCol).as("__p"))
    var frontier = base.withColumn("level", lit(1L))
    var closure = frontier
    for (l <- 2 to maxLevels) {
      frontier = frontier.join(up, frontier("ancestor") === col("__c"))
        .select(col("node"), col("__p").as("ancestor"), lit(l.toLong).as("level"))
      if (checkpointEvery > 0 && l % checkpointEvery == 0)
        frontier = frontier.localCheckpoint()
      closure = closure.unionByName(frontier)
    }
    closure
  }
}
