package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Size-balanced shard assignment for training-data output: walk the
 * corpus in a deterministic order and cut a new shard every `capacity`
 * cost units (tokens, bytes), so every shard except the last carries
 * between `capacity - max_row_cost` and `capacity` units — the
 * assignment a sequential writer would produce, computed distributed.
 * A row belongs to the shard its FIRST unit lands in (`(cum - cost)
 * div capacity`), so a row straddling a boundary goes to the earlier
 * shard, matching greedy sequential packing.
 *
 * The cumulative cost is [[PrefixSum.withRunningSum]]'s two-phase
 * prefix sum — the corpus moves once through a balanced range
 * exchange, never through a single-task global window. Downstream, the
 * shard id is exactly what `write.partitionBy("shard")` or a
 * `repartition(col("shard"))` wants; unlike `repartition(n)`'s
 * hash-by-row it yields shards balanced by COST, not by row count,
 * which is what matters when document sizes are heavy-tailed.
 */
object Sharding {

  /** Append `cum` (running cost including the row, ordered by `idCol`)
    * and `shard` = (cum - cost) div capacity. Costs must be positive
    * and ≤ capacity; ids unique and non-null. */
  def assignShards(df: DataFrame, idCol: String, costCol: String,
                   capacity: Long): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    PrefixSum.withRunningSum(df, Seq(col(idCol).asc), costCol, "cum")
      .withColumn("shard", expr(s"(cum - $costCol) div ${capacity}L"))
  }

  /**
   * STABLE shard assignment via rendezvous (highest-random-weight)
   * hashing: `shard(id) = argmax_s hash(id, s)` over the `nShards`
   * candidate shards. The property [[assignShards]] cannot give:
   * growing the corpus never reassigns an existing document, and
   * RESIZING nShards → nShards+1 moves only the ~1/(nShards+1) of
   * documents whose new candidate wins the argmax — every other row
   * keeps its shard, so an incremental pipeline re-materializes one
   * shard's worth of output instead of reshuffling the corpus
   * (mod-N hashing moves ~all rows on resize). Documents spread
   * uniformly, balanced by COUNT, not cost — pair with
   * [[assignShards]] when sizes are heavy-tailed and stability is not
   * needed.
   *
   * Purely narrow per-row work: the argmax is an unrolled struct
   * comparison over nShards hash calls — no shuffle, no state, no
   * lookup table to keep consistent across runs. The score is the
   * md5 hex of `"<id>:<shard>"` compared lexicographically — the same
   * md5-portability convention as [[graft.pipeline.Sampling]]'s hash
   * sampling, so a SQL oracle replays the identical assignment (ties
   * break to the lower shard id; swap in `xxhash64(id, s)` for raw
   * throughput when cross-engine replay is not required).
   */
  def rendezvousShard(df: DataFrame, idCol: String, nShards: Int,
                      shardName: String = "shard"): DataFrame = {
    require(nShards >= 1, "nShards must be >= 1")
    require(nShards <= 1024,
      s"nShards=$nShards unrolls one hash per shard per row — past ~1k " +
        "candidates use two-level routing (rendezvous over shard GROUPS, " +
        "then within the group)")
    df.withColumn(shardName,
      hrwArgmax(col(idCol).cast("string"), nShards, i => lit(s":$i"))
        .cast("long"))
  }

  /** md5-scored highest-random-weight argmax over `n` candidates, each
    * salted by `salt(i)` appended to the id string — the shared scoring
    * core of [[rendezvousShard]] and [[rendezvousShard2]]. Ties (hash
    * collisions across salts) break to the lower index; result ∈ [0, n). */
  private def hrwArgmax(idStr: Column, n: Int, salt: Int => Column): Column =
    array_max(array((0 until n).map { i =>
      struct(md5(concat(idStr, salt(i))).as("h"), lit(-i).as("ns"))
    }: _*)).getField("ns") * -1

  /**
   * Two-level rendezvous routing for LARGE shard counts — the recipe
   * [[rendezvousShard]]'s guard names: a flat argmax over 100k shards
   * would unroll 100k hashes per row, so route in two hops instead —
   * rendezvous over `nGroups` shard GROUPS, then rendezvous within the
   * winning group over its `shardsPerGroup` members (the within-group
   * score salts the id with the GROUP, so a row moving between groups
   * re-draws its member uniformly). `shard = group · shardsPerGroup +
   * member`: nGroups·shardsPerGroup total shards at nGroups +
   * shardsPerGroup hashes per row.
   *
   * Stability composes per level: growing `nGroups` by one moves only
   * the ~1/(nGroups+1) of rows the new GROUP wins (each re-draws its
   * member inside the new group); growing `shardsPerGroup` by one
   * relocates only within-group winners — every unmoved row keeps its
   * exact shard id ONLY if existing ids are computed against the same
   * shardsPerGroup multiplier, so treat (nGroups, shardsPerGroup) as
   * the layout version and resize by preference through nGroups.
   */
  def rendezvousShard2(df: DataFrame, idCol: String,
                       nGroups: Int, shardsPerGroup: Int,
                       shardName: String = "shard"): DataFrame = {
    require(nGroups >= 1 && shardsPerGroup >= 1,
      "nGroups and shardsPerGroup must be >= 1")
    require(nGroups <= 1024 && shardsPerGroup <= 1024,
      "each level unrolls one hash per candidate per row — split further")
    val idStr = col(idCol).cast("string")
    val group = hrwArgmax(idStr, nGroups, g => lit(s":g$g"))
    val member = (gCol: Column) => hrwArgmax(idStr, shardsPerGroup,
      m => concat(lit(":"), gCol.cast("string"), lit(s":m$m")))
    df.withColumn("__g", group)
      .withColumn(shardName,
        (col("__g") * shardsPerGroup + member(col("__g"))).cast("long"))
      .drop("__g")
  }

  /**
   * Shard delivery manifest: route every document to a stable
   * [[rendezvousShard]] shard and emit one integrity row per shard —
   * (shard, n_docs, n_chars, checksum). The record a training-data
   * handoff ships NEXT TO the shards so the consumer can verify counts,
   * sizes, and CONTENT without trusting the transport: the checksum is
   * the order-insensitive sum of each document's 60-bit md5 prefix
   * (mod 2⁶¹), so any dropped, duplicated, or altered document changes
   * it, while re-partitioning or re-ordering rows does not. All
   * integer/md5 arithmetic — engine-portable like the routing itself
   * (the sum accumulates in DECIMAL(38,0): n·2⁶⁰ overflows BIGINT long
   * before any real shard is full).
   *
   * One narrow routing pass + one shuffle to `nShards` rows.
   */
  def manifest(df: DataFrame, idCol: String, textCol: String,
               nShards: Int): DataFrame = {
    val docHash = conv(substring(md5(col(textCol)), 1, 15), 16, 10)
      .cast("decimal(38,0)")
    rendezvousShard(df, idCol, nShards)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col(textCol)).cast("long")).as("n_chars"),
        pmod(sum(docHash), lit(BigDecimal(2305843009213693952L)).cast("decimal(38,0)"))
          .cast("long").as("checksum"))
  }
}
