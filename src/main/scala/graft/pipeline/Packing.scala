package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Sequence packing for LLM pretraining: assign every document its position
 * in the concatenate-and-chunk token stream — the standard packing used to
 * fill fixed-size training contexts (docs are concatenated in a canonical
 * order, the stream is cut every `budget` tokens, and a document knows
 * which chunk its first token lands in and at what offset).
 *
 * The reference engine has no counterpart (it answers queries, it doesn't
 * build corpora); this is part of the training-data surface this library
 * adds on top.
 *
 * Spark shape: one running-sum window per pack stream — a single hash
 * shuffle on the stream key, in-partition sort, O(1) state per row.
 *
 * 100 TB notes: a window needs each PARTITION (pack stream) to be sorted
 * within one task, so the unit of parallelism is the stream, not the row.
 * Packing one global stream would serialize the corpus through a single
 * task; instead the stream key is (source, shard) where shard =
 * id % `shards` — each source packs into `shards` independent streams,
 * keeping every task's slice bounded while the chunk layout stays fully
 * deterministic (shard membership is a pure function of the id). Size
 * `shards` so corpus_tokens / (sources × shards × budget) chunks per
 * stream fit a task comfortably; Spark's window sort is external (spills,
 * doesn't OOM) so the bound is time, not memory.
 */
object Packing {

  /** Chunk placement per document. Output: every input column plus
    * `pack_stream` (the stream key), `n_tokens`, `chunk_id` (0-based chunk
    * index within the stream where this doc's first token lands),
    * `chunk_offset` (token offset of the doc inside that chunk) and
    * `chunks_spanned` (how many budget-sized chunks the doc touches —
    * >1 means it straddles a boundary and continues into later chunks).
    *
    * `tokens` is any integral token-count column/expression (word count, a
    * tokenizer's count column — the packing is agnostic). Docs with zero
    * tokens occupy no space: they get the position of the stream cursor
    * and span 0 chunks.
    */
  def concatChunks(df: DataFrame, idCol: String, tokensCol: String,
                   budget: Long, sourceCol: String, shards: Int = 1): DataFrame = {
    require(budget > 0, "token budget must be positive")
    require(shards >= 1, "shards must be >= 1")
    // the packing owns these output/internal names — an input column named
    // n_tokens (a natural tokenizer-output name) would be silently clobbered
    val reserved = Set("pack_stream", "n_tokens", "chunk_id", "chunk_offset",
      "chunks_spanned", "__before") - tokensCol
    val clash = df.columns.toSet.intersect(reserved)
    require(clash.isEmpty, s"input uses reserved packing column names: $clash")
    val streamKey =
      if (shards == 1) col(sourceCol).cast("string")
      else concat(col(sourceCol).cast("string"), lit("#"),
        pmod(col(idCol), lit(shards)).cast("string"))
    val w = Window.partitionBy(col("pack_stream")).orderBy(col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val before = coalesce(sum(col("n_tokens")).over(w), lit(0L))
    // `div` (integer division) everywhere: `/` on longs is DOUBLE division
    // in Spark and would lose exactness past 2^53 cumulative tokens.
    // Null/negative counts clamp to 0 (a null-text doc's size(split) is
    // -1 in Spark): a negative count would move the stream cursor BACKWARD
    // and corrupt every later doc's placement; 0 means "occupies no
    // space", matching a SQL window sum that skips NULL.
    df.withColumn("n_tokens",
        greatest(coalesce(col(tokensCol).cast("long"), lit(0L)), lit(0L)))
      .withColumn("pack_stream", streamKey)
      .withColumn("__before", before)
      .withColumn("chunk_id", expr(s"__before div $budget"))
      .withColumn("chunk_offset", col("__before") % budget)
      .withColumn("chunks_spanned",
        when(col("n_tokens") === 0, lit(0L)).otherwise(
          expr(s"(__before + n_tokens - 1) div $budget") - col("chunk_id") + 1))
      .drop("__before")
  }

  /**
   * Padding-waste audit for fixed-size training batches: group
   * sequences into consecutive batches of `batchSize` under a given
   * order, pad every sequence to its batch's max length, and report the
   * waste — for BOTH canonical loader orders in one frame: `arrival`
   * (by id — the naive loader) and `sorted` (length-bucketed — the
   * standard fix). The delta between the two strategies' waste is the
   * token bill the sort saves; per-batch rows expose stragglers (one
   * long doc maxing out an arrival batch). Output per (strategy,
   * batch_id): (n, max_len, real_tokens, padded_tokens, waste_tokens),
   * all integer arithmetic. Scale: rides [[graft.operators.PrefixSum
   * .withGlobalRank]] — the row numbering is range-partition + offsets,
   * never a single-task global window — and touches only (id, len),
   * never the text. Null/negative lengths clamp to 0 (they pad like
   * empty rows rather than corrupting a batch max).
   */
  def paddingWaste(df: DataFrame, idCol: String, lenCol: String,
                   batchSize: Int): DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    val base = df.select(col(idCol).as("__id"),
      greatest(coalesce(col(lenCol).cast("long"), lit(0L)), lit(0L))
        .as("__len"))
    def batched(orderCols: Seq[org.apache.spark.sql.Column],
                strategy: String) =
      graft.operators.PrefixSum.withGlobalRank(base, orderCols, "__rn")
        .withColumn("batch_id", expr(s"(__rn - 1) div $batchSize"))
        .groupBy("batch_id")
        .agg(count(lit(1)).as("n"), max(col("__len")).as("max_len"),
          sum(col("__len")).as("real_tokens"))
        .select(lit(strategy).as("strategy"), col("batch_id"), col("n"),
          col("max_len"), col("real_tokens"),
          (col("n") * col("max_len")).as("padded_tokens"),
          (col("n") * col("max_len") - col("real_tokens"))
            .as("waste_tokens"))
    batched(Seq(col("__id")), "arrival")
      .unionByName(batched(Seq(col("__len"), col("__id")), "sorted"))
  }
}
