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
}
