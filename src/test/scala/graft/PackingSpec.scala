package graft

import graft.pipeline.Packing
import org.apache.spark.sql.functions._

/** Conformance for concatenate-and-chunk sequence packing. */
class PackingSpec extends SparkTestBase {
  private val s = spark
  import s.implicits._

  test("chunk placement follows the running token stream per source") {
    // one stream: tokens 100, 200, 30, 300 with budget 256
    val df = Seq((1L, 100L, "a"), (2L, 200L, "a"), (3L, 30L, "a"), (4L, 300L, "a"))
      .toDF("id", "nt", "src")
    val out = Packing.concatChunks(df, "id", "nt", budget = 256, sourceCol = "src")
      .select($"id", $"chunk_id", $"chunk_offset", $"chunks_spanned")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) === (0L, 0L, 1L))     // tokens [0,100)
    assert(out(2L) === (0L, 100L, 2L))   // [100,300) straddles 256
    assert(out(3L) === (1L, 44L, 1L))    // [300,330)
    assert(out(4L) === (1L, 74L, 2L))    // [330,630) touches chunks 1 and 2
  }

  test("zero-token docs occupy no space and span zero chunks") {
    val df = Seq((1L, 10L, "a"), (2L, 0L, "a"), (3L, 5L, "a")).toDF("id", "nt", "src")
    val out = Packing.concatChunks(df, "id", "nt", budget = 8, sourceCol = "src")
      .select($"id", $"chunk_id", $"chunk_offset", $"chunks_spanned")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(2L) === (1L, 2L, 0L))     // sits at the cursor, consumes nothing
    assert(out(3L) === (1L, 2L, 1L))     // next doc starts at the same offset
  }

  test("sharding splits a source into independent deterministic streams") {
    val df = (0L until 20L).map(i => (i, 10L, "a")).toDF("id", "nt", "src")
    val out = Packing.concatChunks(df, "id", "nt", budget = 25,
      sourceCol = "src", shards = 2)
    // shard = id % 2, each stream packs its own cumulative sum
    val byStream = out.groupBy("pack_stream").agg(count(lit(1)).as("n"),
      max("chunk_id").as("mx")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byStream.keySet === Set("a#0", "a#1"))
    // 10 docs × 10 tokens = 100 tokens per stream → last doc starts at 90 → chunk 3
    assert(byStream.values.toSet === Set((10L, 3L)))
  }

  test("packing invariants hold on random corpora (deterministic seeds)") {
    val rnd = new scala.util.Random(42)
    val rows = (0L until 500L).map { i =>
      (i, rnd.nextInt(400).toLong, s"src${rnd.nextInt(5)}")
    }
    val out = Packing.concatChunks(rows.toDF("id", "nt", "src"), "id", "nt",
      budget = 128, sourceCol = "src", shards = 3)
      .select($"id", $"pack_stream", $"n_tokens", $"chunk_id", $"chunk_offset",
        $"chunks_spanned")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.length === 500)
    out.groupBy(_._2).foreach { case (_, docs) =>
      val ordered = docs.sortBy(_._1)
      var cum = 0L
      ordered.foreach { case (_, _, nt, chunkId, off, spanned) =>
        // placement is exactly the running-sum cursor
        assert(chunkId === cum / 128 && off === cum % 128)
        assert(off >= 0 && off < 128)
        val expectSpan = if (nt == 0) 0L else (cum + nt - 1) / 128 - cum / 128 + 1
        assert(spanned === expectSpan)
        cum += nt
      }
    }
    // token conservation: every input token is in exactly one stream cursor
    assert(out.map(_._3).sum === rows.map(_._2).sum)
  }

  test("reserved output/internal column names on the input are rejected") {
    val df = Seq((1L, 10L, "a", 9L)).toDF("id", "nt", "src", "chunk_id")
    intercept[IllegalArgumentException] {
      Packing.concatChunks(df, "id", "nt", budget = 8, sourceCol = "src")
    }
    // the tokens column itself may carry the canonical output name
    val ok = Seq((1L, 10L, "a")).toDF("id", "n_tokens", "src")
    assert(Packing.concatChunks(ok, "id", "n_tokens", budget = 8,
      sourceCol = "src").count() === 1)
  }

  test("streams pack independently: a doc's placement ignores other sources") {
    val df = Seq((1L, 100L, "a"), (2L, 100L, "b"), (3L, 10L, "a"))
      .toDF("id", "nt", "src")
    val out = Packing.concatChunks(df, "id", "nt", budget = 64, sourceCol = "src")
      .select($"id", $"chunk_id", $"chunk_offset")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(2L) === (0L, 0L))   // b's stream starts fresh
    assert(out(3L) === (1L, 36L))  // a's cursor after 100 tokens
  }

  test("paddingWaste: hand-computed batches; sorting never loses") {
    val s = spark
    import s.implicits._
    import graft.pipeline.Packing
    // arrival batches of 2: [10, 100] -> waste 90; [20, 1] -> waste 19
    // sorted  batches of 2: [1, 10]   -> waste  9; [20, 100] -> waste 80
    val df = Seq((1L, 10L), (2L, 100L), (3L, 20L), (4L, 1L)).toDF("id", "len")
    val got = Packing.paddingWaste(df, "id", "len", batchSize = 2)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    assert(got(("arrival", 0L)) === ((2L, 100L, 110L, 200L, 90L)))
    assert(got(("arrival", 1L)) === ((2L, 20L, 21L, 40L, 19L)))
    assert(got(("sorted", 0L)) === ((2L, 10L, 11L, 20L, 9L)))
    assert(got(("sorted", 1L)) === ((2L, 100L, 120L, 200L, 80L)))
    // the invariant the audit exists to demonstrate
    def waste(strategy: String) = got.collect {
      case ((s0, _), (_, _, _, _, w)) if s0 == strategy => w }.sum
    assert(waste("sorted") <= waste("arrival"))
    // null/negative lengths clamp to zero-space rows, not batch poison
    val messy = Seq((1L, Some(5L)), (2L, Option.empty[Long]), (3L, Some(-7L)),
      (4L, Some(5L))).toDF("id", "len")
    val m = Packing.paddingWaste(messy, "id", "len", batchSize = 4)
      .filter(col("strategy") === "arrival").collect()(0)
    assert(m.getLong(3) === 5L && m.getLong(4) === 10L)
  }
}
