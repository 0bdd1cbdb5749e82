package graft

import graft.operators.Sharding
import org.apache.spark.sql.functions._

/** Rendezvous-hash shard routing: the STABILITY contract is the whole
  * point (mod-N hashing reshuffles ~everything on resize), so it is
  * pinned directly — growing the shard count moves only winners of the
  * NEW candidate, everyone else stays put. */
class ShardingSpec extends SparkTestBase {
  private def s = spark

  private lazy val ids = {
    val sp = s
    import sp.implicits._
    (1L to 2000L).toDF("doc_id")
  }

  test("rendezvousShard: deterministic, all shards in range and populated, roughly balanced") {
    val a = Sharding.rendezvousShard(ids, "doc_id", nShards = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Sharding.rendezvousShard(ids, "doc_id", nShards = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b, "pure function of (id, nShards)")
    assert(a.values.forall(v => v >= 0 && v < 8))
    val counts = a.values.groupBy(identity).view.mapValues(_.size)
    assert(counts.size === 8, s"every shard populated: $counts")
    // 2000 ids over 8 shards: uniform md5 keeps every shard within a
    // loose 2x band of the 250 mean
    assert(counts.values.forall(c => c > 125 && c < 500), counts.toMap)
  }

  test("rendezvousShard: resize 8 -> 9 moves ONLY rows won by the new shard (~1/9)") {
    val at8 = Sharding.rendezvousShard(ids, "doc_id", nShards = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val at9 = Sharding.rendezvousShard(ids, "doc_id", nShards = 9)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val moved = at8.keys.filter(k => at8(k) != at9(k)).toSeq
    // every mover lands on the NEW shard — the rendezvous guarantee: an
    // added candidate can win a row, but existing candidates' relative
    // order never changes
    assert(moved.forall(k => at9(k) === 8L),
      s"movers must all go to shard 8, got ${moved.take(5).map(k => at8(k) -> at9(k))}")
    // moved fraction ~ 1/9 of 2000 = 222; accept a generous band
    assert(moved.size > 120 && moved.size < 350,
      s"expected ~222 movers (1/9 of corpus), got ${moved.size}")
  }

  test("rendezvousShard: corpus growth never reassigns existing docs; plan is narrow") {
    val sp = s
    import sp.implicits._
    val grown = (1L to 3000L).toDF("doc_id")
    val base = Sharding.rendezvousShard(ids, "doc_id", nShards = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val after = Sharding.rendezvousShard(grown, "doc_id", nShards = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    base.foreach { case (k, v) => assert(after(k) === v) }
    val plan = Sharding.rendezvousShard(ids, "doc_id", 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "routing must be per-row narrow work:\n" + plan.take(800))
    intercept[IllegalArgumentException](Sharding.rendezvousShard(ids, "doc_id", 0))
    intercept[IllegalArgumentException](Sharding.rendezvousShard(ids, "doc_id", 5000))
  }

  test("rendezvousShard2: all 16 shards populated; group resize moves only new-group winners") {
    val at4 = Sharding.rendezvousShard2(ids, "doc_id", nGroups = 4, shardsPerGroup = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(at4.values.forall(v => v >= 0 && v < 16))
    assert(at4.values.toSet.size === 16, "all group×member shards populated")
    val at5 = Sharding.rendezvousShard2(ids, "doc_id", nGroups = 5, shardsPerGroup = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val moved = at4.keys.filter(k => at4(k) != at5(k)).toSeq
    // a mover must have been won by the NEW group (ids 16..19); everyone
    // else keeps their exact (group, member) shard
    assert(moved.forall(k => at5(k) / 4 === 4L),
      s"movers must land in the new group, got ${moved.take(5).map(k => at4(k) -> at5(k))}")
    assert(moved.size > 200 && moved.size < 600,
      s"expected ~400 movers (1/5 of corpus), got ${moved.size}")
    // plan stays narrow — two chained argmaxes, zero exchanges
    val plan = Sharding.rendezvousShard2(ids, "doc_id", 4, 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(600))
  }

  test("manifest: order-insensitive, tamper-sensitive per-shard checksums") {
    val sp = s
    import sp.implicits._
    val docs = (1L to 200L).map(i => (i, s"document body number $i with words"))
      .toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      Sharding.manifest(df, "doc_id", "text", nShards = 4)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val base = rows(docs)
    assert(base.keySet === Set(0L, 1L, 2L, 3L))
    assert(base.values.map(_._1).sum === 200L)
    // row order / partitioning must not matter (the consumer re-derives
    // the checksum from whatever layout it received)
    assert(rows(docs.orderBy(org.apache.spark.sql.functions.desc("doc_id"))
      .repartition(7)) === base)
    // a single altered document flips exactly its shard's checksum
    val tampered = docs.withColumn("text",
      org.apache.spark.sql.functions.when(col("doc_id") === 42L,
        org.apache.spark.sql.functions.lit("tampered body")).otherwise(col("text")))
    val after = rows(tampered)
    val shard42 = Sharding.rendezvousShard(docs.filter(col("doc_id") === 42L),
      "doc_id", 4).select("shard").head.getLong(0)
    assert(after(shard42)._3 !== base(shard42)._3, "altered doc must change its shard checksum")
    assert(after.filter(_._1 != shard42) === base.filter(_._1 != shard42),
      "other shards' checksums must be untouched")
    // a dropped document changes count AND checksum
    val dropped = rows(docs.filter(col("doc_id") =!= 42L))
    assert(dropped(shard42)._1 === base(shard42)._1 - 1)
    assert(dropped(shard42)._3 !== base(shard42)._3)
  }
}
