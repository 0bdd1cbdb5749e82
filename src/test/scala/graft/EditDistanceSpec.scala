package graft

import graft.pipeline.Dedup
import org.apache.spark.sql.functions._

class EditDistanceSpec extends SparkTestBase {

  test("finds known near pairs, skips far strings") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "kitten"), (2L, "sitten"), (3L, "sittin"),
      (4L, "banana")).toDF("id", "t")
    val got = Dedup.editDistancePairs(docs, "id", "t", prefixLen = 6, maxDist = 2)
      .orderBy("doc_id1", "doc_id2")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.toSeq === Seq((1L, 2L, 1), (1L, 3L, 2), (2L, 3L, 1)))
  }

  test("blocking is lossless: matches brute-force levenshtein on a mutated corpus") {
    val s = spark
    import s.implicits._
    // seeded corpus: 40 bases + mutated twins (substitution / insert /
    // delete at varying offsets) — mutations the segment lemma must survive
    val rnd = new scala.util.Random(42)
    val alpha = "abcdef"
    val bases = (0 until 40).map { i =>
      (i.toLong, (0 until 30).map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
    }
    val twins = bases.take(25).map { case (i, t) =>
      val pos = rnd.nextInt(20)
      val mutated = rnd.nextInt(3) match {
        case 0 => t.updated(pos, '#')                        // substitute
        case 1 => t.substring(0, pos) + "#" + t.substring(pos) // insert
        case 2 => t.substring(0, pos) + t.substring(pos + 1)   // delete
      }
      (i + 1000L, mutated)
    }
    val docs = (bases ++ twins).toDF("id", "t")
    val fast = Dedup.editDistancePairs(docs, "id", "t", prefixLen = 24, maxDist = 2)
      .orderBy("doc_id1", "doc_id2")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    val p = docs.select(col("id"), substring(col("t"), 1, 24).as("p"))
    val brute = p.as("a").join(p.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"),
        levenshtein(col("a.p"), col("b.p")).as("d"))
      .filter(col("d") <= 2).orderBy("a.id", "b.id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(brute.nonEmpty, "fixture must contain qualifying pairs")
    assert(fast === brute)
  }

  test("plan is an equi-join on segment keys — no cartesian, only the 1-row guard NLJ") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "abcdefabcdefabcdefabcdef")).toDF("id", "t")
    val p = Dedup.editDistancePairs(docs, "id", "t")
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p.take(800))
    // exactly ONE nested-loop join: the 1-row broadcast short-doc guard
    // (the repo's 1-row-global pattern). The candidate join itself must
    // stay an equi-join on the hashed segment keys.
    val nlj = p.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
    assert(nlj === 1, p.take(1200))
  }

  test("docs shorter than the prefix still pair via their empty tail segments") {
    val s = spark
    import s.implicits._
    // len 10 vs len 9 (one delete): every non-empty segment may be touched,
    // so the empty-segment match path must keep the pair findable
    val docs = Seq((1L, "abcdefghij"), (2L, "abcdfghij"),
      (3L, "zzzzzzzzzz")).toDF("id", "t")
    val got = Dedup.editDistancePairs(docs, "id", "t", prefixLen = 24, maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got.contains((1L, 2L, 1)), got)
    assert(!got.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("rejects a prefix length that does not split into equal segments") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "abc")).toDF("id", "t")
    intercept[IllegalArgumentException] {
      Dedup.editDistancePairs(docs, "id", "t", prefixLen = 25, maxDist = 2)
    }
  }
}
