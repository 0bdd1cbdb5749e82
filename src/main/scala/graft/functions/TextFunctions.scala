package graft.functions

import java.util.LinkedHashSet

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode, JavaCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Row-at-a-time helper for [[WordShingles]]. Top-level object → static
  * forwarder, directly callable from generated Java. */
object TextFunctionHelpers {
  private val Empty = new GenericArrayData(new Array[Any](0))

  /** Ordered (non-distinct) space-joined word n-grams of `text`: the
    * SINGLE tokenization + gram-joining contract both native text
    * functions share (split is `String.split(" ", -1)` — identical token
    * boundaries to Spark's `split(text, " ")`). NULL text or fewer than
    * `n` tokens → empty. */
  private def grams(text: UTF8String, n: Int): Array[UTF8String] = {
    if (text == null) return Array.empty
    val toks = text.toString.split(" ", -1)
    val count = toks.length - n + 1
    if (count <= 0) return Array.empty
    val out = new Array[UTF8String](count)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < count) {
      sb.setLength(0)
      sb.append(toks(i))
      var j = 1
      while (j < n) { sb.append(' '); sb.append(toks(i + j)); j += 1 }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    out
  }

  /** Distinct space-joined word n-grams of `text`, first-occurrence order
    * (exactly `array_distinct` over the sliding grams); fewer than `n`
    * tokens → empty array. NULL text → empty array, matching the
    * composable form's `when(...).otherwise(array())` (a null condition
    * falls through to otherwise). */
  def wordShingles(text: UTF8String, n: Int): ArrayData = {
    val gs = grams(text, n)
    if (gs.isEmpty) return Empty
    val set = new LinkedHashSet[UTF8String]()
    var i = 0
    while (i < gs.length) { set.add(gs(i)); i += 1 }
    new GenericArrayData(set.toArray.asInstanceOf[Array[AnyRef]])
  }

  /** Window-bounded co-occurrence pair keys of `text`: for every token
    * position i and each of the next `window` positions j, the unordered
    * pair as ONE space-joined key `min(t_i,t_j) + " " + max(t_i,t_j)`
    * (tokens never contain the separator — they were split on it).
    * Ordering compares UTF8 bytes (= codepoint order), matching both
    * Spark's `least`/`greatest` and DuckDB's default collation. One
    * compiled loop per document — the composable nested
    * `transform(sequence…, slice…)` form pays interpreted lambdas per
    * PAIR and measured ~10 µs/pair at sf0.1. */
  def cooccurPairs(text: UTF8String, window: Int): ArrayData = {
    if (text == null) return Empty
    val toks = text.toString.split(" ", -1)
    val n = toks.length
    if (n < 2) return Empty
    val u = new Array[UTF8String](n)
    var i = 0
    while (i < n) { u(i) = UTF8String.fromString(toks(i)); i += 1 }
    var cnt = 0
    i = 0
    while (i < n - 1) { cnt += math.min(window, n - 1 - i); i += 1 }
    val out = new Array[Any](cnt)
    val sb = new java.lang.StringBuilder
    var k = 0
    i = 0
    while (i < n - 1) {
      val jEnd = math.min(i + window, n - 1)
      var j = i + 1
      while (j <= jEnd) {
        val swap = u(i).compareTo(u(j)) > 0
        sb.setLength(0)
        sb.append(if (swap) toks(j) else toks(i))
        sb.append(' ')
        sb.append(if (swap) toks(i) else toks(j))
        out(k) = UTF8String.fromString(sb.toString)
        k += 1; j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Winnowing fingerprint of `text` (Schleimer et al., MOSS): xxhash64
    * (seed 42 — bit-identical to Spark's `xxhash64`) of every ordered word
    * k-gram, minimum of each sliding window of `w` hashes, deduped in
    * first-occurrence order. < k tokens → empty; k-gram count in (0, w) →
    * the single global minimum. NULL text → empty (composable parity). */
  def winnowFingerprint(text: UTF8String, k: Int, w: Int): ArrayData = {
    val gs = grams(text, k)
    val nGrams = gs.length
    if (nGrams == 0) return Empty
    val hashes = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      val g = gs(i)
      hashes(i) = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(g.getBaseObject, g.getBaseOffset, g.numBytes, 42L)
      i += 1
    }
    val out = new LinkedHashSet[java.lang.Long]()
    if (nGrams < w) {
      var m = hashes(0)
      var x = 1
      while (x < nGrams) { if (hashes(x) < m) m = hashes(x); x += 1 }
      out.add(m)
    } else {
      var s = 0
      while (s + w <= nGrams) {
        var m = hashes(s)
        var x = 1
        while (x < w) { if (hashes(s + x) < m) m = hashes(s + x); x += 1 }
        out.add(m)
        s += 1
      }
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[AnyRef]])
  }

  /** Char-level md5-prefix winnowing fingerprint — the native twin of
    * [[graft.pipeline.Winnowing.fingerprints]]'s relational form, VALUE-
    * IDENTICAL by construction: hash = the first 14 md5 hex digits of
    * each char k-gram as a BIGINT (`conv(substring(md5(g),1,14),16,10)`
    * = the first 7 digest bytes big-endian), fingerprints = the set of
    * FULL-window minima (fewer than w grams → empty, matching the
    * relational `length >= k + w - 1` filter; no short-text global-min
    * special case, unlike the word-level [[winnowFingerprint]]). Grams
    * slice by CHARACTER (`substringSQL`), matching SQL substring. */
  /** Byte start offset of every code point of `text` (plus the end
    * offset), so k-gram hashing can digest byte slices in place instead
    * of allocating a UTF8String + byte copy per gram — the md5 values
    * are identical (same UTF-8 bytes), the allocations are gone. */
  private def codePointByteOffsets(bytes: Array[Byte], numChars: Int): Array[Int] = {
    val offs = new Array[Int](numChars + 1)
    var o = 0
    var c = 0
    while (c < numChars) {
      offs(c) = o
      o += UTF8String.numBytesForFirstByte(bytes(o))
      c += 1
    }
    offs(numChars) = o
    offs
  }

  /** md5-56 (first 7 digest bytes big-endian as non-negative BIGINT) of
    * the byte slice [from, until) — shared by the winnowing and anchor
    * samplers; `buf` is the caller's reusable 16-byte digest buffer. */
  private def md5Prefix56(md: java.security.MessageDigest, bytes: Array[Byte],
                          from: Int, until: Int, buf: Array[Byte]): Long = {
    md.update(bytes, from, until - from)
    md.digest(buf, 0, 16)
    var h = 0L
    var b = 0
    while (b < 7) { h = (h << 8) | (buf(b) & 0xffL); b += 1 }
    h
  }

  def winnowMd5Fingerprint(text: UTF8String, k: Int, w: Int): ArrayData = {
    if (text == null) return Empty
    val numChars = text.numChars()
    val nGrams = numChars - k + 1
    if (nGrams < w) return Empty
    val md = java.security.MessageDigest.getInstance("MD5")
    val buf = new Array[Byte](16)
    val bytes = text.getBytes
    val offs = codePointByteOffsets(bytes, numChars)
    val hashes = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      hashes(i) = md5Prefix56(md, bytes, offs(i), offs(i + k), buf)
      i += 1
    }
    val out = new LinkedHashSet[java.lang.Long]()
    var s = 0
    while (s + w <= nGrams) {
      var m = hashes(s)
      var x = 1
      while (x < w) { if (hashes(s + x) < m) m = hashes(s + x); x += 1 }
      out.add(m)
      s += 1
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[AnyRef]])
  }

  /** 64-bit SimHash of `text`: per-bit majority vote over xxhash64 (seed
    * 42 — bit-identical to Spark's `xxhash64`) of each DISTINCT word
    * n-gram, tie (sum = 0) voting 1 — exactly the explode + 64-conditional-
    * sum aggregate it replaces, in one pass per row with no shuffle.
    * NULL text or fewer than `n` tokens → null (those docs carried no
    * signature in the aggregate form either: they were filtered out). */
  def simhash64(text: UTF8String, n: Int): java.lang.Long = {
    val gs = grams(text, n)
    if (gs.isEmpty) return null
    val set = new LinkedHashSet[UTF8String]()
    var i = 0
    while (i < gs.length) { set.add(gs(i)); i += 1 }
    val counts = new Array[Int](64)
    val it = set.iterator()
    while (it.hasNext) {
      val g = it.next()
      val h = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(g.getBaseObject, g.getBaseOffset, g.numBytes, 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (counts(b) >= 0) sig |= 1L << b; b += 1 }
    java.lang.Long.valueOf(sig)
  }

  /** MinHash signature of `text`: for i in [0, numHashes), the minimum
    * over word n-grams of Spark's `hash(gram, i)` — bit-identical to the
    * explode + groupBy(doc) + numHashes min-aggregates form it replaces
    * (Murmur3 chain: bytes at seed 42, then the literal int; duplicate
    * grams cannot change a minimum, so the distinct step is skipped).
    * NULL text or fewer than `n` tokens → null (those docs carried no
    * signature row in the aggregate form either). */
  def minhashSignature(text: UTF8String, n: Int, numHashes: Int): ArrayData = {
    val gs = grams(text, n)
    if (gs.isEmpty) return null
    val mins = new Array[Int](numHashes)
    java.util.Arrays.fill(mins, Int.MaxValue)
    var j = 0
    while (j < gs.length) {
      val g = gs(j)
      val hg = org.apache.spark.unsafe.hash.Murmur3_x86_32
        .hashUnsafeBytes(g.getBaseObject, g.getBaseOffset, g.numBytes, 42)
      var i = 0
      while (i < numHashes) {
        val h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashInt(i, hg)
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  /** Unicode normalization of `text` to the given form (NFC/NFD/NFKC/
    * NFKD) — java.text.Normalizer, the same Unicode data tables DuckDB's
    * `nfc_normalize` uses. NULL in → NULL out (string-function
    * convention, unlike the empty-collection conventions above). */
  def unicodeNormalize(text: UTF8String, form: java.text.Normalizer.Form): UTF8String = {
    if (text == null) return null
    val s = text.toString
    if (java.text.Normalizer.isNormalized(s, form)) text
    else UTF8String.fromString(java.text.Normalizer.normalize(s, form))
  }

  /** 1-based char positions of `text`'s k-grams whose md5-56 hash (the
    * same first-14-hex-digits-as-BIGINT convention as
    * [[winnowMd5Fingerprint]]) is ≡ 0 (mod stride) — the Karp–Rabin
    * "0 mod p" anchor sampling the exact-substring dedup pipeline seeds
    * its extensions from. Content-determined: the same substring selects
    * the same anchors in every document that contains it, so two copies
    * of a span always agree on the anchor inside it. Expected density
    * 1/stride. NULL or shorter-than-k text → empty array. */
  def modAnchorPositions(text: UTF8String, k: Int, stride: Int): ArrayData = {
    if (text == null) return Empty
    val numChars = text.numChars()
    val nGrams = numChars - k + 1
    if (nGrams <= 0) return Empty
    val md = java.security.MessageDigest.getInstance("MD5")
    val buf = new Array[Byte](16)
    val bytes = text.getBytes
    val offs = codePointByteOffsets(bytes, numChars)
    val out = new java.util.ArrayList[java.lang.Long]()
    var i = 0
    while (i < nGrams) {
      if (md5Prefix56(md, bytes, offs(i), offs(i + k), buf) % stride == 0)
        out.add(java.lang.Long.valueOf((i + 1).toLong))
      i += 1
    }
    if (out.isEmpty) Empty
    else new GenericArrayData(out.toArray.asInstanceOf[Array[AnyRef]])
  }

  private val ZeroExtension =
    new GenericArrayData(Array[Any](0L, 0L))

  /** Maximal common extension of `t1`/`t2` around the 1-based char
    * positions `p1`/`p2`: returns `[l, r]` where `r` is the length of
    * the longest common prefix of the suffixes starting AT (p1, p2) and
    * `l` the longest common suffix of the prefixes ending just BEFORE
    * them — so `[p1 − l, p1 + r − 1]` / `[p2 − l, p2 + r − 1]` is the
    * maximal matching run through the anchor diagonal, and every
    * reported span is a genuine common substring regardless of how the
    * anchor was chosen (a hash-collision anchor just extends to a short
    * run that the caller's min-length filter drops). Comparison is by
    * code point (supplementary-plane safe — the Bpe surrogate lesson).
    * NULL text or out-of-range position → [0, 0]. */
  def commonExtension(t1: UTF8String, p1: Long, t2: UTF8String, p2: Long): ArrayData = {
    if (t1 == null || t2 == null || p1 < 1 || p2 < 1) return ZeroExtension
    // in-place UTF-8 byte walk: O(p) positioning + O(span) comparison,
    // zero allocation — a full decode of both documents per candidate
    // pair (the toString/codePoints form) costs O(len1+len2) time and
    // ~8 bytes per char of garbage for spans a few hundred chars long.
    // UTF-8 is injective, so code points are equal iff their byte runs
    // are equal (width compared first).
    val n1 = t1.numBytes
    val n2 = t2.numBytes
    def offsetOf(t: UTF8String, nBytes: Int, p: Long): Int = {
      var o = 0
      var c = 1L
      while (c < p && o < nBytes) {
        o += UTF8String.numBytesForFirstByte(t.getByte(o)); c += 1
      }
      if (c == p && o < nBytes) o else -1
    }
    val o1 = offsetOf(t1, n1, p1)
    val o2 = offsetOf(t2, n2, p2)
    if (o1 < 0 || o2 < 0) return ZeroExtension
    var r = 0L
    var i = o1
    var j = o2
    var stop = false
    while (!stop && i < n1 && j < n2) {
      val w = UTF8String.numBytesForFirstByte(t1.getByte(i))
      if (w != UTF8String.numBytesForFirstByte(t2.getByte(j)) ||
          i + w > n1 || j + w > n2) stop = true
      else {
        var b = 0
        while (b < w && t1.getByte(i + b) == t2.getByte(j + b)) b += 1
        if (b < w) stop = true
        else { r += 1; i += w; j += w }
      }
    }
    // backward: step to the previous code-point start (skip continuation
    // bytes 10xxxxxx) on both sides
    def prevStart(t: UTF8String, o: Int): Int = {
      var q = o - 1
      while (q > 0 && (t.getByte(q) & 0xC0) == 0x80) q -= 1
      q
    }
    var l = 0L
    i = o1
    j = o2
    stop = false
    while (!stop && i > 0 && j > 0) {
      val pi = prevStart(t1, i)
      val pj = prevStart(t2, j)
      val w = i - pi
      if (w != j - pj) stop = true
      else {
        var b = 0
        while (b < w && t1.getByte(pi + b) == t2.getByte(pj + b)) b += 1
        if (b < w) stop = true
        else { l += 1; i = pi; j = pj }
      }
    }
    new GenericArrayData(Array[Any](l, r))
  }
}


/**
 * Native Catalyst word-shingling: distinct space-joined word n-grams of a
 * string column in ONE pass per row.
 *
 * The composable alternative (n shifted `slice`s folded with
 * `zip_with(concat)` + `array_distinct`) evaluates its lambdas interpreted
 * per ELEMENT and allocates n intermediate arrays per row — it dominates
 * the shingle-pipeline profile (ngram/MinHash/SimHash dedup all start
 * here). This expression costs one JVM call per row and stays inside
 * whole-stage codegen.
 *
 * Reference semantics: the shingle-set form feeding Jaccard dedup
 * (SURVEY pipeline ops); bit-identical output to the composable form.
 */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) {
      if (n >= 1) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"word_shingles n must be >= 1, got $n")
    } else TypeCheckResult.TypeCheckFailure(
      s"word_shingles needs a string input, got ${child.dataType}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  // NULL text yields an EMPTY array (composable-form parity), so the
  // expression itself is never null.
  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    TextFunctionHelpers.wordShingles(child.eval(input).asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val c = child.genCode(ctx)
    val call = JavaCode.expression(
      s"graft.functions.TextFunctionHelpers.wordShingles(" +
        s"${c.isNull} ? null : ${c.value}, $n)", dataType)
    ev.copy(
      code = code"""
        |${c.code}
        |${CodeGenerator.javaType(dataType)} ${ev.value} = $call;""".stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native window-bounded co-occurrence pair expansion — see
  * [[TextFunctionHelpers.cooccurPairs]]; one compiled loop per document
  * instead of interpreted nested lambdas per pair. */
case class CooccurPairs(child: Expression, window: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) {
      if (window >= 1) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"cooccur_pairs window must be >= 1, got $window")
    } else TypeCheckResult.TypeCheckFailure(
      s"cooccur_pairs needs a string input, got ${child.dataType}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "cooccur_pairs"
  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    TextFunctionHelpers.cooccurPairs(child.eval(input).asInstanceOf[UTF8String], window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val c = child.genCode(ctx)
    val call = JavaCode.expression(
      s"graft.functions.TextFunctionHelpers.cooccurPairs(" +
        s"${c.isNull} ? null : ${c.value}, $window)", dataType)
    ev.copy(
      code = code"""
        |${c.code}
        |${CodeGenerator.javaType(dataType)} ${ev.value} = $call;""".stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * Native Catalyst winnowing fingerprint: the ordered-k-gram xxhash64 +
 * sliding-window-min + first-occurrence-dedupe chain of
 * [[graft.pipeline.TextAnalysis.fingerprints]] in ONE JVM call per row,
 * bit-identical to the composable form (which pays interpreted lambdas per
 * k-gram: a transform for the hashes plus w zip_with folds for the window
 * minima).
 */
case class WinnowFingerprint(child: Expression, k: Int, w: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) {
      if (k >= 1 && w >= 1) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"winnow_fingerprint needs k,w >= 1, got ($k, $w)")
    } else TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprint needs a string input, got ${child.dataType}")

  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprint"
  override def nullable: Boolean = false // NULL text → empty array

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    TextFunctionHelpers.winnowFingerprint(child.eval(input).asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val c = child.genCode(ctx)
    val call = JavaCode.expression(
      s"graft.functions.TextFunctionHelpers.winnowFingerprint(" +
        s"${c.isNull} ? null : ${c.value}, $k, $w)", dataType)
    ev.copy(
      code = code"""
        |${c.code}
        |${CodeGenerator.javaType(dataType)} ${ev.value} = $call;""".stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * Native Catalyst char-level md5 winnowing: [[graft.pipeline.Winnowing]]'s
 * relational gram-explode + per-doc window + distinct collapsed into ONE
 * JVM call per row. The selected set is value-identical (same md5-prefix
 * hash, same full-window minima), so downstream pair joins explode only
 * the ~2/(w+1)-density SELECTED fingerprints instead of shuffling every
 * char position through a per-doc window sort — the 100 TB form of the
 * fingerprint pass.
 */
case class WinnowMd5Fingerprint(child: Expression, k: Int, w: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) {
      if (k >= 2 && w >= 1) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"winnow_md5_fingerprint needs k >= 2, w >= 1, got ($k, $w)")
    } else TypeCheckResult.TypeCheckFailure(
      s"winnow_md5_fingerprint needs a string input, got ${child.dataType}")

  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "winnow_md5_fingerprint"
  override def nullable: Boolean = false // NULL text → empty array

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    TextFunctionHelpers.winnowMd5Fingerprint(child.eval(input).asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val c = child.genCode(ctx)
    val call = JavaCode.expression(
      s"graft.functions.TextFunctionHelpers.winnowMd5Fingerprint(" +
        s"${c.isNull} ? null : ${c.value}, $k, $w)", dataType)
    ev.copy(
      code = code"""
        |${c.code}
        |${CodeGenerator.javaType(dataType)} ${ev.value} = $call;""".stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * Native Catalyst anchor sampler for exact-substring dedup: the 1-based
 * char positions whose k-gram md5-56 hash is ≡ 0 (mod stride) — Karp–
 * Rabin "0 mod p" content-defined sampling. One JVM call per row inside
 * whole-stage codegen; only the ~1/stride sampled positions ever become
 * rows (the same selection-before-explosion discipline as
 * [[WinnowMd5Fingerprint]]). md5-portable, so an external SQL engine
 * replays the selection verbatim.
 */
case class ModAnchorPositions(child: Expression, k: Int, stride: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) {
      if (k >= 2 && stride >= 1) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"mod_anchor_positions needs k >= 2, stride >= 1, got ($k, $stride)")
    } else TypeCheckResult.TypeCheckFailure(
      s"mod_anchor_positions needs a string input, got ${child.dataType}")

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "mod_anchor_positions"
  override def nullable: Boolean = false // NULL text → empty array

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    TextFunctionHelpers.modAnchorPositions(
      child.eval(input).asInstanceOf[UTF8String], k, stride)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val c = child.genCode(ctx)
    val call = JavaCode.expression(
      s"graft.functions.TextFunctionHelpers.modAnchorPositions(" +
        s"${c.isNull} ? null : ${c.value}, $k, $stride)", dataType)
    ev.copy(
      code = code"""
        |${c.code}
        |${CodeGenerator.javaType(dataType)} ${ev.value} = $call;""".stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * Native Catalyst maximal-common-extension: `[l, r]` such that
 * `t1[p1−l … p1+r−1] == t2[p2−l … p2+r−1]` is the maximal matching run
 * through the (p1, p2) diagonal — the extension step of anchor-based
 * exact-substring dedup (Lee et al. 2022's ExactSubstr class, in
 * bucketed-anchor form). One code-point-wise JVM scan per candidate
 * pair, O(span); every reported span is a genuine common substring no
 * matter how the anchor was found.
 */
case class CommonExtension(t1: Expression, p1: Expression,
                           t2: Expression, p2: Expression) extends Expression {

  override def children: Seq[Expression] = Seq(t1, p1, t2, p2)

  override def checkInputDataTypes(): TypeCheckResult = {
    val lt = org.apache.spark.sql.types.LongType
    if (t1.dataType == StringType && t2.dataType == StringType &&
        p1.dataType == lt && p2.dataType == lt) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "common_extension needs (string, bigint, string, bigint), got " +
        children.map(_.dataType.simpleString).mkString("(", ", ", ")"))
  }

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "common_extension"
  override def nullable: Boolean = false // NULL/out-of-range → [0, 0]

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val s1 = t1.eval(input).asInstanceOf[UTF8String]
    val s2 = t2.eval(input).asInstanceOf[UTF8String]
    val i1 = p1.eval(input)
    val i2 = p2.eval(input)
    TextFunctionHelpers.commonExtension(s1,
      if (i1 == null) 0L else i1.asInstanceOf[Long],
      s2,
      if (i2 == null) 0L else i2.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val c1 = t1.genCode(ctx)
    val cp1 = p1.genCode(ctx)
    val c2 = t2.genCode(ctx)
    val cp2 = p2.genCode(ctx)
    val call = JavaCode.expression(
      s"graft.functions.TextFunctionHelpers.commonExtension(" +
        s"${c1.isNull} ? null : ${c1.value}, " +
        s"${cp1.isNull} ? 0L : ${cp1.value}, " +
        s"${c2.isNull} ? null : ${c2.value}, " +
        s"${cp2.isNull} ? 0L : ${cp2.value})", dataType)
    ev.copy(
      code = code"""
        |${c1.code}
        |${cp1.code}
        |${c2.code}
        |${cp2.code}
        |${CodeGenerator.javaType(dataType)} ${ev.value} = $call;""".stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(t1 = newChildren(0), p1 = newChildren(1),
      t2 = newChildren(2), p2 = newChildren(3))
}

/**
 * Native Catalyst SimHash: the 64-bit near-dup signature of a string
 * column in ONE JVM call per row — distinct word n-grams, xxhash64 per
 * gram, per-bit majority vote. Replaces an explode + groupBy(doc) with 64
 * conditional sums, i.e. turns a full shuffle of every gram into a narrow
 * codegen'd map over the scan. Null when the text has fewer than n tokens
 * (such docs had no signature row in the aggregate form either).
 */
case class SimHash64(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) {
      if (n >= 1) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"simhash64 n must be >= 1, got $n")
    } else TypeCheckResult.TypeCheckFailure(
      s"simhash64 needs a string input, got ${child.dataType}")

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "simhash64"
  override def nullable: Boolean = true // < n tokens → null

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val boxed = TextFunctionHelpers.simhash64(
      child.eval(input).asInstanceOf[UTF8String], n)
    if (boxed == null) null else boxed.longValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val c = child.genCode(ctx)
    val boxed = ctx.freshName("simhashBoxed")
    ev.copy(code = code"""
      |${c.code}
      |java.lang.Long $boxed = graft.functions.TextFunctionHelpers.simhash64(
      |  ${c.isNull} ? null : ${c.value}, $n);
      |boolean ${ev.isNull} = $boxed == null;
      |long ${ev.value} = ${ev.isNull} ? 0L : $boxed.longValue();""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * Native Catalyst MinHash: the numHashes-minima signature of a string
 * column in ONE JVM call per row — replacing an explode + groupBy(doc)
 * with numHashes min-aggregates, i.e. a full shuffle of every gram
 * becomes a narrow codegen'd map over the scan. Bit-identical to
 * `min(hash(gram, lit(i)))` per slot (same Murmur3 chain). Null when the
 * text has fewer than n tokens.
 */
case class MinHashSignature(child: Expression, n: Int, numHashes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) {
      if (n >= 1 && numHashes >= 1) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"minhash_signature needs n, numHashes >= 1, got ($n, $numHashes)")
    } else TypeCheckResult.TypeCheckFailure(
      s"minhash_signature needs a string input, got ${child.dataType}")

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "minhash_signature"
  override def nullable: Boolean = true // < n tokens → null

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    TextFunctionHelpers.minhashSignature(
      child.eval(input).asInstanceOf[UTF8String], n, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val c = child.genCode(ctx)
    val arr = ctx.freshName("minhashArr")
    ev.copy(code = code"""
      |${c.code}
      |${CodeGenerator.javaType(dataType)} $arr =
      |  graft.functions.TextFunctionHelpers.minhashSignature(
      |    ${c.isNull} ? null : ${c.value}, $n, $numHashes);
      |boolean ${ev.isNull} = $arr == null;
      |${CodeGenerator.javaType(dataType)} ${ev.value} = $arr;""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}


/**
 * Native Unicode normalization: `unicode_normalize(text, 'NFC')`. Text
 * arriving at a 100 TB corpus mixes composed and decomposed forms of
 * the same grapheme ("e\u0301" vs "\u00e9"); every downstream exact-dedup
 * hash, shingle, and join key silently splits on the difference unless
 * ingestion canonicalizes. One JVM call per row inside whole-stage
 * codegen, with a fast path (isNormalized check, no allocation) for the
 * overwhelmingly-common already-normalized input. NULL → NULL.
 */
case class NormalizeUnicode(child: Expression, form: java.text.Normalizer.Form)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"unicode_normalize needs a string input, got ${child.dataType}")

  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  protected override def nullSafeEval(input: Any): Any =
    TextFunctionHelpers.unicodeNormalize(input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextFunctionHelpers.unicodeNormalize(" +
        s"$c, java.text.Normalizer.Form.${form.name})")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextFunctions {
  private[functions] val ident = FunctionIdentifier("word_shingles")
  private[functions] val info = new ExpressionInfo(classOf[WordShingles].getName, "word_shingles")
  private[functions] val builder = (exprs: Seq[Expression]) => {
    require(exprs.length == 2, "word_shingles takes exactly 2 arguments")
    require(exprs(1).foldable, "word_shingles n must be a literal")
    WordShingles(exprs.head, exprs(1).eval().asInstanceOf[Number].intValue())
  }

  private[functions] val winnowIdent = FunctionIdentifier("winnow_fingerprint")
  private[functions] val winnowInfo =
    new ExpressionInfo(classOf[WinnowFingerprint].getName, "winnow_fingerprint")
  private[functions] val winnowBuilder = (exprs: Seq[Expression]) => {
    require(exprs.length == 3, "winnow_fingerprint takes exactly 3 arguments")
    require(exprs(1).foldable && exprs(2).foldable,
      "winnow_fingerprint k and w must be literals")
    WinnowFingerprint(exprs.head,
      exprs(1).eval().asInstanceOf[Number].intValue(),
      exprs(2).eval().asInstanceOf[Number].intValue())
  }

  private[functions] val minhashIdent = FunctionIdentifier("minhash_signature")
  private[functions] val minhashInfo =
    new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature")
  private[functions] val minhashBuilder = (exprs: Seq[Expression]) => {
    require(exprs.length == 3, "minhash_signature takes exactly 3 arguments")
    require(exprs(1).foldable && exprs(2).foldable,
      "minhash_signature n and numHashes must be literals")
    MinHashSignature(exprs.head,
      exprs(1).eval().asInstanceOf[Number].intValue(),
      exprs(2).eval().asInstanceOf[Number].intValue())
  }

  private[functions] val normIdent = FunctionIdentifier("unicode_normalize")
  private[functions] val normInfo =
    new ExpressionInfo(classOf[NormalizeUnicode].getName, "unicode_normalize")
  private[functions] val normBuilder = (exprs: Seq[Expression]) => {
    require(exprs.length == 2, "unicode_normalize takes exactly 2 arguments")
    require(exprs(1).foldable, "unicode_normalize form must be a literal")
    NormalizeUnicode(exprs.head, java.text.Normalizer.Form.valueOf(
      exprs(1).eval().asInstanceOf[UTF8String].toString))
  }

  private[functions] val simhashIdent = FunctionIdentifier("simhash64")
  private[functions] val simhashInfo =
    new ExpressionInfo(classOf[SimHash64].getName, "simhash64")
  private[functions] val simhashBuilder = (exprs: Seq[Expression]) => {
    require(exprs.length == 2, "simhash64 takes exactly 2 arguments")
    require(exprs(1).foldable, "simhash64 n must be a literal")
    SimHash64(exprs.head, exprs(1).eval().asInstanceOf[Number].intValue())
  }

  /** Idempotently register the text functions with an existing session. */
  def ensure(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(ident)) registry.registerFunction(ident, info, builder)
    if (!registry.functionExists(winnowIdent))
      registry.registerFunction(winnowIdent, winnowInfo, winnowBuilder)
    if (!registry.functionExists(simhashIdent))
      registry.registerFunction(simhashIdent, simhashInfo, simhashBuilder)
    if (!registry.functionExists(minhashIdent))
      registry.registerFunction(minhashIdent, minhashInfo, minhashBuilder)
    if (!registry.functionExists(normIdent))
      registry.registerFunction(normIdent, normInfo, normBuilder)
  }

  // The Column builders construct the native expression nodes DIRECTLY
  // (org.apache.spark.sql.graft.ColumnBridge) — no session function
  // registry involved, so the plan is identical on every thread and
  // [[ensure]]/[[GraftExtensions]] are needed only for SQL-name access
  // (`SELECT word_shingles(...)`, BQL).
  import org.apache.spark.sql.graft.ColumnBridge.{column => nativeCol, expression => exprOf}

  /** `word_shingles(text, n)` as a Column — session-free native node. */
  def wordShingles(text: Column, n: Int): Column =
    nativeCol(WordShingles(exprOf(text), n))

  /** `cooccur_pairs(text, window)` as a Column — session-free. */
  def cooccurPairs(text: Column, window: Int): Column =
    nativeCol(CooccurPairs(exprOf(text), window))

  /** `winnow_fingerprint(text, k, w)` as a Column — session-free. */
  def winnowFingerprint(text: Column, k: Int, w: Int): Column =
    nativeCol(WinnowFingerprint(exprOf(text), k, w))

  /** `winnow_md5_fingerprint(text, k, w)` as a Column — session-free. */
  def winnowMd5Fingerprint(text: Column, k: Int, w: Int): Column =
    nativeCol(WinnowMd5Fingerprint(exprOf(text), k, w))

  /** `simhash64(text, n)` as a Column — session-free. */
  def simhash64(text: Column, n: Int): Column =
    nativeCol(SimHash64(exprOf(text), n))

  /** `minhash_signature(text, n, numHashes)` as a Column — session-free. */
  def minhashSignature(text: Column, n: Int, numHashes: Int): Column =
    nativeCol(MinHashSignature(exprOf(text), n, numHashes))

  /** `unicode_normalize(text, form)` as a Column — session-free. */
  def unicodeNormalize(text: Column, form: String): Column =
    nativeCol(NormalizeUnicode(exprOf(text),
      java.text.Normalizer.Form.valueOf(form)))

  /** `mod_anchor_positions(text, k, stride)` as a Column — session-free. */
  def modAnchorPositions(text: Column, k: Int, stride: Int): Column =
    nativeCol(ModAnchorPositions(exprOf(text), k, stride))

  /** `common_extension(t1, p1, t2, p2)` as a Column — session-free. */
  def commonExtension(t1: Column, p1: Column, t2: Column, p2: Column): Column =
    nativeCol(CommonExtension(exprOf(t1), exprOf(p1), exprOf(t2), exprOf(p2)))
}
