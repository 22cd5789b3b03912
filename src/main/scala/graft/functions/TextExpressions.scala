package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass native SimHash over a document's word array.
  *
  * The DataFrame formulation (explode shingles → md5 per shingle → groupBy(id) with
  * `bits` conditional sums) computes the same signature but pays an explode, a
  * hex-string md5 round trip, and a full shuffle of (id, ±1×bits) partial sums.
  * SimHash is embarrassingly parallel per document — this expression folds
  * shingling, hashing, and bit-counting into a single map-side loop: no explode, no
  * shuffle, no hex strings. At 100 TB the signature stage becomes a pure scan; only
  * the band-bucket candidate join shuffles (ids + 8-byte signatures).
  *
  * Semantics match the composed pipeline bit-for-bit (asserted in OperatorsSpec):
  *   - shingles = distinct word `n`-grams joined by ' ' (array_distinct equality on
  *     the gram string);
  *   - per-shingle hash = top 60 bits of md5, i.e.
  *     `conv(substring(md5(gram), 1, 15), 16, 10)` — first 8 digest bytes big-endian,
  *     unsigned-shifted right 4;
  *   - bit i of the signature is set iff the +1/−1 counter over shingle-hash bit i is
  *     positive (ties → 0, matching `when(sum > 0, …)`).
  *
  * Documents with fewer than `n` words produce no shingles; callers must filter them
  * out (`size(words) >= n`) for pair-set parity with the exploded form, where such
  * documents simply vanish at the explode.
  */
case class SimHashWords(child: Expression, n: Int = 3, bits: Int = 60)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_words"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 && bits >= 1 && bits <= 60 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input and 1 <= bits <= 60, " +
        s"got ${child.dataType.sql}, n=$n, bits=$bits")
  }

  override def nullSafeEval(a: Any): Any =
    SimHashWords.compute(a.asInstanceOf[ArrayData], n, bits)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SimHashWords.compute($a, $n, $bits);")

  override protected def withNewChildInternal(newChild: Expression): SimHashWords =
    copy(child = newChild)
}

/** One-pass native MinHash signature over a document's word array — same motivation
  * as [[SimHashWords]]: the composed form (explode shingles → xxhash64 → groupBy(id)
  * with k `min` aggregates) shuffles every (id, hash) pair; this computes all k
  * minima in a single map-side loop per document, so the signature stage is a pure
  * scan at any scale.
  *
  * Hashing replicates the DataFrame pipeline's exact chain (asserted bit-identical
  * in OperatorsSpec) via the same `XXH64` primitives Catalyst's `xxhash64` codegen
  * uses: base = xxhash64(gram_string) = hashUnsafeBytes(bytes, seed=42); permutation
  * i = xxhash64(base, i) = hashInt(i, hashLong(base, 42)).
  *
  * Returns `array<long>` of length `k`. Documents with fewer than `n` words must be
  * filtered out by the caller (they have no shingles, hence no signature).
  */
case class MinHashWords(child: Expression, n: Int = 3, k: Int = 32)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_words"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 && k >= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${child.dataType.sql}")
  }

  override def nullSafeEval(a: Any): Any =
    MinHashWords.compute(a.asInstanceOf[ArrayData], n, k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.MinHashWords.compute($a, $n, $k);")

  override protected def withNewChildInternal(newChild: Expression): MinHashWords =
    copy(child = newChild)
}

object MinHashWords {
  import org.apache.spark.sql.catalyst.expressions.XXH64
  import org.apache.spark.unsafe.Platform

  def compute(words: ArrayData, n: Int, k: Int): ArrayData = {
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val m = words.numElements()
    if (m >= n) {
      val seen = new java.util.HashSet[UTF8String]()
      var i = 0
      while (i <= m - n) {
        val buf = TextHashing.gramBytes(words, i, n)
        if (seen.add(UTF8String.fromBytes(buf))) {
          val base = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, buf.length, 42L)
          val seeded = XXH64.hashLong(base, 42L)
          var p = 0
          while (p < k) {
            val h = XXH64.hashInt(p, seeded)
            if (h < mins(p)) mins(p) = h
            p += 1
          }
        }
        i += 1
      }
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(mins)
  }
}

/** Shared gram assembly: bytes of `n` words starting at `i`, joined by ' '
  * (the `concat_ws(" ", …)` shape).
  */
private[functions] object TextHashing {
  def gramBytes(words: ArrayData, i: Int, n: Int): Array[Byte] = {
    var len = n - 1
    var j = 0
    while (j < n) {
      val w = words.getUTF8String(i + j)
      if (w != null) len += w.numBytes()
      j += 1
    }
    val buf = new Array[Byte](len)
    var off = 0
    j = 0
    while (j < n) {
      if (j > 0) { buf(off) = ' '; off += 1 }
      val w = words.getUTF8String(i + j)
      if (w != null) {
        val wb = w.getBytes
        System.arraycopy(wb, 0, buf, off, wb.length)
        off += wb.length
      }
      j += 1
    }
    buf
  }
}

object SimHashWords {

  private val localDigest: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(words: ArrayData, n: Int, bits: Int): Long = {
    val m = words.numElements()
    if (m < n) return 0L
    val counters = new Array[Int](bits)
    val seen = new java.util.HashSet[UTF8String]()
    val md = localDigest.get()
    var i = 0
    while (i <= m - n) {
      val buf = TextHashing.gramBytes(words, i, n)
      if (seen.add(UTF8String.fromBytes(buf))) {
        md.reset()
        val d = md.digest(buf)
        var h = 0L
        var k = 0
        while (k < 8) { h = (h << 8) | (d(k) & 0xFFL); k += 1 }
        h = h >>> 4 // top 60 bits == conv(substring(md5hex, 1, 15), 16, 10)
        var b = 0
        while (b < bits) {
          counters(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < bits) { if (counters(b) > 0) sig |= 1L << b; b += 1 }
    sig
  }
}

/** All sliding `window`-word hashes of a document as one map-side array —
  * position i holds `xxhash64(concat_ws(' ', words[i..i+window)))`, the exact
  * Catalyst chain (`XXH64.hashUnsafeBytes`, seed 42), asserted bit-identical to
  * the `transform(sequence(...), i => xxhash64(concat_ws(slice(...))))`
  * formulation in OperatorsSpec. The higher-order-function form allocates a
  * sliced array plus a concatenated string PER POSITION through Catalyst's
  * lambda machinery; this loop builds each window's bytes once into a local
  * buffer and hashes it — the duplicate-span scan stays a pure codegen stage.
  * Documents shorter than `window` return an empty array.
  */
case class WindowHashes(child: Expression, window: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "window_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if window >= 1 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${child.dataType.sql}")
  }

  override def nullSafeEval(a: Any): Any =
    WindowHashes.compute(a.asInstanceOf[ArrayData], window)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.WindowHashes.compute($a, $window);")

  override protected def withNewChildInternal(newChild: Expression): WindowHashes =
    copy(child = newChild)
}

object WindowHashes {
  import org.apache.spark.sql.catalyst.expressions.XXH64
  import org.apache.spark.unsafe.Platform

  def compute(words: ArrayData, window: Int): ArrayData = {
    val m = words.numElements()
    val n = if (m >= window) m - window + 1 else 0
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val buf = TextHashing.gramBytes(words, i, window)
      out(i) = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, buf.length, 42L)
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** Per-document distinct shingle-hash set as ONE map-side array: shingling,
  * dedup, and xxhash64 fused into a single loop — no gram strings materialized in
  * the row, no string explode. The Jaccard pipelines only ever compare shingles
  * for equality, so each document reduces to a sorted `array<long>` of its gram
  * hashes: candidate verification becomes a map-side `array_intersect` over two
  * ~doc-length arrays instead of an (candidate × shingles) join + count shuffle,
  * and the exploded `(id, hash)` form — when the inverted index still needs it —
  * is a cheap `explode` of longs.
  *
  * Hash parity with the composed pipeline (`xxhash64(gram_string)` over
  * `array_distinct` grams joined by ' ') is exact — same `XXH64.hashUnsafeBytes`
  * chain as [[MinHashWords]] (asserted in OperatorsSpec). Output is sorted
  * ascending for plan stability; documents with fewer than `n` words return an
  * empty array (callers filter `size > 0` for parity with the exploded form).
  */
case class ShingleHashes(child: Expression, n: Int = 3)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${child.dataType.sql}")
  }

  override def nullSafeEval(a: Any): Any =
    ShingleHashes.compute(a.asInstanceOf[ArrayData], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.ShingleHashes.compute($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  import org.apache.spark.sql.catalyst.expressions.XXH64
  import org.apache.spark.unsafe.Platform

  def compute(words: ArrayData, n: Int): ArrayData = {
    val m = words.numElements()
    val out = new java.util.ArrayList[java.lang.Long]()
    if (m >= n) {
      // distinct by gram STRING (matching array_distinct on the gram text), then
      // hash — two distinct grams colliding in xxhash64 would duplicate a value
      // here exactly as they collide in the exploded (id, hash) form
      val seen = new java.util.HashSet[UTF8String]()
      var i = 0
      while (i <= m - n) {
        val buf = TextHashing.gramBytes(words, i, n)
        if (seen.add(UTF8String.fromBytes(buf)))
          out.add(XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, buf.length, 42L))
        i += 1
      }
    }
    val arr = new Array[Long](out.size())
    var j = 0
    while (j < arr.length) { arr(j) = out.get(j); j += 1 }
    java.util.Arrays.sort(arr)
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(arr)
  }
}

/** Stopword-count language ID fused into one native expression.
  *
  * The composed Column formulation ([[graft.operators.TextAnalysis.langIdComposed]])
  * inlines `concat(' ', lower(text), ' ')` into every keyword-occurrence count —
  * ~64 copies of the lowered text across the CASE — and the generated Janino method
  * blows past the JVM method-size limit, so whole-stage codegen falls back to
  * interpreted mode for any projection containing it. This expression is a single
  * static call: the projection stays inside codegen, and the text is lowered once
  * per row instead of once per keyword.
  *
  * Semantics are bit-identical to the composed form (asserted in OperatorsSpec):
  * CJK presence short-circuits to "zh"; otherwise per-language scores sum
  * NON-OVERLAPPING occurrences of " kw " in ' '||lower(text)||' ' (the same count
  * the portable length-difference/replace trick produces, so the DuckDB oracle
  * needs no lookarounds), with the deterministic en > de > fr > es tie-break.
  */
case class StopwordLangId(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "stopword_lang_id"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${child.dataType.sql}")
  }

  override def nullSafeEval(s: Any): Any =
    StopwordLangId.compute(s.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.StopwordLangId.compute($s);")

  override protected def withNewChildInternal(newChild: Expression): StopwordLangId =
    copy(child = newChild)
}

object StopwordLangId {

  /** Single source of truth for the stopword lists — the DuckDB oracle generator and
    * the composed parity formulation both read these.
    */
  val keywords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "que", "des"),
    "es" -> Seq("el", "los", "las", "es", "una", "que", "por", "con"))

  private val needles: Array[Array[String]] =
    keywords.map(_._2.map(k => s" $k ").toArray).toArray

  private val ZH = UTF8String.fromString("zh")
  private val LANGS = keywords.map(k => UTF8String.fromString(k._1)).toArray
  private val UNKNOWN = UTF8String.fromString("unknown")

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(s: UTF8String): UTF8String = {
    val raw = s.toString
    var i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (c >= '一' && c <= '鿿') return ZH
      i += 1
    }
    // UTF8String.toLowerCase is exactly what the `lower` function applies
    val t = " " + s.toLowerCase.toString + " "
    val sc = new Array[Int](needles.length)
    var li = 0
    while (li < needles.length) {
      val ks = needles(li)
      var total = 0
      var j = 0
      while (j < ks.length) {
        val kw = ks(j)
        var idx = t.indexOf(kw)
        while (idx >= 0) { total += 1; idx = t.indexOf(kw, idx + kw.length) }
        j += 1
      }
      sc(li) = total
      li += 1
    }
    val en = sc(0); val de = sc(1); val fr = sc(2); val es = sc(3)
    if (en >= de && en >= fr && en >= es && en > 0) LANGS(0)
    else if (de >= fr && de >= es && de > 0) LANGS(1)
    else if (fr >= es && fr > 0) LANGS(2)
    else if (es > 0) LANGS(3)
    else UNKNOWN
  }
}
