package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the text-dedup hash pipeline.
  *
  * The previous route built shingles + MinHash bases out of built-in
  * higher-order functions (`transform` / `zip_with` / `array_min`).
  * Those are interpreted (no codegen), allocate an intermediate array
  * per lambda, and are so sensitive to re-inlining and JIT state that
  * the round-1 driver bench recorded 128 s for `q_minhash_lsh` in-suite
  * vs 1.2 s isolated. These expressions do the same arithmetic in one
  * compiled pass per row — a single md5 per distinct shingle / word,
  * no intermediate Catalyst arrays — and sit inside whole-stage codegen
  * as a plain static call, so cost is stable under any session state.
  *
  * Hash definitions are bit-identical to the DuckDB oracle SQL
  * (md5 hex, 15-hex-digit base-16 parses, mod P arithmetic): see
  * graft.llm.TextPrep for the SQL twins.
  */
object TextHash {

  /** Modulus for the arithmetic MinHash hash family (Kirsch–
    * Mitzenmacher: h_i = (a + i*b) mod P; fits a + 15*b in a long). */
  val HashP = 1000000007L

  private val hexDigits = "0123456789abcdef".toCharArray

  private val mdLocal = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private def md5Hex(s: String): String = {
    val md = mdLocal.get()
    md.reset()
    val d = md.digest(s.getBytes(StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexDigits((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexDigits(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  private val emptyShingles: InternalRow = {
    val e = new GenericArrayData(Array.empty[Any])
    val el = new GenericArrayData(Array.empty[Long])
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](e, el, el))
  }

  /** Distinct word n-gram shingles of lower(text) + the two md5-derived
    * MinHash base hashes per shingle. Matches the SQL twin exactly:
    * words = regex-split(lower(text), " ") keeping empties; shingle =
    * space-join of n consecutive words; ha = parse(hex[0,15)) mod P,
    * hb = parse(hex[16,31)) mod P. Returns struct(shs, ha, hb). */
  /** Space-joined word n-gram starting at `i`, built into the reused
    * builder — ONE definition of gram assembly for the shingle and
    * positional-gram kernels. */
  private def gramAt(sb: java.lang.StringBuilder, words: Array[String],
                     i: Int, n: Int): String = {
    sb.setLength(0)
    var j = 0
    while (j < n) {
      if (j > 0) sb.append(' ')
      sb.append(words(i + j))
      j += 1
    }
    sb.toString
  }

  /** The 60-bit md5-derived hash pair — THE oracle-parity-critical
    * formula (twin of TextPrep.sqlShingleCtes' substr(md5, 1, 15) /
    * substr(md5, 17, 15) parses), defined ONCE so the shingle and
    * positional-gram kernels can never drift apart. */
  private def hex60a(hex: String): Long =
    java.lang.Long.parseLong(hex.substring(0, 15), 16) % HashP
  private def hex60b(hex: String): Long =
    java.lang.Long.parseLong(hex.substring(16, 31), 16) % HashP

  def computeShingles(text: UTF8String, n: Int): InternalRow = {
    val words = text.toLowerCase.toString.split(" ", -1)
    if (words.length < n) return emptyShingles
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= words.length - n) {
      seen.add(gramAt(sb, words, i, n))
      i += 1
    }
    val m = seen.size
    val shs = new Array[Any](m)
    val ha = new Array[Long](m)
    val hb = new Array[Long](m)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) {
      val s = it.next()
      val hex = md5Hex(s)
      ha(k) = hex60a(hex)
      hb(k) = hex60b(hex)
      shs(k) = UTF8String.fromString(s)
      k += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](new GenericArrayData(shs), new GenericArrayData(ha),
        new GenericArrayData(hb)))
  }

  /** Distinct lowercase character n-grams of a document, first-
    * occurrence order. The trigram-LID hot path: the built-in route
    * (`transform(sequence(...)) → substring → array_distinct`) is an
    * interpreted higher-order lambda allocating one Catalyst array per
    * row plus a full intermediate gram array BEFORE deduplication;
    * this is one compiled pass with row-local dedup. Semantics match
    * `list_distinct(list_transform(generate_series(1, len-(n-1)),
    * i -> substr(lower(text), i, n)))` on the oracle side — in
    * code-POINT positions, like [[computeWinnow]]: DuckDB's
    * substr/len are character-based, so gramming by UTF-16 code
    * units would split surrogate pairs and silently break parity on
    * any non-BMP document. */
  def computeCharGrams(text: UTF8String, n: Int): ArrayData = {
    val cp = text.toLowerCase.toString.codePoints().toArray
    if (cp.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i <= cp.length - n) {
      seen.add(new String(cp, i, n))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) {
      out(k) = UTF8String.fromString(it.next())
      k += 1
    }
    new GenericArrayData(out)
  }

  /** MinHash signature: sig(i) = min_j (ha(j) + i*hb(j)) mod P for
    * i in [0, k). One pass over the base hashes; empty input yields an
    * empty signature (callers filter size(shs) > 0 upstream). */
  def computeMinhash(ha: ArrayData, hb: ArrayData, k: Int): ArrayData = {
    val m = ha.numElements()
    // minhash_sigs is SQL-exposed: mismatched arrays must fail loudly —
    // the loop indexes hb by ha's length, and an UnsafeArrayData input
    // would otherwise read off-buffer and return silent garbage
    if (hb.numElements() != m) throw new IllegalArgumentException(
      s"minhash_sigs: ha and hb must be equal-length (got $m vs ${hb.numElements()})")
    if (m == 0) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](k)
    var i = 0
    while (i < k) {
      var mn = Long.MaxValue
      var j = 0
      while (j < m) {
        val v = (ha.getLong(j) + i * hb.getLong(j)) % HashP
        if (v < mn) mn = v
        j += 1
      }
      out(i) = mn
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Rabin-Karp polynomial hash parameters for winnowing: Horner fold
    * acc = (acc*B + char) mod P over k-char grams. */
  val RollB = 257L

  /** Winnowing document fingerprints (Schleimer et al., SIGMOD'03):
    * rolling Rabin-Karp hash over character k-grams of lower(text),
    * minimum hash of every w-window of consecutive gram hashes,
    * distinct minima sorted ascending. The rolling update
    * h' = (h - c_out·B^(k-1))·B + c_in (mod P) makes the gram pass
    * O(n) instead of O(n·k); the SQL oracle computes each gram hash
    * directly by Horner — identical values by construction. */
  def computeWinnow(text: UTF8String, k: Int, w: Int): ArrayData = {
    // SQL-exposed: nonsensical parameters must fail loudly, not index
    // out of bounds (w = 0 skips the window minima loop and reads past
    // the gram-hash array; k < 1 makes the gram count exceed the text)
    if (k < 1 || w < 1) throw new IllegalArgumentException(
      s"winnow_fps: gram size and window must be >= 1 (got k=$k, w=$w)")
    // Code-POINT semantics (not UTF-16 code units): the DuckDB twin
    // grams via substr/ascii, which are character-based, so surrogate
    // pairs must count as one position with their full code point value
    // or Spark↔oracle parity silently breaks outside the BMP.
    val cp = text.toLowerCase.toString.codePoints().toArray
    val n = cp.length
    val numGrams = n - k + 1
    val numWindows = numGrams - w + 1
    if (numWindows <= 0) return new GenericArrayData(Array.empty[Long])
    val h = new Array[Long](numGrams)
    // B^(k-1) mod P for the roll-out term
    var bk = 1L
    var i = 0
    while (i < k - 1) { bk = bk * RollB % HashP; i += 1 }
    // first gram by Horner
    var acc = 0L
    i = 0
    while (i < k) { acc = (acc * RollB + cp(i).toLong) % HashP; i += 1 }
    h(0) = acc
    i = 1
    while (i < numGrams) {
      val out = cp(i - 1).toLong * bk % HashP
      acc = ((acc - out + HashP) % HashP * RollB + cp(i + k - 1).toLong) % HashP
      h(i) = acc
      i += 1
    }
    val seen = new java.util.TreeSet[java.lang.Long]()
    i = 0
    while (i < numWindows) {
      var mn = h(i)
      var j = 1
      while (j < w) { if (h(i + j) < mn) mn = h(i + j); j += 1 }
      seen.add(mn)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var m = 0
    while (it.hasNext) { out(m) = it.next(); m += 1 }
    new GenericArrayData(out)
  }

  /** POSITIONAL word n-gram hashes of lower(text): one 60-bit hash per
    * gram occurrence, in document order, NOT de-duplicated — the base
    * of the duplicated-passage statistics, where position and
    * multiplicity matter (computeShingles deliberately de-dups for the
    * set-similarity family). Hash = parse(md5 hex[0,15)) mod P, the
    * same `ha` formula as the MinHash base, so the DuckDB twin is the
    * one-line expression already used in TextPrep.sqlShingleCtes. */
  def computeGramHashesPos(text: UTF8String, n: Int): ArrayData = {
    val words = text.toLowerCase.toString.split(" ", -1)
    if (words.length < n) return new GenericArrayData(Array.empty[Long])
    val m = words.length - n + 1
    val out = new Array[Long](m)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < m) {
      out(i) = hex60a(md5Hex(gramAt(sb, words, i, n)))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** NFC normalization with an is-normalized fast path (quick-check
    * true → return the input UTF8String untouched, no allocation). */
  def normalizeNfc(text: UTF8String): UTF8String = {
    val s = text.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) text
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  /** Multiplicity of the most frequent word of lower(text), split on
    * single spaces (empty tokens count, matching split semantics in
    * both engines). O(n) one-pass hash count. */
  def computeTopWordCount(text: UTF8String): Long = {
    val words = text.toLowerCase.toString.split(" ", -1)
    val counts = new java.util.HashMap[String, Long](words.length * 2)
    var best = 0L
    var i = 0
    while (i < words.length) {
      val c = counts.merge(words(i), 1L, (a, b) => a + b)
      if (c > best) best = c
      i += 1
    }
    best
  }

  /** 64-bit SimHash over the word multiset of lower(text).
    * Bit j (0-based) is set iff the sum over words of the per-word vote
    * is >= 0, where word w votes +1 on bit j iff:
    *   j <  32: hex digit j of md5(w) has nibble bit 8 (digit in 8..f)
    *   j >= 32: hex digit j-32 of md5(w) has nibble bit 4
    *            (digit in {4,5,6,7,c,d,e,f})
    * One md5 per DISTINCT word per row, votes weighted by the word's
    * multiplicity — natural text repeats words heavily (the whole
    * reason the Gopher top-word filters exist), so hashing per
    * occurrence would redo identical digests by the inverse
    * type-token ratio. Vote sums are identical either way; votes
    * accumulate in Long so no document length can wrap them. */
  def computeSimhash(text: UTF8String): Long = {
    val words = text.toLowerCase.toString.split(" ", -1)
    val counts = new java.util.HashMap[String, Long](words.length * 2)
    var wi = 0
    while (wi < words.length) {
      counts.merge(words(wi), 1L, (a, b) => a + b)
      wi += 1
    }
    val votes = new Array[Long](64)
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue.longValue()
      val hex = md5Hex(e.getKey)
      var i = 0
      while (i < 32) {
        val nib = Character.digit(hex.charAt(i), 16)
        if ((nib & 8) != 0) votes(i) += c else votes(i) -= c
        if ((nib & 4) != 0) votes(32 + i) += c else votes(32 + i) -= c
        i += 1
      }
    }
    var fp = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) >= 0) fp |= (1L << j)
      j += 1
    }
    fp
  }
}

/** `shingle_hashes(text, n)` → struct(shs: array<string>,
  * ha: array<long>, hb: array<long>). */
case class ShingleHashes(child: Expression, shingleWords: Int)
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("shs", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("ha", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("hb", ArrayType(LongType, containsNull = false), nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes requires a string argument, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    TextHash.computeShingles(input.asInstanceOf[UTF8String], shingleWords)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHash.computeShingles($c, $shingleWords);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `nfc_normalize(text)` → string in Unicode Normalization Form C.
  * The canonical first step of text curation: composed vs decomposed
  * accents (é as U+00E9 vs e + U+0301) hash differently, so exact
  * dedup and every md5-keyed operator silently misses duplicates
  * until the corpus is normalized. java.text.Normalizer implements
  * the same Unicode standard as DuckDB's utf8proc-based
  * nfc_normalize, so the oracle twin is the built-in of the same
  * name. Row-local, codegen'd, with a fast path: NFC-clean text
  * (the overwhelming majority) is returned without allocation. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires a string argument, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    TextHash.normalizeNfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHash.normalizeNfc($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `char_grams(text, n)` → array<string> of DISTINCT lowercase
  * character n-grams, first-occurrence order. */
case class CharGrams(child: Expression, gramChars: Int)
    extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_grams requires a string argument, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    TextHash.computeCharGrams(input.asInstanceOf[UTF8String], gramChars)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHash.computeCharGrams($c, $gramChars);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `gram_hashes_pos(text, n)` → array<long> of per-position word
  * n-gram hashes (document order, duplicates kept). */
case class GramHashesPos(child: Expression, gramWords: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"gram_hashes_pos requires a string argument, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    TextHash.computeGramHashesPos(input.asInstanceOf[UTF8String], gramWords)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHash.computeGramHashesPos($c, $gramWords);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `minhash_sigs(ha, hb, k)` → array<long> of the k MinHash mins. */
case class MinhashSigs(left: Expression, right: Expression, numHashes: Int)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_sigs requires two array<bigint> arguments, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextHash.computeMinhash(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.TextHash.computeMinhash($a, $b, $numHashes);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `simhash64(text)` → bigint 64-bit SimHash fingerprint (row-local —
  * no explode, no shuffle). */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires a string argument, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    TextHash.computeSimhash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHash.computeSimhash($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `winnow_fps(text, k, w)` → array<bigint> of the document's
  * winnowing fingerprints (distinct window minima, sorted). */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"winnow_fps requires a string argument, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    TextHash.computeWinnow(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHash.computeWinnow($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `top_word_count(text)` → bigint multiplicity of the most frequent
  * word of lower(text) (the Gopher top-word repetition signal). O(n)
  * hash count — the higher-order `transform(filter(...))` route is
  * O(n²) AND interpreted, the round-1 lesson. */
case class TopWordCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"top_word_count requires a string argument, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    TextHash.computeTopWordCount(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHash.computeTopWordCount($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextHashExprs {
  /** Register SQL-callable text-hash functions on a session (idempotent).
    * Delegates to the single [[GraftFunctions]] registry so the two entry
    * points can never drift apart. */
  def register(spark: SparkSession): Unit = GraftFunctions.registerAll(spark)
}
