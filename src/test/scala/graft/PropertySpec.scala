package graft

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{TextHash, TopKByScore}

/** Property tests for the custom Catalyst kernels — the optimized
  * imperative implementations (rolling hashes, bounded heaps, single
  * md5 passes) are each checked against a straightforward functional
  * reimplementation on arbitrary inputs. The oracle queries prove
  * Spark ≡ DuckDB on the corpus; these prove the kernels match their
  * specification on inputs the corpus never exercises (empty strings,
  * NaN scores, tie storms, adversarial word shapes).
  */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop, n: Int = 300): Unit = {
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(n).withInitialSeed(42L), p)
    assert(res.passed, res.status.toString)
  }

  private def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private val word: Gen[String] =
    Gen.oneOf(Gen.alphaLowerStr.map(_.take(6)), Gen.const(""), Gen.numStr.map(_.take(4)))
  private val text: Gen[String] =
    Gen.listOfN(12, word).map(_.mkString(" ")).flatMap(t =>
      Gen.oneOf(t, t.toUpperCase, ""))

  test("shingle_hashes matches the spec reimplementation") {
    check(Prop.forAll(text, Gen.choose(1, 4)) { (t, n) =>
      val row = TextHash.computeShingles(UTF8String.fromString(t), n)
      val got = (0 until row.getArray(0).numElements()).map { i =>
        (row.getArray(0).getUTF8String(i).toString,
          row.getArray(1).getLong(i), row.getArray(2).getLong(i))
      }
      val words = t.toLowerCase.split(" ", -1)
      val expected =
        if (words.length < n) Seq.empty
        else words.sliding(n).map(_.mkString(" ")).toSeq.distinct.map { sh =>
          val h = md5Hex(sh)
          (sh,
            java.lang.Long.parseLong(h.substring(0, 15), 16) % TextHash.HashP,
            java.lang.Long.parseLong(h.substring(16, 31), 16) % TextHash.HashP)
        }
      got == expected
    })
  }

  test("minhash_sigs is the arithmetic-family minimum per seed") {
    val bases = Gen.listOf(Gen.zip(
      Gen.choose(0L, TextHash.HashP - 1), Gen.choose(0L, TextHash.HashP - 1)))
    check(Prop.forAll(bases, Gen.choose(1, 16)) { (hs, k) =>
      val ha = new GenericArrayData(hs.map(_._1).toArray)
      val hb = new GenericArrayData(hs.map(_._2).toArray)
      val sig = TextHash.computeMinhash(ha, hb, k)
      if (hs.isEmpty) sig.numElements() == 0
      else (0 until k).forall { i =>
        sig.getLong(i) == hs.map { case (a, b) => (a + i * b) % TextHash.HashP }.min
      }
    })
  }

  test("simhash64 matches the bit-vote spec") {
    check(Prop.forAll(text) { t =>
      val got = TextHash.computeSimhash(UTF8String.fromString(t))
      val words = t.toLowerCase.split(" ", -1)
      val expected = (0 until 64).foldLeft(0L) { (fp, j) =>
        val votes = words.map { w =>
          val nib = Character.digit(md5Hex(w).charAt(j % 32), 16)
          val hit = if (j < 32) (nib & 8) != 0 else (nib & 4) != 0
          if (hit) 1 else -1
        }.sum
        if (votes >= 0) fp | (1L << j) else fp
      }
      got == expected
    })
  }

  test("winnow_fps equals direct gram-hash window minima (incl. non-BMP)") {
    // Mix in multi-byte and astral (surrogate-pair) characters: the
    // kernel must hash CODE POINTS, not UTF-16 code units, to match
    // the oracle's character-based substr/ascii semantics.
    val uniWord: Gen[String] =
      Gen.oneOf(word, Gen.const("héllo"), Gen.const("日本語"),
        Gen.const("a𝕏 b"), Gen.const("😀😀"))
    val uniText: Gen[String] =
      Gen.listOfN(12, uniWord).map(_.mkString(" ")).flatMap(t =>
        Gen.oneOf(t, t.toUpperCase, ""))
    check(Prop.forAll(uniText, Gen.choose(2, 8), Gen.choose(1, 5)) { (t, k, w) =>
      val got = {
        val a = TextHash.computeWinnow(UTF8String.fromString(t), k, w)
        (0 until a.numElements()).map(a.getLong)
      }
      val cps = t.toLowerCase.codePoints().toArray
      val grams = if (cps.length < k) Seq.empty
        else (0 to cps.length - k).map { i =>
          (i until i + k).foldLeft(0L)((acc, j) =>
            (acc * TextHash.RollB + cps(j).toLong) % TextHash.HashP)
        }
      val expected =
        if (grams.length < w) Seq.empty
        else grams.sliding(w).map(_.min).toSeq.distinct.sorted
      got == expected
    })
  }

  test("top_word_count equals naive multiset maximum") {
    check(Prop.forAll(text) { t =>
      val got = TextHash.computeTopWordCount(UTF8String.fromString(t))
      val expected = t.toLowerCase.split(" ", -1)
        .groupBy(identity).values.map(_.length.toLong).max
      got == expected
    })
  }

  test("top_k_by heap equals sort-take under ties, NaN, and -0.0") {
    val entry = Gen.zip(
      Gen.oneOf(Gen.choose(-10.0, 10.0),
        Gen.oneOf(0.0, -0.0, 1.0, Double.NaN)),
      Gen.choose(0L, 20L))
    // SQL total order: NaN ranks above everything in DESC (as in
    // Spark's sort and DuckDB's ORDER BY), -0.0 ties with +0.0.
    def canon(s: Double): Double = if (s == 0.0d) 0.0d else s
    def bits(p: (Double, Long)): (Long, Long) =
      (java.lang.Double.doubleToLongBits(canon(p._1)), p._2)
    check(Prop.forAll(Gen.listOf(entry), Gen.choose(1, 8)) { (xs, k) =>
      val heap = new TopKByScore.Heap(k)
      xs.foreach { case (s, i) => heap.insert(s, i) }
      val got = heap.sortedDesc().toSeq
      val expected = xs
        .map { case (s, i) => (canon(s), i) }
        .sortWith { case ((sa, ia), (sb, ib)) =>
          val c = java.lang.Double.compare(sa, sb)
          c > 0 || (c == 0 && ia < ib)
        }.take(k)
      got.map(bits) == expected.map(bits)
    })
  }

  test("cms: hash columns match the md5-hex spec; estimate >= true count; merge == union") {
    import graft.functions.Cms
    // cols() reads digest bytes directly; re-derive via hex parsing
    check(Prop.forAll(Gen.alphaNumStr.suchThat(_.nonEmpty)) { s =>
      val hex = md5Hex(s)
      val ha = java.lang.Long.parseLong(hex.substring(0, 15), 16) % Cms.HashP
      val hb = java.lang.Long.parseLong(hex.substring(16, 31), 16) % Cms.HashP
      val expect = Array.tabulate(Cms.Depth)(i =>
        ((ha + (i + 1) * hb) % Cms.HashP % Cms.Width).toInt)
      Cms.cols(UTF8String.fromString(s)).toSeq == expect.toSeq
    }, n = 200)
    // overcount guarantee + merge-commutes on random word bags
    val word = Gen.oneOf("a", "b", "cc", "dd", "ee", "ff", "gg", "hh")
    check(Prop.forAll(Gen.listOf(word), Gen.listOf(word)) { (xs, ys) =>
      def build(ws: Seq[String]): Array[Long] = {
        val buf = new Array[Long](Cms.Depth * Cms.Width)
        ws.foreach { w =>
          val cs = Cms.cols(UTF8String.fromString(w))
          (0 until Cms.Depth).foreach(i => buf(i * Cms.Width + cs(i)) += 1L)
        }
        buf
      }
      def query(buf: Array[Long], w: String): Long = {
        val cs = Cms.cols(UTF8String.fromString(w))
        (0 until Cms.Depth).map(i => buf(i * Cms.Width + cs(i))).min
      }
      val merged = build(xs).zip(build(ys)).map { case (a, b) => a + b }
      val direct = build(xs ++ ys)
      val all = (xs ++ ys)
      merged.toSeq == direct.toSeq &&
        all.distinct.forall(w => query(direct, w) >= all.count(_ == w))
    }, n = 100)
  }

  test("misra-gries: guarantees hold under arbitrary split/merge and overflow") {
    import graft.functions.{MisraGries, MisraGriesBuild}
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.StringType
    val agg = MisraGriesBuild(BoundReference(0, StringType, nullable = true))
    // 100 distinct tokens (>> K = 32, so eviction and merge-prune both
    // fire) with a skewed head that must survive as a heavy hitter
    val word = Gen.frequency(
      (6, Gen.const("hot")), (3, Gen.const("warm")),
      (1, Gen.choose(0, 99).map(i => s"w$i")))
    def build(ws: Seq[String]) = {
      val b = agg.createAggregationBuffer()
      ws.foreach(w => agg.update(b, InternalRow(UTF8String.fromString(w))))
      b
    }
    check(Prop.forAll(
      Gen.listOfN(200, word), Gen.listOfN(150, word), Gen.listOfN(80, word)) {
      (xs, ys, zs) =>
        val merged = agg.merge(agg.merge(build(xs), build(ys)), build(zs))
        val all = xs ++ ys ++ zs
        val n = all.size.toLong
        val K = MisraGries.K
        merged.size <= K &&
          all.distinct.forall { w =>
            val c = all.count(_ == w).toLong
            val est = merged.getOrDefault(w, 0L)
            est <= c && (c - est) * (K + 1) <= n &&
              (c * (K + 1) <= n || est > 0L)
          }
    }, n = 60)
  }

  test("html_extract: wrapping arbitrary escaped text in blocks extracts it back") {
    // escape markup-active chars the way a generator must, then the
    // extractor must return exactly the whitespace-collapsed text —
    // the round-trip law the oracle fixture relies on
    def esc(s: String) =
      s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    def collapse(s: String) =
      s.replaceAll("[ \t\n\r]+", " ").trim
    val anyText: Gen[String] = Gen.listOfN(10,
      Gen.oneOf(word, Gen.const("&"), Gen.const("<"), Gen.const(">"),
        Gen.const("  "), Gen.const("\t"))).map(_.mkString(" "))
    check(Prop.forAll(anyText, anyText, anyText) { (a, b, boiler) =>
      val html = s"<html><head><title>x</title></head><body>" +
        s"<nav>${esc(boiler)}</nav><p>${esc(a)}</p><div>${esc(b)}</div></body></html>"
      val r = graft.functions.HtmlText.computeHtmlExtract(
        UTF8String.fromString(html))
      val main = r.getUTF8String(0).toString
      main == collapse(collapse(a) + " " + collapse(b)) &&
        r.getInt(2) == main.length &&
        r.getInt(4) == collapse(boiler).length
    }, n = 200)
  }

  test("url_parts: parsing a URL built from arbitrary components recovers them") {
    val label: Gen[String] = Gen.chooseNum(1, 8)
      .flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
    check(Prop.forAll(label, label, label, Gen.choose(0, 4),
      Gen.choose(0, 65535), Gen.oneOf(true, false), Gen.oneOf(true, false)) {
      (sub, site, tld, depth, port, withPort, withQuery) =>
        val host = s"$sub.$site.$tld"
        val url = "https://" + host +
          (if (withPort) s":$port" else "") +
          (0 until depth).map(i => s"/p$i").mkString +
          (if (withQuery) "?k=v" else "")
        val r = graft.functions.UrlText.computeUrlParts(
          UTF8String.fromString(url))
        r.getUTF8String(1).toString == host &&
          r.getUTF8String(2).toString == s"$site.$tld" &&
          r.getUTF8String(3).toString == tld &&
          r.getUTF8String(4).toString ==
            (0 until depth).map(i => s"/p$i").mkString &&
          r.getInt(5) == (if (withPort) port else 0) &&
          r.getInt(6) == depth &&
          r.getBoolean(7) == withQuery
    }, n = 300)
  }

  test("heap merge is equivalent to inserting the union") {
    val entry = Gen.zip(Gen.choose(-5.0, 5.0), Gen.choose(0L, 30L))
    check(Prop.forAll(Gen.listOf(entry), Gen.listOf(entry), Gen.choose(1, 6)) {
      (xs, ys, k) =>
        val h1 = new TopKByScore.Heap(k)
        xs.foreach { case (s, i) => h1.insert(s, i) }
        val h2 = new TopKByScore.Heap(k)
        ys.foreach { case (s, i) => h2.insert(s, i) }
        h1.mergeFrom(h2)
        val direct = new TopKByScore.Heap(k)
        (xs ++ ys).foreach { case (s, i) => direct.insert(s, i) }
        h1.sortedDesc().toSeq == direct.sortedDesc().toSeq
    })
  }
}
