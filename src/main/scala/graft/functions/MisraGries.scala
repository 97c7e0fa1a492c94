package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

/** Misra–Gries heavy-hitters summary (Misra & Gries 1982; mergeable
  * form per Agarwal et al., "Mergeable Summaries", PODS'12) as a
  * Catalyst aggregate: `mg_build(word)` keeps at most K counters per
  * buffer; the shuffle carries ≤ K (word, count) pairs per map
  * partition REGARDLESS of corpus size — the heavy-hitters counterpart
  * to the CMS counter matrix, with the opposite bias (MG
  * underestimates, CMS overestimates).
  *
  * update: present → +1; room → insert 1; full → decrement ALL (items
  * hitting 0 evicted). merge: add counters pointwise; if > K survive,
  * subtract the (K+1)-th largest count from all and drop ≤ 0.
  *
  * Guarantees for ANY processing/merge order over n total items:
  *  - est(w) ≤ exact(w) ≤ est(w) + n/(K+1)   (est = 0 if absent)
  *  - exact(w) > n/(K+1)  ⇒  w IS in the summary.
  * The summary CONTENT is merge-order-dependent (unlike CMS), so the
  * oracle checks the GUARANTEES as integer-exact booleans
  * ((exact − est)·(K+1) ≤ n — no floating point anywhere), never the
  * raw estimates. Output is canonically sorted (count desc, word asc).
  */
object MisraGries {
  val K = 32
}

/** `mg_build(word)` → array<struct<word:string, cnt:bigint>>. */
case class MisraGriesBuild(
    wordExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, Long]] {

  import MisraGries.K

  override def children: Seq[Expression] = Seq(wordExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("word", StringType), StructField("cnt", LongType))))

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long]()

  override def update(buf: java.util.HashMap[String, Long],
                      input: InternalRow): java.util.HashMap[String, Long] = {
    val w = wordExpr.eval(input)
    if (w != null) {
      val s = w.asInstanceOf[UTF8String].toString
      // getOrDefault, never get: buffered counts are always ≥ 1, and
      // get() on a missing key would NPE unboxing null to Long
      val cur = buf.getOrDefault(s, 0L)
      if (cur > 0L) buf.put(s, cur + 1L)
      else if (buf.size < K) buf.put(s, 1L)
      else {
        // decrement-all; evict zeros (the classic MG step)
        val it = buf.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue <= 1L) it.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }
    buf
  }

  override def merge(buf: java.util.HashMap[String, Long],
                     other: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    other.forEach { (k, v) => buf.put(k, buf.getOrDefault(k, 0L) + v) }
    if (buf.size > K) {
      // subtract the (K+1)-th largest count from every counter
      val counts = new Array[Long](buf.size)
      var i = 0
      buf.forEach { (_, v) => counts(i) = v; i += 1 }
      java.util.Arrays.sort(counts)
      val sub = counts(counts.length - (K + 1)) // (K+1)-th largest
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= sub) it.remove() else e.setValue(e.getValue - sub)
      }
    }
    buf
  }

  override def eval(buf: java.util.HashMap[String, Long]): Any = {
    val entries = new Array[(String, Long)](buf.size)
    var i = 0
    buf.forEach { (k, v) => entries(i) = (k, v); i += 1 }
    // canonical order: count desc, word asc
    val sorted = entries.sortBy { case (w, c) => (-c, w) }
    new GenericArrayData(sorted.map { case (w, c) =>
      InternalRow(UTF8String.fromString(w), c)
    })
  }

  // length-prefixed UTF-8 bytes, NOT writeUTF: writeUTF throws on
  // strings over 65535 encoded bytes, and crawl garbage does produce
  // space-free 64 KB+ "words" — the shuffle serializer must never be
  // the thing that crashes on them
  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.forEach { (k, v) =>
      val b = k.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(v)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new java.util.HashMap[String, Long]()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.put(new String(b, "UTF-8"), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesBuild =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesBuild =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(wordExpr = c(0))
  override def prettyName: String = "mg_build"
}
