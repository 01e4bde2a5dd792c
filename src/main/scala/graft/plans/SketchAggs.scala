package org.apache.spark.sql.graft
// Lives under org.apache.spark.sql for the same reason as DotProduct.scala:
// access to ExpressionUtils so the aggregates are usable as Columns.
// Consumed through the public graft.plans.Sketch facade.

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Mergeable sketch aggregates — the 100-TB cardinality/frequency
  * primitives: each task folds its partition into a FIXED-size state
  * (1 KB HLL registers / d·w counters / k minimum hashes), partial
  * states merge on the reduce side, and nothing proportional to the
  * key cardinality ever shuffles. The exact twins (`groupBy(key)
  * .distinct`, full frequency counts) shuffle every key instance; at
  * corpus scale that is the difference between kilobytes and terabytes
  * on the exchange.
  *
  * Determinism contract (the repo's oracle convention): the inputs are
  * md5-derived integer hashes computed by BUILT-IN expressions
  * (`conv(substr(md5(x),1,13),16,10)` — 52-bit, the `dedup_minhash_lsh`
  * idiom), so a DuckDB oracle recomputes every register/counter/minimum
  * exactly; the sketch state is integer-exact, never
  * platform-dependent. No reference analog (builder-brief extension);
  * algorithms per the published HLL (Flajolet et al. 2007), CMS
  * (Cormode–Muthukrishnan 2005), and KMV/theta (Bar-Yossef et al. 2002)
  * papers.
  */

/** HyperLogLog register builder over 52-bit hashes: m = 2^p registers,
  * register j = low p bits, rho = leading-zero run (+1) of the
  * remaining (52-p)-bit field. Evaluates to the raw register array
  * (int, length m) so downstream SQL composes the estimate — and a
  * spec can pin register equality against an independent fold. */
case class HllSketchAgg(
    child: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]]
  with UnaryLike[Expression] with ExpectsInputTypes {

  require(p >= 4 && p <= 16, "p in [4,16]")
  private val m = 1 << p
  private val wBits = 52 - p

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_hll"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      // The register math assumes a 52-bit non-negative hash (the
      // md5-substr idiom); mask so a wider input (e.g. raw xxhash64)
      // degrades to its low 52 bits instead of silently dropping the
      // value (w >>> p exceeding wBits made rho <= 0 and the update
      // a no-op, biasing the estimate with no error).
      val h = v.asInstanceOf[Long] & ((1L << 52) - 1)
      val j = (h & (m - 1)).toInt
      val w = h >>> p
      val rho =
        if (w == 0L) wBits + 1
        else wBits - (63 - java.lang.Long.numberOfLeadingZeros(w))
      if (rho > buf(j)) buf(j) = rho.toByte
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any =
    new GenericArrayData(buf.map(_.toInt))

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(o: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): HllSketchAgg =
    copy(child = c)
}

/** Count–min sketch: d rows × w counters; the input is the ARRAY of d
  * independent md5-derived hashes for one item plus the item's WEIGHT
  * (combine-then-sketch: pre-aggregating instances to (item, count)
  * rows first means one hash per distinct item, not per instance — the
  * 100×-tier fix that took the entry from 94s of allocation GC to a
  * vocabulary-sized pass). Point estimate = min over rows of
  * counter[r][h_r mod w] — overestimate-only. Evaluates to the flat
  * counter array (long, length d·w, row-major). */
case class CmsSketchAgg(
    left: Expression,
    right: Expression,
    d: Int,
    w: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression]
  with ExpectsInputTypes {

  require(d >= 1 && d <= 16 && w >= 2 && (w & (w - 1)) == 0,
    "d in [1,16], w a power of two")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_cms"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](d * w)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = left.eval(input)
    val wt = right.eval(input)
    if (v != null && wt != null) {
      val hs = v.asInstanceOf[ArrayData]
      val add = wt.asInstanceOf[Long]
      // A short or null-slotted hash array would leave whole counter
      // rows untouched, silently breaking the overestimate-only
      // invariant (est >= true count) the entries pin — fail loudly.
      require(hs.numElements() == d,
        s"graft_cms: expected $d hashes, got ${hs.numElements()}")
      var r = 0
      while (r < d) {
        require(!hs.isNullAt(r), s"graft_cms: null hash at row $r")
        val idx = r * w + (hs.getLong(r) & (w - 1)).toInt
        buf(idx) += add
        r += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): CmsSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmsSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsSketchAgg =
    copy(left = newLeft, right = newRight)
}

/** KMV (k minimum values / bottom-k theta) sketch: keeps the k smallest
  * DISTINCT hash values seen. Mergeable (k smallest of the union);
  * supports distinct-count estimation ((k-1)·2^52 / kth-min) and set
  * intersection via the theta cut. Evaluates to the ascending-sorted
  * value array (length ≤ k — when fewer distinct values exist the
  * sketch IS the exact set). */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] with ExpectsInputTypes {

  require(k >= 1 && k <= 65536, "k in [1,65536]")

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kmv"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = java.lang.Long.valueOf(v.asInstanceOf[Long])
      if (buf.size < k) buf.add(h)
      else if (h < buf.last()) { if (buf.add(h)) buf.pollLast() }
    }
    buf
  }

  override def merge(a: java.util.TreeSet[java.lang.Long],
                     b: java.util.TreeSet[java.lang.Long])
      : java.util.TreeSet[java.lang.Long] = {
    val it = b.iterator()
    while (it.hasNext) {
      val h = it.next()
      if (a.size < k) a.add(h)
      else if (h < a.last()) { if (a.add(h)) a.pollLast() }
      else return a // b is sorted ascending: the rest only gets larger
    }
    a
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.size * 8)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }
  override def deserialize(bytes: Array[Byte])
      : java.util.TreeSet[java.lang.Long] = {
    val out = new java.util.TreeSet[java.lang.Long]()
    val bb = ByteBuffer.wrap(bytes)
    while (bb.remaining() >= 8) out.add(bb.getLong())
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KmvSketchAgg =
    copy(child = c)
}

object SketchExprs {
  def hll(hash: Column, p: Int): Column =
    ExpressionUtils.column(
      HllSketchAgg(ExpressionUtils.expression(hash), p).toAggregateExpression())
  def cms(hashes: Column, weight: Column, d: Int, w: Int): Column =
    ExpressionUtils.column(
      CmsSketchAgg(ExpressionUtils.expression(hashes),
        ExpressionUtils.expression(weight), d, w)
        .toAggregateExpression())
  def kmv(hash: Column, k: Int): Column =
    ExpressionUtils.column(
      KmvSketchAgg(ExpressionUtils.expression(hash), k).toAggregateExpression())
}
