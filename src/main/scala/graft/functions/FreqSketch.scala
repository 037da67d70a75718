package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._

/** Misra-Gries heavy-hitter state: at most k (key → weight) counters.
  * Inserting past capacity subtracts the new weight and the smallest
  * counter's weight from everyone (the classic "decrement all" move,
  * weight-batched); merge sums counters then re-truncates by the same
  * rule — the mergeable-summaries form (Agarwal et al., PODS 2012),
  * which is exactly what Spark's partial-aggregation tree needs.
  *
  * Guarantee (any insert/merge order): every stored weight is a LOWER
  * bound on the true count, undercounting by at most n/(k+1) for n
  * total weight — so any key with true count > n/(k+1) is present.
  * The exact counter VALUES depend on arrival order (unavoidable for
  * MG), hence no oracle gate query: the order-free laws live in
  * `FreqSketchSpec`, and the production use is hot-key DETECTION
  * (candidate set + lower bounds), not exact counting.
  */
final class MgBuffer(val k: Int) {
  val counts = new java.util.HashMap[java.lang.Long, java.lang.Long]()

  def add(v: Long, w: Long): Unit = {
    if (w <= 0) return
    val cur = counts.get(v)
    if (cur != null) { counts.put(v, cur + w); () }
    else if (counts.size < k) { counts.put(v, w); () }
    else {
      // decrement everyone by min(w, smallest counter); drop zeros;
      // any remainder of w re-offers the key
      var minC = Long.MaxValue
      counts.forEach((_, c) => if (c < minC) minC = c)
      val dec = math.min(w, minC)
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val nc = e.getValue - dec
        if (nc <= 0) it.remove() else e.setValue(nc)
      }
      if (w > dec) add(v, w - dec)
    }
  }

  def mergeFrom(o: MgBuffer): Unit =
    o.counts.forEach((v, w) => add(v, w))
}

case class MgAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgBuffer] with UnaryLike[Expression]
  with ExpectsInputTypes {

  require(k > 0, s"freq_sketch needs k > 0, got $k")

  // fail at analysis, not as an executor-side ClassCastException
  override def inputTypes: Seq[DataType] =
    Seq(LongType)

  override def createAggregationBuffer(): MgBuffer = new MgBuffer(k)

  override def update(b: MgBuffer, input: InternalRow): MgBuffer = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[Long], 1L)
    b
  }

  override def merge(b: MgBuffer, o: MgBuffer): MgBuffer = {
    b.mergeFrom(o); b
  }

  /** map<key, lower-bound weight> — order-free container. */
  override def eval(b: MgBuffer): Any = {
    val n = b.counts.size
    val keys = new Array[Long](n)
    val vals = new Array[Long](n)
    var i = 0
    // sort keys so the serialized map is canonical
    val sorted = new java.util.TreeMap[java.lang.Long, java.lang.Long](
      b.counts)
    sorted.forEach { (kk, vv) => keys(i) = kk; vals(i) = vv; i += 1 }
    new ArrayBasedMapData(
      new GenericArrayData(keys), new GenericArrayData(vals))
  }

  override def serialize(b: MgBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * b.counts.size)
    bb.putInt(b.counts.size)
    b.counts.forEach { (v, w) => bb.putLong(v); bb.putLong(w) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MgBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = new MgBuffer(k)
    var i = 0
    // direct restore (no decrement churn): deserialized state is ≤ k
    while (i < n) { b.counts.put(bb.getLong, bb.getLong); i += 1 }
    b
  }

  override def dataType: DataType =
    MapType(LongType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(o: Int): MgAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MgAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): MgAgg =
    copy(child = c)

  override def prettyName: String = "freq_sketch"
}

object FreqSketch {
  import org.apache.spark.sql.GraftShim

  /** Column-API entry: Misra-Gries top-k candidate map over a long
    * column — map<key, lower-bound count>, ≤ k entries. */
  def freqSketch(c: Column, k: Int): Column =
    GraftShim.column(
      MgAgg(GraftShim.expression(c), k).toAggregateExpression())
}
