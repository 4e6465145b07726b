package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Bounded-memory k-smallest aggregation for the k-NN join (SURVEY §7.3's
  * TypedImperativeAggregate option): keeps the k nearest (dist2, src_id)
  * pairs per group in a fixed-size max-heap. Unlike the rank-window
  * formulation this has a PARTIAL phase — each map task ships at most k
  * candidates per target into the shuffle instead of all of them — and its
  * state is O(k) regardless of the candidate count.
  *
  * Ordering matches the window exactly: ascending (dist2, src_id), so
  * results are bit-identical to row_number() over that ordering.
  */
case class TopKNearest(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKNearest.Heap] with UnaryLike[Expression] {

  import TopKNearest._

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("dist2", DoubleType), StructField("src_id", LongType))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_nearest"

  override def createAggregationBuffer(): Heap = new Heap(k)

  override def update(buf: Heap, input: InternalRow): Heap = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      buf.offer(row.getDouble(0), row.getLong(1))
    }
    buf
  }

  override def merge(buf: Heap, other: Heap): Heap = { buf.absorb(other); buf }

  override def eval(buf: Heap): Any = {
    val sorted = buf.sorted
    new GenericArrayData(sorted.map { case (d, id) =>
      InternalRow(d, id)
    })
  }

  override def serialize(buf: Heap): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val items = buf.items
    out.writeInt(items.length)
    items.foreach { case (d, id) => out.writeDouble(d); out.writeLong(id) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Heap = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val h = new Heap(k)
    var i = 0
    while (i < n) { h.offer(in.readDouble(), in.readLong()); i += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKNearest =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKNearest =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): TopKNearest = copy(child = c)
}

object TopKNearest {

  /** Fixed-capacity max-heap on (dist2, src_id): the root is the WORST kept
    * candidate, evicted when a better one arrives. */
  final class Heap(k: Int) {
    private val ds = new Array[Double](k)
    private val ids = new Array[Long](k)
    private var n = 0

    @inline private def worse(i: Int, j: Int): Boolean =
      ds(i) > ds(j) || (ds(i) == ds(j) && ids(i) > ids(j))
    @inline private def swap(i: Int, j: Int): Unit = {
      val td = ds(i); ds(i) = ds(j); ds(j) = td
      val ti = ids(i); ids(i) = ids(j); ids(j) = ti
    }
    private def siftUp(i0: Int): Unit = {
      var i = i0
      while (i > 0 && worse(i, (i - 1) / 2)) { swap(i, (i - 1) / 2); i = (i - 1) / 2 }
    }
    private def siftDown(): Unit = {
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = 2 * i + 2
        var m = i
        if (l < n && worse(l, m)) m = l
        if (r < n && worse(r, m)) m = r
        if (m == i) done = true else { swap(i, m); i = m }
      }
    }

    def offer(d: Double, id: Long): Unit = {
      if (n < k) { ds(n) = d; ids(n) = id; n += 1; siftUp(n - 1) }
      else if (d < ds(0) || (d == ds(0) && id < ids(0))) {
        ds(0) = d; ids(0) = id; siftDown()
      }
    }
    def absorb(o: Heap): Unit = {
      var i = 0
      while (i < o.n) { offer(o.ds(i), o.ids(i)); i += 1 }
    }
    def items: Array[(Double, Long)] = Array.tabulate(n)(i => (ds(i), ids(i)))
    def sorted: Array[(Double, Long)] =
      items.sortBy { case (d, id) => (d, id) }
  }

  /** Column API: array<struct<dist2,src_id>> of the k nearest, ascending. */
  def topkNearest(pair: Column, k: Int): Column =
    Bridge.column(TopKNearest(Bridge.expression(pair), k)
      .toAggregateExpression(isDistinct = false))
}
