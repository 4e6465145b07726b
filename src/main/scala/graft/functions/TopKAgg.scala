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
  * state is O(k) regardless of the candidate count. It also hash-aggregates
  * (ObjectHashAggregate), where the declarative `min(struct(...))`
  * alternative falls to SortAggregate and sorts every candidate row twice.
  *
  * `payload` names optional DOUBLE columns (struct fields 2..n after
  * dist2, src_id) carried alongside each kept candidate — the winner's
  * values ride the aggregation, which removes the classic second
  * scan + join-back-on-src_id of the value gather. Nulls survive via a
  * per-slot bitmask (payload width ≤ 64).
  *
  * Ordering matches the window exactly: ascending (dist2, src_id), so
  * results are bit-identical to row_number() over that ordering; payload
  * fields never participate in the ordering.
  */
case class TopKNearest(
    child: Expression,
    k: Int,
    payload: Seq[String] = Nil,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKNearest.Heap] with UnaryLike[Expression] {

  import TopKNearest._

  require(payload.length <= 64, "payload bitmask holds at most 64 columns")
  private val pw = payload.length

  override def dataType: DataType = ArrayType(
    StructType(
      Seq(StructField("dist2", DoubleType), StructField("src_id", LongType)) ++
        payload.map(StructField(_, DoubleType, nullable = true))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_nearest"

  override def createAggregationBuffer(): Heap = new Heap(k, pw)

  // The hot path: update runs once per INPUT row (candidate-sized), and
  // TypedImperativeAggregate updates are never whole-stage-codegen'd —
  // `child.eval` walks the CreateNamedStruct tree interpreted, boxing
  // every field (measured ~7-18 µs/row on the knn/bm25 heaps, r17). A
  // generated UnsafeProjection compiles the struct evaluation once per
  // task (Janino, cached by generated source) and writes a reused
  // buffer row — same values, same null semantics (the projected field
  // is null exactly when child.eval would return null).
  @transient private lazy val evalProj =
    org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(Seq(child))

  override def update(buf: Heap, input: InternalRow): Heap = {
    val projected = evalProj(input)
    if (!projected.isNullAt(0)) {
      val row = projected.getStruct(0, 2 + pw)
      var nulls = 0L
      var i = 0
      while (i < pw) {
        if (row.isNullAt(2 + i)) { nulls |= (1L << i); buf.scratch(i) = 0.0 }
        else buf.scratch(i) = row.getDouble(2 + i)
        i += 1
      }
      buf.offer(row.getDouble(0), row.getLong(1), buf.scratch, nulls)
    }
    buf
  }

  override def merge(buf: Heap, other: Heap): Heap = { buf.absorb(other); buf }

  override def eval(buf: Heap): Any = {
    new GenericArrayData(buf.sortedRows().map { r =>
      val vals = new Array[Any](2 + pw)
      vals(0) = r.d; vals(1) = r.id
      var i = 0
      while (i < pw) {
        vals(2 + i) = if ((r.nulls & (1L << i)) != 0) null else r.p(i)
        i += 1
      }
      InternalRow.fromSeq(vals.toSeq)
    })
  }

  override def serialize(buf: Heap): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val n = buf.size
    out.writeInt(n)
    var s = 0
    while (s < n) {
      out.writeDouble(buf.dAt(s)); out.writeLong(buf.idAt(s)); out.writeLong(buf.nullsAt(s))
      var i = 0
      while (i < pw) { out.writeDouble(buf.pAt(s, i)); i += 1 }
      s += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Heap = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val h = new Heap(k, pw)
    var s = 0
    while (s < n) {
      val d = in.readDouble(); val id = in.readLong(); val nulls = in.readLong()
      var i = 0
      while (i < pw) { h.scratch(i) = in.readDouble(); i += 1 }
      h.offer(d, id, h.scratch, nulls)
      s += 1
    }
    h
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKNearest =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKNearest =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): TopKNearest = copy(child = c)
}

object TopKNearest {

  /** One kept candidate (materialized only at eval time). */
  final case class Kept(d: Double, id: Long, nulls: Long, p: Array[Double])

  /** Fixed-capacity max-heap on (dist2, src_id): the root is the WORST kept
    * candidate, evicted when a better one arrives. Payload doubles live in
    * a flat k×pw array swapped alongside the keys. */
  final class Heap(k: Int, pw: Int) {
    private val ds = new Array[Double](k)
    private val ids = new Array[Long](k)
    private val pnulls = new Array[Long](k)
    private val pv = new Array[Double](math.max(k * pw, 1))
    private var n = 0
    /** update/deserialize staging row (avoids per-row allocation). */
    val scratch = new Array[Double](math.max(pw, 1))

    def size: Int = n
    def dAt(i: Int): Double = ds(i)
    def idAt(i: Int): Long = ids(i)
    def nullsAt(i: Int): Long = pnulls(i)
    def pAt(i: Int, j: Int): Double = pv(i * pw + j)

    @inline private def worse(i: Int, j: Int): Boolean =
      ds(i) > ds(j) || (ds(i) == ds(j) && ids(i) > ids(j))
    @inline private def swap(i: Int, j: Int): Unit = {
      val td = ds(i); ds(i) = ds(j); ds(j) = td
      val ti = ids(i); ids(i) = ids(j); ids(j) = ti
      val tn = pnulls(i); pnulls(i) = pnulls(j); pnulls(j) = tn
      var m = 0
      while (m < pw) {
        val tp = pv(i * pw + m); pv(i * pw + m) = pv(j * pw + m); pv(j * pw + m) = tp
        m += 1
      }
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
    @inline private def put(slot: Int, d: Double, id: Long, vals: Array[Double], nulls: Long): Unit = {
      ds(slot) = d; ids(slot) = id; pnulls(slot) = nulls
      var m = 0
      while (m < pw) { pv(slot * pw + m) = vals(m); m += 1 }
    }

    def offer(d: Double, id: Long, vals: Array[Double], nulls: Long): Unit = {
      if (n < k) { put(n, d, id, vals, nulls); n += 1; siftUp(n - 1) }
      else if (d < ds(0) || (d == ds(0) && id < ids(0))) {
        put(0, d, id, vals, nulls); siftDown()
      }
    }
    def absorb(o: Heap): Unit = {
      var i = 0
      while (i < o.n) {
        var m = 0
        while (m < pw) { scratch(m) = o.pv(i * pw + m); m += 1 }
        offer(o.ds(i), o.ids(i), scratch, o.pnulls(i))
        i += 1
      }
    }
    def sortedRows(): Array[Kept] =
      Array.tabulate(n)(i => Kept(ds(i), ids(i), pnulls(i), Array.tabulate(pw)(j => pv(i * pw + j))))
        .sortBy(r => (r.d, r.id))
  }

  /** Column API: array<struct<dist2,src_id[,payload...]>> of the k nearest,
    * ascending (dist2, src_id). `pair` must be struct(dist2, src_id,
    * payload-doubles...) in that field order. */
  def topkNearest(pair: Column, k: Int, payload: Seq[String] = Nil): Column =
    Bridge.column(TopKNearest(Bridge.expression(pair), k, payload)
      .toAggregateExpression(isDistinct = false))
}
