package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Aggregation buffer for [[BoundedTopK]]: the `cap` smallest members seen
  * so far by signed `(nkp, id)` order, plus the total member count.
  *
  * Kept as a size-bounded binary max-heap over flat long triples
  * `[nkp, id, simhash]` — the head is the current worst kept member, so an
  * incoming member either replaces it in O(log cap) or is dropped in O(1).
  * No per-row boxing beyond the 3-long array.
  */
final class TopKBuf(val cap: Int) {
  var total: Long = 0L
  val heap = new java.util.PriorityQueue[Array[Long]](
    math.max(cap, 1),
    new java.util.Comparator[Array[Long]] { // reverse (nkp, id) → max-heap
      override def compare(a: Array[Long], b: Array[Long]): Int = {
        val c = java.lang.Long.compare(b(0), a(0))
        if (c != 0) c else java.lang.Long.compare(b(1), a(1))
      }
    })

  def add(nkp: Long, id: Long, sim: Long): Unit = {
    total += 1
    if (heap.size < cap) heap.add(Array(nkp, id, sim))
    else {
      val worst = heap.peek()
      if (nkp < worst(0) || (nkp == worst(0) && id < worst(1))) {
        heap.poll()
        heap.add(Array(nkp, id, sim))
      }
    }
  }
}

/** Bounded per-group top-k: `struct(ms: array<struct<id, simhash>>, total)`
  * where `ms` holds the group's `cap` smallest members by signed
  * `(nkp, id)` order, ascending, and `total` counts every member seen.
  *
  * This is the LSH bucket cap (`Lsh.Config.bucketCap`) as a real aggregate
  * instead of a window rank: because it is a `TypedImperativeAggregate`, the
  * planner gives it a map-side PARTIAL pass, so each input partition ships
  * at most `cap` members per bucket through the exchange — a viral-
  * boilerplate bucket with 10^6 distinct-signature members sends
  * `cap × partitions` rows instead of 10^6, and the full-table sort the
  * window rank needed disappears. The reference's bounded-work-per-hot-
  * resource discipline (`ViewModels/MainViewModel.cs:1166-1213`) pushed to
  * the earliest possible point: before the shuffle.
  *
  * Equivalent (bit-identical, window form):
  * {{{
  *   row_number over (partition by bkey order by nkp, id) as krank,
  *   count(*)   over (partition by bkey)                  as kcnt
  *   … where krank <= cap … collect_list sorted by krank, total = kcnt
  * }}}
  */
case class BoundedTopK(
    nkp: Expression,
    id: Expression,
    sim: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuf] with TernaryLike[Expression]
    // SQL-exposed via the registry (ADVICE r2): declare input types so an
    // INT column or literal gets a clean implicit cast (or analysis error)
    // instead of a runtime ClassCastException in update()
    with org.apache.spark.sql.graft.AllLongInputTypes {

  require(cap > 0, s"bounded_topk cap must be positive, got $cap")

  override def first: Expression = nkp
  override def second: Expression = id
  override def third: Expression = sim

  override def createAggregationBuffer(): TopKBuf = new TopKBuf(cap)

  override def update(buf: TopKBuf, input: InternalRow): TopKBuf = {
    val n = nkp.eval(input)
    val i = id.eval(input)
    val s = sim.eval(input)
    if (n != null && i != null && s != null)
      buf.add(n.asInstanceOf[Long], i.asInstanceOf[Long], s.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBuf, other: TopKBuf): TopKBuf = {
    // other.total counts its drops too; replay only its kept members
    buf.total += other.total - other.heap.size
    val it = other.heap.iterator()
    while (it.hasNext) { val m = it.next(); buf.add(m(0), m(1), m(2)) }
    buf
  }

  override def eval(buf: TopKBuf): Any = {
    val ms = buf.heap.toArray(new Array[Array[Long]](buf.heap.size))
    java.util.Arrays.sort(ms, new java.util.Comparator[Array[Long]] {
      override def compare(a: Array[Long], b: Array[Long]): Int = {
        val c = java.lang.Long.compare(a(0), b(0))
        if (c != 0) c else java.lang.Long.compare(a(1), b(1))
      }
    })
    val rows: Array[Any] =
      ms.map(m => new GenericInternalRow(Array[Any](m(1), m(2))): Any)
    new GenericInternalRow(Array[Any](new GenericArrayData(rows), buf.total))
  }

  override def serialize(buf: TopKBuf): Array[Byte] = {
    val n = buf.heap.size
    val bb = ByteBuffer.allocate(12 + 24 * n)
    bb.putLong(buf.total).putInt(n)
    val it = buf.heap.iterator()
    while (it.hasNext) {
      val m = it.next()
      bb.putLong(m(0)).putLong(m(1)).putLong(m(2))
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKBuf(cap)
    val total = bb.getLong()
    val n = bb.getInt()
    var i = 0
    while (i < n) { buf.add(bb.getLong(), bb.getLong(), bb.getLong()); i += 1 }
    buf.total = total
    buf
  }

  override def dataType: DataType = StructType(Seq(
    StructField("ms", ArrayType(StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("simhash", LongType, nullable = false))),
      containsNull = false), nullable = false),
    StructField("total", LongType, nullable = false)))
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(o: Int): BoundedTopK =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BoundedTopK =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, c: Expression): Expression =
    copy(nkp = a, id = b, sim = c)
  override def prettyName: String = "bounded_topk"
}
