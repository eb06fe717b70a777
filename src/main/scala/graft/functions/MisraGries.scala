package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Aggregation buffer for [[MisraGries]]: at most `cap` (item → count)
  * entries plus the total item count and the cumulative decrement mass
  * discarded by compressions (the certification input for
  * [[graft.operators.HeavyHitters]]). */
final class MGBuf(val cap: Int) {
  var total: Long = 0L
  var discarded: Long = 0L
  val counts = new java.util.HashMap[String, Long]()

  def add(item: String, c: Long): Unit = {
    val cur = counts.get(item)
    if (cur != 0L || counts.containsKey(item)) counts.put(item, cur + c)
    else counts.put(item, c)
    if (counts.size > cap) compress()
  }

  /** Mergeable-summaries compression (Agarwal et al. 2013): subtract the
    * (cap+1)-th largest count from every entry and drop the non-positive
    * ones — at most `cap` entries survive, every key's count falls by at
    * most that value, and at least (cap+1)·value of total mass is
    * discarded (the Misra–Gries error argument). With exactly cap+1
    * entries this is the classic decrement-all-by-min step. */
  private def compress(): Unit = {
    val vals = new Array[Long](counts.size)
    var i = 0
    val vit = counts.values().iterator()
    while (vit.hasNext) { vals(i) = vit.next(); i += 1 }
    java.util.Arrays.sort(vals)
    val cStar = vals(vals.length - (cap + 1)) // (cap+1)-th largest
    if (cStar <= 0L) return
    discarded += cStar
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val nv = e.getValue - cStar
      if (nv <= 0L) it.remove() else e.setValue(nv)
    }
  }
}

/** Misra–Gries heavy-hitters sketch as a map-side-combinable aggregate:
  * `misra_gries(item, cap)` → `struct(items: array<struct<item, cnt>>,
  * total: long, max_err: long)` where `items` holds at most `cap` entries
  * with LOWER-BOUND counts (`cnt ≤ true count ≤ cnt + max_err`), `total`
  * counts every non-null input, and `max_err` bounds the undercount of
  * EVERY key — retained or evicted — so any item whose true count exceeds
  * `max_err` is guaranteed present (the zero-miss contract
  * [[graft.operators.HeavyHitters]] certifies at run time).
  *
  * Why an aggregate and not a groupBy: at corpus scale the interesting
  * question is "which lines/tokens/hosts repeat ≥ θ·N times" over a
  * column with ~N distinct values — a full groupBy shuffles the whole
  * cardinality to answer a question whose output is tiny. As a
  * `TypedImperativeAggregate` the planner runs a PARTIAL pass per input
  * partition, so only `cap`-entry summaries enter the exchange — the
  * exact pattern of [[BoundedTopK]], for frequency instead of rank.
  *
  * `max_err` is exact accounting, not the worst-case N/(cap+1) bound:
  * each compression subtracts its c* from every key and discards
  * ≥ (cap+1)·c* of counted mass, so the cumulative decrement — summed
  * across partials and merges — is the sketch's true undercount ceiling
  * (typically far below N/(cap+1) on skewed data; 0 when the column's
  * distinct count never exceeded `cap`, where the sketch is simply exact).
  */
case class MisraGries(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MGBuf] with UnaryLike[Expression]
    with org.apache.spark.sql.graft.AllStringInputTypes {

  require(cap > 0, s"misra_gries cap must be positive, got $cap")

  override def createAggregationBuffer(): MGBuf = new MGBuf(cap)

  override def update(buf: MGBuf, input: InternalRow): MGBuf = {
    val v = child.eval(input)
    if (v != null) {
      buf.total += 1
      buf.add(v.asInstanceOf[UTF8String].toString, 1L)
    }
    buf
  }

  override def merge(buf: MGBuf, other: MGBuf): MGBuf = {
    buf.total += other.total
    buf.discarded += other.discarded
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      buf.add(e.getKey, e.getValue)
    }
    buf
  }

  override def eval(buf: MGBuf): Any = {
    // deterministic output order: count desc, item asc
    val entries = buf.counts.entrySet().toArray(
      new Array[java.util.Map.Entry[String, Long]](buf.counts.size))
    java.util.Arrays.sort(entries,
      new java.util.Comparator[java.util.Map.Entry[String, Long]] {
        override def compare(
            a: java.util.Map.Entry[String, Long],
            b: java.util.Map.Entry[String, Long]): Int = {
          val c = java.lang.Long.compare(b.getValue, a.getValue)
          if (c != 0) c else a.getKey.compareTo(b.getKey)
        }
      })
    val rows: Array[Any] = entries.map(e =>
      new GenericInternalRow(Array[Any](
        UTF8String.fromString(e.getKey), e.getValue)): Any)
    new GenericInternalRow(Array[Any](
      new GenericArrayData(rows), buf.total, buf.discarded))
  }

  override def serialize(buf: MGBuf): Array[Byte] = {
    var bytes = 20 // total, discarded, n
    val pre = new java.util.ArrayList[(Array[Byte], Long)](buf.counts.size)
    val it = buf.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val b = e.getKey.getBytes(StandardCharsets.UTF_8)
      pre.add((b, e.getValue))
      bytes += 12 + b.length
    }
    val bb = java.nio.ByteBuffer.allocate(bytes)
    bb.putLong(buf.total).putLong(buf.discarded).putInt(pre.size())
    var i = 0
    while (i < pre.size()) {
      val (b, c) = pre.get(i)
      bb.putInt(b.length).put(b).putLong(c)
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MGBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new MGBuf(cap)
    buf.total = bb.getLong()
    buf.discarded = bb.getLong()
    val n = bb.getInt()
    var i = 0
    while (i < n) {
      val len = bb.getInt()
      val b = new Array[Byte](len)
      bb.get(b)
      buf.counts.put(new String(b, StandardCharsets.UTF_8), bb.getLong())
      i += 1
    }
    buf
  }

  override def dataType: DataType = StructType(Seq(
    StructField("items", ArrayType(StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
      containsNull = false), nullable = false),
    StructField("total", LongType, nullable = false),
    StructField("max_err", LongType, nullable = false)))
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(o: Int): MisraGries =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGries =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "misra_gries"
}
