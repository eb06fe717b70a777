package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Aggregation buffer for [[KmvSketch]]: the `k` smallest DISTINCT hash
  * strings seen so far, kept in a sorted set so duplicate keys (which share
  * a hash) occupy one slot — the property that makes the k-minimum-values
  * estimator a DISTINCT-count sketch rather than a row sample.
  *
  * Ordered as [[UTF8String]] (binary / code-point order) — the SAME order
  * `array_sort`, `element_at`-based estimation and the DuckDB oracle use.
  * A `java.util.TreeSet[String]` would order by UTF-16 code units, which
  * diverges from binary order when U+E000–U+FFFF chars meet
  * supplementary-plane chars; the operators feed md5 hex so it would never
  * show there, but the aggregate is SQL-registered and a user may sketch
  * raw keys.
  */
final class KmvBuf(val k: Int) {
  val set = new java.util.TreeSet[UTF8String]()

  def add(h: UTF8String): Unit =
    if (set.size < k) { set.add(h); () }
    else if (h.compareTo(set.last()) < 0 && set.add(h)) { set.pollLast(); () }
}

/** K-minimum-values (KMV) distinct sketch: `array<string>` of the `k`
  * smallest distinct values of the input hash column, ascending.
  *
  * The input is expected to be a uniform hex hash of the key (the operators
  * feed it `md5(key)` so the DuckDB oracle can replay the sketch verbatim
  * with `SELECT DISTINCT md5(key) ORDER BY 1 LIMIT k`). From the sketch,
  * [[graft.operators.Kmv]] derives the Bar-Yossef et al. distinct-count
  * estimate `(k-1) / frac(h_k)` and, from two sketches, the corpus-overlap
  * Jaccard estimate — the "how big is the dedup win / how much do two crawls
  * share" questions answered WITHOUT grouping or joining the corpora.
  *
  * Being a `TypedImperativeAggregate`, the planner gives it a map-side
  * PARTIAL pass: each input task ships at most `k` 32-byte hashes through
  * the exchange, so sketching a 10^12-row corpus exchanges `k × tasks` rows
  * — the entire reason to sketch at 100 TB. Merge is a bounded set union.
  *
  * Reference anchor: the reference sizes its duplicate problem up front by
  * hashing every file before pairing (`ViewModels/MainViewModel.cs:833-872`);
  * this is that sizing pass collapsed to a constant-space estimate.
  */
case class KmvSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvBuf] with UnaryLike[Expression]
    with org.apache.spark.sql.graft.AllStringInputTypes {

  require(k > 0, s"kmv_sketch k must be positive, got $k")

  override def createAggregationBuffer(): KmvBuf = new KmvBuf(k)

  override def update(buf: KmvBuf, input: InternalRow): KmvBuf = {
    val v = child.eval(input)
    // .clone() copies out of Spark's reused row buffer — required before
    // retaining the value across rows
    if (v != null) buf.add(v.asInstanceOf[UTF8String].clone())
    buf
  }

  override def merge(buf: KmvBuf, other: KmvBuf): KmvBuf = {
    val it = other.set.iterator()
    while (it.hasNext) buf.add(it.next())
    buf
  }

  override def eval(buf: KmvBuf): Any = {
    val out = new Array[Any](buf.set.size)
    val it = buf.set.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: KmvBuf): Array[Byte] = {
    val items = new Array[Array[Byte]](buf.set.size)
    var total = 4
    val it = buf.set.iterator()
    var i = 0
    while (it.hasNext) {
      val b = it.next().getBytes
      items(i) = b; total += 4 + b.length; i += 1
    }
    val bb = java.nio.ByteBuffer.allocate(total)
    bb.putInt(items.length)
    items.foreach { b => bb.putInt(b.length); bb.put(b) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new KmvBuf(k)
    val n = bb.getInt()
    var i = 0
    while (i < n) {
      val b = new Array[Byte](bb.getInt()); bb.get(b)
      buf.add(UTF8String.fromBytes(b))
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(o: Int): KmvSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "kmv_sketch"
}
