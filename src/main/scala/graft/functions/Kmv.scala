package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mergeable bounded-state buffer for a K-minimum-values (theta) sketch:
  * the k smallest DISTINCT hash values seen so far, kept in a TreeSet so
  * insert/evict are O(log k) and iteration is already sorted. State is
  * ≤ k longs regardless of input size — the property that makes the
  * sketch shippable between the partial and final aggregation stages of
  * a 1000-executor distinct-count without ever materializing the
  * distinct set. */
final class KmvBuffer(val k: Int) {
  val set = new java.util.TreeSet[java.lang.Long]()
  def add(v: Long): Unit =
    if (set.size < k) { set.add(v); () }
    else if (v < set.last) { if (set.add(v)) { set.pollLast(); () } }
}

/** K-minimum-values (KMV / bottom-k theta) sketch as a native Catalyst
  * `TypedImperativeAggregate` — Spark's designed extension point for
  * aggregates whose state is an opaque object rather than a fixed-width
  * mutable row (the same machinery behind `percentile_approx` and
  * `count_min_sketch`). Partial aggregation (map-side combine) and
  * sketch merge come for free from the agg framework: `update` folds
  * raw hashes partition-locally, `serialize`/`deserialize` move ≤ k
  * longs through the shuffle, `merge` unions two sketches by re-adding.
  *
  * Evaluates to the sorted `array<bigint>` of the ≤ k minimum distinct
  * hashes — deliberately the RAW sketch, not a point estimate, so
  * downstream SQL can derive the estimator (`(k−1)·2^60 div theta`),
  * set-algebra estimates (theta intersection — something HLL cannot
  * do), and merge-law checks as exact integer arithmetic that a DuckDB
  * oracle restates bit-for-bit via `row_number() ≤ k`.
  *
  * Reference context: signaldb estimates label/series cardinality for
  * its discovery APIs (src/querier metadata paths); a mergeable
  * bottom-k sketch is the scale-out form of that count.
  */
case class KmvSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] with UnaryLike[Expression] {

  require(k > 0 && k <= 4096, s"kmv k out of range: $k")

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(b: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[Long])
    b
  }

  override def merge(b: KmvBuffer, o: KmvBuffer): KmvBuffer = {
    val it = o.set.iterator()
    while (it.hasNext) b.add(it.next())
    b
  }

  override def eval(b: KmvBuffer): Any = {
    val arr = new Array[Long](b.set.size)
    var i = 0
    val it = b.set.iterator()
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(b: KmvBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * b.set.size)
    bb.putInt(b.set.size)
    val it = b.set.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = new KmvBuffer(k)
    var i = 0
    while (i < n) { b.set.add(bb.getLong); i += 1 }
    b
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketch =
    copy(child = newChild)
  override def prettyName: String = "kmv_sketch"
}

object Kmv {
  /** lift to the public Column algebra */
  def kmvSketch(c: Column, k: Int): Column =
    GraftShim.column(KmvSketch(GraftShim.expression(c), k).toAggregateExpression())
}
