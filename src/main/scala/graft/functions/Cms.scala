package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Mergeable fixed-size buffer for a Count-Min sketch: d rows × w
  * columns of exact integer counters. State is d·w longs regardless of
  * input size — like the KMV sketch, the property that lets a
  * 1000-executor heavy-hitter scan ship sketches through partial
  * aggregation and the shuffle instead of the token stream itself.
  * Merge is elementwise addition (CMS is a linear sketch). */
final class CmsBuffer(val d: Int, val w: Int) {
  val counters = new Array[Long](d * w)
  def add(pos: Array[Int], weight: Long): Unit = {
    var r = 0
    while (r < d) { counters(r * w + pos(r)) += weight; r += 1 }
  }
}

/** Count-Min sketch (Cormode–Muthukrishnan) as a native Catalyst
  * `TypedImperativeAggregate` — the same extension point as KmvSketch
  * (and Spark's own `count_min_sketch`). The ROW POSITIONS are computed
  * in the PLAN (an `array<int>` of d md5-derived cells per input row),
  * not inside the aggregate, so the hash family is plain column
  * arithmetic a DuckDB oracle restates verbatim; the aggregate itself
  * just folds `counters[r·w + pos(r)] += weight` and merges by
  * elementwise addition.
  *
  * Evaluates to the full `array<bigint>` of d·w counters (row-major) —
  * deliberately the RAW sketch, so downstream SQL derives the point
  * estimate `min_r counters[r·w + pos_r(x)]` (an upper bound on the
  * true count, the CMS guarantee) as exact integer arithmetic both
  * engines reproduce bit-for-bit.
  */
case class CmsSketch(
    left: Expression,  // array<int> of d cell positions
    right: Expression, // bigint weight
    d: Int,
    w: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CmsBuffer] with BinaryLike[Expression] {

  require(d > 0 && d <= 16 && w > 0 && w <= 65536,
    s"cms shape out of range: d=$d w=$w")

  override def createAggregationBuffer(): CmsBuffer = new CmsBuffer(d, w)

  override def update(b: CmsBuffer, input: InternalRow): CmsBuffer = {
    val posRaw = left.eval(input)
    val wtRaw = right.eval(input)
    if (posRaw != null && wtRaw != null) {
      val arr = posRaw.asInstanceOf[ArrayData].toIntArray()
      require(arr.length == d, s"cms expects $d positions, got ${arr.length}")
      b.add(arr, wtRaw.asInstanceOf[Long])
    }
    b
  }

  override def merge(b: CmsBuffer, o: CmsBuffer): CmsBuffer = {
    var i = 0
    while (i < b.counters.length) { b.counters(i) += o.counters(i); i += 1 }
    b
  }

  override def eval(b: CmsBuffer): Any = new GenericArrayData(b.counters)

  override def serialize(b: CmsBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * b.counters.length)
    var i = 0
    while (i < b.counters.length) { bb.putLong(b.counters(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CmsBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new CmsBuffer(d, w)
    var i = 0
    while (i < b.counters.length) { b.counters(i) = bb.getLong; i += 1 }
    b
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CmsSketch = copy(left = newLeft, right = newRight)
  override def prettyName: String = "cms_sketch"
}

object Cms {
  /** lift to the public Column algebra: `positions` is the array<int>
    * of d cells, `weight` the bigint increment. */
  def cmsSketch(positions: Column, weight: Column, d: Int, w: Int): Column =
    GraftShim.column(CmsSketch(GraftShim.expression(positions),
      GraftShim.expression(weight), d, w).toAggregateExpression())
}
