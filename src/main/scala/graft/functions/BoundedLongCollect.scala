package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Collect up to `limit` longs per group; yield NULL the moment a group
  * exceeds the cap. The skew-safe replacement for
  * `collect_list(...) ... HAVING count <= limit`:
  * plain collect_list materializes a degenerate group's ENTIRE value
  * list in one aggregation buffer before the filter can drop it — at
  * 100 TB a boilerplate shingle shared by millions of documents is an
  * executor OOM. This aggregate's state is bounded at `limit` longs by
  * construction: once a partial buffer overflows it frees its array and
  * carries a 1-byte flag, and merges of overflowed buffers stay
  * overflowed. Same partial-aggregation class as collect_list
  * (ObjectHashAggregate), so map-side combining still applies.
  *
  * The emitted array is sorted ascending — deterministic regardless of
  * shuffle arrival order, and i<j pair expansion over it yields
  * id1 < id2 for free. Input nulls are skipped (collect_list contract);
  * an empty group evaluates to an empty array, not NULL.
  */
case class BoundedLongCollect(
    child: Expression,
    limit: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedLongCollect.Buffer]
  with UnaryLike[Expression] {

  require(limit > 0, s"bounded_long_collect limit must be positive, got $limit")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bounded_long_collect expects bigint, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def createAggregationBuffer(): BoundedLongCollect.Buffer =
    new BoundedLongCollect.Buffer(new Array[Long](math.min(limit, 8)), 0, false)

  override def update(b: BoundedLongCollect.Buffer,
                      input: InternalRow): BoundedLongCollect.Buffer = {
    if (b.overflow) return b
    val v = child.eval(input)
    if (v == null) return b
    if (b.n == limit) { b.overflow = true; b.arr = null; return b }
    if (b.n == b.arr.length) {
      val grown = new Array[Long](math.min(limit, b.arr.length * 2))
      System.arraycopy(b.arr, 0, grown, 0, b.n)
      b.arr = grown
    }
    b.arr(b.n) = v.asInstanceOf[Long]
    b.n += 1
    b
  }

  override def merge(b: BoundedLongCollect.Buffer,
                     o: BoundedLongCollect.Buffer): BoundedLongCollect.Buffer = {
    if (b.overflow) return b
    if (o.overflow || b.n + o.n > limit) { b.overflow = true; b.arr = null; return b }
    if (b.n + o.n > b.arr.length) {
      val grown = new Array[Long](b.n + o.n)
      System.arraycopy(b.arr, 0, grown, 0, b.n)
      b.arr = grown
    }
    System.arraycopy(o.arr, 0, b.arr, b.n, o.n)
    b.n += o.n
    b
  }

  override def eval(b: BoundedLongCollect.Buffer): Any = {
    if (b.overflow) return null
    val out = java.util.Arrays.copyOf(b.arr, b.n)
    java.util.Arrays.sort(out)
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def serialize(b: BoundedLongCollect.Buffer): Array[Byte] = {
    if (b.overflow) return Array[Byte](1)
    val bb = ByteBuffer.allocate(1 + 4 + 8 * b.n)
    bb.put(0: Byte).putInt(b.n)
    var i = 0
    while (i < b.n) { bb.putLong(b.arr(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BoundedLongCollect.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    if (bb.get() != 0) return new BoundedLongCollect.Buffer(null, 0, true)
    val n = bb.getInt
    val arr = new Array[Long](math.max(n, 1))
    var i = 0
    while (i < n) { arr(i) = bb.getLong; i += 1 }
    new BoundedLongCollect.Buffer(arr, n, false)
  }

  override def withNewMutableAggBufferOffset(o: Int): BoundedLongCollect =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BoundedLongCollect =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "bounded_long_collect"
}

object BoundedLongCollect {
  /** overflow == true ⇒ arr is freed; n is meaningless. */
  final class Buffer(var arr: Array[Long], var n: Int, var overflow: Boolean)

  def boundedCollect(c: Column, limit: Int): Column =
    Bridge.column(BoundedLongCollect(Bridge.expression(c), limit)
      .toAggregateExpression())
}
