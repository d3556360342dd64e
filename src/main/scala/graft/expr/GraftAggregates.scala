package graft.expr

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Mutable aggregation buffer for [[BoundedIds]]: a long-id list that
  * stops growing at `cap` elements. The cap is the skew guard — a
  * pathological hot key (e.g. thousands of identical docs landing in one
  * LSH band) costs at most `cap` longs per partial buffer and at most
  * `cap` longs on the wire per map task, no matter how many rows it owns.
  */
final class BoundedIdsBuffer(val cap: Int) {
  var n: Int = 0
  var ids: Array[Long] = new Array[Long](math.min(cap, 8))

  def add(id: Long): Unit = if (n < cap) {
    if (n == ids.length) {
      val grown = new Array[Long](math.min(cap.toLong, ids.length * 2L).toInt)
      System.arraycopy(ids, 0, grown, 0, n)
      ids = grown
    }
    ids(n) = id
    n += 1
  }
}

/** `graft_bounded_ids(id, cap)` — `collect_list` over BIGINT ids with a
  * hard per-buffer element cap (ARRAY<BIGINT>, insertion order within a
  * partial, partials concatenated in merge order, trimmed at `cap`).
  *
  * Purpose: single-pass LSH candidate generation. A `groupBy(band)` can
  * compute `count(*)` (exact — counted independently of the list) and the
  * member list in ONE aggregation; the list is complete whenever the
  * exact count is <= cap, and a hot band — which the count gate drops
  * anyway — can never build an unbounded agg buffer or shuffle more than
  * `cap` longs per map task. This is what plain `collect_list` cannot
  * guarantee and why the previous shape needed a separate count
  * aggregation plus a join back onto a SECOND evaluation of the banding
  * kernel.
  *
  * Like `collect_list` this is a [[TypedImperativeAggregate]], so the
  * aggregation runs in `ObjectHashAggregateExec` (sort-based fallback
  * past the key threshold) with map-side partials — identical operator
  * class to the shape it replaces, minus one full kernel evaluation and
  * one shuffle+join.
  */
case class BoundedIds(child: Expression, cap: Int,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedIdsBuffer]
  with UnaryLike[Expression] with ExpectsInputTypes {

  require(cap > 0, "graft_bounded_ids cap must be positive")

  // analyzer-time contract: a non-BIGINT id column via the SQL registry
  // would otherwise surface as a runtime ClassCastException in update()
  override def inputTypes = Seq(LongType)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bounded_ids"

  override def createAggregationBuffer(): BoundedIdsBuffer =
    new BoundedIdsBuffer(cap)

  override def update(buf: BoundedIdsBuffer,
                      input: InternalRow): BoundedIdsBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: BoundedIdsBuffer,
                     other: BoundedIdsBuffer): BoundedIdsBuffer = {
    var i = 0
    while (i < other.n && buf.n < buf.cap) {
      buf.add(other.ids(i))
      i += 1
    }
    buf
  }

  override def eval(buf: BoundedIdsBuffer): Any = {
    val out = new Array[Long](buf.n)
    System.arraycopy(buf.ids, 0, out, 0, buf.n)
    new GenericArrayData(out)
  }

  override def serialize(buf: BoundedIdsBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.n)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BoundedIdsBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new BoundedIdsBuffer(cap)
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): BoundedIds =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BoundedIds =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): BoundedIds =
    copy(child = c)
}
