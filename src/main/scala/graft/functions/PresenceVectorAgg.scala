package graft.functions

import java.util.{BitSet => JBitSet}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._

/** Presence-vector aggregate with a BitSet buffer (SURVEY.md §7's
  * perf-path replacement for collect_set + transform(sequence)): folds
  * doc ids of a group into a fixed-width 0/1 vector in O(n/8) bytes.
  *
  * Reference semantics (ProcessData.java:454-472): set semantics
  * (duplicates collapse — BitSet OR), slot `docId - firstId`, ids
  * outside [firstId, firstId+n) are ignored (the reference threw
  * AIOOBE; an engine must not). TypedImperativeAggregate gives sound
  * partial aggregation: buffers serialize as the BitSet's byte image
  * and merge by OR — the mergeable combine the reference's string
  * reducer couldn't have.
  */
case class PresenceVectorAgg(
    child: Expression,
    n: Int,
    firstId: Long,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[JBitSet] with UnaryLike[Expression] {

  // fail at construction, not as an opaque NegativeArraySizeException
  // inside executor tasks (new JBitSet(n) / new Array[Int](n))
  require(n >= 1, s"presence_vector needs n >= 1, got $n")

  override def prettyName: String = "presence_vector"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): JBitSet = new JBitSet(n)

  override def update(buf: JBitSet, input: InternalRow): JBitSet = {
    val v = child.eval(input)
    if (v != null) {
      val slot = v.asInstanceOf[Long] - firstId
      if (slot >= 0 && slot < n) buf.set(slot.toInt)
    }
    buf
  }

  override def merge(a: JBitSet, b: JBitSet): JBitSet = { a.or(b); a }

  override def eval(buf: JBitSet): Any = {
    val out = new Array[Int](n)
    var i = buf.nextSetBit(0)
    while (i >= 0 && i < n) { out(i) = 1; i = buf.nextSetBit(i + 1) }
    new GenericArrayData(out)
  }

  override def serialize(buf: JBitSet): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): JBitSet = JBitSet.valueOf(bytes)

  override def withNewMutableAggBufferOffset(o: Int): PresenceVectorAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): PresenceVectorAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): PresenceVectorAgg =
    copy(child = c)
}

object PresenceVectorAgg {
  /** Column API: presence_vector(docIdCol, n, firstId) for use in agg(). */
  def presence_vector(c: Column, n: Int, firstId: Long): Column =
    Shim.column(
      PresenceVectorAgg(
        org.apache.spark.sql.catalyst.expressions.Cast(
          Shim.expression(c), LongType),
        n, firstId).toAggregateExpression())
}
