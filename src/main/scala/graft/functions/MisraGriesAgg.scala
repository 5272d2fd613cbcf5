package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters summary with k counters: a bounded-memory
  * (O(k) per partition) frequent-items sketch whose partial buffers
  * merge soundly (Agarwal et al., "Mergeable Summaries", PODS 2012),
  * so Catalyst's partial -> final aggregation applies unchanged.
  *
  * Guarantee after any merge tree: every item with true frequency
  * > N/(k+1) appears in the summary, and each surviving counter
  * undercounts by at most N/(k+1). The summary is a CANDIDATE set
  * (supersets the heavy items, may include light ones); a cheap exact
  * second pass over candidates (a k-element `isin` filter — narrow,
  * scan speed) turns it into the exact top set. That two-pass shape is
  * the point at 100 TB: pass 1 never shuffles anything wider than k
  * counters, pass 2 aggregates only rows matching k terms.
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with UnaryLike[Expression] {

  require(k >= 1, s"misra_gries needs k >= 1, got $k")

  override def prettyName: String = "misra_gries"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      buf.get(s) match {
        case Some(c) => buf.update(s, c + 1L)
        case None if buf.size < k => buf.update(s, 1L)
        case None =>
          // classic MG step: a full summary and an untracked arrival
          // decrement every counter (the arrival is "spent" too)
          val dead = mutable.ArrayBuffer.empty[String]
          buf.keysIterator.foreach { key =>
            val c = buf(key) - 1L
            if (c <= 0L) dead += key else buf.update(key, c)
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(
      a: mutable.HashMap[String, Long],
      b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (s, c) => a.update(s, a.getOrElse(s, 0L) + c) }
    if (a.size > k) {
      // subtract the (k+1)-th largest counter from all, drop <= 0:
      // the mergeable-summaries MG combine (error bounds add)
      val vs = a.values.toArray
      java.util.Arrays.sort(vs)
      val d = vs(vs.length - k - 1)
      val dead = mutable.ArrayBuffer.empty[String]
      a.keysIterator.foreach { key =>
        val c = a(key) - d
        if (c <= 0L) dead += key else a.update(key, c)
      }
      dead.foreach(a.remove)
    }
    a
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    // deterministic candidate order (by residual count desc, then term)
    val sorted = buf.toArray.sortBy { case (s, c) => (-c, s) }
    new GenericArrayData(sorted.map { case (s, _) => UTF8String.fromString(s) })
  }

  // length-prefixed UTF-8, NOT writeUTF: writeUTF caps each string's
  // modified-UTF-8 at 65535 bytes and a single >64KB junk "term" (an
  // unsplit document body) would throw UTFDataFormatException at
  // partial-buffer shuffle time, failing the whole aggregation on a
  // row-local value. Internal wire format only — never persisted.
  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, c) =>
      val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(new String(b, java.nio.charset.StandardCharsets.UTF_8),
        in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): MisraGriesAgg =
    copy(child = c)
}

object MisraGriesAgg {
  /** Column API: misra_gries(termCol, k) -> ARRAY<STRING> candidates. */
  def misra_gries(c: Column, k: Int): Column =
    Shim.column(MisraGriesAgg(Shim.expression(c), k).toAggregateExpression())
}
