package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters summary as a native typed aggregate.
  *
  * Why an aggregate and not `groupBy(item).count` + top-k: at corpus
  * scale the exact plan shuffles one row PER DISTINCT ITEM — fine for
  * a 40-word vocabulary, catastrophic for URLs/shingles/user-ids with
  * billions of distincts. A Misra-Gries buffer is a MERGEABLE summary
  * (Agarwal et al., "Mergeable Summaries", PODS'12): each map task
  * folds its partition into a capacity-bounded buffer, partial
  * buffers merge associatively on the reducer, and only
  * `capacity`-sized state ever crosses the wire — the same shape
  * Spark's own `TypedImperativeAggregate` sketches (HLL++,
  * percentile_approx) use.
  *
  * Guarantees: every item with true frequency > N/(capacity+1)
  * survives, and each reported count is exact up to an undercount of
  * at most N/(capacity+1). When `capacity` ≥ the number of distincts
  * seen by every partial buffer, no decrement ever fires anywhere and
  * the summary IS the exact frequency table — the regime the DuckDB
  * oracle gates (q43); the sketch regime's error bound is pinned in
  * RelationalSpec on a deliberately undersized buffer.
  */
case class MisraGries(
    child: Expression,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]]
  with UnaryLike[Expression] {

  require(capacity > 0, "misra_gries capacity must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"misra_gries expects a string item column, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("count", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false
  override def prettyName: String = "misra_gries"

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[UTF8String, Long],
      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val item = v.asInstanceOf[UTF8String]
    buf.get(item) match {
      case Some(n) => buf.update(item, n + 1); buf
      case None if buf.size < capacity =>
        // UTF8String from an unsafe row points into a reused buffer —
        // copy before it outlives the current input row.
        buf.update(item.clone(), 1L); buf
      case None =>
        // classic MG step: a miss on a full buffer decrements every
        // counter (the new item and one unit of `capacity` others
        // cancel); zeros free their slots.
        decrementAll(buf, 1L); buf
    }
  }

  override def merge(
      buf: mutable.HashMap[UTF8String, Long],
      other: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (item, n) =>
      buf.update(item, buf.getOrElse(item, 0L) + n)
    }
    if (buf.size > capacity) {
      // mergeable-summaries rule: subtract the (capacity+1)-th
      // largest count from everything; at most `capacity` survivors.
      val counts = buf.valuesIterator.toArray
      java.util.Arrays.sort(counts)
      decrementAll(buf, counts(counts.length - capacity - 1))
    }
    buf
  }

  private def decrementAll(
      buf: mutable.HashMap[UTF8String, Long], by: Long): Unit = {
    val dead = mutable.ArrayBuffer.empty[UTF8String]
    buf.foreach { case (item, n) =>
      if (n - by <= 0) dead += item else buf.update(item, n - by)
    }
    dead.foreach(buf.remove)
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val rows = buf.toArray
      .sortWith { case ((i1, n1), (i2, n2)) =>
        if (n1 != n2) n1 > n2 else i1.compareTo(i2) < 0
      }
      .map { case (item, n) =>
        new GenericInternalRow(Array[Any](item, n)): Any
      }
    new GenericArrayData(rows)
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (item, n) =>
      val b = item.getBytes
      out.writeInt(b.length); out.write(b); out.writeLong(n)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGries =
    copy(child = newChild)
}

object Sketches {
  /** `approx_top_items(item, capacity)` — the full Misra-Gries summary
    * as `array<struct<item,count>>`, sorted (count DESC, item ASC).
    */
  def approxTopItems(item: Column, capacity: Int): Column =
    ColumnBridge.column(
      MisraGries(ColumnBridge.expression(item), capacity).toAggregateExpression())
}
