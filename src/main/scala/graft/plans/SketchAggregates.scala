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
    // snapshot before mutating: value updates during HashMap
    // iteration are undefined behavior, and the buffer is
    // capacity-bounded so the copy is cheap
    buf.toArray.foreach { case (item, n) =>
      if (n - by <= 0) buf.remove(item) else buf.update(item, n - by)
    }
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

/** KMV (k-minimum-values, a.k.a. bottom-k / theta) DISTINCT-COUNT
  * sketch as a native typed aggregate (Bar-Yossef et al., RANDOM'02;
  * Beyer et al., SIGMOD'07).
  *
  * Why not `countDistinct`: exact distinct shuffles one row PER
  * DISTINCT VALUE — at corpus scale (URLs, content digests, user ids)
  * that is the whole job. The bottom-k of a uniform 64-bit hash is a
  * MERGEABLE summary: each map task keeps its k smallest distinct
  * hashes, partials merge by set-union-then-trim, and only k longs
  * ever cross the wire. Unlike HLL it is also an exact SAMPLE of the
  * distinct population, so intersections/Jaccard between sketches
  * stay estimable — and unlike Misra-Gries the result is FULLY
  * deterministic under any partitioning (the bottom-k of a set does
  * not depend on arrival order), which is what lets an entry
  * oracle-gate it.
  *
  * The child must already be a 64-bit hash (e.g. `xxhash64(col)`)
  * — hashing stays explicit and visible in the plan. Estimator:
  * exact |S| while fewer than k distinct hashes were seen (the
  * regime the DuckDB oracle gates), else (k−1)/u_k with u_k the
  * k-th smallest hash as a fraction of the 2^64 space (relative
  * error ~1/√(k−2); the sketch regime is pinned in PropertySpec).
  */
/** The bottom-k TreeSet discipline shared by the KMV family — buffer
  * shape, unsigned-order offset, update/merge, and the wire format
  * live HERE so [[KmvDistinct]] and [[KmvSketch]] (which differ only
  * in what `eval` derives from the buffer) cannot drift.
  */
abstract class KmvBottomK
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  def k: Int

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a 64-bit hash column (LONG), got ${t.simpleString}")
  }

  override def nullable: Boolean = false

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  // hashes compare in UNSIGNED order: offsetting by Long.MinValue
  // maps unsigned order onto the TreeSet's signed order
  protected final def offset(h: Long): Long = h ^ Long.MinValue

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = offset(v.asInstanceOf[Long])
      if (buf.size < k) buf.add(key)
      else if (key < buf.last()) { if (buf.add(key)) buf.pollLast() }
    }
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) {
      val key = it.next()
      if (buf.size < k) buf.add(key)
      else if (key < buf.last()) { if (buf.add(key)) buf.pollLast() }
    }
    buf
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) out.writeLong(it.next())
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(in.readLong()); i += 1 }
    buf
  }
}

case class KmvDistinct(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends KmvBottomK {

  require(k >= 2, "kmv_distinct k must be >= 2")

  override def dataType: DataType = LongType
  override def prettyName: String = "kmv_distinct"

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (buf.size < k) buf.size.toLong
    else {
      // u_k = k-th smallest hash as a fraction of [0, 2^64)
      val uK = (buf.last().toDouble - Long.MinValue.toDouble) /
        18446744073709551616.0 // 2^64
      math.round((k - 1).toDouble / uK)
    }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvDistinct =
    copy(child = newChild)
}

/** KMV bottom-k SKETCH as a native typed aggregate: the k smallest
  * DISTINCT hash values themselves (unsigned order, ascending), not
  * just the count [[KmvDistinct]] derives from them.
  *
  * Why the values matter: a bottom-k sketch is an exact uniform
  * SAMPLE of a group's distinct population, so two groups' sketches
  * support SET-OPERATION estimates (Jaccard, intersection,
  * containment — Beyer et al., SIGMOD'07 §4) that a scalar distinct
  * count cannot: combine the sketches, re-trim to the k smallest,
  * and the fraction of survivors present in both sides estimates the
  * Jaccard similarity of the FULL populations. That turns
  * "how much does corpus slice A overlap slice B" — naively a
  * corpus × corpus distinct join — into one map-side-combined pass
  * producing ≤ k longs per group, with all pairwise math on
  * group-count-sized sketch rows. Fully deterministic under any
  * partitioning (bottom-k of a set is order-free), which is what
  * lets x38 oracle-gate the ESTIMATOR itself, not just a lucky exact
  * regime.
  *
  * Same buffer/merge discipline as [[KmvDistinct]]; eval returns the
  * ORIGINAL hash values (offset undone) sorted in unsigned order.
  */
case class KmvSketch(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends KmvBottomK {

  require(k >= 2, "kmv_sketch k must be >= 2")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "kmv_sketch"

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next() ^ Long.MinValue; i += 1 }
    new GenericArrayData(out)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketch =
    copy(child = newChild)
}

/** Exact elementwise sum of the upper-triangle outer product of a
  * scaled-integer vector column — s19rot's covariance pass as ONE
  * mergeable aggregate.
  *
  * Why an aggregate and not posexplode(pairs) + groupBy: the explode
  * form shuffles dim·(dim+1)/2 rows PER VECTOR (2,080 rows each at
  * dim 64 — measured 71 s at the sf1 sweep, the board's biggest
  * build constant), where the only state that actually needs to
  * cross the wire is one 2,080-cell partial per map task. Each cell
  * accumulates in SIGNED 128-BIT integer arithmetic (two longs,
  * bitwise carry-out): products are ≤ 2⁴⁰, so a 64-bit cell would
  * overflow at ~2²³ rows per partition — a real corpus partition —
  * while 128 bits hold to ~10²⁶ rows. Exact integer sums are
  * order-free, so the result is bit-identical to the explode form
  * and run-to-run stable (the property s19rot's determinism spec
  * pins).
  */
case class PairProductSum(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  private val cells = dim * (dim + 1) / 2

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pair_product_sum needs array<bigint>, got ${other.simpleString(10)}")
  }

  // upper-triangle sums in row-major (i, j >= i) order; ≤ 2⁴⁰·rows ≤
  // 10²⁷ at any real corpus — inside decimal(38,0)
  override def dataType: DataType = ArrayType(DecimalType(38, 0), false)
  override def nullable: Boolean = false
  override def prettyName: String = "pair_product_sum"

  // (lo, hi) per cell, interleaved
  override def createAggregationBuffer(): Array[Long] = new Array[Long](2 * cells)

  /** buf(cell) += v, signed 128-bit (v sign-extends). */
  private def add128(buf: Array[Long], cell: Int, v: Long): Unit = {
    val lo = buf(2 * cell)
    val sum = lo + v
    // carry-out of the unsigned low-word add
    val carry = ((lo & v) | ((lo | v) & ~sum)) >>> 63
    buf(2 * cell) = sum
    buf(2 * cell + 1) += (v >> 63) + carry
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val q = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray()
      require(q.length == dim,
        s"pair_product_sum: expected $dim components, got ${q.length}")
      var idx = 0
      var i = 0
      while (i < dim) {
        val qi = q(i)
        var j = i
        while (j < dim) { add128(buf, idx, qi * q(j)); idx += 1; j += 1 }
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var c = 0
    while (c < cells) {
      val lo1 = b1(2 * c); val lo2 = b2(2 * c)
      val sum = lo1 + lo2
      val carry = ((lo1 & lo2) | ((lo1 | lo2) & ~sum)) >>> 63
      b1(2 * c) = sum
      b1(2 * c + 1) += b2(2 * c + 1) + carry
      c += 1
    }
    b1
  }

  private val mask64 = java.math.BigInteger.ONE.shiftLeft(64)
    .subtract(java.math.BigInteger.ONE)

  override def eval(buf: Array[Long]): Any = {
    val out = new Array[Any](cells)
    var c = 0
    while (c < cells) {
      val bi = java.math.BigInteger.valueOf(buf(2 * c + 1)).shiftLeft(64)
        .add(java.math.BigInteger.valueOf(buf(2 * c)).and(mask64))
      out(c) = Decimal(new java.math.BigDecimal(bi), 38, 0)
      c += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bytes = new Array[Byte](8 * buf.length)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    buf.foreach(bb.putLong)
    bytes
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): PairProductSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): PairProductSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): PairProductSum =
    copy(child = newChild)
}

object Sketches {
  /** `approx_top_items(item, capacity)` — the full Misra-Gries summary
    * as `array<struct<item,count>>`, sorted (count DESC, item ASC).
    */
  def approxTopItems(item: Column, capacity: Int): Column =
    ColumnBridge.column(
      MisraGries(ColumnBridge.expression(item), capacity).toAggregateExpression())

  /** `kmv_distinct(hash64, k)` — bottom-k distinct-count estimate;
    * exact while the group's distinct count stays under k.
    */
  def kmvDistinct(hash64: Column, k: Int): Column =
    ColumnBridge.column(
      KmvDistinct(ColumnBridge.expression(hash64), k).toAggregateExpression())

  /** `kmv_sketch(hash64, k)` — the bottom-k distinct hash values
    * themselves (unsigned ascending), the mergeable uniform sample
    * set-operation estimates are computed from.
    */
  def kmvSketch(hash64: Column, k: Int): Column =
    ColumnBridge.column(
      KmvSketch(ColumnBridge.expression(hash64), k).toAggregateExpression())

  /** `pair_product_sum(q, dim)` — exact upper-triangle outer-product
    * sums of a scaled-long vector column (row-major (i, j ≥ i)
    * order), one mergeable 128-bit-exact partial per task.
    */
  def pairProductSum(q: Column, dim: Int): Column =
    ColumnBridge.column(
      PairProductSum(ColumnBridge.expression(q), dim).toAggregateExpression())
}
