package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the dense dot product.
  *
  * The composable alternative — `aggregate(zip_with(a, b, _*_), 0d, _+_)`
  * — is evaluated by the interpreted higher-order-function path (HOFs
  * have no codegen), which measured ~25µs/pair on 64-dim vectors and
  * dominated the embedding near-dup scan. This expression generates a
  * primitive double loop inside whole-stage codegen: same strict
  * left-to-right accumulation order (bit-identical results, which the
  * DuckDB list_reduce oracle relies on), ~50× faster per pair.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product expects array<double> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** All SRP hash-table signatures of a vector in ONE primitive pass:
  * `tables` signatures of `bits` sign bits each, over a fixed
  * hyperplane matrix.
  *
  * Why an expression and not `tables × bits` [[DotProduct]] columns
  * against literal plane arrays: a literal array is a
  * GenericArrayData of BOXED doubles (each getDouble unboxes a
  * java.lang.Double), and a projection of 48-88 independent dot
  * expressions grows past what whole-stage codegen keeps in one
  * compiled method — measured on the 10× probe, the hashing stage
  * alone cost 3.6s (bits=6) / 6.1s (bits=11) for 20k rows and
  * dominated BOTH d05 dials. Here the planes live in ONE unboxed
  * `double[]` codegen reference, the triple loop runs primitive FMAs,
  * and the per-row cost is exactly tables·bits·dim multiply-adds.
  *
  * Sign semantics are bit-identical to the per-plane form: strict
  * ascending-index accumulation per plane (the order the generated
  * DuckDB oracle uses), bit j set iff dot > 0.
  */
case class SrpSignatures(child: Expression, planes: Seq[Double],
    tables: Int, bits: Int, dim: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(planes.length == tables * bits * dim,
    s"planes length ${planes.length} != $tables*$bits*$dim")

  @transient private lazy val flat: Array[Double] = planes.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"srp_signatures expects array<double> input, got ${t.simpleString}")
  }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "srp_signatures"

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val m = math.min(dim, v.numElements())
    val sig = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var b = 0L
      var j = 0
      while (j < bits) {
        val base = (t * bits + j) * dim
        var s = 0.0
        var i = 0
        while (i < m) { s += flat(base + i) * v.getDouble(i); i += 1 }
        if (s > 0) b |= (1L << j)
        j += 1
      }
      sig(t) = b
      t += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val p = ctx.addReferenceObj("srpPlanes", flat, "double[]")
      val sig = ctx.freshName("sig")
      val m = ctx.freshName("m")
      val t = ctx.freshName("t")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val b = ctx.freshName("b")
      val base = ctx.freshName("base")
      s"""
         |int $m = java.lang.Math.min($dim, $v.numElements());
         |long[] $sig = new long[$tables];
         |for (int $t = 0; $t < $tables; $t++) {
         |  long $b = 0L;
         |  for (int $j = 0; $j < $bits; $j++) {
         |    int $base = ($t * $bits + $j) * $dim;
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $m; $i++) {
         |      $s += $p[$base + $i] * $v.getDouble($i);
         |    }
         |    if ($s > 0) $b |= (1L << $j);
         |  }
         |  $sig[$t] = $b;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($sig);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SrpSignatures =
    copy(child = newChild)
}

object VectorExpressions {
  /** Column API for [[DotProduct]]. */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column API for [[SrpSignatures]]: `planes(t)(j)` is hyperplane j
    * of table t, each of length `dim`.
    */
  def srpSignatures(v: Column, planes: Array[Array[Array[Double]]]): Column = {
    val tables = planes.length
    val bits = planes.head.length
    val dim = planes.head.head.length
    ColumnBridge.column(SrpSignatures(ColumnBridge.expression(v),
      planes.flatten.flatten.toSeq, tables, bits, dim))
  }
}
