package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression: all `w`-token window hashes of a token
  * array in ONE primitive rolling pass — the scale path for
  * window-inverted-index operators (exact-substring scrub, span
  * dedup).
  *
  * The composable form those operators gate their oracles with —
  * `md5(concat_ws(" ", slice(t, pos, w)))` exploded per position —
  * pays per window: a w-token string copy, an md5 over it, and a
  * 32-char UTF8 key that then rides every shuffle. This expression
  * hashes each token once (XXH64 over its bytes) and rolls a
  * degree-(w-1) polynomial in 64-bit wraparound arithmetic across
  * positions — O(n) token hashes + O(n) multiply-adds for ALL
  * windows, emitting 8-byte LongType keys that shrink the
  * window-index shuffle ~4× vs md5 strings. Collisions are the usual
  * 64-bit-birthday trade (~n²/2⁶⁵ expected false window matches);
  * the md5 form remains the registered oracle-exact path, this is
  * the documented production dial (LlmOpsSpec pins output equality
  * on the compare corpus).
  */
case class WindowHashes(child: Expression, w: Int) extends UnaryExpression {

  require(w >= 1, "window must cover at least 1 token")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"window_hashes expects array<string>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "window_hashes"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = WindowHashes.roll(
      Array.tabulate(n)(i =>
        if (arr.isNullAt(i)) 0L
        else {
          val s = arr.getUTF8String(i)
          org.apache.spark.sql.catalyst.expressions.XXH64
            .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        }),
      w)
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val th = ctx.freshName("tokHashes")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |long[] $th = new long[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    org.apache.spark.unsafe.types.UTF8String $s = $a.getUTF8String($i);
         |    $th[$i] = org.apache.spark.sql.catalyst.expressions.XXH64
         |      .hashUnsafeBytes($s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(graft.plans.WindowHashes.roll($th, $w));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WindowHashes =
    copy(child = newChild)
}

object WindowHashes {

  /** Odd multiplier with good avalanche (splitmix64's golden-gamma). */
  private final val B = 0x9E3779B97F4A7C15L

  /** Rolling degree-(w-1) polynomial over `tok` in 64-bit wraparound
    * arithmetic: out(i) = Σ_j tok(i+j)·B^(w-1-j). Shared by the
    * interpreted and generated paths (one arithmetic, one answer).
    */
  def roll(tok: Array[Long], w: Int): Array[Long] = {
    val n = tok.length
    if (n < w) return Array.emptyLongArray
    var bw = 1L // B^(w-1)
    var j = 1
    while (j < w) { bw *= B; j += 1 }
    val out = new Array[Long](n - w + 1)
    var h = 0L
    var i = 0
    while (i < w) { h = h * B + tok(i); i += 1 }
    out(0) = h
    i = 0
    while (i + w < n) {
      h = (h - tok(i) * bw) * B + tok(i + w)
      out(i + 1) = h
      i += 1
    }
    out
  }
}

object HashExpressions {
  /** Column API for [[WindowHashes]]. */
  def windowHashes(tokens: Column, w: Int): Column =
    ColumnBridge.column(WindowHashes(ColumnBridge.expression(tokens), w))
}
