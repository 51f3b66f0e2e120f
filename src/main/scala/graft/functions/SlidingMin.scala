package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Minimum of every `w`-wide sliding window over an `array<bigint>`,
  * in ONE monotonic-deque pass — O(n) total, each element pushed and
  * popped at most once.
  *
  * This exists for the same reason as [[WordShingles]]: the composed
  * built-in form `transform(sequence(1, n-w+1), j -> array_min(slice(
  * hashes, j, w)))` re-evaluates the `hashes` producer expression FOR
  * EVERY window position once CollapseProject inlines it into the
  * lambda (higher-order functions evaluate interpreted, with no common
  * subexpression elimination), turning an O(n) selection into O(n²·k)
  * per row — the winnowing fingerprint pass (c92) ran minutes instead
  * of seconds at sf0.1 in exactly that shape. As a single expression
  * the child array is evaluated once per row, definitionally.
  *
  * Windows are full except when the array is shorter than `w`, in
  * which case the single partial window's minimum is returned —
  * mirroring `greatest(n-w+1, 1)` start counting, so short-text edge
  * semantics survive the rewrite. Output length: max(n-w+1, 1) for
  * n > 0; empty in, empty out.
  */
case class SlidingMin(child: Expression, w: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sliding_min"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, false) if w > 0 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(LongType, true) => TypeCheckResult.TypeCheckFailure(
      "sliding_min requires non-null array elements")
    case _ if w <= 0 => TypeCheckResult.TypeCheckFailure(
      s"sliding_min requires w > 0, got w=$w")
    case other => TypeCheckResult.TypeCheckFailure(
      s"sliding_min requires array<bigint> input, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    SlidingMinUtil.slidingMin(v.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SlidingMinUtil.slidingMin($c, $w);")

  override protected def withNewChildInternal(newChild: Expression): SlidingMin =
    copy(child = newChild)
}

object SlidingMinUtil {
  def slidingMin(arr: ArrayData, w: Int): GenericArrayData = {
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](0))
    val m = math.max(n - w + 1, 1)
    val out = new Array[Any](m)
    // deque of candidate indices with strictly increasing values;
    // deque(head) is the current window's minimum
    val deque = new Array[Int](n)
    var head = 0
    var tail = 0
    var i = 0
    while (i < n) {
      val v = arr.getLong(i)
      while (tail > head && arr.getLong(deque(tail - 1)) >= v) tail -= 1
      deque(tail) = i
      tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) out(i - w + 1) = arr.getLong(deque(head))
      i += 1
    }
    if (n < w) out(0) = arr.getLong(deque(head)) // single partial window
    new GenericArrayData(out)
  }
}

object SlidingMinFunctions {
  def sliding_min(c: Column, w: Int): Column =
    GraftColumnBridge.column(SlidingMin(GraftColumnBridge.expression(c), w))
}
