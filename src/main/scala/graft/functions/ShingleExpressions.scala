package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a lowercased string, as one
  * imperative pass.
  *
  * Replaces the composed built-in form
  * `array_distinct(transform(sequence(...), i => array_join(slice(words,
  * i, n), " ")))`, whose higher-order lambdas evaluate interpreted and
  * whose slice-per-index + pairwise distinct are O(words²) per row —
  * measured 7.5 s of the 17 s c4 runtime at sf0.1. This pass is
  * O(words·n) with a hash set for dedup.
  *
  * Semantics match the built-in form exactly (same oracle): words =
  * regex-split on `\s+` with trailing empties kept (Spark `split`
  * default), start positions 1..max(len-(n-1), 1), final slice
  * truncated at the end of the array.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires string input, got ${child.dataType.simpleString}")

  override def nullSafeEval(v: Any): Any =
    ShingleUtil.shingles(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleUtil.shingles($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object ShingleUtil {
  private val ws = java.util.regex.Pattern.compile("\\s+")

  def shingles(s: UTF8String, n: Int): GenericArrayData = {
    // -1 limit: keep trailing empty strings — identical to Spark's
    // split(str, "\s+") default
    val words = ws.split(s.toLowerCase.toString, -1)
    val starts = math.max(words.length - (n - 1), 1)
    val seen = new java.util.LinkedHashSet[String](starts * 2)
    var i = 0
    while (i < starts) {
      val end = math.min(i + n, words.length)
      val sb = new java.lang.StringBuilder
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(words(j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }
}

object ShingleFunctions {
  def word_shingles(c: Column, n: Int): Column =
    GraftColumnBridge.column(WordShingles(GraftColumnBridge.expression(c), n))
}
