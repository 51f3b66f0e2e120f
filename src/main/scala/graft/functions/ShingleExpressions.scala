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
    if (child.dataType != StringType) TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires string input, got ${child.dataType.simpleString}")
    else if (n <= 0) TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires n > 0, got n=$n")
    else TypeCheckResult.TypeCheckSuccess

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

/** Word n-gram chunks with a configurable stride — the generalized,
  * non-distinct sibling of `WordShingles`, one codegen'd pass replacing
  * the interpreted `transform(sequence(...), i => ...)` chains:
  *
  *  - `n = step`: consecutive non-overlapping spans (span-level dedup),
  *    final chunk truncated at the end of the word array;
  *  - `step = 1, fullOnly = true`: sliding full-width n-grams in
  *    document order with multiplicity (bigram models, repetition
  *    stats) — a document shorter than `n` words yields an empty array.
  *
  * Splits on `\s+` with trailing empties kept (Spark `split` default);
  * `lowercase` folds case before splitting, matching
  * `split(lower(text), "\\s+")`.
  */
case class WordChunks(child: Expression, n: Int, step: Int,
                      lowercase: Boolean, fullOnly: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_chunks"

  // parameter validation lives here (not in eval): the function is
  // SQL-exposed with free parameters, and a bad (n, step) must fail
  // ANALYSIS with a clear message, not surface mid-query as a division
  // by zero inside ChunkUtil.chunks
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType) TypeCheckResult.TypeCheckFailure(
      s"word_chunks requires string input, got ${child.dataType.simpleString}")
    else if (n <= 0 || step <= 0) TypeCheckResult.TypeCheckFailure(
      s"word_chunks requires n > 0 and step > 0, got n=$n step=$step")
    else if (!fullOnly && step > n) TypeCheckResult.TypeCheckFailure(
      "word_chunks without fullOnly requires step <= n (step > n would " +
        s"silently skip words between windows), got n=$n step=$step; " +
        "sampling strides are defined for fullOnly = true only")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(v: Any): Any =
    ChunkUtil.chunks(v.asInstanceOf[UTF8String], n, step, lowercase, fullOnly)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ChunkUtil.chunks($c, $n, $step, $lowercase, $fullOnly);")

  override protected def withNewChildInternal(newChild: Expression): WordChunks =
    copy(child = newChild)
}

object ChunkUtil {
  private val ws = java.util.regex.Pattern.compile("\\s+")

  def chunks(s: UTF8String, n: Int, step: Int,
             lowercase: Boolean, fullOnly: Boolean): GenericArrayData = {
    val str = if (lowercase) s.toLowerCase.toString else s.toString
    val words = ws.split(str, -1)
    val len = words.length
    // start positions 0, step, 2·step … — fullOnly admits only windows
    // of exactly n words; otherwise (any step <= n — WordChunks
    // .checkInputDataTypes rejects the rest) the last window truncates
    // at the end of the string and the count guarantees every word is
    // covered: ceil(len/step) spans when n == step, max(len-n+1, 1)
    // truncated shingle starts when step == 1, and for overlapping
    // strides in between the final start is the smallest multiple of
    // step whose window reaches the last word.
    val count =
      if (fullOnly) { if (len < n) 0 else (len - n) / step + 1 }
      else (math.max(len - (n - step), step) + step - 1) / step
    val out = new Array[Any](count)
    var k = 0
    while (k < count) {
      val i = k * step
      val end = math.min(i + n, len)
      val sb = new java.lang.StringBuilder
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(words(j))
        j += 1
      }
      out(k) = UTF8String.fromString(sb.toString)
      k += 1
    }
    new GenericArrayData(out)
  }

  def charNgrams(s: UTF8String, n: Int, lowercase: Boolean): GenericArrayData = {
    val u = if (lowercase) s.toLowerCase else s
    val bytes = u.getBytes
    // one forward walk collects every code point's byte offset; n-gram i
    // is then a byte slice [starts(i), starts(min(i+n, chars)))
    val chars = u.numChars()
    val starts = new Array[Int](chars + 1)
    var c = 0
    var off = 0
    while (c < chars) {
      starts(c) = off
      off += UTF8String.numBytesForFirstByte(bytes(off))
      c += 1
    }
    starts(chars) = bytes.length
    val count = math.max(chars - (n - 1), 1)
    val out = new Array[Any](count)
    var i = 0
    while (i < count) {
      val from = starts(i)
      val until = starts(math.min(i + n, chars))
      out(i) = UTF8String.fromBytes(bytes, from, until - from)
      i += 1
    }
    new GenericArrayData(out)
  }
}

object ChunkFunctions {
  def word_chunks(c: Column, n: Int, step: Int,
                  lowercase: Boolean, fullOnly: Boolean): Column =
    GraftColumnBridge.column(
      WordChunks(GraftColumnBridge.expression(c), n, step, lowercase, fullOnly))

  def char_ngrams(c: Column, n: Int, lowercase: Boolean): Column =
    GraftColumnBridge.column(
      CharNgrams(GraftColumnBridge.expression(c), n, lowercase))
}

/** Character n-grams in one codegen'd pass, replacing the interpreted
  * `transform(sequence(1, greatest(length(t)-(n-1), 1)), i =>
  * substring(t, i, n))` form. Semantics are identical: start positions
  * 1..max(len-(n-1), 1) counted in CODE POINTS (Spark `substring`
  * semantics — the zh fixture text is multi-byte), final n-gram
  * truncated at end of string. The pass walks UTF-8 byte offsets once
  * (the composed form rescans from the string head per substring —
  * O(len²) on multi-byte text).
  */
case class CharNgrams(child: Expression, n: Int, lowercase: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_ngrams"

  // n <= 0 would compute a negative-length byte slice inside
  // UTF8String.fromBytes — reject at analysis (SQL-exposed function)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType) TypeCheckResult.TypeCheckFailure(
      s"char_ngrams requires string input, got ${child.dataType.simpleString}")
    else if (n <= 0) TypeCheckResult.TypeCheckFailure(
      s"char_ngrams requires n > 0, got n=$n")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(v: Any): Any =
    ChunkUtil.charNgrams(v.asInstanceOf[UTF8String], n, lowercase)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ChunkUtil.charNgrams($c, $n, $lowercase);")

  override protected def withNewChildInternal(newChild: Expression): CharNgrams =
    copy(child = newChild)
}
