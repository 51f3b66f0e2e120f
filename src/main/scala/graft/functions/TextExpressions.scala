package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit Karp–Rabin rolling fingerprint of a string's UTF-8 bytes:
  * h = h * 31 + byte, wrapping two's-complement (Java semantics — no
  * ANSI overflow concern inside generated code, unlike the SQL-level
  * fold, which also evaluated interpreted per character and was ~40×
  * slower on the sf0.1 bench).
  */
case class Fingerprint64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "fingerprint64"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"fingerprint64 requires string input, got ${child.dataType.simpleString}")

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = h * 31L + (bytes(i) & 0xffL); i += 1 }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = $h * 31L + ($bytes[$i] & 0xffL);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Fingerprint64 =
    copy(child = newChild)
}

/** Murmur3 64-bit finalizer (fmix64) over a long: three xorshift-multiply
  * rounds giving full avalanche — every output bit depends on every input
  * bit. Composed as `mix64(fingerprint64(s))` it upgrades the Karp–Rabin
  * fold (whose high bits are zero for short strings) into a usable
  * 64-bit string hash whose arithmetic is STILL exactly replicable in
  * DuckDB HUGEINT mod-2⁶⁴ SQL (xor + floor-division shifts + wrapping
  * multiply) — the property the c3 SimHash oracle needs and xxhash64's
  * stripe fold lacks. Wrapping multiplies live in generated Java, so
  * ANSI-mode overflow checking never sees them.
  */
case class Mix64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "mix64"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"mix64 requires bigint input, got ${child.dataType.simpleString}")

  override def nullSafeEval(v: Any): Any = Mix64.mix(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Mix64.mix($c);")

  override protected def withNewChildInternal(newChild: Expression): Mix64 =
    copy(child = newChild)
}

object Mix64 {
  def mix(v: Long): Long = {
    var h = v
    h ^= h >>> 33
    h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33
    h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    h
  }
}

object TextFunctions {
  def fingerprint64(c: Column): Column =
    GraftColumnBridge.column(Fingerprint64(GraftColumnBridge.expression(c)))

  def mix64(c: Column): Column =
    GraftColumnBridge.column(Mix64(GraftColumnBridge.expression(c)))

  /** The engine-replicable seeded order/sample key
    * `mix64(fingerprint64("<seed>:" || id))` — single-sourced so the
    * shuffle operator, the sampler, and the DuckDB oracle replicas can
    * never drift apart on the recipe. */
  def seededKey(id: Column, seed: Long): Column = {
    import org.apache.spark.sql.functions.{concat, lit}
    mix64(fingerprint64(concat(lit(s"$seed:"), id.cast("string"))))
  }
}
