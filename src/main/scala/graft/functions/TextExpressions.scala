package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}
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

/** Count of non-overlapping occurrences of a fixed LITERAL set in a
  * string — value-identical to
  * `size(regexp_extract_all(text, "\Qlit1\E|\Qlit2\E|…", 0))` but a
  * single byte-level scan instead of a regex-engine alternation.
  *
  * Exactness argument (the langId scorer's contract): Java's regex
  * engine scans match-start positions left to right and, at each
  * position, tries the alternatives IN ORDER, consuming the first that
  * matches before resuming AFTER it. For literal alternatives that is
  * precisely: at each position, first literal (in given order) whose
  * bytes match wins, scan resumes past it, else advance one position.
  * This expression implements exactly that on UTF-8 bytes. Byte-level
  * positions inside a multi-byte code point can never match (UTF-8 is
  * self-synchronizing: a literal's lead byte never equals a
  * continuation byte), so the byte scan visits the same match set the
  * UTF-16 regex scan does, in the same order.
  *
  * Why it exists (round 12, c111/c10 profile): the per-language
  * alternation regex pays the regex engine's per-position alternative
  * loop plus UTF-16 decode per row per language; this is one
  * first-byte table lookup per byte with rare candidate compares —
  * the scoring projection of per-segment language ID is the whole cost
  * of c111, the slowest batch query of the r11 replications.
  */
case class LiteralScanCount(child: Expression, literals: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "literal_scan_count"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType) TypeCheckResult.TypeCheckFailure(
      s"literal_scan_count requires string input, got ${child.dataType.simpleString}")
    else if (literals.isEmpty || literals.exists(_.isEmpty))
      TypeCheckResult.TypeCheckFailure(
        "literal_scan_count requires a non-empty set of non-empty literals")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val scanner = new LiteralScanner(
    literals.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray)

  override def nullSafeEval(v: Any): Any =
    scanner.count(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("scanner", scanner,
      classOf[LiteralScanner].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.count($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): LiteralScanCount =
    copy(child = newChild)
}

/** The runtime scanner behind [[LiteralScanCount]]: ordered
  * first-match non-overlapping counting with a 256-entry first-byte
  * filter so non-candidate positions cost one array read. */
final class LiteralScanner(lits: Array[Array[Byte]]) extends Serializable {
  private[this] val firstByte = {
    val fb = new Array[Boolean](256)
    lits.foreach(l => fb(l(0) & 0xff) = true)
    fb
  }
  def count(s: UTF8String): Int = {
    val bytes = s.getBytes
    val len = bytes.length
    var i = 0
    var n = 0
    while (i < len) {
      if (firstByte(bytes(i) & 0xff)) {
        var k = 0
        var hit = -1
        while (hit < 0 && k < lits.length) {
          val l = lits(k)
          if (i + l.length <= len) {
            var j = 0
            while (j < l.length && bytes(i + j) == l(j)) j += 1
            if (j == l.length) hit = k
          }
          k += 1
        }
        if (hit >= 0) { n += 1; i += lits(hit).length } else i += 1
      } else i += 1
    }
    n
  }
}

object TextFunctions {
  def fingerprint64(c: Column): Column =
    GraftColumnBridge.column(Fingerprint64(GraftColumnBridge.expression(c)))

  def mix64(c: Column): Column =
    GraftColumnBridge.column(Mix64(GraftColumnBridge.expression(c)))

  def literal_scan_count(c: Column, literals: Seq[String]): Column =
    GraftColumnBridge.column(
      LiteralScanCount(GraftColumnBridge.expression(c), literals))

  /** The engine-replicable seeded order/sample key
    * `mix64(fingerprint64("<seed>:" || id))` — single-sourced so the
    * shuffle operator, the sampler, and the DuckDB oracle replicas can
    * never drift apart on the recipe. */
  def seededKey(id: Column, seed: Long): Column = {
    import org.apache.spark.sql.functions.{concat, lit}
    mix64(fingerprint64(concat(lit(s"$seed:"), id.cast("string"))))
  }
}
