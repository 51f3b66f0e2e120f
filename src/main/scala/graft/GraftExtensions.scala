package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.{AdcScore, CharNgrams, DotProduct, Fingerprint64, MaxAbs, Mix64, QuantizeInt8, WordChunks, WordShingles}

/** SparkSessionExtensions entry point: registers the graft custom
  * expressions as SQL functions, so `spark.sql("SELECT dot_product(a,b)")`
  * works alongside the Column API. Install with
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._

  override def apply(ext: SparkSessionExtensions): Unit = {
    builders.foreach { case (name, usage, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in"),
        builder))
    }
    // the whole-operator tier: plans TopKPerGroupNode as the bounded-
    // heap partial/final pair, and SelfPairsByKeyNode as the single-
    // exchange bucket-pair exec (graft.plans); the programmatic route
    // is spark.experimental.extraStrategies via their companion objects
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerGroupStrategy)
    ext.injectPlannerStrategy(_ => graft.plans.SelfPairsByKeyStrategy)
  }
}

object GraftExtensions {
  private def intLit(e: Expression, fn: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(n: Int, _: org.apache.spark.sql.types.IntegerType) => n
    case other => throw new IllegalArgumentException(
      s"$fn: argument must be an INT literal, got ${other.sql}")
  }
  private def boolLit(e: Expression, fn: String): Boolean = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(b: Boolean, _: org.apache.spark.sql.types.BooleanType) => b
    case other => throw new IllegalArgumentException(
      s"$fn: argument must be a BOOLEAN literal, got ${other.sql}")
  }

  val builders: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("dot_product", "dot_product(a, b) - dense dot product of two array<double>",
      (children: Seq[Expression]) => DotProduct(children(0), children(1))),
    ("fingerprint64", "fingerprint64(s) - 64-bit rolling content hash",
      (children: Seq[Expression]) => Fingerprint64(children.head)),
    ("mix64", "mix64(h) - murmur3 fmix64 avalanche finalizer over a bigint",
      (children: Seq[Expression]) => Mix64(children.head)),
    ("word_shingles", "word_shingles(s, n) - distinct lowercased word n-grams",
      (children: Seq[Expression]) =>
        WordShingles(children.head, intLit(children(1), "word_shingles"))),
    ("word_chunks",
      "word_chunks(s, n, step, lowercase, fullOnly) - word n-grams with stride",
      (children: Seq[Expression]) =>
        WordChunks(children.head,
          intLit(children(1), "word_chunks"), intLit(children(2), "word_chunks"),
          boolLit(children(3), "word_chunks"), boolLit(children(4), "word_chunks"))),
    ("char_ngrams",
      "char_ngrams(s, n, lowercase) - code-point character n-grams",
      (children: Seq[Expression]) =>
        CharNgrams(children.head,
          intLit(children(1), "char_ngrams"), boolLit(children(2), "char_ngrams"))),
    ("max_abs", "max_abs(v) - largest |x| over an array<double>",
      (children: Seq[Expression]) => MaxAbs(children.head)),
    ("quantize_int8",
      "quantize_int8(v, scale) - symmetric int8 quantization of array<double>",
      (children: Seq[Expression]) => QuantizeInt8(children(0), children(1))),
    ("adc_score",
      "adc_score(codes, lut, ksub) - asymmetric-distance PQ code scoring",
      (children: Seq[Expression]) =>
        AdcScore(children(0), children(1), intLit(children(2), "adc_score"))),
    ("sliding_min",
      "sliding_min(arr, w) - minimum of every w-wide window over array<bigint>",
      (children: Seq[Expression]) =>
        graft.functions.SlidingMin(children(0), intLit(children(1), "sliding_min"))))

  /** Register the same functions on an already-running session (temp
    * functions in the session registry). `spark.sql.extensions=
    * graft.GraftExtensions` at session build is the cluster-config
    * route; this is the programmatic one. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    builders.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}
