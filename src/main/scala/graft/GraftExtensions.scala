package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.{DotProduct, Fingerprint64, WordShingles}

/** SparkSessionExtensions entry point: registers the graft custom
  * expressions as SQL functions, so `spark.sql("SELECT dot_product(a,b)")`
  * works alongside the Column API. Install with
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._

  override def apply(ext: SparkSessionExtensions): Unit =
    builders.foreach { case (name, usage, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in"),
        builder))
    }
}

object GraftExtensions {
  val builders: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("dot_product", "dot_product(a, b) - dense dot product of two array<double>",
      (children: Seq[Expression]) => DotProduct(children(0), children(1))),
    ("fingerprint64", "fingerprint64(s) - 64-bit rolling content hash",
      (children: Seq[Expression]) => Fingerprint64(children.head)),
    ("word_shingles", "word_shingles(s, n) - distinct lowercased word n-grams",
      (children: Seq[Expression]) => children(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(n: Int, _: org.apache.spark.sql.types.IntegerType) =>
          WordShingles(children.head, n)
        case other => throw new IllegalArgumentException(
          s"word_shingles: second argument must be an INT literal, got ${other.sql}")
      }))

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
