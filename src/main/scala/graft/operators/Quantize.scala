package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.{max_abs, quantize_int8}

/** Embedding compression for storage/serving tiers.
  *
  * At 100 TB an embedding corpus is dominated by the vector payload
  * (a 1024-dim float vector is 4 KiB/row); symmetric int8 quantization
  * cuts that 4× with a per-vector scale, and is the standard first
  * compression step before product quantization (see
  * [[Similarity.pqKnn]]). Everything here is a narrow projection —
  * one codegen pass per row, no shuffle, no UDFs.
  *
  * Scheme: `scale = 127 / max|x_i|`; `q_i = clamp(floor(x_i*scale+0.5),
  * -127, 127)` as `array<tinyint>`. Dequantization is `q_i / scale`,
  * with per-element error bounded by `0.5 / scale`. A zero (or empty)
  * vector has no scale — it quantizes to NULL rather than dividing by
  * zero (ANSI mode would kill the job) or silently emitting garbage;
  * downstream treats NULL like the zero-norm cosine convention
  * ([[Similarity.cosineOrNull]]).
  */
object Quantize {

  /** idCol, `_v` (double vector), `scale`, `qvec` — `_v` retained for
    * callers that diagnose against the original values. */
  private def quantized(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol), col(vecCol).cast("array<double>").as("_v"))
      .withColumn("_ma", max_abs(col("_v")))
      .withColumn("scale",
        when(col("_ma").isNull || col("_ma") === 0.0, lit(null).cast("double"))
          .otherwise(lit(127.0) / col("_ma")))
      .withColumn("qvec",
        when(col("scale").isNull, lit(null).cast("array<tinyint>"))
          .otherwise(quantize_int8(col("_v"), col("scale"))))
      .drop("_ma")

  /** Quantize `vecCol` (array<float> or array<double>) to int8.
    * Output: idCol, `scale` (double), `qvec` (array<tinyint>). */
  def int8(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    quantized(df, idCol, vecCol).drop("_v")

  /** int8 quantization plus reconstruction diagnostics: the max
    * per-element dequantization error and its theoretical bound
    * 0.5/scale. The error columns are verification/monitoring output —
    * the interpreted higher-order form is fine off the hot path. */
  def int8WithError(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    quantized(df, idCol, vecCol)
      .withColumn("max_err",
        when(col("scale").isNull, lit(null).cast("double"))
          .otherwise(array_max(zip_with(col("qvec").cast("array<double>"),
            col("_v"), (q, x) => abs(q / col("scale") - x)))))
      .withColumn("err_bound", lit(0.5) / col("scale"))
      .drop("_v")
}
