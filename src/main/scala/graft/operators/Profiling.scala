package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling — the data-quality "describe" an ETL pipeline runs
  * on every new source before trusting it (null rates, cardinalities,
  * value ranges). The reference's schema tooling stops at names/types
  * (`SchemaTools`); this is the value-level complement.
  */
object Profiling {

  /** Per-column profile of `cols`: row count, null count, exact
    * distinct count, and min/max rendered as strings (computed on the
    * NATIVE type first — lexicographic min of a rendered number would
    * be wrong — then cast for the uniform schema).
    *
    * Scale shape: ONE aggregation pass over the table produces a
    * single wide row (Spark plans the multi-distinct via Expand — one
    * shuffle, no per-column scans); `stack` then unpivots that 1-row
    * relation driver-free. Distinct counts are exact; swap in
    * approx_count_distinct at the call site when HLL precision
    * suffices at 100 TB. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    }
    val row = df.agg(count(lit(1)).as("__total"), aggs: _*)
    val stackArgs = cols
      .map(c => s"'$c', `__nn_$c`, `__nd_$c`, `__mn_$c`, `__mx_$c`")
      .mkString(", ")
    row.select(col("__total"),
        expr(s"stack(${cols.size}, $stackArgs) AS " +
          "(col_name, __nn, n_distinct, min_val, max_val)"))
      .select(col("col_name"), col("__total").as("n_rows"),
        (col("__total") - col("__nn")).as("n_nulls"),
        col("n_distinct"), col("min_val"), col("max_val"))
  }
}
