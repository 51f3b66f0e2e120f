package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-7 SQL-surface additions.
  *
  * Starts with the approximate-percentile tier: `q40_percentiles` is the
  * exact family (full-sort per group), which is the right answer at
  * report scale but not at 100 TB — there the GK/KLL-style mergeable
  * sketch behind `percentile_approx` is the production path (one pass,
  * map-side partial sketches merged at reduce, rank error bounded by
  * 1/accuracy). Same exact-vs-approx pairing the engine already ships
  * for count-distinct (`q53_approx_distinct` + ApproxSpec).
  */
object Relational6 {
  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String) =
    Tables.load(s, dir, name)

  val queries: Map[String, Q] = Map(

    // approximate percentiles at production accuracy — rows-only: the
    // sketch's picked elements have no DuckDB-equal value; the rank
    // error bound (≤ 1/accuracy) is asserted in ApproxSpec vs the
    // exact tier on the same data
    "q96_approx_percentiles" -> { (s, dir) =>
      val acc = 100 // rank error ≤ 1/acc = 1% — the 100 TB setting
      t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
          percentile_approx(col("o_totalprice"),
            array(lit(0.25), lit(0.5), lit(0.75), lit(0.9), lit(0.99)),
            lit(acc)).as("pct_approx"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    }
  )

  val oracle: Map[String, String] = Map(
  )
}
